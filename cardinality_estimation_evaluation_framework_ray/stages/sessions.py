"""Event sessionization: gap-based session windows per user.

A training-data / event-stream operator the reference lacks (its only
ordering semantics are prefix unions, SURVEY.md §2.8).  Implemented as the
canonical Ray Data composition: shuffle by user (the groupby), then a
vectorized per-group sort + gap scan — no streaming state needed because
session boundaries are a pure function of each user's own timestamps.

Partitioning assumption (documented per the driver brief): all events of one
``user_col`` value fit in one group; for 100 TB event logs, pre-bucket by
``hash(user) % k`` files so the groupby shuffles within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def sessionize(ds: "ray.data.Dataset", *, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0) -> "ray.data.Dataset":
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    Output: (user_col, session_id:int64 [per-user, 1-based], n_events,
    session_start, session_end, duration_s).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col]
        new_session = ts.diff() > gap
        sid = new_session.cumsum().astype("int64") + 1
        out = (pd.DataFrame({user_col: g[user_col].values, "session_id": sid.values,
                             ts_col: ts.values})
               .groupby("session_id")
               .agg(**{user_col: (user_col, "first"),
                       "n_events": (ts_col, "size"),
                       "session_start": (ts_col, "min"),
                       "session_end": (ts_col, "max")})
               .reset_index())
        out["duration_s"] = (
            (out["session_end"] - out["session_start"]).dt.total_seconds())
        return out[[user_col, "session_id", "n_events", "session_start",
                    "session_end", "duration_s"]]

    return (ds.select_columns([user_col, ts_col])
            .groupby(user_col)
            .map_groups(per_user, batch_format="pandas"))


def session_stats(ds: "ray.data.Dataset", *, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: float = 30.0) -> pd.DataFrame:
    """Per-user session summary: (user, n_sessions, n_events, max_session_events)."""
    sessions = sessionize(ds, user_col=user_col, ts_col=ts_col,
                          gap_minutes=gap_minutes)

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user_col: [g[user_col].iloc[0]],
            "n_sessions": np.int64(len(g)),
            "n_events": np.int64(g["n_events"].sum()),
            "max_session_events": np.int64(g["n_events"].max()),
        })

    return (sessions.groupby(user_col)
            .map_groups(summarize, batch_format="pandas").to_pandas())
