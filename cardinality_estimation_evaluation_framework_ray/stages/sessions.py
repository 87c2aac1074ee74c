"""Event sessionization: gap-based session windows per user.

A training-data / event-stream operator the reference lacks (its only
ordering semantics are prefix unions, SURVEY.md §2.8).  Implemented as the
canonical Ray Data composition: shuffle by user (the groupby), then a
vectorized per-group sort + gap scan — no streaming state needed because
session boundaries are a pure function of each user's own timestamps.

Hot-key handling: by default all events of one ``user_col`` value fit in one
group.  ``bucket_span_minutes`` selects the two-level scan for users too hot
for one task: events are co-grouped on ``(user, ts // span)``, per-bucket
sessions are computed locally, and a per-user STITCH pass over the (much
smaller) session summaries chain-merges sessions that touch bucket
boundaries — within a bucket consecutive sessions already exceed the gap,
and buckets partition time, so merging consecutive summaries whose gap is
<= the threshold reproduces the single-level output exactly (tested with one
dominant user spanning many blocks).  The stitch group is one row per
SESSION, not per event — the reduction a two-level scan buys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _sessions_frame(g: pd.DataFrame, user_col: str, ts_col: str,
                    gap: pd.Timedelta) -> pd.DataFrame:
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
    return out


def sessionize(ds: "ray.data.Dataset", *, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               bucket_span_minutes: float | None = None) -> "ray.data.Dataset":
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    Output: (user_col, session_id:int64 [per-user, 1-based], n_events,
    session_start, session_end, duration_s).

    ``bucket_span_minutes`` (must exceed ``gap_minutes``) switches to the
    two-level scan for hot users — see module docstring.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def finalize(out: pd.DataFrame) -> pd.DataFrame:
        out["duration_s"] = (
            (out["session_end"] - out["session_start"]).dt.total_seconds())
        return out[[user_col, "session_id", "n_events", "session_start",
                    "session_end", "duration_s"]]

    if bucket_span_minutes is None:
        def per_user(g: pd.DataFrame) -> pd.DataFrame:
            return finalize(_sessions_frame(g, user_col, ts_col, gap))

        return (ds.select_columns([user_col, ts_col])
                .groupby(user_col)
                .map_groups(per_user, batch_format="pandas"))

    if bucket_span_minutes <= gap_minutes:
        raise ValueError("bucket_span_minutes must exceed gap_minutes")
    span = pd.Timedelta(minutes=bucket_span_minutes)

    import pyarrow as pa

    def add_bucket(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.timestamp("ns")).to_numpy(
            zero_copy_only=False).astype("datetime64[ns]").view(np.int64)
        b = ts // span.value
        return t.append_column("__bucket", pa.array(b.astype(np.int64)))

    bucketed = (ds.select_columns([user_col, ts_col])
                .map_batches(add_bucket, batch_format="pyarrow",
                             zero_copy_batch=True))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return _sessions_frame(g, user_col, ts_col, gap).drop(
            columns=["session_id"])

    partial = bucketed.groupby([user_col, "__bucket"]).map_groups(
        per_bucket, batch_format="pandas")

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        # one row per per-bucket session; buckets partition time, so sorting
        # by start and chain-merging adjacent summaries with gap <= threshold
        # is exactly the single-level recurrence over session summaries
        g = g.sort_values("session_start", kind="stable").reset_index(drop=True)
        starts = g["session_start"].to_numpy()
        ends = g["session_end"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (starts[1:] - ends[:-1]) > gap.to_timedelta64()
        sid = np.cumsum(brk)
        out = (pd.DataFrame({user_col: g[user_col].values, "session_id": sid,
                             "n_events": g["n_events"].values,
                             "session_start": starts, "session_end": ends})
               .groupby("session_id")
               .agg(**{user_col: (user_col, "first"),
                       "n_events": ("n_events", "sum"),
                       "session_start": ("session_start", "min"),
                       "session_end": ("session_end", "max")})
               .reset_index())
        return finalize(out)

    return partial.groupby(user_col).map_groups(stitch, batch_format="pandas")


def session_stats(ds: "ray.data.Dataset", *, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: float = 30.0,
                  bucket_span_minutes: float | None = None) -> pd.DataFrame:
    """Per-user session summary: (user, n_sessions, n_events, max_session_events)."""
    sessions = sessionize(ds, user_col=user_col, ts_col=ts_col,
                          gap_minutes=gap_minutes,
                          bucket_span_minutes=bucket_span_minutes)

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user_col: [g[user_col].iloc[0]],
            "n_sessions": np.int64(len(g)),
            "n_events": np.int64(g["n_events"].sum()),
            "max_session_events": np.int64(g["n_events"].max()),
        })

    return (sessions.groupby(user_col)
            .map_groups(summarize, batch_format="pandas").to_pandas())


def funnel_counts(ds: "ray.data.Dataset", *, key_col: str, ts_col: str,
                  event_col: str, steps: list[str]) -> pd.DataFrame:
    """Ordered funnel analysis: how many keys reach each step of
    ``steps``, where step i counts a key iff it has a step-i event at or
    after its earliest qualifying step-(i-1) time (t_i = MIN ts of step-i
    events with ts >= t_{i-1}).

    Distributed shape — chained aggregate + join, NO per-key-group task
    assumption: the corpus streams ONCE into a pinned narrow
    (key, event, ts) subset of step events; each step filters that subset,
    joins it against the previous step's FRONTIER table (one (key, t) row
    per surviving key, sharded by key via ``hash_join``), and reduces with
    one ``groupby(key).min``.  k steps = k KB-payload aggregates + (k-1)
    key-sharded joins; nothing driver-side but the final k counts.

    Timestamps compare in int64 nanoseconds — identical ordering to SQL
    timestamp comparison, so the step counts hash-match a chained-CTE
    oracle.  Returns (step 1..k, event, n_keys).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from .joins import hash_join

    step_set = list(dict.fromkeys(steps))

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column(event_col),
                        value_set=pa.array(step_set, pa.string()))
        t = t.filter(keep)
        ts = t.column(ts_col).cast(pa.timestamp("ns")).cast(pa.int64())
        return pa.table({key_col: t.column(key_col),
                         event_col: t.column(event_col), "__ts": ts})

    # ONE corpus scan: the narrow (key, event, ts) subset of step events is
    # pinned once; each step then filters this (much smaller) table instead
    # of re-reading the corpus k times (diamond rule, SCALE.md)
    base = (ds.select_columns([key_col, ts_col, event_col])
            .map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).materialize())
    frontier = None
    counts: list[int] = []
    for step in steps:

        def only(t: pa.Table, _s=step) -> pa.Table:
            return (t.filter(pc.equal(t.column(event_col), _s))
                    .select([key_col, "__ts"]))

        ev = base.map_batches(only, batch_format="pyarrow")
        if frontier is not None:
            ev = hash_join(ev, frontier, on=key_col)

            def after(t: pa.Table) -> pa.Table:
                return t.filter(pc.greater_equal(t.column("__ts"),
                                                 t.column("__t")))

            ev = ev.map_batches(after, batch_format="pyarrow")
        cur = (ev.groupby(key_col)
               .aggregate(Min("__ts", alias_name="__t")).materialize())
        counts.append(cur.count())
        frontier = cur
        if counts[-1] == 0:
            # empty frontier: every later step is 0 (and an empty Dataset
            # has no schema for hash_join to consume)
            counts.extend([0] * (len(steps) - len(counts)))
            break
    return pd.DataFrame({
        "step": np.arange(1, len(steps) + 1, dtype=np.int64),
        "event": steps,
        "n_keys": np.asarray(counts, dtype=np.int64),
    })


def cohort_retention(ds: "ray.data.Dataset", *, key_col: str, ts_col: str,
                     unit: str = "day") -> pd.DataFrame:
    """Cohort retention matrix: cohort = each key's FIRST activity bucket
    (calendar ``unit``); one output row per (cohort, bucket) with the
    distinct-key count of that cohort active in that bucket.

    Distributed shape: the corpus shuffles ONCE into distinct
    (key, bucket) activity pairs (map-side combined groupby); the
    first-activity frontier is a KB-per-key ``groupby(key).min``; a
    key-sharded ``hash_join`` attaches each key's cohort to its activity
    pairs; the final groupby is over ≤ #buckets² metadata rows.  No
    per-key task assumption, nothing driver-side but the matrix.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from .joins import hash_join

    def to_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor_temporal(t.column(ts_col), unit=unit),
                    pa.timestamp("us")).cast(pa.int64())
        return pa.table({key_col: t.column(key_col), "__b": b})

    pairs = (ds.select_columns([key_col, ts_col])
             .map_batches(to_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([key_col, "__b"]).count()
             .drop_columns(["count()"]).materialize())
    first = pairs.groupby(key_col).aggregate(Min("__b",
                                                 alias_name="__cohort"))
    j = hash_join(pairs, first, on=key_col)
    out = j.groupby(["__cohort", "__b"]).count().to_pandas()
    res = pd.DataFrame({
        "cohort": pd.to_datetime(out["__cohort"], unit="us"),
        "bucket": pd.to_datetime(out["__b"], unit="us"),
        "n_keys": out["count()"].astype("int64"),
    })
    res["cohort"] = res["cohort"].astype("datetime64[us]")
    res["bucket"] = res["bucket"].astype("datetime64[us]")
    return (res.sort_values(["cohort", "bucket"]).reset_index(drop=True))


def transition_counts(ds: "ray.data.Dataset", *, key_col: str, ts_col: str,
                      type_col: str, tiebreak: list[str] | None = None
                      ) -> pd.DataFrame:
    """Markov transition matrix over per-key event sequences: order each
    key's events by ``ts_col`` (+ tiebreak), count adjacent
    (prev_type -> type) pairs, fold across keys.  The behavioral-analytics
    primitive behind next-action models and funnel discovery (the funnel
    stage checks ONE ordered pattern; this measures ALL adjacent pairs).

    Scale shape: ONE shuffle (groupby key) moves each event row once;
    each group emits its LOCAL (prev, cur) counts — at most
    (#distinct types)^2 rows per key, not its event rows — and a KB-scale
    groupby folds them.  Same single-key-fits-a-task assumption as
    ``sessionize``/``grouped_lead_lag``; pre-bucket hot keys upstream if
    violated.

    Output: (prev_type, type_col, n_transitions), sorted.
    """
    from ray.data.aggregate import Sum

    sort_cols = [ts_col] + (tiebreak or [])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        t = g[type_col].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"prev_type": [], type_col: [],
                                 "__n": []})
        local = (pd.DataFrame({"prev_type": t[:-1], type_col: t[1:]})
                 .groupby(["prev_type", type_col], as_index=False)
                 .size().rename(columns={"size": "__n"}))
        return local

    cols = list(dict.fromkeys([key_col, type_col] + sort_cols))
    out = (ds.select_columns(cols)
           .groupby(key_col).map_groups(pairs, batch_format="pandas")
           .groupby(["prev_type", type_col])
           .aggregate(Sum("__n", alias_name="n_transitions"))
           .to_pandas())
    out["n_transitions"] = out["n_transitions"].astype("int64")
    return (out.sort_values(["prev_type", type_col])
            .reset_index(drop=True))
