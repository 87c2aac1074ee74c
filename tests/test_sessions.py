import numpy as np
import pandas as pd
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.sessions import (
    session_stats,
    sessionize,
)


def _events():
    base = pd.Timestamp("2025-01-01 10:00:00")
    rows = [
        # user 1: two sessions (gap 45 min), 3 + 2 events
        (1, base), (1, base + pd.Timedelta(minutes=5)),
        (1, base + pd.Timedelta(minutes=20)),
        (1, base + pd.Timedelta(minutes=65)),
        (1, base + pd.Timedelta(minutes=70)),
        # user 2: one session, single event
        (2, base),
    ]
    return ray.data.from_pandas(pd.DataFrame(rows, columns=["user_id", "ts"]))


@pytest.mark.usefixtures("ray_session")
def test_sessionize_boundaries():
    out = sessionize(_events(), gap_minutes=30.0).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_id")
    assert u1.n_events.tolist() == [3, 2]
    assert u1.duration_s.tolist() == [20 * 60.0, 5 * 60.0]
    u2 = out[out.user_id == 2]
    assert u2.n_events.tolist() == [1] and u2.duration_s.tolist() == [0.0]


@pytest.mark.usefixtures("ray_session")
def test_session_stats():
    df = session_stats(_events(), gap_minutes=30.0).set_index("user_id")
    assert df.loc[1, "n_sessions"] == 2
    assert df.loc[1, "n_events"] == 5
    assert df.loc[1, "max_session_events"] == 3
    assert df.loc[2, "n_sessions"] == 1


@pytest.mark.usefixtures("ray_session")
def test_gap_parameter():
    out = sessionize(_events(), gap_minutes=120.0).to_pandas()
    assert out[out.user_id == 1].n_events.tolist() == [5]  # one big session


@pytest.mark.usefixtures("ray_session")
def test_sessionize_two_level_matches_single_level():
    # one dominant user spanning many blocks; sessions cross bucket borders
    import numpy as np

    rs = np.random.RandomState(11)
    base = pd.Timestamp("2024-01-01")
    # hot user: bursts every ~10 min with occasional > 30 min gaps, over days
    offsets = np.cumsum(rs.choice([5, 10, 45, 200], size=4000,
                                  p=[0.5, 0.3, 0.15, 0.05]))
    rows = [(1, base + pd.Timedelta(minutes=int(m))) for m in offsets]
    rows += [(u, base + pd.Timedelta(minutes=int(m)))
             for u in (2, 3) for m in rs.randint(0, 5000, 40)]
    ds = ray.data.from_pandas(
        pd.DataFrame(rows, columns=["user_id", "ts"])).repartition(16)
    single = sessionize(ds, gap_minutes=30.0).to_pandas()
    two = sessionize(ds, gap_minutes=30.0,
                     bucket_span_minutes=240.0).to_pandas()
    key = ["user_id", "session_id"]
    single = single.sort_values(key).reset_index(drop=True)
    two = two.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(single, two[single.columns])


@pytest.mark.usefixtures("ray_session")
def test_sessionize_two_level_span_guard():
    with pytest.raises(ValueError):
        sessionize(_events(), gap_minutes=30.0, bucket_span_minutes=10.0)


def test_funnel_counts_matches_bruteforce(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.sessions import (
        funnel_counts,
    )

    rng = np.random.RandomState(31)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 80, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "x"], n),
    })
    out = funnel_counts(ray.data.from_pandas(df, override_num_blocks=7),
                        key_col="user_id", ts_col="ts",
                        event_col="event_type", steps=["a", "b", "c"])

    # brute force per user
    expected = [0, 0, 0]
    for _, g in df.groupby("user_id"):
        t = None
        for i, step in enumerate(["a", "b", "c"]):
            sel = g[g["event_type"] == step]
            if t is not None:
                sel = sel[sel["ts"] >= t]
            if sel.empty:
                break
            t = sel["ts"].min()
            expected[i] += 1
    assert out["n_keys"].tolist() == expected
    assert out["step"].tolist() == [1, 2, 3]


def test_funnel_counts_dead_step_short_circuits(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.sessions import (
        funnel_counts,
    )

    df = pd.DataFrame({"user_id": [1, 1], "event_type": ["a", "a"],
                       "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    out = funnel_counts(ray.data.from_pandas(df), key_col="user_id",
                        ts_col="ts", event_col="event_type",
                        steps=["a", "zzz", "a"])
    assert out["n_keys"].tolist() == [1, 0, 0]


def test_cohort_retention_matches_bruteforce(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.sessions import (
        cohort_retention,
    )

    rng = np.random.RandomState(37)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 60, n),
        "ts": pd.to_datetime("2024-03-01")
        + pd.to_timedelta(rng.randint(0, 20 * 86400, n), unit="s"),
    })
    out = cohort_retention(ray.data.from_pandas(df, override_num_blocks=7),
                           key_col="user_id", ts_col="ts", unit="day")
    a = df.assign(bucket=df["ts"].dt.floor("D")).drop_duplicates(
        ["user_id", "bucket"])
    f = a.groupby("user_id")["bucket"].min().rename("cohort")
    ref = (a.join(f, on="user_id").groupby(["cohort", "bucket"])
           .size().rename("n_keys").reset_index()
           .sort_values(["cohort", "bucket"]).reset_index(drop=True))
    assert out["n_keys"].tolist() == ref["n_keys"].tolist()
    assert out["cohort"].tolist() == ref["cohort"].tolist()
    assert out["bucket"].tolist() == ref["bucket"].tolist()


def test_transition_counts_matches_pandas(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.sessions import (
        transition_counts,
    )

    rs = np.random.RandomState(9)
    n = 3000
    df = pd.DataFrame({
        "user_id": rs.randint(0, 40, n),
        "ts": pd.to_datetime(rs.randint(0, 10**6, n), unit="s"),
        "event_id": np.arange(n),
        "event_type": rs.choice(list("abcd"), n),
    })
    got = transition_counts(
        ray.data.from_pandas(df, override_num_blocks=7),
        key_col="user_id", ts_col="ts", type_col="event_type",
        tiebreak=["event_id"])

    exp = (df.sort_values(["user_id", "ts", "event_id"])
           .assign(prev_type=lambda d: d.groupby("user_id")["event_type"]
                   .shift(1))
           .dropna(subset=["prev_type"])
           .groupby(["prev_type", "event_type"], as_index=False).size()
           .rename(columns={"size": "n_transitions"})
           .sort_values(["prev_type", "event_type"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, exp.astype({"n_transitions": "int64"}))


def test_transition_counts_single_event_keys_drop_out(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.sessions import (
        transition_counts,
    )

    df = pd.DataFrame({
        "user_id": [1, 2, 2],
        "ts": pd.to_datetime([10, 5, 7], unit="s"),
        "event_id": [0, 1, 2],
        "event_type": ["a", "b", "c"],
    })
    got = transition_counts(
        ray.data.from_pandas(df), key_col="user_id", ts_col="ts",
        type_col="event_type", tiebreak=["event_id"])
    assert got["prev_type"].tolist() == ["b"]
    assert got["event_type"].tolist() == ["c"]
    assert got["n_transitions"].tolist() == [1]
