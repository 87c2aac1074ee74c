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
