import numpy as np
import pandas as pd
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.joins import (
    asof_join,
    range_join,
    top_k_by_count,
)


def _tables():
    left = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "k": ["a", "a", "b", "b", "c"],   # c has no right rows
        "t": [10.0, 25.0, 5.0, 30.0, 7.0],
    })
    right = pd.DataFrame({
        "k": ["a", "a", "b"],
        "t": [8.0, 20.0, 29.0],
        "v": [100, 200, 300],
    })
    return left, right


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_pandas():
    left, right = _tables()
    got = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="t", by="k").to_pandas().sort_values("id").reset_index(drop=True)
    expect = pd.merge_asof(left.sort_values("t"),
                           right.sort_values("t").rename(
                               columns={"t": "t_right", "v": "v"}),
                           left_on="t", right_on="t_right", by="k",
                           direction="backward").sort_values("id").reset_index(drop=True)
    assert got.id.tolist() == expect.id.tolist()
    assert got.v.fillna(-1).tolist() == expect.v.fillna(-1).tolist()
    # id=1 (t=10) -> right t=8 v=100 ; id=2 (t=25) -> v=200 ;
    # id=3 (t=5, b) -> no match ; id=4 (t=30, b) -> v=300 ; id=5 (c) -> none
    lookup = dict(zip(got.id, got.v.fillna(-1)))
    assert lookup == {1: 100, 2: 200, 3: -1, 4: 300, 5: -1}


@pytest.mark.usefixtures("ray_session")
def test_asof_join_forward():
    left, right = _tables()
    got = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="t", by="k", direction="forward").to_pandas()
    lookup = dict(zip(got.id, got.v.fillna(-1)))
    # forward: first right row with t >= left.t
    assert lookup == {1: 200, 2: -1, 3: 300, 4: -1, 5: -1}


@pytest.mark.usefixtures("ray_session")
def test_top_k_by_count_tie_break():
    df = pd.DataFrame({"w": ["x"] * 3 + ["y"] * 3 + ["z"] * 2})
    out = top_k_by_count(ray.data.from_pandas(df), ["w"], 2)
    assert out.w.tolist() == ["x", "y"]  # equal counts -> lexicographic
    assert out.n.tolist() == [3, 3]


@pytest.mark.usefixtures("ray_session")
def test_range_join_band_semantics():
    """Interval join: right rows of the same key within [on+lower, on+upper]."""
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.stages.joins import (
        range_join,
    )

    left = pd.DataFrame({"k": ["a", "a", "b"], "t": [10, 20, 10],
                         "lid": [1, 2, 3]})
    right = pd.DataFrame({"k": ["a", "a", "a", "b", "c"],
                          "t": [5, 9, 18, 30, 10], "rid": [100, 101, 102, 103, 104]})
    out = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     on="t", by="k", lower=-5, upper=0,
                     right_cols=["rid"]).to_pandas()
    got = {(r.lid, r.rid) for r in out.itertuples()}
    # lid 1 (t=10): right a-rows with t in [5,10] -> 100, 101
    # lid 2 (t=20): t in [15,20] -> 102
    # lid 3 (b, t=10): b-rows t in [5,10] -> none (t=30)
    assert got == {(1, 100), (1, 101), (2, 102)}
    # suffixed right columns present
    assert "t_right" in out.columns


def _hot_key_frames(seed=7):
    """One dominant key ('hot', 5000 rows) + a few small keys."""
    rs = np.random.RandomState(seed)
    n_hot = 5000
    left = pd.DataFrame({
        "k": ["hot"] * n_hot + ["a"] * 50 + ["b"] * 30,
        "t": np.concatenate([rs.randint(0, 100_000, n_hot),
                             rs.randint(0, 1_000, 80)]),
        "lid": np.arange(n_hot + 80),
    })
    # right `t` values are UNIQUE per key: asof tie-break among equal right
    # timestamps is positional (arrival-order) in pandas merge_asof, hence
    # unspecified for any distributed grouping — not part of the contract
    right = pd.DataFrame({
        "k": ["hot"] * 2000 + ["a"] * 40 + ["c"] * 10,
        "t": np.concatenate([rs.permutation(100_000)[:2000],
                             rs.permutation(1_000)[:40],
                             rs.permutation(1_000)[:10]]),
        "v": np.arange(2050) * 10,
    })
    return left, right


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_two_level_matches_single_level(direction):
    left, right = _hot_key_frames()
    kw = dict(on="t", by="k", direction=direction, right_cols=["v"])
    base = asof_join(ray.data.from_pandas(left).repartition(16),
                     ray.data.from_pandas(right).repartition(16),
                     **kw).to_pandas()
    two = asof_join(ray.data.from_pandas(left).repartition(16),
                    ray.data.from_pandas(right).repartition(16),
                    bucket_span=1000, **kw).to_pandas()
    base = base.sort_values("lid").reset_index(drop=True)
    two = two.sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, two[base.columns])


@pytest.mark.usefixtures("ray_session")
def test_range_join_two_level_matches_single_level():
    left, right = _hot_key_frames()
    kw = dict(on="t", by="k", lower=-500, upper=250, right_cols=["v"])
    base = range_join(ray.data.from_pandas(left).repartition(16),
                      ray.data.from_pandas(right).repartition(16),
                      **kw).to_pandas()
    two = range_join(ray.data.from_pandas(left).repartition(16),
                     ray.data.from_pandas(right).repartition(16),
                     bucket_span=1000, **kw).to_pandas()
    key = ["lid", "v"]
    base = base.sort_values(key).reset_index(drop=True)
    two = two.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, two[base.columns])
    assert len(base) > 0


@pytest.mark.usefixtures("ray_session")
def test_range_join_two_level_span_guard():
    left, right = _hot_key_frames()
    with pytest.raises(ValueError):
        range_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                   on="t", by="k", lower=-500, upper=250, bucket_span=100)
