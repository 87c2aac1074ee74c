import numpy as np
import pandas as pd
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.joins import (
    hash_join,
)


def _tables():
    left = pd.DataFrame({
        "k": [1, 1, 2, 3, 4],
        "lv": ["a", "b", "c", "d", "e"],
    })
    right = pd.DataFrame({
        "rk": [1, 2, 2, 5],
        "rv": [10, 20, 21, 50],
    })
    return left, right


def _expect(how):
    left, right = _tables()
    exp = left.merge(right, left_on="k", right_on="rk", how=how)
    exp = exp.drop(columns=["rk"])
    return (exp.sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_pandas(how):
    left, right = _tables()
    got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="k", right_key="rk", how=how).to_pandas()
    got = (got.sort_values(["k", "lv", "rv"], na_position="last")
           .reset_index(drop=True))
    exp = _expect(how)
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lv"].tolist() == exp["lv"].tolist()
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_salted_identical(how):
    """The salted (skew-guard) plan is output-identical to the plain plan,
    including a dominant hot key spanning many input blocks."""
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": np.concatenate([np.zeros(500, np.int64),
                             rng.integers(1, 50, 200)]),
        "lv": np.arange(700, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.concatenate([np.zeros(5, np.int64),
                             rng.integers(1, 60, 40)]),
        "rv": np.arange(45, dtype=np.int64),
    })
    lds = ray.data.from_pandas(left).repartition(8)
    rds = ray.data.from_pandas(right).repartition(4)
    plain = hash_join(lds, rds, on="k", how=how).to_pandas()
    salted = hash_join(lds, rds, on="k", how=how, num_salts=5).to_pandas()
    key = ["k", "lv", "rv"]
    plain = plain.fillna(-1).sort_values(key).reset_index(drop=True)
    salted = salted.fillna(-1).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_hash_join_suffix_collision():
    left = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    right = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="k").to_pandas().sort_values("k").reset_index(drop=True)
    assert sorted(got.columns) == ["k", "v", "v_right"]
    assert got["v_right"].tolist() == [10, 20]


@pytest.mark.usefixtures("ray_session")
def test_hash_join_partition_invariance():
    left, right = _tables()
    outs = []
    for blocks in (1, 7):
        got = hash_join(ray.data.from_pandas(left).repartition(blocks),
                        ray.data.from_pandas(right).repartition(blocks),
                        on="k", right_key="rk").to_pandas()
        outs.append(got.sort_values(["k", "lv", "rv"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("num_salts", [None, 3])
def test_hash_join_semi_anti(num_salts):
    left, right = _tables()
    semi = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     on="k", right_key="rk", how="semi",
                     num_salts=num_salts).to_pandas()
    anti = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     on="k", right_key="rk", how="anti",
                     num_salts=num_salts).to_pandas()
    matched = left["k"].isin(right["rk"])
    assert sorted(semi["lv"]) == sorted(left.loc[matched, "lv"])
    assert sorted(anti["lv"]) == sorted(left.loc[~matched, "lv"])
    assert list(semi.columns) == list(left.columns)  # left cols only
    # every left row lands in exactly one of the two outputs
    assert len(semi) + len(anti) == len(left)
