"""Property-based tests for the cogroup operator family: under arbitrary
key/value/timestamp data, hash_join matches pandas merge (all four join
kinds, salted and plain) and windowed_agg matches a brute-force window scan
(plain and two-level).  Few examples, each a real Ray pipeline — these are
the randomized counterparts of the fixed-fixture tests."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.joins import (
    hash_join,
)
from cardinality_estimation_evaluation_framework_ray.stages.windows import (
    windowed_agg,
)

_keys = st.lists(st.integers(min_value=0, max_value=6), min_size=0,
                 max_size=25)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=6, deadline=None)
@given(lk=_keys, rk=_keys, how=st.sampled_from(["inner", "left", "semi",
                                                "anti"]),
       salts=st.sampled_from([None, 3]))
def test_hash_join_matches_pandas_property(lk, rk, how, salts):
    left = pd.DataFrame({"k": np.array(lk, np.int64),
                         "lv": np.arange(len(lk), dtype=np.int64)})
    right = pd.DataFrame({"k": np.array(rk, np.int64),
                          "rv": np.arange(len(rk), dtype=np.int64) + 100})
    if len(left) == 0:
        return  # empty Dataset has no schema to join on
    rds = (ray.data.from_pandas(right) if len(right)
           else ray.data.from_pandas(pd.DataFrame(
               {"k": pd.Series(dtype="int64"),
                "rv": pd.Series(dtype="int64")})))
    got = hash_join(ray.data.from_pandas(left).repartition(3), rds,
                    on="k", how=how, num_salts=salts).to_pandas()
    if got.empty:
        # Ray 2.49 quirk: an all-empty result loses its schema in
        # to_pandas (documented in stages/joins.py) — reindex to the
        # expected columns so the comparisons below see typed emptiness
        cols = (["k", "lv"] if how in ("semi", "anti")
                else ["k", "lv", "rv"])
        got = got.reindex(columns=cols)
    matched = left["k"].isin(right["k"])
    if how == "semi":
        exp = left.loc[matched]
        assert sorted(got["lv"]) == sorted(exp["lv"])
    elif how == "anti":
        exp = left.loc[~matched]
        assert sorted(got["lv"]) == sorted(exp["lv"])
    else:
        exp = left.merge(right, on="k", how=how)
        key = ["k", "lv", "rv"]
        got = got.fillna(-1).sort_values(key).reset_index(drop=True)
        exp = exp.fillna(-1).sort_values(key).reset_index(drop=True)
        assert got["lv"].tolist() == exp["lv"].tolist()
        assert got["rv"].tolist() == exp["rv"].tolist()


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=6, deadline=None)
@given(data=st.lists(st.tuples(st.integers(0, 3),           # key
                               st.integers(0, 200),         # ts
                               st.integers(-5, 5)),         # value
                     min_size=1, max_size=40),
       window=st.integers(1, 60),
       bucketed=st.booleans())
def test_windowed_agg_matches_bruteforce_property(data, window, bucketed):
    df = pd.DataFrame(data, columns=["u", "t", "v"])
    df["eid"] = np.arange(len(df), dtype=np.int64)
    ds = ray.data.from_pandas(df).repartition(3)
    got = windowed_agg(ds, key_col="u", ts_col="t", id_col="eid",
                       value_col="v", window=window,
                       bucket_span=(window if bucketed else None)
                       ).to_pandas().sort_values("eid").reset_index(drop=True)
    for _, r in df.iterrows():
        m = (df["u"] == r["u"]) & (df["t"] >= r["t"] - window) \
            & (df["t"] <= r["t"])
        row = got[got["eid"] == r["eid"]].iloc[0]
        assert row["n_window"] == int(m.sum())
        assert row["sum_window"] == int(df.loc[m, "v"].sum())
