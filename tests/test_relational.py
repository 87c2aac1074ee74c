import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.relational import (
    broadcast_join,
    grouped_quantile_disc,
    lag_diff_per_group,
    melt,
    relative_error_columns,
    union_all,
)


def _metric_ds():
    return ray.data.from_pandas(pd.DataFrame({
        "num_sets": [1, 2, 1, 2],
        "estimated_cardinality_1": [95.0, 190.0, 105.0, 210.0],
        "true_cardinality_1": [100, 200, 100, 200],
    }))


@pytest.mark.usefixtures("ray_session")
def test_relative_error_columns():
    out = relative_error_columns(_metric_ds()).to_pandas()
    assert np.allclose(out.relative_error_1, [-0.05, -0.05, 0.05, 0.05])


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantile_disc_matches_duckdb():
    import duckdb

    rs = np.random.RandomState(0)
    df = pd.DataFrame({"k": rs.choice(["a", "b", "c"], 3000),
                       "v": rs.randint(0, 50, 3000)})
    got = grouped_quantile_disc(ray.data.from_pandas(df), "k", "v", 0.5)
    ref = duckdb.sql(
        "SELECT k, percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p50_v "
        "FROM df GROUP BY k ORDER BY k").df()
    assert got["p50_v"].tolist() == ref["p50_v"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_melt_and_lag_diff():
    df = pd.DataFrame({"id": [1, 2], "c_1": [10, 20], "c_2": [7, 12]})
    long = melt(ray.data.from_pandas(df), ["id"], ["c_1", "c_2"]).to_pandas()
    assert len(long) == 4
    assert set(long.variable) == {"c_1", "c_2"}

    cum = pd.DataFrame({"g": ["x"] * 3 + ["y"] * 2,
                        "lvl": [1, 2, 3, 1, 2],
                        "kplus": [10, 6, 1, 8, 3]})
    out = lag_diff_per_group(ray.data.from_pandas(cum), "g", "lvl",
                             "kplus").to_pandas().sort_values(["g", "lvl"])
    assert out[out.g == "x"]["diff"].tolist() == [10.0, -4.0, -5.0]


@pytest.mark.usefixtures("ray_session")
def test_broadcast_join_and_union_all():
    big = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b", "a"],
                                             "v": [1, 2, 3]}))
    small = pd.DataFrame({"k": ["a", "b"], "label": ["A", "B"]})
    out = broadcast_join(big, small, on="k").to_pandas()
    assert out.sort_values("v").label.tolist() == ["A", "B", "A"]
    u = union_all([big, big]).to_pandas()
    assert len(u) == 6


def test_range_partition_exact_and_kll(ray_session):
    import numpy as np
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        range_cutpoints,
        range_partition,
    )

    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(100, 20, 4000),
                           np.full(500, 100.0)])  # heavy tie at 100
    df = pd.DataFrame({"v": vals})
    ds = ray.data.from_pandas(df).repartition(6)

    cuts = range_cutpoints(ds, "v", 8)
    # percentile_disc definition: cut i = value at rank ceil(n*(i+1)/8)
    sv = np.sort(vals)
    expect = sv[np.ceil(len(sv) * np.arange(1, 8) / 8).astype(int) - 1]
    assert np.allclose(cuts, expect)

    out = range_partition(ds, "v", 8).to_pandas()
    b = out["bucket"].to_numpy()
    v = out["v"].to_numpy()
    # bucket = #cuts strictly below v; boundaries closed on the right
    assert (b == np.searchsorted(cuts, v, side="left")).all()
    # per-bucket ranges tile the value space in order
    g = out.groupby("bucket")["v"].agg(["min", "max"]).sort_index()
    assert (g["max"].to_numpy()[:-1] <= g["min"].to_numpy()[1:]).all()
    # near-balanced buckets (ties can skew the tied bucket)
    n = len(vals)
    assert out.groupby("bucket").size().max() <= n / 8 + 500 + 8

    # KLL mode: approximate cuts within rank error, monotone
    kcuts = range_cutpoints(ds, "v", 8, mode="kll")
    assert (np.diff(kcuts) >= 0).all()
    # a tied value covers a RANK INTERVAL [lo, hi); error = distance from
    # the target quantile to that interval (0 when the target lies inside)
    lo = np.searchsorted(sv, kcuts, side="left") / n
    hi = np.searchsorted(sv, kcuts, side="right") / n
    target = np.arange(1, 8) / 8
    err = np.maximum(lo - target, 0) + np.maximum(target - hi, 0)
    assert err.max() < 0.05


def test_range_partition_partition_invariance(ray_session):
    import numpy as np
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        range_partition,
    )

    df = pd.DataFrame({"v": np.arange(1000, dtype=np.float64) % 37})
    outs = []
    for blocks in (1, 16):
        ds = ray.data.from_pandas(df).repartition(blocks)
        outs.append(range_partition(ds, "v", 4).to_pandas()
                    .sort_values(["v", "bucket"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_global_rank_matches_argsort(ray_session):
    import numpy as np
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        global_rank,
    )

    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "v": rng.integers(0, 50, 600).astype(np.float64),  # heavy ties
        "id": np.arange(600, dtype=np.int64),
    })
    got = (global_rank(ray.data.from_pandas(df).repartition(7), "v",
                       tiebreak=["id"], num_partitions=8)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    order = np.lexsort((df["id"].to_numpy(), df["v"].to_numpy()))
    assert got["rank"].tolist() == list(range(1, 601))
    assert got["id"].tolist() == df["id"].to_numpy()[order].tolist()
    # partition-count invariance
    got2 = (global_rank(ray.data.from_pandas(df).repartition(3), "v",
                        tiebreak=["id"], num_partitions=3)
            .to_pandas().sort_values("rank").reset_index(drop=True))
    assert got2["id"].tolist() == got["id"].tolist()


def test_write_sorted_partitioned_resumable(ray_session, tmp_path):
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        write_sorted_partitioned,
    )

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"v": rng.normal(0, 1, 2000),
                       "id": np.arange(2000, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(5)
    out = str(tmp_path / "sorted")
    man = write_sorted_partitioned(ds, "v", out, tiebreak=["id"],
                                   num_partitions=6)
    assert not man["skipped"].any() and man["n_rows"].sum() == 2000

    # reading buckets in order yields the global total order
    vals = []
    for b in sorted(os.listdir(out)):
        t = pq.read_table(os.path.join(out, b, "part.parquet"))
        v = t.column("v").to_numpy()
        assert (np.diff(v) >= 0).all()  # sorted within bucket
        vals.append(v)
    allv = np.concatenate(vals)
    assert (np.diff(allv) >= 0).all()  # sorted across buckets
    assert len(allv) == 2000

    # resume: drop one _DONE -> only that bucket is rewritten
    victim = sorted(os.listdir(out))[2]
    os.remove(os.path.join(out, victim, "_DONE"))
    man2 = write_sorted_partitioned(ds, "v", out, tiebreak=["id"],
                                    num_partitions=6)
    assert man2["skipped"].sum() == 5
    assert not man2.loc[man2["bucket"] == 2, "skipped"].iloc[0]


def test_group_zscore_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        group_zscore,
    )

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "id": np.arange(300, dtype=np.int64),
        "g": rng.choice(["a", "b", "const"], 300),
        "v": rng.integers(-50, 200, 300).astype(np.int64),
    })
    df.loc[df["g"] == "const", "v"] = 7  # zero-variance group -> z = 0
    got = (group_zscore(ray.data.from_pandas(df).repartition(5), "g", "v",
                        id_col="id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    for gname, sub in df.groupby("g"):
        v = sub["v"].to_numpy(dtype=np.float64)
        std = v.std()  # population
        exp = np.zeros(len(v)) if std == 0 else (v - v.mean()) / std
        gotz = got[got["g"] == gname].set_index("id").loc[sub["id"]]["z"]
        assert np.allclose(gotz.to_numpy(), np.round(exp, 6), atol=2e-6)


def test_value_histogram_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        value_histogram,
    )

    rng = np.random.default_rng(21)
    v = np.concatenate([rng.normal(50, 30, 2000), [-10.0, 1e6]])  # clamps
    got = value_histogram(ray.data.from_pandas(pd.DataFrame({"v": v}))
                          .repartition(6), "v", lo=0.0, hi=100.0, bins=10)
    b = np.clip(np.floor(v / 10.0), 0, 9).astype(int)
    exp = pd.Series(b).value_counts().sort_index()
    assert got["bin"].tolist() == exp.index.tolist()
    assert got["n_rows"].tolist() == exp.tolist()
    assert got["n_rows"].sum() == len(v)


def test_quantiles_disc_matches_numpy_reference(ray_session):
    """Exact mode == a brute-force percentile_disc on the driver, across
    random value distributions and partition counts; nulls excluded."""
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        quantiles_disc,
    )

    rng = np.random.RandomState(11)
    for trial in range(4):
        vals = rng.randint(0, 50, size=rng.randint(5, 400)).astype(float)
        nulls = rng.rand(len(vals)) < 0.1
        col = [None if m else v for v, m in zip(vals, nulls)]
        ds = ray.data.from_arrow(pa.table({
            "v": pa.array(col, pa.float64())})).repartition(1 + trial * 3)
        qs = np.array([0.1, 0.25, 0.5, 0.9, 1.0])
        got = quantiles_disc(ds, "v", qs)
        clean = np.sort(vals[~nulls])
        want = clean[np.maximum(np.ceil(qs * len(clean)).astype(int) - 1, 0)]
        np.testing.assert_array_equal(got, want)


def test_pivot_sum_inverse_of_melt(ray_session):
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        pivot_sum,
    )

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b", "b", "b"], pa.string()),
        "c": pa.array(["x", "y", "x", "x", "z"], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })).repartition(3)
    out = (pivot_sum(ds, index="k", columns="c", value="v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert list(out.columns) == ["k", "x", "y", "z"]
    assert out.loc[0].tolist() == ["a", 1, 2, 0]   # missing cell -> 0
    assert out.loc[1].tolist() == ["b", 7, 0, 5]

    # explicit column set pins the schema even for values absent in data
    fixed = pivot_sum(ds, index="k", columns="c", value="v",
                      col_values=["x", "q"]).to_pandas()
    assert list(fixed.columns) == ["k", "q", "x"] or \
        list(fixed.columns) == ["k", "x", "q"]
    assert (fixed["q"] == 0).all()


def test_rollup_counts_all_levels(ray_session):
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        rollup_counts,
    )

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(["p", "p", "q"], pa.string()),
        "b": pa.array(["1", "2", "1"], pa.string()),
    })).repartition(2)
    out = rollup_counts(ds, ["a", "b"]).to_pandas()
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    assert got == {
        ("p", "1"): 1, ("p", "2"): 1, ("q", "1"): 1,
        ("p", "ALL"): 2, ("q", "ALL"): 1,
        ("ALL", "ALL"): 3,
    }
    assert out["n"].dtype == "int64"


def test_set_op_intersect_except(ray_session):
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        set_op,
    )

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 4], pa.int64())})).repartition(2)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 4, 4, 5], pa.int64())})).repartition(2)

    inter = set_op(left, right, on=["k"]).to_pandas()
    assert sorted(inter["k"]) == [2, 4]            # distinct semantics
    exc = set_op(left, right, on=["k"], op="except").to_pandas()
    assert sorted(exc["k"]) == [1, 3]
    # right-only keys never leak into either result
    assert 5 not in set(inter["k"]) | set(exc["k"])

    # empty result keeps executing without error (schema loss at the
    # to_pandas edge is the CALLER's concern, as in the oracle queries)
    sub = set_op(right, right, on=["k"], op="except").to_pandas()
    assert len(sub) == 0

    with pytest.raises(ValueError):
        set_op(left, right, on=["k"], op="union")


def test_quantiles_cont_matches_numpy(ray_session):
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        quantiles_cont,
    )

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 30, size=157).astype(float)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(5)
    qs = np.array([0.0, 0.25, 0.5, 0.9, 1.0])
    got = quantiles_cont(ds, "v", qs)
    # numpy's default 'linear' interpolation IS percentile_cont
    want = np.quantile(vals, qs)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_grouped_lead_lag_matches_pandas(ray_session):
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_lead_lag,
    )

    tbl = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "t": pa.array([3, 1, 2, 5, 4], pa.int64()),
        "v": pa.array([30.0, 10.0, 20.0, 50.0, 40.0]),
    })
    out = (grouped_lead_lag(ray.data.from_arrow(tbl).repartition(3),
                            key="k", order_col="t", value_col="v")
           .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
    assert out["lag_v"].tolist()[0:3] == pytest.approx(
        [np.nan, 10.0, 20.0], nan_ok=True)
    assert np.isnan(out["lag_v"].iloc[3]) and out["lag_v"].iloc[4] == 40.0

    # negative offset = LEAD
    lead = (grouped_lead_lag(ray.data.from_arrow(tbl), key="k",
                             order_col="t", value_col="v", offset=-1)
            .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
    assert lead["lag_v"].iloc[0] == 20.0 and np.isnan(lead["lag_v"].iloc[2])


def test_grouped_corr_matches_numpy(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_corr,
    )

    rng = np.random.RandomState(7)
    n = 5000
    key = rng.choice(["a", "b", "c"], size=n)
    x = rng.randint(1, 51, size=n).astype(np.float64)
    y = 3.0 * x + rng.randint(0, 1000, size=n)  # correlated, integer-valued
    df = pd.DataFrame({"k": key, "x": x, "y": y})
    ds = ray.data.from_pandas(df, override_num_blocks=9)
    out = grouped_corr(ds, "k", "x", "y", quantize=1.0)
    assert list(out["k"]) == ["a", "b", "c"]
    for _, row in out.iterrows():
        g = df[df["k"] == row["k"]]
        ref_corr = np.corrcoef(g["x"], g["y"])[0, 1]
        ref_cov = np.cov(g["x"], g["y"], bias=True)[0, 1]
        assert abs(row["corr"] - ref_corr) < 1e-5
        assert abs(row["covar_pop"] - ref_cov) < 1e-5
        assert row["n"] == len(g)


def test_grouped_corr_partition_invariance(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_corr,
    )

    rng = np.random.RandomState(11)
    df = pd.DataFrame({"k": rng.choice(["p", "q"], size=1000),
                       "x": rng.randint(0, 100, size=1000).astype("float64"),
                       "y": rng.randint(0, 100, size=1000).astype("float64")})
    outs = [grouped_corr(ray.data.from_pandas(df, override_num_blocks=nb),
                         "k", "x", "y")
            for nb in (1, 17)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_corr_zero_variance_is_nan(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_corr,
    )

    df = pd.DataFrame({"k": ["z"] * 10, "x": [5.0] * 10,
                       "y": np.arange(10, dtype="float64")})
    out = grouped_corr(ray.data.from_pandas(df), "k", "x", "y")
    assert np.isnan(out["corr"].iloc[0])
    assert out["covar_pop"].iloc[0] == 0.0


def _sql_ntile_reference(total: int, buckets: int) -> np.ndarray:
    q, r = divmod(total, buckets)
    tiles = []
    for t in range(1, buckets + 1):
        tiles += [t] * (q + (1 if t <= r else 0))
    return np.array(tiles, dtype=np.int64)


def test_ntile_matches_sql_contract(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        ntile,
    )

    rng = np.random.RandomState(3)
    for total, buckets in [(997, 10), (50, 7), (6, 10), (1, 4)]:
        df = pd.DataFrame({"v": rng.randint(0, 200, size=total).astype("float64"),
                           "id": np.arange(total, dtype="int64")})
        ds = ray.data.from_pandas(df, override_num_blocks=min(total, 5))
        out = (ntile(ds, "v", buckets=buckets, tiebreak=["id"],
                     num_partitions=4).to_pandas()
               .sort_values(["v", "id"]).reset_index(drop=True))
        ref = _sql_ntile_reference(total, buckets)
        assert np.array_equal(out["tile"].to_numpy(), ref), (total, buckets)


def test_ntile_partition_invariance(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        ntile,
    )

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"v": rng.randint(0, 30, size=500).astype("float64"),
                       "id": np.arange(500, dtype="int64")})
    outs = []
    for nb, nparts in [(1, 2), (13, 8)]:
        ds = ray.data.from_pandas(df, override_num_blocks=nb)
        outs.append(ntile(ds, "v", buckets=9, tiebreak=["id"],
                          num_partitions=nparts).to_pandas()
                    .sort_values(["v", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_cube_counts_all_subsets(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        cube_counts,
    )

    df = pd.DataFrame({"a": ["x", "x", "y", "y", "y"],
                       "b": ["1", "2", "1", "1", "2"]})
    out = (cube_counts(ray.data.from_pandas(df, override_num_blocks=2),
                       ["a", "b"]).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    ref = (df.groupby(["a", "b"]).size().reset_index(name="n"))
    # finest
    for _, r in ref.iterrows():
        got = out[(out["a"] == r["a"]) & (out["b"] == r["b"])]
        assert got["n"].iloc[0] == r["n"]
    # marginals
    assert out[(out["a"] == "x") & (out["b"] == "ALL")]["n"].iloc[0] == 2
    assert out[(out["a"] == "ALL") & (out["b"] == "1")]["n"].iloc[0] == 3
    assert out[(out["a"] == "ALL") & (out["b"] == "2")]["n"].iloc[0] == 2
    assert out[(out["a"] == "ALL") & (out["b"] == "ALL")]["n"].iloc[0] == 5
    # 2^2 subsets: finest(4) + a-marginal(2) + b-marginal(2) + total(1)
    assert len(out) == 4 + 2 + 2 + 1


def test_grouped_moments_matches_scipy(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_moments,
    )

    rng = np.random.RandomState(13)
    n = 4000
    df = pd.DataFrame({"k": rng.choice(["a", "b"], size=n),
                       "x": rng.gamma(2.0, 10.0, size=n).round()})
    out = grouped_moments(ray.data.from_pandas(df, override_num_blocks=9),
                          "k", "x", quantize=1.0)
    for _, row in out.iterrows():
        x = df[df["k"] == row["k"]]["x"].to_numpy()
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        assert abs(row["skew_pop"] - m3 / m2 ** 1.5) < 1e-4
        assert abs(row["kurt_excess"] - (m4 / m2 ** 2 - 3.0)) < 1e-4
        assert row["n"] == len(x)


def test_grouped_moments_partition_invariance(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_moments,
    )

    rng = np.random.RandomState(17)
    df = pd.DataFrame({"k": rng.choice(["p", "q", "r"], size=1500),
                       "x": rng.randint(0, 200, size=1500).astype("float64")})
    outs = [grouped_moments(ray.data.from_pandas(df, override_num_blocks=nb),
                            "k", "x") for nb in (1, 23)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_group_concat_sorted_join(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        group_concat,
    )

    df = pd.DataFrame({"g": ["r1", "r2", "r1", "r1", "r2"],
                       "name": ["zulu", "alpha", "echo", "alpha", "mike"]})
    out = (group_concat(ray.data.from_pandas(df, override_num_blocks=3),
                        "g", "name", sep="|", out_col="names")
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert out["names"].tolist() == ["alpha|echo|zulu", "alpha|mike"]


def test_grouped_ols_matches_numpy(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_ols,
    )

    rng = np.random.RandomState(23)
    n = 3000
    df = pd.DataFrame({"k": rng.choice(["a", "b"], size=n),
                       "x": rng.randint(1, 60, size=n).astype("float64")})
    df["y"] = 2.5 * df["x"] + rng.randint(0, 40, size=n)
    df["y"] = df["y"].round()
    out = grouped_ols(ray.data.from_pandas(df, override_num_blocks=7),
                      "k", "x", "y", quantize=1.0)
    for _, row in out.iterrows():
        g = df[df["k"] == row["k"]]
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-3
        assert row["n"] == len(g)


def test_grouped_count_distinct_exact(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_count_distinct,
    )

    rng = np.random.RandomState(41)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 4000),
                       "v": rng.randint(0, 300, 4000)})
    out = grouped_count_distinct(
        ray.data.from_pandas(df, override_num_blocks=9), "k", "v")
    ref = df.groupby("k")["v"].nunique()
    for _, row in out.iterrows():
        assert row["n_distinct"] == ref[row["k"]]


def test_latest_per_key_matches_window(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        latest_per_key,
    )

    rng = np.random.RandomState(53)
    df = pd.DataFrame({"k": rng.randint(0, 50, 2000),
                       "v": rng.randint(0, 40, 2000),
                       "uid": np.arange(2000, dtype=np.int64)})
    out = (latest_per_key(ray.data.from_pandas(df, override_num_blocks=9),
                          key="k", order_col="v", tiebreak=["uid"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    ref = (df.sort_values(["v", "uid"], ascending=False)
           .drop_duplicates("k").sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "v", "uid"]],
                                  ref[["k", "v", "uid"]])


def test_grouped_count_distinct_excludes_null(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_count_distinct,
    )

    df = pd.DataFrame({"k": ["a", "a", "a", "b"],
                       "v": [1.0, 2.0, np.nan, np.nan]})
    out = grouped_count_distinct(ray.data.from_pandas(df), "k", "v")
    got = dict(zip(out["k"], out["n_distinct"]))
    assert got.get("a") == 2 and got.get("b", 0) == 0


def test_grouped_value_histogram_matches_numpy(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_value_histogram,
    )

    rng = np.random.RandomState(59)
    df = pd.DataFrame({"k": rng.choice(["x", "y"], 3000),
                       "v": rng.uniform(-50, 550, 3000)})
    out = grouped_value_histogram(
        ray.data.from_pandas(df, override_num_blocks=7), "k", "v",
        lo=0.0, hi=500.0, bins=10)
    for g in ("x", "y"):
        v = df[df["k"] == g]["v"].to_numpy()
        b = np.clip(np.floor(v / 50.0), 0, 9).astype(int)
        ref = np.bincount(b, minlength=10)
        got = out[out["k"] == g].set_index("bin")["n_rows"]
        for i in range(10):
            assert got.get(i, 0) == ref[i]


def test_profile_numeric_columns(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        profile_numeric_columns,
    )

    df = pd.DataFrame({"a": [1.0, np.nan, 3.5, -2.0],
                       "b": [np.nan, np.nan, np.nan, np.nan]})
    out = profile_numeric_columns(
        ray.data.from_pandas(df, override_num_blocks=2), ["a", "b"])
    a = out[out["column"] == "a"].iloc[0]
    assert a["n_rows"] == 4 and a["n_null"] == 1
    assert a["min_val"] == -2.0 and a["max_val"] == 3.5
    b = out[out["column"] == "b"].iloc[0]
    assert b["n_null"] == 4 and np.isnan(b["min_val"])


def test_contingency_expected_matches_scipy(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        contingency_expected,
    )

    rng = np.random.RandomState(61)
    df = pd.DataFrame({"a": rng.choice(["p", "q", "r"], 2000),
                       "b": rng.choice(["x", "y"], 2000)})
    # plant a structurally-missing cell: (r, y) never co-occurs
    df = df[~((df["a"] == "r") & (df["b"] == "y"))].reset_index(drop=True)
    out = contingency_expected(ray.data.from_pandas(df,
                                                    override_num_blocks=5),
                               "a", "b")
    assert len(out) == 6  # completed grid includes the zero-observed cell
    piv = df.groupby(["a", "b"]).size().unstack(fill_value=0)
    exp = np.outer(piv.sum(axis=1), piv.sum(axis=0)) / piv.to_numpy().sum()
    chi2_ref = ((piv.to_numpy() - exp) ** 2 / exp).sum()
    assert abs(out["chi2_micro"].sum() - chi2_ref) < 1e-3
    for _, row in out.iterrows():
        i = list(piv.index).index(row["a"])
        j = list(piv.columns).index(row["b"])
        assert row["n_obs"] == piv.to_numpy()[i, j]
        assert abs(row["e_micro"] - exp[i, j]) < 1e-5


def test_unnest_list_matches_explode(ray_session):
    import pyarrow as pa

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        unnest_list,
    )

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "xs": pa.array([[10, 11], [], None, [12]],
                       pa.list_(pa.int64())),
    })
    out = (unnest_list(ray.data.from_arrow(tbl), list_col="xs",
                       id_col="id")
           .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True))
    assert out["id"].tolist() == [1, 1, 4]
    assert out["pos"].tolist() == [0, 1, 0]
    assert out["value"].tolist() == [10, 11, 12]


def test_top_k_rows_per_group_matches_window(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        top_k_rows_per_group,
    )

    rng = np.random.RandomState(67)
    df = pd.DataFrame({"k": rng.randint(0, 30, 1500),
                       "v": rng.randint(0, 25, 1500),
                       "uid": np.arange(1500, dtype=np.int64)})
    out = (top_k_rows_per_group(
        ray.data.from_pandas(df, override_num_blocks=8),
        key="k", order_col="v", k=3, tiebreak=["uid"])
        .to_pandas().sort_values(["k", "v", "uid"],
                                 ascending=[True, False, False])
        .reset_index(drop=True))
    ref = (df.sort_values(["v", "uid"], ascending=False, kind="stable")
           .groupby("k", sort=False).head(3)
           .sort_values(["k", "v", "uid"], ascending=[True, False, False])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "v", "uid"]],
                                  ref[["k", "v", "uid"]])


def test_corr_matrix_matches_numpy(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        corr_matrix,
    )

    rng = np.random.RandomState(71)
    n = 3000
    a = rng.randint(0, 100, n).astype("float64")
    df = pd.DataFrame({"a": a,
                       "b": 2.0 * a + rng.randint(0, 50, n),
                       "c": rng.randint(0, 100, n).astype("float64")})
    out = corr_matrix(ray.data.from_pandas(df, override_num_blocks=7),
                      ["a", "b", "c"])
    ref = np.corrcoef(df[["a", "b", "c"]].to_numpy().T)
    got = {(r["col_a"], r["col_b"]): r["corr"] for _, r in out.iterrows()}
    assert abs(got[("a", "b")] - ref[0, 1]) < 1e-5
    assert abs(got[("a", "c")] - ref[0, 2]) < 1e-5
    assert abs(got[("b", "c")] - ref[1, 2]) < 1e-5


def test_unnest_list_all_null_batch(ray_session):
    import pyarrow as pa

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        unnest_list,
    )

    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "xs": pa.array([None, None], pa.list_(pa.int64()))})
    out = unnest_list(ray.data.from_arrow(tbl), list_col="xs", id_col="id")
    assert out.count() == 0


def test_top_k_rows_per_group_null_key_partition(ray_session):
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        top_k_rows_per_group,
    )

    df = pd.DataFrame({"k": ["a", None, "a", None],
                       "v": [1, 2, 3, 4],
                       "uid": np.arange(4, dtype=np.int64)})
    out = (top_k_rows_per_group(ray.data.from_pandas(df), key="k",
                                order_col="v", k=1, tiebreak=["uid"])
           .to_pandas())
    # null key is its own partition (SQL PARTITION BY semantics)
    assert len(out) == 2
    assert sorted(out["v"].tolist()) == [3, 4]


def test_group_zscore_max_keys_guard(ray_session):
    import numpy as np
    import pandas as pd
    import pytest

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        group_zscore,
    )

    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                       "g": [f"k{i}" for i in range(100)],  # 100 distinct
                       "v": np.arange(100, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(ValueError, match="bounded-key"):
        group_zscore(ds, "g", "v", id_col="id", max_keys=10).to_pandas()
    # at the boundary it still works
    out = group_zscore(ds, "g", "v", id_col="id", max_keys=100).to_pandas()
    assert len(out) == 100


def test_grouped_value_histogram_guards_and_nonfinite(ray_session):
    import numpy as np
    import pandas as pd
    import pytest

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_value_histogram,
    )

    df = pd.DataFrame({"g": ["a"] * 6,
                       "v": [1.0, 5.0, np.nan, np.inf, -np.inf, 9.0]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="hi > lo"):
        grouped_value_histogram(ds, "g", "v", lo=5.0, hi=5.0, bins=4)
    with pytest.raises(ValueError, match="bins"):
        grouped_value_histogram(ds, "g", "v", lo=0.0, hi=10.0, bins=0)
    out = grouped_value_histogram(ds, "g", "v", lo=0.0, hi=10.0, bins=2)
    # NaN/inf rows excluded: 1.0, 5.0 -> bin 0/1, 9.0 -> bin 1
    assert out["n_rows"].sum() == 3
    assert out.set_index("bin")["n_rows"].to_dict() == {0: 1, 1: 2}


def _wq_tbl(n=600, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=n),
        "v": rng.integers(1, 80, size=n).astype(np.int64),
        "w": rng.integers(1, 9, size=n).astype(np.int64),
    })


def _wq_brute(df, q):
    out = {}
    for k, g in df.groupby("k"):
        g = g.sort_values(["v"])
        # expand by weight: percentile_disc over the weighted multiset
        expanded = np.repeat(g["v"].to_numpy(), g["w"].to_numpy())
        rank = int(np.ceil(q * len(expanded)))
        out[k] = int(np.sort(expanded)[rank - 1])
    return out


@pytest.mark.usefixtures("ray_session")
def test_grouped_weighted_quantile_matches_expanded_multiset():
    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_weighted_quantile_disc,
    )

    df = _wq_tbl()
    for q in (0.25, 0.5, 0.9):
        got = grouped_weighted_quantile_disc(
            ray.data.from_pandas(df).repartition(7), "k", "v", "w", q)
        exp = _wq_brute(df, q)
        col = f"wp{int(q * 100)}_v"
        assert {r["k"]: int(r[col]) for _, r in got.iterrows()} == exp


@pytest.mark.usefixtures("ray_session")
def test_grouped_weighted_quantile_weight_one_equals_unweighted():
    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_weighted_quantile_disc,
    )

    df = _wq_tbl()
    df["one"] = np.int64(1)
    a = grouped_weighted_quantile_disc(
        ray.data.from_pandas(df), "k", "v", "one", 0.5)
    b = grouped_quantile_disc(ray.data.from_pandas(df), "k", "v", 0.5)
    assert a["wp50_v"].tolist() == b["p50_v"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_grouped_weighted_quantile_value_as_weight():
    """weight_col == value_col (the mass-weighted median) is legal."""
    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_weighted_quantile_disc,
    )

    df = _wq_tbl()
    got = grouped_weighted_quantile_disc(
        ray.data.from_pandas(df), "k", "v", "v", 0.5)
    df2 = df.assign(w=df["v"])
    assert {r["k"]: int(r["wp50_v"]) for _, r in got.iterrows()} == \
        _wq_brute(df2, 0.5)


@pytest.mark.usefixtures("ray_session")
def test_grouped_median_mad_matches_bruteforce():
    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        grouped_median_mad,
    )

    df = _wq_tbl(seed=13)
    got = grouped_median_mad(ray.data.from_pandas(df).repartition(5),
                             "k", "v")
    for _, row in got.iterrows():
        vals = np.sort(df[df["k"] == row["k"]]["v"].to_numpy())
        med = vals[int(np.ceil(0.5 * len(vals))) - 1]  # percentile_disc
        dev = np.sort(np.abs(vals - med))
        mad = dev[int(np.ceil(0.5 * len(dev))) - 1]
        assert int(row["med_v"]) == int(med)
        assert int(row["mad_v"]) == int(mad)
