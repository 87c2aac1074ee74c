"""Deterministic sampling stages: per-key top-n sample and hash split."""

import numpy as np
import pyarrow as pa

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
    hash_split,
    knuth_priority,
    per_key_sample,
)


def _tbl(n=200, keys=("a", "b", "c")):
    rng = np.random.default_rng(5)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(rng.choice(keys, size=n).tolist()),
        "payload": pa.array((np.arange(n) * 7 % 13).astype(np.int64)),
    })


def _expected_sample(tbl, n_per_key):
    ids = tbl.column("doc_id").to_numpy()
    src = np.array(tbl.column("source").to_pylist())
    prio = knuth_priority(ids)
    keep = []
    for k in np.unique(src):
        m = np.flatnonzero(src == k)
        order = m[np.lexsort((ids[m], prio[m]))]
        keep.extend(order[:n_per_key].tolist())
    return sorted(ids[sorted(keep)].tolist())


def test_per_key_sample_matches_bruteforce(ray_session):
    t = _tbl()
    out = per_key_sample(ray.data.from_arrow(t), key="source", n_per_key=10)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    assert got == _expected_sample(t, 10)


def test_per_key_sample_partition_invariance(ray_session):
    t = _tbl(n=500)
    a = per_key_sample(ray.data.from_arrow(t).repartition(1),
                       key="source", n_per_key=7).to_pandas()
    b = per_key_sample(ray.data.from_arrow(t).repartition(32),
                       key="source", n_per_key=7).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_per_key_sample_small_groups_kept_whole(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": pa.array(["x", "x", "y"])})
    out = per_key_sample(ray.data.from_arrow(t), key="source",
                         n_per_key=10).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]


def test_per_key_sample_keeps_requested_cols(ray_session):
    t = _tbl()
    out = per_key_sample(ray.data.from_arrow(t), key="source", n_per_key=5,
                         cols=["doc_id", "source", "payload"]).to_pandas()
    assert set(out.columns) == {"doc_id", "source", "payload"}
    assert (out.groupby("source").size() <= 5).all()


def test_hash_split_deterministic_and_disjoint(ray_session):
    t = _tbl(n=1000)
    a = hash_split(ray.data.from_arrow(t), test_permille=100).to_pandas()
    b = hash_split(ray.data.from_arrow(t).repartition(16),
                   test_permille=100).to_pandas()
    am = dict(zip(a["doc_id"], a["split"]))
    bm = dict(zip(b["doc_id"], b["split"]))
    assert am == bm
    frac = (a["split"] == "test").mean()
    assert 0.05 < frac < 0.15  # ~10% with hash variance


def _mix_tbl(n=500, hot_frac=0.6):
    rng = np.random.default_rng(9)
    keys = np.where(np.arange(n) < int(n * hot_frac), "hot",
                    rng.choice(["a", "b", "c"], size=n))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(keys.tolist()),
        "n_chars": pa.array(rng.integers(10, 200, n).astype(np.int64)),
    })


def _mix_brute(tbl, budgets):
    import pandas as pd

    df = tbl.to_pandas()
    out = []
    for k, g in df.groupby("source"):
        budget = budgets.get(k, 0)
        prio = knuth_priority(g["doc_id"].to_numpy())
        g = g.iloc[np.lexsort((g["doc_id"].to_numpy(), prio))]
        cum_before = np.concatenate([[0], np.cumsum(g["n_chars"].to_numpy())[:-1]])
        out.append(g[cum_before < budget])
    return (pd.concat(out).sort_values("doc_id").reset_index(drop=True)
            if out else df.iloc[:0])


def test_mixture_sample_matches_bruteforce(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        mixture_sample,
    )

    tbl = _mix_tbl()
    budgets = {"hot": 5000, "a": 900, "b": 0, "c": 10_000_000}
    got = (mixture_sample(ray.data.from_arrow(tbl).repartition(7),
                          budgets=budgets)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _mix_brute(tbl, budgets)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    # per-key totals: every key fills to (just past) its budget or runs out
    tot = got.groupby("source")["n_chars"].sum().to_dict()
    assert "b" not in tot
    assert tot["c"] == tbl.to_pandas().query("source=='c'")["n_chars"].sum()
    assert tot["hot"] >= 5000  # reached (last row may overshoot)


def test_mixture_sample_bucketed_identical(ray_session):
    """The two-level (priority range-partitioned) plan is output-identical,
    across budgets hitting the none/cut/full bucket verdicts."""
    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        mixture_sample,
    )

    tbl = _mix_tbl()
    for budgets in ({"hot": 5000, "a": 900, "b": 0, "c": 10_000_000},
                    {"hot": 1, "a": 50, "c": 123}):
        ds = ray.data.from_arrow(tbl).repartition(7)
        plain = (mixture_sample(ds, budgets=budgets)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        two = (mixture_sample(ds, budgets=budgets, n_buckets=8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert plain["doc_id"].tolist() == two["doc_id"].tolist()


def test_global_sample_exact_n_and_partition_invariance(ray_session):
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        global_sample,
        knuth_priority,
    )

    ids = np.arange(200, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "source": pa.array([f"s{i % 4}" for i in ids])})
    want = set(ids[np.lexsort((ids, knuth_priority(ids)))[:17]].tolist())

    for blocks in (1, 7):
        out = global_sample(ray.data.from_arrow(tbl).repartition(blocks),
                            n=17).to_pandas()
        assert set(out["doc_id"]) == want and list(out.columns) == ["doc_id"]

    # n >= rows: whole table comes back
    all_rows = global_sample(ray.data.from_arrow(tbl), n=1000,
                             cols=["doc_id", "source"]).to_pandas()
    assert len(all_rows) == 200 and set(all_rows.columns) == {"doc_id", "source"}


def test_weighted_sample_exact_n_and_distribution(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        weighted_sample,
    )

    n_rows = 4000
    # two weight classes: heavy rows 10x more likely per unit
    w = np.where(np.arange(n_rows) % 2 == 0, 10.0, 1.0)
    df = pd.DataFrame({"doc_id": np.arange(n_rows, dtype="int64"),
                       "w": w})
    ds = ray.data.from_pandas(df, override_num_blocks=6)
    out = weighted_sample(ds, n=400, weight_col="w",
                          cols=["doc_id", "w"]).to_pandas()
    assert len(out) == 400
    assert out["doc_id"].is_unique
    heavy = (out["w"] == 10.0).sum()
    # E[heavy] via A-Res is well above the unweighted 200; loose band
    assert heavy > 280, heavy

    # partition invariance: identical winners at any block count
    out1 = weighted_sample(ray.data.from_pandas(df, override_num_blocks=1),
                           n=400, weight_col="w").to_pandas()
    assert set(out1["doc_id"]) == set(out["doc_id"])


def test_weighted_sample_excludes_nonpositive_weights(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        weighted_sample,
    )

    df = pd.DataFrame({"doc_id": np.arange(20, dtype="int64"),
                       "w": [0.0] * 10 + [1.0] * 10})
    out = weighted_sample(ray.data.from_pandas(df), n=15,
                          weight_col="w").to_pandas()
    assert set(out["doc_id"]) == set(range(10, 20))


def _temp_tbl(n=400):
    rng = np.random.default_rng(9)
    w = rng.integers(10, 500, size=n).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(rng.choice(["a", "b", "c", "d"], size=n).tolist()),
        "n_chars": pa.array(w),
    })


def test_temperature_budgets_alpha_extremes(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        temperature_budgets,
    )

    t = _temp_tbl()
    ds = ray.data.from_arrow(t)
    src = np.array(t.column("source").to_pylist())
    w = t.column("n_chars").to_numpy()
    totals = {k: int(w[src == k].sum()) for k in np.unique(src)}
    total_w = sum(totals.values())

    # alpha=1: proportional to key totals (up to quantized-floor rounding)
    b1 = temperature_budgets(ds, total_budget=100_000, alpha=1.0)
    for k, v in b1.items():
        assert abs(v - 100_000 * totals[k] / total_w) <= 2
    # alpha=0: uniform split
    b0 = temperature_budgets(ds, total_budget=100_000, alpha=0.0)
    assert len(set(b0.values())) == 1
    # floor split never over-allocates, under-allocates < K units
    for b in (b0, b1):
        assert 100_000 - len(b) < sum(b.values()) <= 100_000


def test_temperature_budgets_sqrt_exact_integer_path(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        temperature_budgets,
    )

    t = _temp_tbl()
    ds = ray.data.from_arrow(t)
    src = np.array(t.column("source").to_pylist())
    w = t.column("n_chars").to_numpy()
    got = temperature_budgets(ds, total_budget=50_000, alpha=0.5)
    s = {k: int(np.floor(np.sqrt(float(w[src == k].sum())) * 1e6))
         for k in np.unique(src)}
    S = sum(s.values())
    assert got == {k: 50_000 * sk // S for k, sk in s.items()}


def test_temperature_mixture_sample_equals_manual_budgets(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        mixture_sample,
        temperature_budgets,
        temperature_mixture_sample,
    )

    t = _temp_tbl()
    ds = ray.data.from_arrow(t)
    budgets = temperature_budgets(ds, total_budget=20_000, alpha=0.5)
    a = temperature_mixture_sample(
        ray.data.from_arrow(t), total_budget=20_000, alpha=0.5).to_pandas()
    b = mixture_sample(ray.data.from_arrow(t), budgets=budgets).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # two-level path identical
    c = temperature_mixture_sample(
        ray.data.from_arrow(t), total_budget=20_000, alpha=0.5,
        n_buckets=4).to_pandas()
    assert sorted(c["doc_id"]) == sorted(b["doc_id"])


def test_temperature_budgets_guards(ray_session):
    import pytest as _pytest

    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        temperature_budgets,
    )

    t = _temp_tbl(50)
    ds = ray.data.from_arrow(t)
    with _pytest.raises(ValueError, match="max_keys"):
        temperature_budgets(ds, total_budget=100, key_col="doc_id",
                            weight_col="n_chars", max_keys=10)
    with _pytest.raises(ValueError, match="alpha"):
        temperature_budgets(ds, total_budget=100, alpha=1.5)
