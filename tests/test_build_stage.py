import numpy as np
import pyarrow as pa
import pytest

from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
    _gen_batch,
    tokens_dataset,
)
from cardinality_estimation_evaluation_framework_ray.stages.build import (
    build_sketch_states,
    collect_states,
    iter_key_tokens,
    union_across_keys,
)
from cardinality_estimation_evaluation_framework_ray.state import (
    ExactMultiSetSpec,
    HllSpec,
)

TINY = TokensTableSpec(num_sources=4, rows_per_source=250, min_tok=1, max_tok=64,
                       universe_size=20_000, seed=42)


def _truth(spec):
    tbl = _gen_batch(np.arange(spec.total_rows, dtype=np.int64), spec)
    per = {}
    glob = set()
    for s, t in zip(tbl.column("source").to_pylist(), tbl.column("tokens").to_pylist()):
        per.setdefault(s, set()).update(t)
        glob.update(t)
    return {k: len(v) for k, v in per.items()}, len(glob)


def test_iter_key_tokens_groups_correctly():
    tbl = pa.table({
        "source": ["a", "b", "a", "b"],
        "tokens": [[1, 2], [3], [2, 5], [7, 8, 9]],
    })
    got = {k: sorted(v.tolist()) for k, v in iter_key_tokens(tbl, "source")}
    assert got == {"a": [1, 2, 2, 5], "b": [3, 7, 8, 9]}


@pytest.mark.usefixtures("ray_session")
def test_build_merge_estimate_vs_truth():
    specs = {"hll": HllSpec(p=11, seed=7), "exact": ExactMultiSetSpec()}
    states = build_sketch_states(tokens_dataset(TINY), specs)
    per_key = collect_states(states, specs)
    true_per, true_glob = _truth(TINY)
    assert set(per_key) == set(true_per)
    for k, truth in true_per.items():
        # sparse-exact at this scale
        assert per_key[k]["exact"].cardinality() == truth
        assert per_key[k]["hll"].estimate() == [float(truth)]
    union = union_across_keys(per_key, specs)
    assert union["exact"].cardinality() == true_glob
    err = abs(union["hll"].estimate()[0] - true_glob) / true_glob
    assert err < 3 * specs["hll"].rel_std_error() + 0.01


@pytest.mark.usefixtures("ray_session")
def test_partition_invariance():
    specs = {"hll": HllSpec(p=9, seed=3)}
    outs = []
    for blocks in (1, 5, 17):
        states = build_sketch_states(tokens_dataset(TINY, override_num_blocks=blocks), specs)
        per_key = collect_states(states, specs)
        u = union_across_keys(per_key, specs)
        outs.append((sorted((k, v["hll"].estimate()[0]) for k, v in per_key.items()),
                     u["hll"].estimate()[0]))
    assert outs[0] == outs[1] == outs[2]


@pytest.mark.usefixtures("ray_session")
def test_combiner_matches_no_combiner():
    specs = {"hll": HllSpec(p=9, seed=3)}
    flat = collect_states(
        build_sketch_states(tokens_dataset(TINY), specs, combine_batch_size=0),
        specs)
    combined = collect_states(
        build_sketch_states(tokens_dataset(TINY), specs, combine_batch_size=4),
        specs)
    for k in flat:
        assert np.array_equal(flat[k]["hll"].buckets, combined[k]["hll"].buckets)


@pytest.mark.usefixtures("ray_session")
def test_epoch_mode_matches_task_mode():
    from cardinality_estimation_evaluation_framework_ray.pipelines.reach import (
        reach_report,
    )
    from cardinality_estimation_evaluation_framework_ray.state import (
        BloomSpec,
        CountMinSpec,
    )

    specs = {"hll": HllSpec(p=10, seed=5),
             "cm": CountMinSpec(depth=4, width=512, seed=5),
             "adbf": BloomSpec(length=5_000, distribution="exp",
                               decay_rate=10.0, seed=5)}
    ds = tokens_dataset(TINY, override_num_blocks=8)
    a = reach_report(ds, specs, mode="tasks").set_index("source").sort_index()
    b = reach_report(tokens_dataset(TINY, override_num_blocks=8), specs,
                     mode="epoch").set_index("source").sort_index()
    assert a.equals(b)


def test_sketch_aggregation_native_udaf(ray_session):
    """sketch_aggregation exposes specs as ray.data AggregateFns:
    groupby(key).aggregate(hll_agg, Count) estimates per-key distinct
    counts within the HLL 3-sigma band, and the 'state' output round-trips
    back into a mergeable sketch."""
    import pickle

    import pyarrow as pa

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.build import (
        sketch_aggregation,
    )
    from cardinality_estimation_evaluation_framework_ray.state import HllSpec

    rng = np.random.RandomState(5)
    rows = []
    truth = {}
    for src, n in (("a", 4000), ("b", 900)):
        toks = rng.randint(0, 10_000_000, size=n * 12).astype(np.int64)
        truth[src] = len(np.unique(toks))
        for i in range(n):
            rows.append({"source": src,
                         "tokens": toks[i * 12:(i + 1) * 12].tolist()})
    ds = ray.data.from_items(rows).repartition(8)

    spec = HllSpec(p=12, seed=9)
    agg = sketch_aggregation(spec, name="hll_est")
    out = ds.groupby("source").aggregate(agg).to_pandas()
    got = dict(zip(out["source"], out["hll_est"]))
    band = 3 * 1.04 / np.sqrt(2 ** 12)
    for src, t in truth.items():
        assert abs(got[src] - t) / t < band, (src, got[src], t)

    # 'state' output: blobs merge back through the spec to the union
    sagg = sketch_aggregation(spec, output="state", name="hll_state")
    st = ds.groupby("source").aggregate(sagg).to_pandas()
    union = spec.new()
    for blob in st["hll_state"]:
        other = spec.new()
        other.load_state(pickle.loads(blob))
        union.merge_in(other)
    all_truth = len(set().union(*[
        set(np.concatenate([np.asarray(r["tokens"]) for r in rows
                            if r["source"] == s]).tolist())
        for s in truth]))
    assert abs(union.estimate()[0] - all_truth) / all_truth < band

    with pytest.raises(ValueError):
        sketch_aggregation(spec, output="blob")


def test_table_sketch_profile_one_pass_multi_column(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.build import (
        table_sketch_profile,
    )

    rs = np.random.RandomState(17)
    df = pd.DataFrame({
        "a": rs.randint(1, 40, 5000).astype("float64"),
        "b": np.round(rs.uniform(0, 1, 5000), 2),
    })
    df.loc[::50, "b"] = np.nan  # nulls drop like SQL
    prof = table_sketch_profile(
        ray.data.from_pandas(df, override_num_blocks=8), ["a", "b"])

    assert prof["a"]["dd"].n == 5000
    assert prof["b"]["dd"].n == int(df["b"].notna().sum())
    # HLL sparse mode is exact below threshold
    assert round(prof["a"]["hll"].estimate()[0]) == df["a"].nunique()
    assert round(prof["b"]["hll"].estimate()[0]) == df["b"].nunique()
    # DDSketch quantiles within alpha of the true rank element
    for c in ("a", "b"):
        v = np.sort(df[c].dropna().to_numpy())
        for q in (0.5, 0.9):
            true = v[int(q * (len(v) - 1))]
            est = prof[c]["dd"].quantile(q)
            assert abs(est - true) <= prof[c]["dd"].spec.alpha * true

    # partition invariance: 1 block == 8 blocks, bit-identical states
    p1 = table_sketch_profile(
        ray.data.from_pandas(df, override_num_blocks=1), ["a", "b"])
    for c in ("a", "b"):
        np.testing.assert_array_equal(p1[c]["dd"].keys, prof[c]["dd"].keys)
        np.testing.assert_array_equal(p1[c]["dd"].counts,
                                      prof[c]["dd"].counts)
        assert (round(p1[c]["hll"].estimate()[0])
                == round(prof[c]["hll"].estimate()[0]))
