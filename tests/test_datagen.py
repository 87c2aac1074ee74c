import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
    _gen_batch,
)


def test_partition_invariant_generation():
    spec = TokensTableSpec(num_sources=3, rows_per_source=100, min_tok=2, max_tok=16,
                           universe_size=1000, seed=1)
    whole = _gen_batch(np.arange(300, dtype=np.int64), spec)
    parts = [_gen_batch(ids, spec) for ids in np.array_split(np.arange(300, dtype=np.int64), 7)]
    import pyarrow as pa
    joined = pa.concat_tables(parts)
    assert whole.equals(joined)


def test_schema_and_invariants():
    spec = TokensTableSpec(num_sources=2, rows_per_source=50, min_tok=3, max_tok=9,
                           universe_size=500, seed=2)
    tbl = _gen_batch(np.arange(100, dtype=np.int64), spec)
    assert [f.name for f in tbl.schema] == ["doc_id", "tokens", "n_tok", "source"]
    n_tok = tbl.column("n_tok").to_numpy()
    lens = np.array([len(t) for t in tbl.column("tokens").to_pylist()])
    assert np.array_equal(n_tok, lens)  # n_tok invariant (input_hint)
    assert n_tok.min() >= 3 and n_tok.max() <= 9
    toks = np.concatenate(tbl.column("tokens").to_pylist())
    assert toks.min() >= 0 and toks.max() < 500


def test_disjoint_scenario_truth_by_construction():
    spec = TokensTableSpec(num_sources=4, rows_per_source=200, min_tok=8, max_tok=32,
                           universe_size=4000, scenario="disjoint", seed=3)
    tbl = _gen_batch(np.arange(spec.total_rows, dtype=np.int64), spec)
    per = {}
    for s, t in zip(tbl.column("source").to_pylist(), tbl.column("tokens").to_pylist()):
        per.setdefault(s, set()).update(t)
    sets = list(per.values())
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            assert not (sets[i] & sets[j])


def test_fully_overlapping_scenario():
    spec = TokensTableSpec(num_sources=3, rows_per_source=2000, min_tok=16, max_tok=64,
                           universe_size=10_000, scenario="fully_overlapping",
                           window_frac=0.01, seed=4)
    tbl = _gen_batch(np.arange(spec.total_rows, dtype=np.int64), spec)
    per = {}
    for s, t in zip(tbl.column("source").to_pylist(), tbl.column("tokens").to_pylist()):
        per.setdefault(s, set()).update(t)
    sets = list(per.values())
    # with a window of 100 ids and ~80k draws each, all sources saturate it
    assert sets[0] == sets[1] == sets[2]


def test_constant_frequency_overlay():
    f = 4
    spec = TokensTableSpec(num_sources=2, rows_per_source=100, min_tok=20, max_tok=20,
                           universe_size=10**9, frequency=f"constant:{f}", seed=5)
    tbl = _gen_batch(np.arange(spec.total_rows, dtype=np.int64), spec)
    from collections import Counter
    per = {}
    for s, t in zip(tbl.column("source").to_pylist(), tbl.column("tokens").to_pylist()):
        per.setdefault(s, Counter()).update(t)
    for s, counter in per.items():
        freqs = np.array(list(counter.values()))
        # all full pool slots hit exactly f times (universe big => no collisions)
        assert (freqs == f).mean() > 0.99


def test_zipf_source_skew():
    spec = TokensTableSpec(num_sources=5, rows_per_source=100, zipf_sources=True, seed=6)
    b = spec.source_boundaries()
    sizes = np.diff(b)
    assert sizes.sum() == spec.total_rows
    assert sizes[0] > 2 * sizes[-1]  # hot first source


def test_sequential_overlap_scenario():
    spec = TokensTableSpec(num_sources=4, rows_per_source=3000, min_tok=32, max_tok=64,
                           universe_size=50_000, scenario="sequential",
                           shared_prop=0.5, window_frac=0.1, seed=7)
    tbl = _gen_batch(np.arange(spec.total_rows, dtype=np.int64), spec)
    per = {}
    for s, t in zip(tbl.column("source").to_pylist(), tbl.column("tokens").to_pylist()):
        per.setdefault(s, set()).update(t)
    a, b = per["src0"], per["src1"]
    jacc_overlap = len(a & b) / min(len(a), len(b))
    assert 0.3 < jacc_overlap < 0.7  # ~shared_prop window overlap
