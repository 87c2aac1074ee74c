"""Count-Sketch: unbiased point queries, AMS F2, merge algebra."""

import numpy as np

from cardinality_estimation_evaluation_framework_ray.state import (
    CountSketchSpec,
)
from cardinality_estimation_evaluation_framework_ray.state.base import (
    Sketch,
    spec_from_dict,
)


def _zipf_stream(n=200_000, v=10_000, seed=0):
    rs = np.random.RandomState(seed)
    return rs.zipf(1.3, size=n) % v


def test_point_query_error_bound():
    spec = CountSketchSpec(depth=7, width=8192, seed=1)
    toks = _zipf_stream()
    s = spec.new()
    s.update_tokens(toks)
    uniq, true_counts = np.unique(toks, return_counts=True)
    est = s.point_query(uniq)
    f2 = float((true_counts.astype(np.float64) ** 2).sum())
    bound = spec.point_error_bound(f2)
    # |err| <= 3*sqrt(F2/width) holds w.h.p. per query; allow a small tail
    assert (np.abs(est - true_counts) <= bound).mean() > 0.98


def test_point_query_unbiased_vs_countmin_bias():
    """Signed cancellation: the mean signed error is near zero, unlike
    count-min whose error is strictly one-sided (+eps*N)."""
    spec = CountSketchSpec(depth=5, width=1024, seed=2)
    toks = _zipf_stream(n=100_000, v=50_000, seed=4)
    s = spec.new()
    s.update_tokens(toks)
    uniq, true_counts = np.unique(toks, return_counts=True)
    err = s.point_query(uniq) - true_counts
    n = len(toks)
    assert abs(err.mean()) < 0.01 * (n / spec.width)  # centered
    assert (err < 0).any() and (err > 0).any()        # two-sided


def test_merge_matches_concat_and_partition_invariance():
    spec = CountSketchSpec(depth=4, width=2048, seed=3)
    rs = np.random.RandomState(1)
    parts = [rs.randint(0, 5000, 30_000) for _ in range(5)]
    whole = spec.new()
    whole.update_tokens(np.concatenate(parts))
    # arbitrary merge-tree order
    states = []
    for p in parts:
        st = spec.new()
        st.update_tokens(p)
        states.append(st)
    left = states[0]
    for st in states[1:]:
        left.merge_in(st)
    assert np.array_equal(left.counts, whole.counts)
    assert left.total == whole.total == 150_000


def test_exact_when_no_collisions():
    spec = CountSketchSpec(depth=5, width=1 << 20, seed=5)
    s = spec.new()
    s.update_tokens(np.array([7, 7, 7, 9]))
    assert s.point_query(np.array([7, 9, 11])).tolist() == [3.0, 1.0, 0.0]


def test_f2_ams_estimate_within_row_bound():
    spec = CountSketchSpec(depth=9, width=4096, seed=6)
    toks = _zipf_stream(n=300_000, v=20_000, seed=7)
    s = spec.new()
    s.update_tokens(toks)
    _, c = np.unique(toks, return_counts=True)
    true_f2 = float((c.astype(np.float64) ** 2).sum())
    rel = abs(s.f2() - true_f2) / true_f2
    # per-row std is ~sqrt(2/width)*F2 (~2.2%); median of 9 rows tightens it
    assert rel < 0.05


def test_serialization_and_spec_roundtrip():
    spec = CountSketchSpec(depth=3, width=256, seed=8)
    s = spec.new()
    s.update_tokens(np.arange(1000))
    back = Sketch.from_bytes(spec, s.to_bytes())
    assert np.array_equal(back.counts, s.counts)
    assert back.total == s.total
    assert spec_from_dict(spec.to_dict()) == spec


def test_non_power_of_two_width():
    spec = CountSketchSpec(depth=4, width=1000, seed=9)
    s = spec.new()
    toks = np.arange(5000) % 37
    s.update_tokens(toks)
    est = s.point_query(np.arange(37))
    true = np.bincount(toks % 37)
    assert np.abs(est - true).max() <= spec.point_error_bound(
        float((true.astype(np.float64) ** 2).sum()))
