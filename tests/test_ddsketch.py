"""DDSketch: relative-error guarantee, exact merge algebra, collapse bound."""

import math
import pickle

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import (
    DDSketchSpec,
)
from cardinality_estimation_evaluation_framework_ray.state.base import (
    spec_from_dict,
)


def _lognormal(n=100_000, seed=0, sigma=2.0):
    rs = np.random.RandomState(seed)
    return np.exp(rs.normal(0.0, sigma, size=n))


def _true_quantile(values: np.ndarray, q: float) -> float:
    """Order statistic at rank q*(n-1) — the paper's rank convention."""
    v = np.sort(values)
    return float(v[int(q * (len(v) - 1))])


def test_relative_error_guarantee_across_quantiles():
    spec = DDSketchSpec(alpha=0.01)
    vals = _lognormal()
    s = spec.new()
    s.update_tokens(vals)
    for q in [0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 1.0]:
        true = _true_quantile(vals, q)
        est = s.quantile(q)
        assert abs(est - true) <= spec.alpha * true, (q, est, true)


def test_bucket_mapping_matches_formula():
    spec = DDSketchSpec(alpha=0.05)
    s = spec.new()
    vals = np.array([0.5, 1.0, 7.25, 1e6])
    s.update_tokens(vals)
    gamma = spec.gamma
    expect = sorted({math.ceil(math.log(v) / math.log(gamma)) for v in vals})
    assert list(s.keys) == expect
    assert int(s.counts.sum()) == len(vals)


def test_merge_is_exact_and_partition_invariant():
    """Merged state is bit-identical to the single-pass state regardless
    of how the input is split or in what order states fold — the
    associativity contract the groupby merge tree relies on."""
    spec = DDSketchSpec(alpha=0.02)
    vals = _lognormal(n=50_000, seed=3)
    whole = spec.new()
    whole.update_tokens(vals)
    for n_parts, order in [(2, [0, 1]), (5, [3, 0, 4, 2, 1]),
                           (7, [6, 5, 4, 3, 2, 1, 0])]:
        parts = np.array_split(vals, n_parts)
        states = []
        for p in parts:
            st = spec.new()
            st.update_tokens(p)
            states.append(st)
        acc = states[order[0]]
        for i in order[1:]:
            acc.merge_in(states[i])
        np.testing.assert_array_equal(acc.keys, whole.keys)
        np.testing.assert_array_equal(acc.counts, whole.counts)
        assert acc.n_underflow == whole.n_underflow


def test_underflow_and_nan_handling():
    spec = DDSketchSpec(alpha=0.01, min_value=1e-3)
    s = spec.new()
    s.update_tokens(np.array([0.0, 1e-6, np.nan, 2.0, 3.0]))
    assert s.n_underflow == 2          # 0.0 and 1e-6; NaN dropped
    assert s.n == 4
    assert s.quantile(0.0) == 0.0      # rank inside the underflow mass
    q1 = s.quantile(1.0)
    assert abs(q1 - 3.0) <= spec.alpha * 3.0


def test_negative_values_rejected():
    s = DDSketchSpec().new()
    with pytest.raises(ValueError, match="non-negative"):
        s.update_tokens(np.array([1.0, -2.0]))


def test_collapse_bounds_memory_and_keeps_high_quantiles():
    spec = DDSketchSpec(alpha=0.01, max_buckets=128)
    vals = _lognormal(n=80_000, seed=7, sigma=3.0)  # wide range => collapse
    s = spec.new()
    s.update_tokens(vals)
    assert len(s.keys) <= 128
    assert s.n == len(vals)            # counts preserved through collapse
    # the guarantee survives exactly for ranks strictly above the lowest
    # surviving bucket (collapsed mass folds INTO keys[0], so that bucket
    # is polluted; everything above keeps the alpha contract)
    lo_edge = spec.gamma ** int(s.keys[0])
    checked = 0
    for q in [0.9, 0.99, 0.999, 0.9999, 1.0]:
        true = _true_quantile(vals, q)
        if true > lo_edge:
            assert abs(s.quantile(q) - true) <= spec.alpha * true, (q,)
            checked += 1
    assert checked >= 2                # the setup must actually exercise it


def test_collapse_is_disabled_when_nonpositive():
    spec = DDSketchSpec(alpha=0.001, max_buckets=0)
    s = spec.new()
    s.update_tokens(_lognormal(n=20_000, seed=5, sigma=4.0))
    assert len(s.keys) > 128           # nothing folded


def test_serialization_round_trip_and_registry():
    spec = DDSketchSpec(alpha=0.02, max_buckets=512)
    assert spec_from_dict(spec.to_dict()) == spec
    s = spec.new()
    s.update_tokens(_lognormal(n=10_000, seed=11))
    clone = spec.new()
    clone.load_state(pickle.loads(s.to_bytes()))
    np.testing.assert_array_equal(clone.keys, s.keys)
    np.testing.assert_array_equal(clone.counts, s.counts)
    assert clone.quantile(0.95) == s.quantile(0.95)


def test_empty_and_validation():
    with pytest.raises(ValueError, match="alpha"):
        DDSketchSpec(alpha=1.5).new()
    with pytest.raises(ValueError, match="min_value"):
        DDSketchSpec(min_value=0.0).new()
    s = DDSketchSpec().new()
    assert math.isnan(s.quantile(0.5))
    with pytest.raises(ValueError, match="q must be"):
        s.quantile(1.5)


def test_collapsed_merges_preserve_counts_and_high_quantiles_any_order():
    """Once collapse fires, states are no longer bit-identical across fold
    orders (documented), but n is exact and quantiles above the collapsed
    mass keep the alpha contract in EVERY order."""
    spec = DDSketchSpec(alpha=0.01, max_buckets=96)
    vals = _lognormal(n=60_000, seed=13, sigma=3.0)
    parts = np.array_split(vals, 6)
    results = []
    for order in [[0, 1, 2, 3, 4, 5], [5, 4, 3, 2, 1, 0],
                  [3, 0, 5, 1, 4, 2]]:
        states = []
        for p in parts:
            st = spec.new()
            st.update_tokens(p)
            states.append(st)
        acc = states[order[0]]
        for i in order[1:]:
            acc.merge_in(states[i])
        assert acc.n == len(vals)
        assert len(acc.keys) <= 96
        lo_edge = spec.gamma ** int(acc.keys[0])
        for q in [0.99, 0.999, 1.0]:
            true = _true_quantile(vals, q)
            if true > lo_edge:
                assert abs(acc.quantile(q) - true) <= spec.alpha * true
        results.append(acc.quantile(0.999))
    # the high-quantile answers agree across orders to within the bound
    assert max(results) - min(results) <= 2 * spec.alpha * max(results)
