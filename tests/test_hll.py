import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import HllSpec
from cardinality_estimation_evaluation_framework_ray.state.base import Sketch


def _fill(spec, tokens):
    s = spec.new()
    s.update_tokens(np.asarray(tokens, dtype=np.int64))
    return s


def test_sparse_mode_is_exact():
    spec = HllSpec(p=10, seed=3)
    toks = np.arange(5000)  # < 6m = 6144 -> stays sparse
    s = _fill(spec, np.concatenate([toks, toks]))  # repeats must not matter
    assert s.sparse_tokens is not None
    assert s.estimate() == [5000.0]


def test_promotion_to_dense_and_accuracy():
    spec = HllSpec(p=12, seed=3)
    n = 200_000
    s = _fill(spec, np.arange(n))
    assert s.sparse_tokens is None  # promoted past 6m
    err = abs(s.estimate_cardinality() - n) / n
    assert err < 3 * spec.rel_std_error()


@pytest.mark.parametrize("n", [100, 200_000, 800_000])
def test_accuracy_bands(n):
    # mirrors reference statistical tests (hyper_log_log_test.py:130-158)
    spec = HllSpec(p=14, seed=11, sparse=False)
    s = _fill(spec, np.random.RandomState(0).randint(0, 2**62, size=n))
    err = abs(s.estimate_cardinality() - n) / n
    assert err < max(3 * spec.rel_std_error(), 0.02)


@pytest.mark.parametrize("n", [100, 12_000, 20_000, 80_000, 500_000])
def test_ertl_estimator_unbiased_across_ranges(n):
    # Ertl (2017) improved raw estimator: no bias zone (unlike the
    # reference's simplified estimator, which is +20-55% for m < n < 5m)
    spec = HllSpec(p=14, seed=11, sparse=False, estimator="ertl")
    s = _fill(spec, np.random.RandomState(1).randint(0, 2**62, size=n))
    err = abs(s.estimate_cardinality() - n) / n
    assert err < max(3 * spec.rel_std_error(), 0.02), err


def test_bias_zone_matches_reference_envelope():
    # For m < n < 5m neither we nor the reference apply ++ bias correction
    # (reference hyper_log_log.py:184-187 returns bias 0), so the raw
    # estimator's known upward bias (~20% at n/m ~ 1.2) is expected.
    spec = HllSpec(p=14, seed=11, sparse=False)
    n = 20_000
    s = _fill(spec, np.random.RandomState(0).randint(0, 2**62, size=n))
    err = (s.estimate_cardinality() - n) / n
    assert 0 < err < 0.35


def test_merge_laws():
    spec = HllSpec(p=10, seed=5, sparse=False)
    rs = np.random.RandomState(1)
    parts = [rs.randint(0, 2**60, size=5000) for _ in range(3)]
    a, b, c = (_fill(spec, p) for p in parts)

    ab = _fill(spec, parts[0]); ab.merge_in(b)
    ba = _fill(spec, parts[1]); ba.merge_in(a)
    assert np.array_equal(ab.buckets, ba.buckets)  # commutative

    abc1 = _fill(spec, parts[0]); abc1.merge_in(b); abc1.merge_in(c)
    bc = _fill(spec, parts[1]); bc.merge_in(c)
    abc2 = _fill(spec, parts[0]); abc2.merge_in(bc)
    assert np.array_equal(abc1.buckets, abc2.buckets)  # associative

    whole = _fill(spec, np.concatenate(parts))
    assert np.array_equal(abc1.buckets, whole.buckets)  # partition invariance


def test_sparse_merge_demotion():
    spec = HllSpec(p=4, seed=5)  # 6m = 96
    a = _fill(spec, np.arange(60))
    b = _fill(spec, np.arange(60, 120))
    a.merge_in(b)
    assert a.sparse_tokens is None  # union of 120 > 96 must demote at merge
    # sparse x dense -> dense
    c = _fill(spec, np.arange(10))
    c.merge_in(a)
    assert c.sparse_tokens is None


def test_serialization_roundtrip():
    spec = HllSpec(p=8, seed=2)
    s = _fill(spec, np.arange(1000))
    blob = s.to_bytes()
    s2 = Sketch.from_bytes(spec, blob)
    assert np.array_equal(s.buckets, s2.buckets)
    assert np.array_equal(s.sparse_tokens, s2.sparse_tokens)
    assert s2.estimate() == s.estimate()


def test_spec_validation():
    with pytest.raises(ValueError):
        HllSpec(p=3)
    with pytest.raises(ValueError):
        HllSpec(p=17)
