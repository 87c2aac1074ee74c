import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import (
    BayesianApproximationSketchOperator,
    BloomSpec,
    ExpectationApproximationSketchOperator,
    FirstMomentEstimator,
    UnionEstimator,
    soft_union,
)
from cardinality_estimation_evaluation_framework_ray.state.base import Sketch
from cardinality_estimation_evaluation_framework_ray.state.noise import (
    blip,
    make_surreal_denoiser,
)


def _fill(spec, tokens):
    s = spec.new()
    s.update_tokens(np.asarray(tokens, dtype=np.int64))
    return s


def _rand(n, seed=0):
    return np.random.RandomState(seed).randint(0, 2**60, size=n)


def test_uniform_bf_union_estimator():
    # mirrors bloom_filters_test.py statistical checks vs m/k*ln(1-x/m)
    spec = BloomSpec(length=200_000, num_hashes=2, seed=5)
    n = 10_000
    a = _fill(spec, _rand(n, 1))
    b = _fill(spec, _rand(n, 2))
    est = UnionEstimator()([a, b])[0]
    assert abs(est - 2 * n) / (2 * n) < 0.05


@pytest.mark.parametrize("dist,method,kwargs", [
    ("uniform", "uniform", {}),
    ("log", "log", {}),
    ("exp", "exp", {"decay_rate": 10.0}),
    ("geo", "geo", {"probability": 0.00008}),
])
def test_first_moment_estimators(dist, method, kwargs):
    spec = BloomSpec(length=100_000, distribution=dist, seed=3, **kwargs)
    n = 30_000
    s = _fill(spec, _rand(n))
    est = FirstMomentEstimator(method)([s])
    assert abs(est - n) / n < 0.1, f"{dist}: {est} vs {n}"


def test_first_moment_any_method():
    spec = BloomSpec(length=100_000, distribution="exp", decay_rate=10.0, seed=3)
    n = 20_000
    s = _fill(spec, _rand(n))
    est = FirstMomentEstimator("any")([s])
    assert abs(est - n) / n < 0.1


def test_union_consistency_across_overlap():
    spec = BloomSpec(length=100_000, distribution="exp", decay_rate=10.0, seed=9)
    pool = _rand(30_000, 7)
    a = _fill(spec, pool[:20_000])
    b = _fill(spec, pool[10_000:])  # 10k overlap -> union 30k
    est = FirstMomentEstimator("exp")([a, b])
    assert abs(est - 30_000) / 30_000 < 0.1


def test_merge_laws_and_serialization():
    spec = BloomSpec(length=10_000, distribution="log", seed=2)
    parts = [_rand(3000, i) for i in range(3)]
    a, b, c = (_fill(spec, p) for p in parts)
    ab = _fill(spec, parts[0]); ab.merge_in(b)
    ba = _fill(spec, parts[1]); ba.merge_in(a)
    assert np.array_equal(ab.registers, ba.registers)
    abc = _fill(spec, np.concatenate(parts))
    ab.merge_in(c)
    assert np.array_equal(ab.registers, abc.registers)
    blob = abc.to_bytes()
    back = Sketch.from_bytes(spec, blob)
    assert np.array_equal(back.registers, abc.registers)


def test_counting_bf_merge_is_sum():
    spec = BloomSpec(length=1000, counting=True, seed=1)
    a = _fill(spec, [1, 2, 3])
    b = _fill(spec, [1, 2, 3])
    a.merge_in(b)
    assert a.registers.sum() == 6


def test_blip_surreal_denoise_roundtrip():
    # denoised estimate should be near the un-noised one (bloom_filters_test.py:324-393)
    spec = BloomSpec(length=100_000, distribution="exp", decay_rate=10.0, seed=4)
    n = 20_000
    s = _fill(spec, _rand(n))
    epsilon = float(np.log(3))
    rs = np.random.RandomState(10)
    noised = spec.new()
    noised.registers = blip(s.registers, epsilon, 1, rs)
    denoiser = make_surreal_denoiser(epsilon=epsilon)
    est = FirstMomentEstimator("exp", denoiser=denoiser)([noised])
    assert abs(est - n) / n < 0.25


def test_surreal_denoiser_expectation_identity():
    # denoise(E[noised bits]) == raw bits in expectation
    p = 0.25
    raw = np.array([0.0, 1.0, 1.0, 0.0])
    expected_noised = raw * (1 - p) + (1 - raw) * p
    from cardinality_estimation_evaluation_framework_ray.state.noise import (
        surreal_denoise,
    )
    den = surreal_denoise(expected_noised, probability=p)
    assert np.allclose(den, raw)


@pytest.mark.parametrize("op_cls", [BayesianApproximationSketchOperator,
                                    ExpectationApproximationSketchOperator])
def test_sketch_operators_intersection_difference(op_cls):
    spec = BloomSpec(length=100_000, distribution="exp", decay_rate=10.0, seed=6)
    pool = _rand(40_000, 3)
    a = _fill(spec, pool[:25_000])       # |A| = 25k
    b = _fill(spec, pool[15_000:40_000])  # |B| = 25k, overlap 10k
    op = op_cls("exp")
    est = FirstMomentEstimator("exp")
    inter = op.intersection(spec, a.float_registers(), b.float_registers())
    diff = op.difference(spec, a.float_registers(), b.float_registers())
    inter_card = est([type("S", (), {"spec": spec, "float_registers": lambda self=None: inter})()])
    diff_card = est([type("S", (), {"spec": spec, "float_registers": lambda self=None: diff})()])
    assert abs(inter_card - 10_000) / 10_000 < 0.35
    assert abs(diff_card - 15_000) / 15_000 < 0.35


def test_general_composition_counting_exp_adbf():
    """AnySketch generality (any_sketch.py:287-348): counting registers over
    a non-uniform distribution.  Counts preserve total insertions; the
    active-bit view feeds the first-moment exp estimator accurately."""
    spec = BloomSpec(length=100_000, distribution="exp", decay_rate=10.0,
                     counting=True, seed=9)
    n = 20_000
    toks = _rand(n)
    s = _fill(spec, np.repeat(toks, 3))  # frequency-3 multiset
    assert s.registers.sum() == 3 * n    # SumFunction: every insert counted
    est = s.estimate()[0]
    assert abs(est - n) / n < 0.05


@pytest.mark.parametrize("dist,kwargs", [
    ("exp", dict(decay_rate=10.0)),
    ("geo", dict(probability=2.0 / 100_000)),
    ("log", dict()),
])
def test_general_composition_multi_hash_nonuniform(dist, kwargs):
    """num_hashes > 1 over non-uniform distributions: estimate() inverts the
    first-moment equation over effective probs 1-(1-p_j)^k."""
    spec = BloomSpec(length=100_000, distribution=dist, num_hashes=2,
                     seed=11, **kwargs)
    n = 10_000
    s = _fill(spec, _rand(n))
    est = s.estimate()[0]
    assert abs(est - n) / n < 0.1


def test_soft_union_matches_or_on_bits():
    a = np.array([0.0, 1.0, 0.0, 1.0])
    b = np.array([0.0, 0.0, 1.0, 1.0])
    assert np.array_equal(soft_union([a, b]), np.array([0.0, 1.0, 1.0, 1.0]))
