import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import (
    ThetaSpec,
    theta_difference,
    theta_intersect,
)


def test_exact_below_saturation():
    spec = ThetaSpec(k=1024, seed=7)
    sk = spec.new()
    sk.update_tokens(np.arange(1000))
    sk.update_tokens(np.arange(500, 1000))  # duplicates ignored
    assert sk.estimate() == [1000.0]


def test_set_algebra_exact_regime():
    spec = ThetaSpec(k=4096, seed=7)
    a, b = spec.new(), spec.new()
    a.update_tokens(np.arange(0, 300))
    b.update_tokens(np.arange(200, 600))
    assert theta_intersect(a, b).estimate() == [100.0]
    assert theta_difference(a, b).estimate() == [200.0]
    assert theta_difference(b, a).estimate() == [300.0]


def test_saturated_estimate_within_3_sigma():
    spec = ThetaSpec(k=4096, seed=11)
    sk = spec.new()
    n = 200_000
    sk.update_tokens(np.arange(n))
    sigma = n / np.sqrt(spec.k - 1)
    assert abs(sk.estimate()[0] - n) < 3 * sigma


def test_intersection_estimate_saturated():
    spec = ThetaSpec(k=8192, seed=13)
    a, b = spec.new(), spec.new()
    a.update_tokens(np.arange(0, 120_000))
    b.update_tokens(np.arange(80_000, 200_000))
    est = theta_intersect(a, b).estimate()[0]
    # effective sample of the intersection is ~k * 40000/200000 ~ 1638
    assert abs(est - 40_000) < 5 * 40_000 / np.sqrt(1500)


def test_composability_of_set_ops():
    spec = ThetaSpec(k=4096, seed=3)
    a, b, c = spec.new(), spec.new(), spec.new()
    a.update_tokens(np.arange(0, 100))
    b.update_tokens(np.arange(50, 150))
    c.update_tokens(np.arange(140, 160))
    ab = theta_intersect(a, b)        # {50..99}
    ab.merge_in(c)                    # union with {140..159}
    assert ab.estimate() == [70.0]


def test_merge_truncates_to_k_and_theta_is_exact_int():
    spec = ThetaSpec(k=16, seed=5)
    a, b = spec.new(), spec.new()
    a.update_tokens(np.arange(0, 500))
    b.update_tokens(np.arange(400, 900))
    a.merge_in(b)
    assert len(a.hashes) <= 16
    assert isinstance(a.theta, int)
    assert (a.hashes < np.uint64(a.theta)).all()


def test_spec_validation():
    with pytest.raises(ValueError):
        ThetaSpec(k=1)
