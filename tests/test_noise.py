import math

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state.noise import (
    analytic_gaussian_sigma,
    blip,
    gaussian_noiser,
    geometric_noiser,
    get_probability_of_flip,
    laplace_noiser,
    sample_discrete_gaussian,
)


def test_flip_probability_formula():
    # 1/(1+e^eps) (bloom_filters.py:525-535)
    assert get_probability_of_flip(math.log(3), 1) == pytest.approx(0.25)
    assert get_probability_of_flip(math.log(3), 2) == pytest.approx(
        1 / (1 + math.sqrt(3)))


def test_blip_flip_rate():
    rs = np.random.RandomState(0)
    bits = np.zeros(200_000, dtype=np.uint8)
    noised = blip(bits, math.log(3), 1, rs)
    assert abs(noised.mean() - 0.25) < 0.01
    ones = np.ones(200_000, dtype=np.uint8)
    noised1 = blip(ones, math.log(3), 1, rs)
    assert abs((1 - noised1.mean()) - 0.25) < 0.01


def test_laplace_and_geometric_noisers():
    rs = np.random.RandomState(1)
    lap = laplace_noiser(1.0, rs)
    draws = np.array([lap(0.0) for _ in range(20_000)])
    assert abs(draws.mean()) < 0.05
    assert abs(draws.std() - math.sqrt(2)) < 0.1  # Var Lap(1) = 2
    geo = geometric_noiser(1.0, rs)
    gd = np.array([geo(0) for _ in range(20_000)])
    assert abs(gd.mean()) < 0.05
    assert np.all(gd == gd.astype(int))  # integer noise


def test_analytic_gaussian_sigma_monotone():
    s1 = analytic_gaussian_sigma(1.0, 1e-5)
    s2 = analytic_gaussian_sigma(2.0, 1e-5)
    s4 = analytic_gaussian_sigma(1.0, 1e-5, num_queries=4)
    assert s2 < s1       # more budget -> less noise
    assert s4 > s1       # more queries -> more noise
    assert s4 == pytest.approx(2 * s1, rel=0.05)  # sqrt(k) scaling


def test_gaussian_mechanism_dp_condition():
    # verify the calibrated sigma actually satisfies the analytic condition
    eps, delta = 1.0, 1e-5
    sigma = analytic_gaussian_sigma(eps, delta)

    def phi(x):
        return 0.5 * (1 + math.erf(x / math.sqrt(2)))

    achieved = phi(1 / (2 * sigma) - eps * sigma) - math.exp(eps) * phi(
        -1 / (2 * sigma) - eps * sigma)
    assert achieved <= delta * 1.01


def test_discrete_gaussian_sampler():
    rs = np.random.RandomState(2)
    draws = np.array([sample_discrete_gaussian(3.0, rs) for _ in range(5000)])
    assert np.all(draws == draws.astype(int))
    assert abs(draws.mean()) < 0.2
    assert abs(draws.std() - 3.0) < 0.3


def test_gaussian_noiser_smoke():
    g = gaussian_noiser(1.0, 1e-5, random_state=np.random.RandomState(3))
    assert g.sigma > 0
    assert g(100.0) != 100.0
