"""DP noisers / denoisers: sketch-level (local DP) and estimate-level (global).

Mirrors the reference's noise layer (``src/estimators/bloom_filters.py:
487-631``, ``estimator_noisers.py``, ``src/common/noisers.py``) as pure
functions over register arrays / scalars.  The Gaussian mechanism's sigma is
calibrated with the analytic Gaussian mechanism (Balle & Wang, ICML 2018)
instead of the ``dp_accounting`` dependency (not available here); k-query
composition uses sqrt(k)-scaled sensitivity (standard Gaussian composition).
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# bit-flip noise for Bloom-family sketches (local DP)
# ---------------------------------------------------------------------------

def get_probability_of_flip(epsilon: float, num_hashes: int) -> float:
    """Blip flip probability 1/(1+e^(eps/k)) (bloom_filters.py:525-535)."""
    return 1.0 / (1.0 + math.exp(epsilon / num_hashes))


def flip_bits(registers: np.ndarray, flip_zero_prob: float, flip_one_prob: float,
              random_state: np.random.RandomState) -> np.ndarray:
    """FixedProbabilityBitFlipNoiser (bloom_filters.py:487-522)."""
    regs = np.asarray(registers)
    probs = np.where(regs > 0, flip_one_prob, flip_zero_prob)
    flips = random_state.random_sample(regs.shape) < probs
    return np.where(flips, np.bitwise_xor(regs > 0, True).astype(regs.dtype), regs)


def blip(registers: np.ndarray, epsilon: float, num_hashes: int,
         random_state: np.random.RandomState) -> np.ndarray:
    """BlipNoiser [Alaggan et al. 2012] (bloom_filters.py:538-570)."""
    p = get_probability_of_flip(epsilon, num_hashes)
    return flip_bits(registers, p, p, random_state)


def surreal_denoise(registers: np.ndarray, probability: float | None = None,
                    epsilon: float | None = None) -> np.ndarray:
    """SurrealDenoiser: closed-form expected-bit correction
    (bloom_filters.py:587-631; one hash function)."""
    assert probability is not None or epsilon is not None
    p = probability if probability is not None else get_probability_of_flip(epsilon, 1)
    regs = np.asarray(registers, dtype=np.float64)
    expected_zeros = -regs * p + (1 - regs) * (1 - p)
    return 1 - expected_zeros / (1 - 2 * p)


def make_surreal_denoiser(probability: float | None = None,
                          epsilon: float | None = None):
    """Denoiser over a LIST of register arrays (DenoiserBase contract)."""

    def denoiser(arrays):
        return [surreal_denoise(a, probability, epsilon) for a in arrays]

    return denoiser


# ---------------------------------------------------------------------------
# estimate-level mechanisms (global DP; common/noisers.py:21-226)
# ---------------------------------------------------------------------------

def laplace_noiser(epsilon: float, random_state=None, sensitivity: float = 1.0):
    rs = random_state or np.random.RandomState()

    def noiser(x):
        return x + rs.laplace(scale=sensitivity / epsilon)

    return noiser


def geometric_noiser(epsilon: float, random_state=None, sensitivity: float = 1.0):
    """Discrete Laplace via difference of two geometrics (noisers.py:107-112)."""
    rs = random_state or np.random.RandomState()
    p = 1 - math.exp(-epsilon / sensitivity)

    def noiser(x):
        return x + (rs.geometric(p=p) - rs.geometric(p=p))

    return noiser


def _phi(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def analytic_gaussian_sigma(epsilon: float, delta: float,
                            sensitivity: float = 1.0,
                            num_queries: int = 1) -> float:
    """Smallest sigma s.t. the Gaussian mechanism is (eps, delta)-DP.

    Exact condition (Balle & Wang 2018, Thm 8):
      delta >= Phi(D/(2s) - eps*s/D) - e^eps * Phi(-D/(2s) - eps*s/D)
    solved by bisection; multi-query composition via sqrt(k)-scaled
    sensitivity.
    """
    d = sensitivity * math.sqrt(num_queries)

    def delta_of(sigma: float) -> float:
        a = d / (2 * sigma) - epsilon * sigma / d
        b = -d / (2 * sigma) - epsilon * sigma / d
        return _phi(a) - math.exp(epsilon) * _phi(b)

    lo, hi = 1e-6, 1.0
    while delta_of(hi) > delta:
        hi *= 2
    for _ in range(200):
        mid = (lo + hi) / 2
        if delta_of(mid) > delta:
            lo = mid
        else:
            hi = mid
    return hi


def gaussian_noiser(epsilon: float, delta: float, num_queries: int = 1,
                    random_state=None, sensitivity: float = 1.0):
    rs = random_state or np.random.RandomState()
    sigma = analytic_gaussian_sigma(epsilon, delta, sensitivity, num_queries)

    def noiser(x):
        return x + rs.normal(scale=sigma)

    noiser.sigma = sigma
    return noiser


def sample_discrete_gaussian(sigma: float, random_state) -> int:
    """Canonne-Kamath-Steinke rejection sampler (noisers.py:205-222)."""
    t = math.floor(sigma) + 1
    p_geom = 1 - math.exp(-1.0 / t)
    sigma_sq = sigma * sigma
    while True:
        y = random_state.geometric(p=p_geom) - random_state.geometric(p=p_geom)
        p_bern = math.exp(-((abs(y) - sigma_sq / t) ** 2) * 0.5 / sigma_sq)
        if random_state.binomial(1, p_bern) == 1:
            return y


def discrete_gaussian_noiser(epsilon: float, delta: float, num_queries: int = 1,
                             random_state=None, sensitivity: float = 1.0):
    rs = random_state or np.random.RandomState()
    sigma = analytic_gaussian_sigma(epsilon, delta, sensitivity, num_queries)

    def noiser(x):
        return x + sample_discrete_gaussian(sigma, rs)

    noiser.sigma = sigma
    return noiser


def register_flip_noiser(probability: float, random_state=None):
    """Legion-style register-emptiness flip (cascading_legions.py:145-154,
    liquid_legions.py:198-202): flip each register's 0/1 state w.p. p."""
    rs = random_state or np.random.RandomState()

    def noiser(registers: np.ndarray) -> np.ndarray:
        return flip_bits(registers, probability, probability, rs)

    return noiser
