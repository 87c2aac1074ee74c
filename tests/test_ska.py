import numpy as np

from cardinality_estimation_evaluation_framework_ray.state import (
    BloomSpec,
    SkaSpec,
    StandardizedHistogramEstimator,
)


def _fill(spec, tokens):
    s = spec.new()
    s.update_tokens(np.asarray(tokens, dtype=np.int64))
    return s


def test_bits_match_exponential_bloom():
    # the reach component must be bit-identical to the exp-ADBF with same seed
    spec = SkaSpec(length=10_000, decay_rate=10.0, seed=3)
    toks = np.random.RandomState(0).randint(0, 2**31 - 2, 5000)
    ska = _fill(spec, toks)
    bf = _fill(spec.bloom_spec(), toks)
    assert np.array_equal(ska.bits, bf.registers)


def test_frequency_histogram_constant_freq():
    spec = SkaSpec(length=100_000, decay_rate=10.0, seed=1)
    n = 20_000
    toks = np.tile(np.random.RandomState(1).randint(0, 2**31 - 2, n), 3)  # freq 3
    ska = _fill(spec, toks)
    est = StandardizedHistogramEstimator(max_freq=5)([ska])
    # 1+ ~ n; 3+ ~ n; 4+ ~ 0
    assert abs(est[0] - n) / n < 0.1
    assert abs(est[2] - n) / n < 0.15
    assert est[3] / n < 0.05


def test_merge_associative_commutative():
    spec = SkaSpec(length=5000, decay_rate=10.0, seed=2)
    rs = np.random.RandomState(2)
    parts = [rs.randint(0, 2**31 - 2, 4000) for _ in range(3)]
    a, b, c = (_fill(spec, p) for p in parts)
    ab = _fill(spec, parts[0]); ab.merge_in(b)
    ba = _fill(spec, parts[1]); ba.merge_in(a)
    for attr in ("bits", "unique", "counts"):
        assert np.array_equal(getattr(ab, attr), getattr(ba, attr))
    abc = _fill(spec, parts[0]); abc.merge_in(b); abc.merge_in(c)
    whole = _fill(spec, np.concatenate(parts))
    for attr in ("bits", "unique", "counts"):
        assert np.array_equal(getattr(abc, attr), getattr(whole, attr))


def test_merged_histogram_two_sources():
    spec = SkaSpec(length=100_000, decay_rate=10.0, seed=4)
    rs = np.random.RandomState(3)
    pool = rs.randint(0, 2**31 - 2, 30_000)
    a = _fill(spec, pool[:20_000])
    b = _fill(spec, pool[10_000:])  # overlap 10k -> freq 2 for overlap
    est = StandardizedHistogramEstimator(max_freq=3)([a, b])
    assert abs(est[0] - 30_000) / 30_000 < 0.1   # 1+ union reach
    assert abs(est[1] - 10_000) / 10_000 < 0.35  # 2+ ~ overlap


def test_noised_histogram():
    from cardinality_estimation_evaluation_framework_ray.state.noise import (
        geometric_noiser,
    )

    spec = SkaSpec(length=100_000, decay_rate=10.0, seed=5)
    toks = np.random.RandomState(4).randint(0, 2**31 - 2, 20_000)
    ska = _fill(spec, toks)
    rs = np.random.RandomState(5)
    est = StandardizedHistogramEstimator(
        max_freq=3,
        reach_noiser=geometric_noiser(1.0, rs),
        frequency_noiser=geometric_noiser(0.5, rs))([ska])
    assert abs(est[0] - 20_000) / 20_000 < 0.1
