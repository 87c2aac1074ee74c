import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import (
    CascadingLegionsEstimator,
    CascadingLegionsSpec,
    LiquidLegionsEstimator,
    LiquidLegionsSpec,
    LiquidSequentialEstimator,
    VennEstimator,
)
from cardinality_estimation_evaluation_framework_ray.state.legions import (
    UNIQUE_COLLIDED,
    unique_key_batch,
    unique_key_combine,
)


def _fill(spec, tokens):
    s = spec.new()
    s.update_tokens(np.asarray(tokens, dtype=np.int64))
    return s


def test_unique_key_batch_and_combine():
    idx = np.array([0, 0, 1, 2, 2])
    keys = np.array([5, 5, 7, 3, 9])
    out = unique_key_batch(idx, keys, 4)
    assert out.tolist() == [5, 7, UNIQUE_COLLIDED, 0]
    other = np.array([5, 8, 0, 4])
    combined = unique_key_combine(out, other)
    assert combined.tolist() == [5, UNIQUE_COLLIDED, UNIQUE_COLLIDED, 4]


def test_cascading_cardinality_accuracy():
    spec = CascadingLegionsSpec(l=24, m=5000, seed=1)
    n = 50_000
    s = _fill(spec, np.random.RandomState(0).randint(0, 2**60, n))
    est = s.get_cardinality()
    assert abs(est - n) / n < 0.1


def test_cascading_merge_matches_concat():
    spec = CascadingLegionsSpec(l=16, m=1000, seed=2)
    rs = np.random.RandomState(1)
    x, y = rs.randint(0, 2**50, 5000), rs.randint(0, 2**50, 5000)
    a, b = _fill(spec, x), _fill(spec, y)
    a.merge_in(b)
    whole = _fill(spec, np.concatenate([x, y]))
    assert np.array_equal(a.counts, whole.counts)
    assert np.array_equal(a.unique, whole.unique)


def test_cascading_noised_estimator():
    spec = CascadingLegionsSpec(l=24, m=5000, seed=3)
    n = 30_000
    pool = np.random.RandomState(2).randint(0, 2**60, n)
    sketches = [_fill(spec, pool[:20_000]), _fill(spec, pool[10_000:])]
    p = 0.1
    rs = np.random.RandomState(5)  # one stream: flips must be INDEPENDENT
    for s in sketches:
        s.add_dp_noise(p, rs)
    est = CascadingLegionsEstimator()(sketches)[0]
    assert abs(est - n) / n < 0.25


def test_liquid_cardinality_and_frequency():
    spec = LiquidLegionsSpec(a=10.0, m=20_000, seed=4)
    n = 30_000
    toks = np.tile(np.random.RandomState(3).randint(0, 2**60, n), 2)  # freq 2
    s = _fill(spec, toks)
    est = s.get_cardinality()
    assert abs(est - n) / n < 0.1
    hist = s.frequency_histogram()
    assert hist.get(2, 0) > 0.8  # unique registers overwhelmingly show freq 2


def test_liquid_merge_and_estimator():
    spec = LiquidLegionsSpec(a=10.0, m=20_000, seed=5)
    rs = np.random.RandomState(4)
    pool = rs.randint(0, 2**60, 30_000)
    a, b = _fill(spec, pool[:20_000]), _fill(spec, pool[10_000:])
    merged = spec.new()
    merged.merge_in(a)
    merged.merge_in(b)
    est = merged.get_cardinality()
    assert abs(est - 30_000) / 30_000 < 0.1
    est2 = LiquidLegionsEstimator()([a, b])[0]
    assert abs(est2 - 30_000) / 30_000 < 0.1


def test_liquid_noised_estimator():
    spec = LiquidLegionsSpec(a=10.0, m=20_000, seed=6)
    pool = np.random.RandomState(5).randint(0, 2**60, 30_000)
    a, b = _fill(spec, pool[:20_000]), _fill(spec, pool[10_000:])
    rs = np.random.RandomState(6)  # independent flips across sketches
    for s in (a, b):
        s.add_dp_noise(0.05, rs)
    est = LiquidLegionsEstimator()([a, b])[0]
    assert abs(est - 30_000) / 30_000 < 0.3


def test_venn_estimator_two_sets():
    spec = LiquidLegionsSpec(a=10.0, m=50_000, seed=7)
    pool = np.random.RandomState(6).randint(0, 2**60, 30_000)
    a = _fill(spec, pool[:20_000])     # |A|=20k
    b = _fill(spec, pool[10_000:])     # |B|=20k, overlap 10k
    venn = VennEstimator([a, b])()
    assert abs(venn[1] - 10_000) / 10_000 < 0.25  # A - B
    assert abs(venn[2] - 10_000) / 10_000 < 0.25  # B - A
    assert abs(venn[3] - 10_000) / 10_000 < 0.25  # A & B


def test_liquid_sequential_sampler_estimator():
    spec = LiquidLegionsSpec(a=10.0, m=20_000, seed=8)
    pool = np.random.RandomState(7).randint(0, 2**60, 30_000)
    sketches = [_fill(spec, pool[:20_000]), _fill(spec, pool[10_000:])]
    est = LiquidSequentialEstimator(np.random.RandomState(8))(sketches)[0]
    assert abs(est - 30_000) / 30_000 < 0.15
