import numpy as np

from cardinality_estimation_evaluation_framework_ray.state import (
    BloomSpec,
    FirstMomentEstimator,
    IndependentSetEstimator,
    MetaVectorOfCountsEstimator,
)
from cardinality_estimation_evaluation_framework_ray.state.exact import (
    ExactMultiSetSpec,
)


def test_independent_set_estimator_two_sets():
    # exact sketches + lossless single-sketch estimator
    a = ExactMultiSetSpec().new(); a.update_tokens(np.arange(1000))
    b = ExactMultiSetSpec().new(); b.update_tokens(np.arange(5000, 6000))
    est = IndependentSetEstimator(lambda sl: sl[0].estimate(), universe_size=10_000)
    hist = est([a, b])
    # expected union = 1000 + 1000 - 1000*1000/10000 = 1900
    assert abs(hist[0] - 1900) < 1e-6
    # expected overlap at freq 2: 100
    assert abs(hist[1] - 100) < 1e-6


def test_independent_set_estimator_empty():
    est = IndependentSetEstimator(lambda sl: sl[0].estimate(), 1000)
    assert est([]) == [0]


def test_meta_voc_estimator():
    spec = BloomSpec(length=100_000, distribution="exp", decay_rate=10.0, seed=9)
    rs = np.random.RandomState(0)
    pool = rs.randint(0, 2**60, 30_000)
    a = spec.new(); a.update_tokens(pool[:20_000])
    b = spec.new(); b.update_tokens(pool[10_000:])
    meta = MetaVectorOfCountsEstimator(
        num_buckets=8192, adbf_estimator=FirstMomentEstimator("exp"))
    est = meta([a, b])[0]
    assert abs(est - 30_000) / 30_000 < 0.15
