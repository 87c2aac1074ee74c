import numpy as np

from cardinality_estimation_evaluation_framework_ray.functions.randkit import (
    choice_fast,
)
from cardinality_estimation_evaluation_framework_ray.state import (
    VocPairwiseEstimator,
    VocSequentialEstimator,
    VocSpec,
    laplace_noise_voc,
)


def _fill(spec, tokens):
    s = spec.new()
    s.update_tokens(np.unique(np.asarray(tokens)))  # one-shot dedup contract
    return s


def test_cardinality_exact_when_deduped():
    spec = VocSpec(num_buckets=4096, seed=1)
    s = _fill(spec, np.arange(10_000))
    assert s.cardinality() == 10_000


def test_disjoint_partition_merge_is_lossless():
    spec = VocSpec(num_buckets=2048, seed=2)
    a = _fill(spec, np.arange(0, 5000))
    b = _fill(spec, np.arange(5000, 9000))
    a.merge_in(b)
    whole = _fill(spec, np.arange(9000))
    assert np.array_equal(a.stats, whole.stats)


def test_pairwise_union_overlap():
    # dot-product intersection estimate (vector_of_counts.py:175-203)
    spec = VocSpec(num_buckets=8192, seed=3)
    rs = np.random.RandomState(0)
    pool = choice_fast(2**40, 30_000, rs)  # O(m) sampling w/o replacement
    a = _fill(spec, pool[:20_000])
    b = _fill(spec, pool[10_000:])
    est = VocPairwiseEstimator()([a, b])[0]
    assert abs(est - 30_000) / 30_000 < 0.1


def test_sequential_fold_three_sets():
    spec = VocSpec(num_buckets=8192, seed=4)
    rs = np.random.RandomState(1)
    pool = choice_fast(2**40, 45_000, rs)
    sketches = [
        _fill(spec, pool[:20_000]),
        _fill(spec, pool[10_000:30_000]),
        _fill(spec, pool[25_000:45_000]),
    ]
    est = VocSequentialEstimator()(sketches)[0]
    assert abs(est - 45_000) / 45_000 < 0.15


def test_laplace_noise_and_clip():
    spec = VocSpec(num_buckets=1024, seed=5)
    empty = spec.new()
    noised = laplace_noise_voc(empty, epsilon=float(np.log(3)),
                               random_state=np.random.RandomState(2))
    assert not np.array_equal(noised.stats, empty.stats)
    clipped = VocPairwiseEstimator(clip=True).clip_empty(noised)
    assert clipped.cardinality() == 0.0
