import numpy as np

from cardinality_estimation_evaluation_framework_ray.state import ExactMultiSetSpec


def test_histogram_reverse_cumsum():
    # tokens: 1 appears 3x, 2 appears 1x, 3 appears 2x
    s = ExactMultiSetSpec().new()
    s.update_tokens(np.array([1, 1, 1, 2, 3, 3]))
    # k+ histogram: 1+ -> 3 tokens, 2+ -> 2 tokens, 3+ -> 1 token
    assert s.estimate() == [3.0, 2.0, 1.0]
    assert s.cardinality() == 3
    assert s.frequency_of(1) == 3 and s.frequency_of(99) == 0


def test_incremental_equals_batch():
    rs = np.random.RandomState(0)
    toks = rs.randint(0, 500, size=10_000)
    a = ExactMultiSetSpec().new()
    for chunk in np.array_split(toks, 7):
        a.update_tokens(chunk)
    b = ExactMultiSetSpec().new()
    b.update_tokens(toks)
    assert np.array_equal(a.tokens, b.tokens)
    assert np.array_equal(a.counts, b.counts)


def test_merge_matches_concat():
    rs = np.random.RandomState(1)
    x, y = rs.randint(0, 300, 5000), rs.randint(0, 300, 5000)
    a = ExactMultiSetSpec().new(); a.update_tokens(x)
    b = ExactMultiSetSpec().new(); b.update_tokens(y)
    a.merge_in(b)
    c = ExactMultiSetSpec().new(); c.update_tokens(np.concatenate([x, y]))
    assert np.array_equal(a.counts, c.counts)


def test_max_freq_clip():
    s = ExactMultiSetSpec(max_freq=2).new()
    s.update_tokens(np.array([1, 1, 1, 2]))
    assert s.estimate() == [2.0, 1.0]


def test_empty():
    s = ExactMultiSetSpec().new()
    assert s.estimate() == [0.0]
    assert s.cardinality() == 0
