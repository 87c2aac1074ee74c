import numpy as np

from cardinality_estimation_evaluation_framework_ray.state import (
    ExactSetOperator,
    StratifiedPairwiseEstimator,
    StratifiedSequentialEstimator,
    StratifiedSpec,
)


def _exact_card(sketch_list):
    return [sketch_list[0].cardinality()]


def _fill(spec, tokens):
    s = spec.new()
    s.update_tokens(np.asarray(tokens, dtype=np.int64))
    return s


def test_strata_construction():
    spec = StratifiedSpec(max_freq=3)
    # 10 tokens x1, 5 x2, 4 x5 (clipped to 3+)
    toks = np.concatenate([np.arange(10), np.tile(np.arange(100, 105), 2),
                           np.tile(np.arange(200, 204), 5)])
    s = _fill(spec, toks)
    s.create_sketches()
    assert s.sketches[1].cardinality() == 10
    assert s.sketches[2].cardinality() == 5
    assert s.sketches["3+"].cardinality() == 4
    assert s.sketches["1+"].cardinality() == 19


def test_estimate_single():
    spec = StratifiedSpec(max_freq=3)
    toks = np.concatenate([np.arange(10), np.tile(np.arange(100, 105), 2)])
    s = _fill(spec, toks)
    assert s.estimate() == [15.0, 5.0, 0.0]


def test_pairwise_merge_vs_truth():
    spec = StratifiedSpec(max_freq=3)
    # A: tokens 0..9 once each; B: tokens 5..14 once each
    a = _fill(spec, np.arange(10))
    b = _fill(spec, np.arange(5, 15))
    est = StratifiedPairwiseEstimator(ExactSetOperator, _exact_card)(a, b)
    # union: 15 tokens; 5..9 have freq 2
    assert est == [15.0, 5.0, 0.0]


def test_sequential_three_way():
    spec = StratifiedSpec(max_freq=3)
    a = _fill(spec, np.arange(10))          # 0..9
    b = _fill(spec, np.arange(5, 15))       # 5..14
    c = _fill(spec, np.arange(8, 12))       # 8..11
    est = StratifiedSequentialEstimator(ExactSetOperator, _exact_card)([a, b, c])
    # truth: freqs over union 0..14: 0-4:1, 5-7:2, 8-9:3, 10-11:2, 12-14:1
    # 1+: 15, 2+: 7, 3+: 2
    assert est == [15.0, 7.0, 2.0]


def test_exact_set_operator():
    from cardinality_estimation_evaluation_framework_ray.state import (
        ExactMultiSetSpec,
    )

    a = ExactMultiSetSpec().new(); a.update_tokens(np.array([1, 1, 2, 3]))
    b = ExactMultiSetSpec().new(); b.update_tokens(np.array([2, 4]))
    assert sorted(ExactSetOperator.union(a, b).tokens.tolist()) == [1, 2, 3, 4]
    assert ExactSetOperator.intersection(a, b).tokens.tolist() == [2]
    assert sorted(ExactSetOperator.difference(a, b).tokens.tolist()) == [1, 3]
    # frequencies reset to 1 (stratified_sketch.py:43)
    assert ExactSetOperator.union(a, b).counts.tolist() == [1, 1, 1, 1]
