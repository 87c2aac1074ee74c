import numpy as np

from cardinality_estimation_evaluation_framework_ray.state import (
    HeavyHittersSpec,
)
from cardinality_estimation_evaluation_framework_ray.state.base import (
    merge_many,
)


def _exact_counts(stream):
    u, c = np.unique(stream, return_counts=True)
    return dict(zip(u.tolist(), c.tolist()))


def test_exact_below_capacity_and_partition_invariant():
    rng = np.random.RandomState(7)
    stream = rng.randint(0, 200, size=5000).astype(np.int64)  # 200 distinct
    spec = HeavyHittersSpec(capacity=256)

    whole = spec.new()
    whole.update_tokens(stream)
    assert whole.decremented == 0
    exact = _exact_counts(stream)
    assert dict(zip(whole.keys.tolist(), whole.counts.tolist())) == exact

    # split into partials, merge via the serialized path: identical
    blobs = []
    for part in np.array_split(stream, 13):
        s = spec.new()
        s.update_tokens(part)
        blobs.append(s.to_bytes())
    merged = merge_many(spec, blobs)
    assert merged.decremented == 0
    assert np.array_equal(merged.keys, whole.keys)
    assert np.array_equal(merged.counts, whole.counts)
    assert merged.n == len(stream)


def test_mg_guarantee_under_saturation():
    """With capacity far below distinct count: every estimate lies in
    [true - decremented, true]; every token with true frequency above the
    total decrement is tracked."""
    rng = np.random.RandomState(11)
    # zipf-ish: heavy head + long uniform tail, 5000 distinct
    head = np.repeat(np.arange(10, dtype=np.int64), 500)
    tail = rng.randint(10, 5000, size=8000).astype(np.int64)
    stream = np.concatenate([head, tail])
    rng.shuffle(stream)
    spec = HeavyHittersSpec(capacity=64)

    blobs = []
    for part in np.array_split(stream, 7):
        s = spec.new()
        s.update_tokens(part)
        blobs.append(s.to_bytes())
    sk = merge_many(spec, blobs)

    exact = _exact_counts(stream)
    assert 0 < sk.decremented <= len(stream) / (spec.capacity + 1) * 7
    est = sk.point_query(np.asarray(list(exact), dtype=np.int64))
    for (tok, true), e in zip(exact.items(), est.tolist()):
        assert true - sk.decremented <= e <= true
    # heavy head (500 each) far exceeds the decrement: all tracked, and
    # first in the deterministic top-k order
    keys, counts = sk.topk(10)
    assert set(keys.tolist()) == set(range(10))
    assert all(c >= 500 - sk.decremented for c in counts.tolist())


def test_topk_tiebreak_deterministic():
    spec = HeavyHittersSpec(capacity=16)
    sk = spec.new()
    sk.update_tokens(np.array([5, 3, 9, 3, 5, 9, 1], dtype=np.int64))
    keys, counts = sk.topk(3)
    # counts: 3,5,9 -> 2 each, 1 -> 1; ties break by ascending key
    assert keys.tolist() == [3, 5, 9]
    assert counts.tolist() == [2, 2, 2]


def test_fold_exact_above_float53():
    """Merged counts above 2^53 stay integer-exact (int64 scatter-add,
    not float64 bincount weights)."""
    from cardinality_estimation_evaluation_framework_ray.state.heavyhitters import (
        HeavyHittersSpec,
    )

    spec = HeavyHittersSpec(capacity=8)
    a = spec.new()
    b = spec.new()
    big = (1 << 53) + 1  # not representable in float64
    a.keys = np.array([5, 9], dtype=np.int64)
    a.counts = np.array([big, 3], dtype=np.int64)
    b.keys = np.array([5], dtype=np.int64)
    b.counts = np.array([big, ], dtype=np.int64)
    a.merge_in(b)
    got = dict(zip(a.keys.tolist(), a.counts.tolist()))
    assert got[5] == 2 * big  # float64 path would round to 2^54
    assert got[9] == 3
