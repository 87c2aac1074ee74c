import numpy as np

from cardinality_estimation_evaluation_framework_ray.state import CountMinSpec
from cardinality_estimation_evaluation_framework_ray.state.base import Sketch


def test_never_underestimates_and_bound():
    spec = CountMinSpec(depth=5, width=4096, seed=1)
    rs = np.random.RandomState(0)
    # zipf-ish stream over 10k distinct tokens
    toks = rs.zipf(1.3, size=200_000) % 10_000
    s = spec.new()
    s.update_tokens(toks)
    uniq, true_counts = np.unique(toks, return_counts=True)
    est = s.point_query(uniq)
    assert np.all(est >= true_counts)  # CM never underestimates
    overshoot = est - true_counts
    n = len(toks)
    # eps*N bound w.p. 1-delta; allow the tiny delta tail
    assert (overshoot <= spec.epsilon() * n).mean() > 1 - 2 * spec.delta()


def test_merge_matches_concat():
    spec = CountMinSpec(depth=4, width=1024, seed=2)
    rs = np.random.RandomState(1)
    x, y = rs.randint(0, 5000, 50_000), rs.randint(0, 5000, 50_000)
    a = spec.new(); a.update_tokens(x)
    b = spec.new(); b.update_tokens(y)
    a.merge_in(b)
    whole = spec.new(); whole.update_tokens(np.concatenate([x, y]))
    assert np.array_equal(a.counts, whole.counts)
    assert a.total == whole.total == 100_000


def test_exact_when_no_collisions():
    spec = CountMinSpec(depth=5, width=1 << 20, seed=3)
    s = spec.new()
    s.update_tokens(np.array([7, 7, 7, 9]))
    assert s.point_query(np.array([7, 9, 11])).tolist() == [3, 1, 0]


def test_serialization():
    spec = CountMinSpec(depth=3, width=256, seed=4)
    s = spec.new()
    s.update_tokens(np.arange(1000))
    back = Sketch.from_bytes(spec, s.to_bytes())
    assert np.array_equal(back.counts, s.counts)
    assert back.total == s.total


def test_conservative_update_tighter_and_never_underestimates():
    """CU (Estan-Varghese 2002): point queries never underestimate and are
    no looser than plain CM on a skewed stream; sum-merge of disjoint CU
    partials preserves the guarantee."""
    import numpy as np

    from cardinality_estimation_evaluation_framework_ray.state import CountMinSpec

    rng = np.random.default_rng(3)
    stream = rng.zipf(1.3, 200_000)
    stream = stream[stream < 50_000].astype(np.int64)
    uniq, truth = np.unique(stream, return_counts=True)

    plain = CountMinSpec(depth=4, width=2048, seed=5).new()
    cu_spec = CountMinSpec(depth=4, width=2048, seed=5, conservative=True)
    cu = cu_spec.new()
    plain.update_tokens(stream)
    cu.update_tokens(stream)

    q_plain = plain.point_query(uniq)
    q_cu = cu.point_query(uniq)
    assert (q_cu >= truth).all()          # never underestimate
    assert (q_cu <= q_plain).all()        # CU is pointwise no looser
    assert q_cu.sum() < q_plain.sum()     # and strictly tighter in aggregate

    # merged disjoint partials keep the guarantee
    a, b = cu_spec.new(), cu_spec.new()
    a.update_tokens(stream[: len(stream) // 2])
    b.update_tokens(stream[len(stream) // 2:])
    a.merge_in(b)
    assert (a.point_query(uniq) >= truth).all()
