"""Faithful-port tests mirroring the reference's generator assertions
(src/simulations/tests/set_generator_test.py overlap/size checks and
frequency_set_generator_test.py frequency checks)."""

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.sources.set_generators import (
    SetScenarioSpec,
    disjoint_sets,
    exponential_bow_sets,
    fully_overlap_sets,
    heterogeneous_multisets,
    homogeneous_multisets,
    homogeneous_pmf_multisets,
    independent_sets,
    publisher_constant_frequency_sets,
    sequentially_correlated_sets,
    subset_sets,
    truncated_poisson_pmf,
)


def _rel_err(x, truth):
    return (x - truth) / truth


def test_independent_sets_sizes_and_universe():
    rs = np.random.RandomState(1)
    sets = independent_sets(10_000, [1000] * 5, rs)
    assert len(sets) == 5
    for s in sets:
        assert len(s) == len(np.unique(s)) == 1000
        assert s.min() >= 0 and s.max() < 10_000


# set_generator_test.py:201-241 — bow actual size close to input size
def test_exponential_bow_low_and_high_reach_sizes():
    rs = np.random.RandomState(1)
    for sizes, tol in ([600, 800, 1000], 0.01), ([4000, 5000, 6000], 0.2):
        sets = exponential_bow_sets("independent", 10_000, sizes, rs)
        for s, expect in zip(sets, sizes):
            assert abs(_rel_err(len(s), expect)) < tol


def test_exponential_bow_identical_vs_independent_activity():
    """user_activity_association drives cross-set overlap: identical activity
    concentrates every set on the same heavy users, so the overlap must be
    well above the independent-association overlap (set_generator.py:110-144)."""
    rs = np.random.RandomState(7)
    ident = exponential_bow_sets("identical", 20_000, [2000, 2000], rs)
    indep = exponential_bow_sets("independent", 20_000, [2000, 2000], rs)
    ov_ident = len(np.intersect1d(ident[0], ident[1]))
    ov_indep = len(np.intersect1d(indep[0], indep[1]))
    assert ov_ident > 1.5 * ov_indep
    # independent overlap ~ hypergeometric expectation n1*n2/U (within 4x)
    expect = len(indep[0]) * len(indep[1]) / 20_000
    assert 0.25 * expect < ov_indep < 4 * expect


def test_exponential_bow_raises():
    rs = np.random.RandomState(1)
    with pytest.raises(ValueError):
        exponential_bow_sets(0.5, 10_000, [1000] * 3, rs)  # bad association
    with pytest.raises(ValueError):
        exponential_bow_sets("independent", 10_000, [10] * 3, rs)  # too small


def test_fully_overlap_same_ids():
    rs = np.random.RandomState(1)
    sets = fully_overlap_sets(10_000, 4, 500, rs)
    base = set(sets[0])
    assert all(set(s) == base and len(s) == 500 for s in sets)


# set_generator_test.py:282-356 — subset order variants
@pytest.mark.parametrize("order", ["original", "reversed", "random"])
def test_subset_order_variants(order):
    rs = np.random.RandomState(3)
    sets = subset_sets(order, 10_000, num_large_sets=2, num_small_sets=3,
                       large_set_size=400, small_set_size=40, random_state=rs)
    assert len(sets) == 5
    sizes = [len(s) for s in sets]
    assert sorted(sizes) == [40, 40, 40, 400, 400]
    if order == "original":
        assert sizes == [400, 400, 40, 40, 40]
    elif order == "reversed":
        assert sizes == [40, 40, 40, 400, 400]
    large = next(s for s in sets if len(s) == 400)
    small = next(s for s in sets if len(s) == 40)
    assert set(small) <= set(large)  # subset containment
    # all larges identical, all smalls identical
    for s in sets:
        assert set(s) == (set(large) if len(s) == 400 else set(small))


# set_generator_test.py:365-401 — all-previous: overlap with union EXACT
def test_seq_correlated_all_previous_exact_overlap():
    rs = np.random.RandomState(1)
    sets = sequentially_correlated_sets("original", "all", 0.2,
                                        [10, 15, 20, 20], rs)
    expected_overlap = iter([3, 4, 4])
    union = set(sets[0])
    for s in sets[1:]:
        assert len(union.intersection(s)) == next(expected_overlap)
        union.update(s)


def test_seq_correlated_all_previous_reversed():
    rs = np.random.RandomState(1)
    sets = sequentially_correlated_sets("reversed", "all", 0.2, [10] * 3, rs)
    sets = sets[::-1]
    union = set(sets[0])
    for s in sets[1:]:
        assert len(union.intersection(s)) == 2
        union.update(s)


# set_generator_test.py:402-429 — one-previous: overlap ONLY with previous
def test_seq_correlated_one_previous_exact_overlap():
    rs = np.random.RandomState(1)
    sets = sequentially_correlated_sets("original", "one", 0.2, [10] * 3, rs)
    prev, union = set(sets[0]), set(sets[0])
    for s in sets[1:]:
        assert len(prev.intersection(s)) == 2
        assert len(union.intersection(s)) == 2  # no deeper overlap
        prev = set(s)
        union.update(s)


# set_generator_test.py:444-460 — overlap capped by available ids
@pytest.mark.parametrize("correlated", ["all", "one"])
def test_seq_correlated_overlap_size_not_enough(correlated):
    rs = np.random.RandomState(1)
    sets = sequentially_correlated_sets("original", correlated, 0.5, [1, 10], rs)
    assert len(sets[0]) == 1 and len(sets[1]) == 10
    assert len(np.intersect1d(sets[0], sets[1])) == 1


def test_seq_correlated_raises():
    rs = np.random.RandomState(1)
    with pytest.raises(ValueError):
        sequentially_correlated_sets("not_implemented", "all", 0.2, [10] * 3, rs)
    with pytest.raises(ValueError):
        sequentially_correlated_sets("random", "not_implemented", 0.2, [10] * 3, rs)


def test_disjoint_sets_deterministic():
    sets = disjoint_sets([3, 4])
    assert list(sets[0]) == [0, 1, 2]
    assert list(sets[1]) == [3, 4, 5, 6]


# frequency_set_generator_test.py:32-73
def test_homogeneous_pmf_multisets_exact_pmf():
    rs = np.random.RandomState(2)
    # pmf [0,1]: every id exactly twice
    (ms,) = homogeneous_pmf_multisets(1000, [50], [[0.0, 1.0]], rs)
    ids, counts = np.unique(ms, return_counts=True)
    assert len(ids) == 50 and (counts == 2).all()


def test_truncated_poisson_pmf_matches_reference_shape():
    pmf = truncated_poisson_pmf(1.0, 5)
    assert len(pmf) == 5
    assert np.isclose(sum(pmf), 1.0)
    # f(0)=e^-1, f(1)=e^-1, f(2)=e^-1/2 ...
    assert np.isclose(pmf[0], np.exp(-1))
    assert np.isclose(pmf[1], np.exp(-1))
    assert np.isclose(pmf[2], np.exp(-1) / 2)


def test_homogeneous_multisets_freq_cap():
    rs = np.random.RandomState(2)
    (ms,) = homogeneous_multisets(10_000, [500], [3.0], rs, freq_cap=4)
    ids, counts = np.unique(ms, return_counts=True)
    assert len(ids) == 500
    assert counts.min() >= 1 and counts.max() <= 4
    # shifted-Poisson(3) truncated at 4: mean well above 1
    assert counts.mean() > 2.0


def test_heterogeneous_multisets_gamma_poisson():
    rs = np.random.RandomState(2)
    (ms,) = heterogeneous_multisets(10_000, [800], [(1.0, 1.0)], rs, freq_cap=10)
    ids, counts = np.unique(ms, return_counts=True)
    assert len(ids) == 800
    assert counts.min() >= 1 and counts.max() <= 10
    # Gamma(1,1)-Poisson + 1 => mean ~ 2, variance > homogeneous Poisson(1)
    assert 1.5 < counts.mean() < 2.5
    assert counts.var() > 1.0


def test_publisher_constant_frequency():
    rs = np.random.RandomState(2)
    (ms,) = publisher_constant_frequency_sets(10_000, [300], 3, rs)
    ids, counts = np.unique(ms, return_counts=True)
    assert len(ids) == 300 and (counts == 3).all()


# ---------------------------------------------------------------------------
# SetScenarioSpec plumbing
# ---------------------------------------------------------------------------

def test_set_scenario_spec_table_roundtrip():
    spec = SetScenarioSpec.make("sequentially_correlated", order="original",
                                correlated_sets="all", shared_prop=0.5,
                                set_sizes=[200] * 4, seed=11, tokens_per_row=32)
    tbl = spec.make_table()
    assert [f.name for f in tbl.schema] == ["doc_id", "tokens", "n_tok", "source"]
    sets = spec.make_sets()
    # per-source token multiset == generated set, order preserved by src name
    import collections

    per_src = collections.defaultdict(list)
    for s, t in zip(tbl.column("source").to_pylist(),
                    tbl.column("tokens").to_pylist()):
        per_src[s].extend(t)
    assert sorted(per_src) == [f"src{i:02d}" for i in range(4)]
    for i, ids in enumerate(sets):
        assert sorted(per_src[f"src{i:02d}"]) == sorted(ids.tolist())


def test_set_scenario_spec_seed_replace():
    import dataclasses

    spec = SetScenarioSpec.make("independent", universe_size=1000,
                                set_sizes=[100] * 2, seed=5)
    spec2 = dataclasses.replace(spec, seed=6)
    a = spec.make_sets()
    b = spec2.make_sets()
    assert not np.array_equal(a[0], b[0])  # seed drives the draw
    assert np.array_equal(a[0], spec.make_sets()[0])  # deterministic


@pytest.mark.usefixtures("ray_session")
def test_simulator_with_faithful_scenario():
    """Prefix-union simulator over a faithful sequentially-correlated
    scenario: exact estimator must match truth exactly, and the overlap law
    must make unions smaller than the independent sum."""
    from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
        Simulator,
        SketchEstimatorConfig,
    )
    from cardinality_estimation_evaluation_framework_ray.state import (
        ExactMultiSetSpec,
    )

    spec = SetScenarioSpec.make("sequentially_correlated", order="original",
                                correlated_sets="all", shared_prop=0.5,
                                set_sizes=[400] * 4, seed=21)
    sim = Simulator(num_runs=1, scenario=spec,
                    config=SketchEstimatorConfig(name="exact",
                                                 spec=ExactMultiSetSpec()),
                    sketch_random_state=np.random.RandomState(5),
                    engine="local")
    df, _ = sim.run_all_and_aggregate()
    est = df["estimated_cardinality_1"].to_numpy()
    truth = df["true_cardinality_1"].to_numpy()
    assert (est == truth).all()
    # shared_prop=0.5: each new set adds ~half fresh ids
    assert truth[0] == 400
    assert truth[3] == 400 + 3 * 200


def test_subset_order_changes_sequential_voc_estimate():
    """Order variants exist because sequential (fold) estimators are
    order-DEPENDENT: the same subset scenario in original vs reversed order
    gives a different VoC sequential union estimate, while an associative
    sketch (exact set) is order-invariant (reference motivation for
    SubSetGenerator's order parameter, set_generator.py:245-255)."""
    from cardinality_estimation_evaluation_framework_ray.state import (
        ExactMultiSetSpec,
        VocSpec,
    )
    from cardinality_estimation_evaluation_framework_ray.state.voc import (
        SequentialEstimator,
    )

    ests, exacts = {}, {}
    for order in ("original", "reversed"):
        rs = np.random.RandomState(9)  # same draws per order
        sets = subset_sets(order, 50_000, num_large_sets=2, num_small_sets=2,
                           large_set_size=4000, small_set_size=400,
                           random_state=rs)
        sketches = []
        truth = ExactMultiSetSpec().new()
        for ids in sets:
            v = VocSpec(num_buckets=256, seed=3).new()
            v.update_tokens(np.unique(np.asarray(ids, dtype=np.int64)))
            sketches.append(v)
            truth.update_tokens(np.asarray(ids, dtype=np.int64))
        ests[order] = SequentialEstimator()(sketches)[0]
        exacts[order] = truth.estimate()[0]
    # truth is order-invariant; the sequential VoC fold is not
    assert exacts["original"] == exacts["reversed"] == 4000
    assert ests["original"] != ests["reversed"]
    for v in ests.values():  # both still in the ballpark of the union
        assert 0.5 * 4000 < v < 2.0 * 4000
