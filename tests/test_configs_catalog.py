"""The named estimator catalog: coverage of the reference's archived
smoke-test list and executability of every config family through the
Simulator (local engine, tiny scenario)."""

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
    get_estimator_configs,
    get_evaluation_config,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
    Simulator,
)
from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
)

ARCHIVE_SMOKE_LIST = [
    # /root/reference/results/2020-07-16-00-00/results/smoke_test/* dirs
    "exp_bloom_filter-1e5_10-infty-first_moment_exp",
    "exp_bloom_filter-1e5_10-ln3-first_moment_exp",
    "log_bloom_filter-1e5-infty-first_moment_log",
    "log_bloom_filter-1e5-ln3-first_moment_log",
    "vector_of_counts-4096-infty-sequential",
    "vector_of_counts-4096-ln3-sequential",
]


def test_catalog_covers_reference_archive_list():
    names = {c.name for c in get_estimator_configs(None)}
    for n in ARCHIVE_SMOKE_LIST:
        assert n in names
    # breadth: length variants, meta-VoC, SKA noised, counting, global-DP
    for n in ("exp_bloom_filter-1e4_10-infty-first_moment_exp",
              "exp_bloom_filter-1e6_10-ln3-first_moment_exp",
              "geo_bloom_filter-2.5e5-ln3-first_moment_geo",
              "meta_voc-4096-exp_bloom_filter-1e5_10",
              "meta_voc-1024-bloom_filter-5e6",
              "same_key_aggregator-1e5_10-global_ln3",
              "exp_counting_bloom_filter-1e5_10-first_moment_exp",
              "reach_using_voc-4096-independent_estimator",
              "exp_bloom_filter-1e5_10-infty-global_ln3_geometric-first_moment_exp",
              "hll-p14-ertl"):
        assert n in names, n
    assert len(names) >= 50


def test_evaluation_registry_names():
    for name in ("smoke_test", "frequency_smoke", "reference_smoke_test",
                 "bow_sweep", "subset_orders", "frequency_end_to_end"):
        cfg = get_evaluation_config(name, num_runs=1)
        assert cfg.scenarios
    with pytest.raises(KeyError):
        get_evaluation_config("nope")


@pytest.mark.parametrize("cfg_name", [
    "meta_voc-1024-exp_bloom_filter-1e5_10",
    "same_key_aggregator-1e4_10-global_ln3",
    "exp_counting_bloom_filter-1e5_10-first_moment_exp",
    "reach_using_voc-4096-independent_estimator",
    "exp_bloom_filter-1e4_10-ln3-first_moment_exp",
    "geo_bloom_filter-1e4-infty-first_moment_geo",
    "exp_bloom_filter-1e5_10-infty-global_ln3_geometric-first_moment_exp",
    "hll-p14-ertl",
])
def test_new_config_families_execute(cfg_name):
    (cfg,) = get_estimator_configs([cfg_name])
    scenario = TokensTableSpec(num_sources=3, rows_per_source=100, min_tok=8,
                               max_tok=32, universe_size=20_000, seed=13)
    sim = Simulator(num_runs=1, scenario=scenario, config=cfg,
                    sketch_random_state=np.random.RandomState(3),
                    engine="local")
    df, _ = sim.run_all_and_aggregate()
    assert len(df) == 3
    assert np.isfinite(df["estimated_cardinality_1"]).all()
    # sane magnitude: within 3x of truth for every prefix union
    ratio = df["estimated_cardinality_1"] / df["true_cardinality_1"]
    assert ((ratio > 0.33) & (ratio < 3.0)).all(), ratio.tolist()


def test_complete_test_with_selected_parameters_grid():
    """65 scenarios mirroring evaluation_configs.py:670-737: 12 independent/
    remarketing + 12 bow + 2 fully-overlapped + 3 subset + 36 seq-correlated."""
    from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
        complete_test_with_selected_parameters,
    )

    cfg = complete_test_with_selected_parameters(num_runs=1,
                                                 universe_size=20_000)
    assert len(cfg.scenarios) == 65
    names = [s.name for s in cfg.scenarios]
    assert len(set(names)) == 65  # unique
    assert sum(n.startswith("independent") for n in names) == 6
    assert sum(n.startswith("remarketing") for n in names) == 6
    assert sum(n.startswith("exponential_bow") for n in names) == 12
    assert sum(n.startswith("fully_overlapped") for n in names) == 2
    assert sum(n.startswith("subset") for n in names) == 3
    assert sum(n.startswith("sequentially_correlated_all") for n in names) == 18
    assert sum(n.startswith("sequentially_correlated_one") for n in names) == 18

    # a bow cell and a gradually-smaller seq cell run end-to-end (local)
    from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
        get_estimator_configs,
    )
    from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
        Simulator,
    )

    (est,) = get_estimator_configs(["exact"])
    for pick in ("exponential_bow-user_activity_association:identical",
                 "sequentially_correlated_one"):
        scen = next(s for s in cfg.scenarios if s.name.startswith(pick))
        sim = Simulator(num_runs=1, scenario=scen.spec, config=est,
                        sketch_random_state=np.random.RandomState(2),
                        engine="local")
        df, _ = sim.run_all_and_aggregate()
        assert (df.estimated_cardinality_1 == df.true_cardinality_1).all()


# ---------------------------------------------------------------------------
# full reference-name catalog (pipelines/catalog.py)
# ---------------------------------------------------------------------------

def test_full_catalog_reference_names():
    """Every name family the reference's catalog generators emit
    (_generate_cardinality/_frequency_estimator_configs,
    evaluation_configs.py:1351-1427 + 1687-1727) resolves by exact name."""
    from cardinality_estimation_evaluation_framework_ray.pipelines.catalog import (
        generate_cardinality_estimator_configs,
        generate_frequency_estimator_configs,
    )

    card = generate_cardinality_estimator_configs()
    freq = generate_frequency_estimator_configs(max_frequency=5)

    # exact reference-format names, one per family/branch
    for n in (
        "exp_bloom_filter-100000_10-first_moment_exp-no_local_dp-no_global_dp",
        "exp_bloom_filter-250000_10-first_moment_exp-local_dp_0.1099-global_dp_1.0986",
        "log_bloom_filter-100000-first_moment_log-local_dp_1.0986-no_global_dp",
        "geo_bloom_filter-250000_0.000008-first_moment_geo-local_dp_0.2747-no_global_dp",
        # budget-split (geometric + gaussian), 4-dec eps and 7-dec delta
        "exp_bloom_filter-100000_10-first_moment_exp-no_local_dp-"
        "global_dp_1.0986,0.0000100-gaussian_noise-budget_split-100",
        "exp_bloom_filter-250000_10-first_moment_exp-no_local_dp-"
        "global_dp_1.0986,0.0000010-geometric_noise-budget_split-1000000",
        # global-DP limit test, 8-decimal epsilon
        "exp_bloom_filter-100000_10-first_moment_exp-no_local_dp-global_dp_0.00010986",
        "vector_of_counts-4096-sequential-local_dp_0.2747-global_dp_1.0986",
        "reach_using_voc-1-independent_estimator_universe1000000-"
        "local_dp_1.0986-no_global_dp",
        "hyper_log_log_plus-16384-hll_cardinality-no_local_dp-no_global_dp",
        "exp_bloom_filter-250000_10-meta_voc_4096-local_dp_1.0986-no_global_dp",
        "bloom_filter-5000000-meta_voc_1024-no_local_dp-no_global_dp",
        "bloom_filter-5000000_hash1-union_estimator-local_dp_1.0986-no_global_dp",
        "liquid_legions-1e5_10-ln3-sequential",
        "cascading_legions-32_10000-infty-estimator",
    ):
        assert n in card, n

    for n in (
        "stratified_sketch_vector_of_counts-1024-sequential_clip-"
        "local_dp_1.0986-no_global_dp-5",
        "stratified_sketch_vector_of_counts-4096-sequential_no_clip-"
        "no_local_dp-no_global_dp-5",
        "stratified_sketch_exp_adbf-100000_10-first_moment_estimator_exp_"
        "bayesian-local_dp_0.2747-global_dp_1.0986-5",
        "stratified_sketch_exp_adbf-250000_10-first_moment_estimator_exp_"
        "expectation-no_local_dp-no_global_dp-5",
        "stratified_sketch_geo_adbf-100000_0.000020-first_moment_estimator_"
        "geo_expectation-local_dp_1.0986-no_global_dp-5",
        "exact_multi_set-10000-lossless-no_local_dp-no_global_dp-5",
        "exp_same_key_aggregator-100000_10-standardized_histogram-"
        "no_local_dp-global_dp_1.0986-5",
    ):
        assert n in freq, n

    # family counts mirror the reference grids (after name dedup of the
    # no-noise budget-split rows)
    assert sum(1 for n in card if "budget_split" in n) == 2 * 3 * 27 * 2
    assert sum(1 for n in freq
               if n.startswith("stratified_sketch_vector_of_counts")) == 16
    assert sum(1 for n in freq
               if n.startswith("stratified_sketch_exp_adbf")) == 32
    assert sum(1 for n in freq
               if n.startswith("stratified_sketch_geo_adbf")) == 16
    assert len(freq) == 16 + 32 + 16 + 1 + 4

    # the merged registry resolves both short engine names and catalog names
    both = get_estimator_configs([
        "hll-p14",
        "exp_bloom_filter-100000_10-first_moment_exp-no_local_dp-no_global_dp",
        "stratified_sketch_vector_of_counts-1024-sequential_no_clip-"
        "no_local_dp-no_global_dp-5",
    ])
    assert len(both) == 3


@pytest.mark.parametrize("cfg_name", [
    "stratified_sketch_vector_of_counts-1024-sequential_no_clip-"
    "no_local_dp-no_global_dp-5",
    "stratified_sketch_exp_adbf-100000_10-first_moment_estimator_exp_"
    "expectation-no_local_dp-no_global_dp-5",
    "stratified_sketch_geo_adbf-100000_0.000020-first_moment_estimator_"
    "geo_expectation-no_local_dp-no_global_dp-5",
    "exp_same_key_aggregator-100000_10-standardized_histogram-"
    "no_local_dp-no_global_dp-5",
    "exact_multi_set-10000-lossless-no_local_dp-no_global_dp-5",
    "hyper_log_log_plus-16384-hll_cardinality-no_local_dp-no_global_dp",
    "bloom_filter-5000000_hash1-union_estimator-no_local_dp-no_global_dp",
    "liquid_legions-1e5_10-infty-sequential",
    "cascading_legions-32_10000-infty-estimator",
    "reach_using_voc-1-independent_estimator_universe1000000-"
    "no_local_dp-no_global_dp",
])
def test_catalog_noiseless_configs_accurate(cfg_name):
    """Noiseless catalog rows execute and land within 3x of truth on a small
    frequency scenario (the noised rows are DP-stress by design)."""
    from cardinality_estimation_evaluation_framework_ray.sources.set_generators import (
        SetScenarioSpec,
    )

    (cfg,) = get_estimator_configs([cfg_name])
    scen = SetScenarioSpec.make(
        "homogeneous", universe_size=20_000, set_sizes=[2_000] * 3,
        freq_rates=[1.0] * 3, freq_cap=5, tokens_per_row=16, seed=7)
    sim = Simulator(num_runs=1, scenario=scen, config=cfg,
                    sketch_random_state=np.random.RandomState(3),
                    engine="local")
    df, _ = sim.run_all_and_aggregate()
    assert len(df) == 3
    ratio = df["estimated_cardinality_1"] / df["true_cardinality_1"]
    assert ((ratio > 0.33) & (ratio < 3.0)).all(), ratio.tolist()


def test_stratified_noise_split_semantics():
    """StratifiedSketchNoiser mirrors stratified_sketch.py:144-150+207-222:
    split=0 -> 1+ is the union-merge of strata, full epsilon everywhere;
    split>0 -> 1+ from underlying, eps*split / eps*(1-split) budgets."""
    import numpy as np
    from cardinality_estimation_evaluation_framework_ray.state import (
        StratifiedSketchNoiser,
        StratifiedSpec,
        VocSketchOperator,
    )

    spec = StratifiedSpec(max_freq=3, cardinality_kind="voc",
                          cardinality_params=(("num_buckets", 64), ("seed", 1)))
    toks = np.repeat(np.arange(300), np.tile([1, 2, 3], 100))

    # split=0, no noise: 1+ union-merge equals the from-underlying VoC
    sk = spec.new()
    sk.update_tokens(toks)
    op = VocSketchOperator()
    StratifiedSketchNoiser(lambda e: (lambda s: s), epsilon=None,
                           epsilon_split=0, one_plus_union=op.union)(sk)
    ref = spec.new()
    ref.update_tokens(toks)
    ref.create_sketches()
    assert np.allclose(sk.sketches["1+"].stats, ref.sketches["1+"].stats)

    # split>0: the 1+ noiser gets eps*split, strata get eps*(1-split)
    seen = []
    noiser = StratifiedSketchNoiser(
        lambda e: seen.append(e) or (lambda s: s),
        epsilon=1.0, epsilon_split=0.25)
    sk2 = spec.new()
    sk2.update_tokens(toks)
    noiser(sk2)
    assert sorted(seen) == [0.25, 0.75]


def test_new_evaluations_registered():
    """complete_frequency_test (28 scenarios, evaluation_configs.py:634-667)
    and global_dp_stress_test (5 disjoint reach points, :738-755)."""
    cfg = get_evaluation_config("complete_frequency_test_with_selected_parameters",
                                num_runs=1, universe_size=2_000)
    names = [s.name for s in cfg.scenarios]
    assert len(names) == 28 and len(set(names)) == 28
    assert sum(n.startswith("homogeneous") for n in names) == 12
    assert sum(n.startswith("heterogeneous") for n in names) == 12
    assert sum(n.startswith("publisher_constant_frequency") for n in names) == 4

    stress = get_evaluation_config("global_dp_stress_test", num_runs=1,
                                   reach_list=(100, 1_000))
    assert [s.name for s in stress.scenarios] == ["0-reach:100", "1-reach:1000"]

    # one cell of each runs end-to-end with the exact estimator
    (est,) = get_estimator_configs(["exact"])
    for scen in (cfg.scenarios[0], stress.scenarios[0]):
        sim = Simulator(num_runs=1, scenario=scen.spec, config=est,
                        sketch_random_state=np.random.RandomState(2),
                        engine="local")
        df, _ = sim.run_all_and_aggregate()
        assert (df.estimated_cardinality_1 == df.true_cardinality_1).all()
