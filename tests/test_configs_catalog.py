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
