"""End-to-end interoperability: every registered estimator config runs
through the Simulator on a shared scenario (mirrors the reference's
tests/interoperability_test.py:53-474 strategy at num_runs=1)."""

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
    get_estimator_configs,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
    Simulator,
)
from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
)

SCENARIO = TokensTableSpec(num_sources=3, rows_per_source=200, min_tok=8,
                           max_tok=64, universe_size=100_000, seed=31)

# curated short-name registry only: the full reference-name catalog (~540
# configs, many deliberately DP-noise-dominated) has its own name-coverage
# and execution tests in test_configs_catalog.py
CONFIGS = {c.name: c for c in get_estimator_configs(include_catalog=False)}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_estimator_through_simulator(name):
    cfg = CONFIGS[name]
    sim = Simulator(num_runs=1, scenario=SCENARIO, config=cfg,
                    sketch_random_state=np.random.RandomState(13))
    df, df_agg = sim.run_all_and_aggregate()
    assert len(df) == 3  # one row per prefix union
    assert np.all(df.num_sets.values == [1, 2, 3])
    assert np.all(df.true_cardinality_1 > 0)
    assert np.all(df.estimated_cardinality_1 > 0)
    # un-noised estimators land within 20% on this easy scenario; DP-noised
    # ones only get a sanity band — the reference's own archive shows ln3
    # noise destroys tight estimability at small sketch lengths (accuracy of
    # the noised family is cross-validated against the archived
    # num_estimable_sets results instead, BASELINE.md)
    tol = 0.75 if ("ln3" in name or "global" in name) else 0.2
    assert np.all(np.abs(df.relative_error_1) < tol), df.relative_error_1
    assert len(df_agg) == 3
