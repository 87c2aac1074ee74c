"""End-to-end FREQUENCY evaluation: scenarios with controlled repetition,
k+ histogram estimators, shuffle-distance criterion (the reference's
frequency_end_to_end half, analyzer.py:292-526 shape)."""

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.pipelines.analyzer import (
    analyze,
    get_num_estimable_sets_by_shuffle_distance,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
    frequency_smoke_evaluation,
    get_frequency_estimator_configs,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.evaluator import (
    Evaluator,
)


@pytest.mark.usefixtures("ray_session")
def test_frequency_evaluation_end_to_end(tmp_path):
    ev_cfg = frequency_smoke_evaluation(num_runs=2, rows_per_source=150)
    ev = Evaluator(ev_cfg, get_frequency_estimator_configs(),
                   str(tmp_path), global_seed=9, parallel_cells=True)
    summary = ev.run()
    assert len(summary) == 9  # 3 estimators x 3 scenarios

    result = analyze(str(tmp_path / "run" / "frequency_smoke"))
    assert len(result) == 9
    # the exact estimator is perfect on both criteria
    exact = result[result.sketch_estimator == "exact-freq"]
    assert np.all(exact.num_estimable_sets == 5)
    assert np.all(exact.num_estimable_sets_freq == 5)
    # sketch estimators pass the 20%/80% shuffle-distance criterion for the
    # full prefix on the constant-frequency scenarios
    for est in ("fll-p14-freq", "same_key_aggregator-1e5_10-freq"):
        rows = result[(result.sketch_estimator == est)
                      & result.scenario.str.startswith("freq_constant")]
        assert np.all(rows.num_estimable_sets_freq >= 4), rows


@pytest.mark.usefixtures("ray_session")
def test_constant_frequency_histograms_via_simulator(tmp_path):
    """constant:3 scenario => 3+ reach == 1+ reach, 4+ ~ 0 in the metrics."""
    import pandas as pd

    df = pd.read_csv(
        _run_one_cell(tmp_path))

    assert np.allclose(df.true_cardinality_1, df.true_cardinality_3)
    assert np.all(df.true_cardinality_4 <= df.true_cardinality_1 * 0.01 + 2)


def _run_one_cell(tmp_path):
    import os

    from cardinality_estimation_evaluation_framework_ray.pipelines.evaluator import (
        EvaluationConfig,
        ScenarioConfig,
    )
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        TokensTableSpec,
    )

    spec = TokensTableSpec(num_sources=3, rows_per_source=100, min_tok=30,
                           max_tok=30, universe_size=10**9,
                           frequency="constant:3", seed=45)
    ev = Evaluator(
        EvaluationConfig(name="c3", num_runs=1,
                         scenarios=[ScenarioConfig("freq_constant_3", spec)]),
        get_frequency_estimator_configs()[:1],  # exact
        str(tmp_path / "c3"), global_seed=2, parallel_cells=True)
    ev.run()
    return os.path.join(tmp_path, "c3", "run", "c3", "exact-freq",
                        "freq_constant_3", "df.csv")
