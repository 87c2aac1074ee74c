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


@pytest.mark.usefixtures("ray_session")
def test_per_frequency_cardinality_hand_computed():
    """The reference's own docstring example (analyzer.py:374-390):
    cumulative k+ reach [10, 8, 7] -> per-level [2, 1, 7]."""
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.pipelines.analyzer import (
        convert_raw_to_long,
        per_frequency_cardinality,
    )

    raw = pd.DataFrame({
        "sketch_estimator": ["e"], "scenario": ["s"], "run_index": [0],
        "num_sets": [2],
        "estimated_cardinality_1": [11.0], "estimated_cardinality_2": [9.0],
        "estimated_cardinality_3": [6.0],
        "true_cardinality_1": [10.0], "true_cardinality_2": [8.0],
        "true_cardinality_3": [7.0],
    })
    long_df = convert_raw_to_long(raw)
    assert len(long_df) == 6
    per = per_frequency_cardinality(long_df)
    true_rows = per[per.cardinality_source == "true_cardinality"]
    assert true_rows.sort_values("frequency_level")[
        "per_level_cardinality"].tolist() == [2.0, 1.0, 7.0]
    est_rows = per[per.cardinality_source == "estimated_cardinality"]
    assert est_rows.sort_values("frequency_level")[
        "per_level_cardinality"].tolist() == [2.0, 3.0, 6.0]


def test_frequency_criterion_hand_computed():
    """80/20 rule: >= 80% of runs within 0.2 shuffle distance."""
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.pipelines.analyzer import (
        frequency_criterion,
    )

    rows = []
    for run, d in enumerate([0.1, 0.15, 0.19, 0.25, 0.05]):   # 4/5 within
        rows.append(dict(sketch_estimator="e", scenario="s", num_sets=2,
                         run_index=run, shuffle_distance=d))
    for run, d in enumerate([0.3, 0.1, 0.25, 0.21, 0.15]):    # 2/5 within
        rows.append(dict(sketch_estimator="e", scenario="s", num_sets=3,
                         run_index=run, shuffle_distance=d))
    # num_sets == 1 rows are excluded from the criterion
    rows.append(dict(sketch_estimator="e", scenario="s", num_sets=1,
                     run_index=0, shuffle_distance=9.9))
    crit = frequency_criterion(pd.DataFrame(rows))
    assert len(crit) == 2
    two = crit[crit.num_sets == 2].iloc[0]
    three = crit[crit.num_sets == 3].iloc[0]
    assert two.proportion_within == pytest.approx(0.8) and bool(two.meets_criterion)
    assert three.proportion_within == pytest.approx(0.4) and not bool(three.meets_criterion)


@pytest.mark.usefixtures("ray_session")
def test_frequency_report_sections(tmp_path):
    """frequency_end_to_end evaluator output gains the 80/20 criterion and
    per-frequency distribution sections in the generated report."""
    from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
        get_frequency_estimator_configs,
    )
    from cardinality_estimation_evaluation_framework_ray.pipelines.evaluator import (
        EvaluationConfig,
        Evaluator,
        ScenarioConfig,
    )
    from cardinality_estimation_evaluation_framework_ray.pipelines.report import (
        generate_report,
    )
    from cardinality_estimation_evaluation_framework_ray.sources.set_generators import (
        SetScenarioSpec,
    )

    scen = ScenarioConfig("homog", SetScenarioSpec.make(
        "homogeneous", universe_size=2_000, set_sizes=[300] * 3,
        freq_rates=[1.0] * 3, freq_cap=5, tokens_per_row=8, seed=3))
    ev = Evaluator(
        EvaluationConfig("freq_mini", 2, [scen]),
        [c for c in get_frequency_estimator_configs()
         if c.name in ("exact-freq", "fll-p14-freq")],
        str(tmp_path), run_name="r", global_seed=5)
    ev.run()
    import os

    md = generate_report(os.path.join(str(tmp_path), "r", "freq_mini"),
                         str(tmp_path / "report"))
    text = open(md).read()
    assert "Frequency criterion" in text
    assert "Mean per-frequency-level cardinality" in text
    # the exact estimator meets the criterion everywhere
    assert "| True |" in text or "True" in text
