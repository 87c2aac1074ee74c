import numpy as np
import pandas as pd
import pytest

from cardinality_estimation_evaluation_framework_ray.pipelines.analyzer import (
    analyze,
    get_num_estimable_sets,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
    get_estimator_configs,
    smoke_test_evaluation,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.evaluator import (
    Evaluator,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
    SketchEstimatorConfig,
    Simulator,
    extend_histogram,
    shuffle_distance,
)
from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
)
from cardinality_estimation_evaluation_framework_ray.state import (
    ExactMultiSetSpec,
    HllSpec,
)

TINY = TokensTableSpec(num_sources=4, rows_per_source=120, min_tok=4,
                       max_tok=32, universe_size=20_000, seed=9)


def test_shuffle_distance_semantics():
    # identical distributions -> 0
    assert shuffle_distance([10, 5, 1], [20, 10, 2]) == pytest.approx(0.0)
    # all freq-1 vs all freq-2
    assert shuffle_distance([10, 0], [10, 10]) == pytest.approx(1.0)
    assert extend_histogram([3, 2], 4) == [3, 2, 0, 0]
    assert extend_histogram([3, 2, 1], 2) == [3, 2]


class LessOneEstimator:
    """Known-bias estimator (exact_set.py:101-113) to validate metric plumbing."""

    def __call__(self, sketch_list):
        acc = sketch_list[0].spec.new()
        for s in sketch_list:
            acc.merge_in(s)
        return [max(h - 1, 0) for h in acc.estimate()]


@pytest.mark.usefixtures("ray_session")
def test_simulator_exact_estimator_zero_error():
    cfg = SketchEstimatorConfig(name="exact", spec=ExactMultiSetSpec())
    sim = Simulator(num_runs=2, scenario=TINY, config=cfg,
                    sketch_random_state=np.random.RandomState(1))
    df, df_agg = sim.run_all_and_aggregate()
    assert set(df.num_sets) == {1, 2, 3, 4}
    assert np.allclose(df.relative_error_1, 0)
    assert np.allclose(df.shuffle_distance, 0)
    assert len(df) == 8  # 2 runs x 4 prefix unions
    # different runs draw different scenario data
    r0 = df[df.run_index == 0].true_cardinality_1.values
    r1 = df[df.run_index == 1].true_cardinality_1.values
    assert not np.array_equal(r0, r1)


@pytest.mark.usefixtures("ray_session")
def test_simulator_less_one_bias_visible():
    cfg = SketchEstimatorConfig(name="lessone", spec=ExactMultiSetSpec(),
                                estimator=LessOneEstimator())
    sim = Simulator(num_runs=1, scenario=TINY, config=cfg,
                    sketch_random_state=np.random.RandomState(2))
    df, _ = sim.run_all_and_aggregate()
    assert np.all(df.estimated_cardinality_1 == df.true_cardinality_1 - 1)


@pytest.mark.usefixtures("ray_session")
def test_simulator_hll_within_band():
    cfg = SketchEstimatorConfig(name="hll", spec=HllSpec(p=12))
    sim = Simulator(num_runs=1, scenario=TINY, config=cfg,
                    sketch_random_state=np.random.RandomState(3))
    df, _ = sim.run_all_and_aggregate()
    assert np.all(np.abs(df.relative_error_1) < 0.05)


@pytest.mark.usefixtures("ray_session")
def test_evaluator_layout_and_analyzer(tmp_path):
    from cardinality_estimation_evaluation_framework_ray.pipelines.evaluator import (
        EvaluationConfig,
        ScenarioConfig,
    )

    ev_cfg = EvaluationConfig(name="mini", num_runs=2, scenarios=[
        ScenarioConfig("independent", TINY),
        ScenarioConfig("disjoint",
                       TokensTableSpec(num_sources=4, rows_per_source=120,
                                       min_tok=4, max_tok=32,
                                       universe_size=20_000,
                                       scenario="disjoint", seed=9)),
    ])
    estimators = [
        SketchEstimatorConfig(name="exact", spec=ExactMultiSetSpec()),
        SketchEstimatorConfig(name="hll-p12", spec=HllSpec(p=12)),
    ]
    ev = Evaluator(ev_cfg, estimators, str(tmp_path), run_name="r1",
                   global_seed=5)
    summary = ev.run()
    assert len(summary) == 4
    import os

    cell = tmp_path / "r1" / "mini" / "exact" / "independent"
    assert (cell / "df.csv").exists() and (cell / "df_agg.csv").exists()
    assert (tmp_path / "r1" / "mini" / "hll-p12" / "evaluation_run_time").exists()

    # resume: second run skips all finished cells
    summary2 = ev.run()
    assert len(summary2) == 0

    result = analyze(str(tmp_path / "r1" / "mini"))
    assert len(result) == 4
    exact_rows = result[result.sketch_estimator == "exact"]
    assert np.all(exact_rows.num_estimable_sets == 4)  # exact always estimable


def test_get_num_estimable_sets_first_failure_scan():
    df = pd.DataFrame({
        "num_sets": [2, 2, 3, 3, 4, 4],
        "relative_error_1": [0.01, 0.02, 0.2, 0.3, 0.01, 0.01],
    })
    # sets=3 fails -> scan stops there even though 4 would pass
    assert get_num_estimable_sets(df) == 2


def test_smoke_configs_shape():
    ev = smoke_test_evaluation(num_runs=1)
    assert ev.name == "smoke_test" and len(ev.scenarios) == 5
    cfgs = get_estimator_configs()
    assert len(cfgs) >= 8
    voc = [c for c in cfgs if c.name.startswith("vector_of_counts")][0]
    assert voc.dedup_input
