import numpy as np
import pandas as pd
import pytest

from cardinality_estimation_evaluation_framework_ray.pipelines.evaluator import (
    EvaluationConfig,
    Evaluator,
    ScenarioConfig,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
    SketchEstimatorConfig,
    Simulator,
)
from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
)
from cardinality_estimation_evaluation_framework_ray.state import (
    ExactMultiSetSpec,
    HllSpec,
    VocSpec,
)
from cardinality_estimation_evaluation_framework_ray.state.voc import (
    SequentialEstimator as VocSequentialEstimator,
)

TINY = TokensTableSpec(num_sources=3, rows_per_source=100, min_tok=4,
                       max_tok=32, universe_size=10_000, seed=23)


@pytest.mark.usefixtures("ray_session")
def test_local_engine_matches_dataset_engine():
    cfg = SketchEstimatorConfig(name="hll", spec=HllSpec(p=10))
    kw = dict(num_runs=2, scenario=TINY, config=cfg)
    df_ds, _ = Simulator(**kw, sketch_random_state=np.random.RandomState(5),
                         engine="dataset").run_all_and_aggregate()
    df_lo, _ = Simulator(**kw, sketch_random_state=np.random.RandomState(5),
                         engine="local").run_all_and_aggregate()
    pd.testing.assert_frame_equal(df_ds, df_lo)


@pytest.mark.usefixtures("ray_session")
def test_local_engine_dedup_input():
    cfg = SketchEstimatorConfig(name="voc", spec=VocSpec(num_buckets=512),
                                estimator=VocSequentialEstimator(),
                                dedup_input=True)
    df, _ = Simulator(num_runs=1, scenario=TINY, config=cfg,
                      sketch_random_state=np.random.RandomState(6),
                      engine="local").run_all_and_aggregate()
    assert np.all(np.abs(df.relative_error_1) < 0.2)


@pytest.mark.usefixtures("ray_session")
def test_parallel_cells_match_sequential(tmp_path):
    ev_cfg = EvaluationConfig(name="mini", num_runs=2, scenarios=[
        ScenarioConfig("independent", TINY),
        ScenarioConfig("disjoint",
                       TokensTableSpec(num_sources=3, rows_per_source=100,
                                       min_tok=4, max_tok=32,
                                       universe_size=10_000,
                                       scenario="disjoint", seed=23)),
    ])
    estimators = [SketchEstimatorConfig(name="exact", spec=ExactMultiSetSpec()),
                  SketchEstimatorConfig(name="hll", spec=HllSpec(p=10))]

    seq = Evaluator(ev_cfg, estimators, str(tmp_path / "seq"), global_seed=4)
    par = Evaluator(ev_cfg, estimators, str(tmp_path / "par"), global_seed=4,
                    parallel_cells=True)
    s1, s2 = seq.run(), par.run()
    assert len(s1) == len(s2) == 4

    for est in ("exact", "hll"):
        for scen in ("independent", "disjoint"):
            a = pd.read_csv(tmp_path / "seq" / "run" / "mini" / est / scen / "df.csv")
            b = pd.read_csv(tmp_path / "par" / "run" / "mini" / est / scen / "df.csv")
            pd.testing.assert_frame_equal(a, b)
