import os

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
    get_estimator_configs,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.evaluator import (
    EvaluationConfig,
    Evaluator,
    ScenarioConfig,
)
from cardinality_estimation_evaluation_framework_ray.pipelines.report import (
    generate_report,
)
from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
)
from cardinality_estimation_evaluation_framework_ray.sources.samplers import (
    ParameterSampler,
    ParameterSamplerConfig,
    sample_scenarios,
    uniform_choice,
    uniform_int,
)


@pytest.mark.usefixtures("ray_session")
def test_end_to_end_report(tmp_path):
    tiny = TokensTableSpec(num_sources=3, rows_per_source=80, min_tok=4,
                           max_tok=16, universe_size=5000, seed=11)
    ev = Evaluator(
        EvaluationConfig(name="mini", num_runs=2,
                         scenarios=[ScenarioConfig("independent", tiny)]),
        get_estimator_configs(["exact", "hll-p14"]),
        str(tmp_path), run_name="r")
    ev.run()
    md = generate_report(str(tmp_path / "r" / "mini"), str(tmp_path / "analysis"))
    assert os.path.isfile(md)
    text = open(md).read()
    assert "Number of estimable sets" in text
    assert "hll-p14" in text and "exact" in text
    assert os.path.isfile(tmp_path / "analysis" / "report.html")
    assert os.path.isfile(tmp_path / "analysis" / "num_estimable_sets.csv")


def test_parameter_sampler_deterministic():
    sampler = ParameterSampler(
        [ParameterSamplerConfig("universe_size", uniform_int(1000, 2000)),
         ParameterSamplerConfig("scenario", uniform_choice(["independent",
                                                            "disjoint"]))],
        np.random.RandomState(3))
    base = TokensTableSpec(num_sources=2, rows_per_source=10)
    specs = sample_scenarios(base, sampler, 5)
    assert len(specs) == 5
    assert all(1000 <= s.universe_size <= 2000 for s in specs)
    assert all(s.scenario in ("independent", "disjoint") for s in specs)
    sampler2 = ParameterSampler(
        [ParameterSamplerConfig("universe_size", uniform_int(1000, 2000)),
         ParameterSamplerConfig("scenario", uniform_choice(["independent",
                                                            "disjoint"]))],
        np.random.RandomState(3))
    specs2 = sample_scenarios(base, sampler2, 5)
    assert specs == specs2
