"""Evaluator: scenario x estimator sweep with the reference's output layout.

Mirrors ``src/evaluations/evaluator.py:45-325``: builds the directory tree
``out_dir/run_name/evaluation_name/<estimator>/<scenario>/{df.csv, df_agg.csv}``
plus per-estimator ``evaluation_run_time``, pre-draws one seed per scenario so
every estimator sees identical data (evaluator.py:264-270), and runs the
work-item product.  The reference parallelizes cells across OS processes
(pathos, evaluator.py:286-294); here each cell is itself a distributed Ray
pipeline, so cells run sequentially on the driver while Ray parallelizes
within each — the right inversion for big per-cell data.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np
import pandas as pd

from ..sources.datagen import TokensTableSpec
from .simulator import SketchEstimatorConfig, Simulator

RAW_RESULT_FILE = "df.csv"
AGG_RESULT_FILE = "df_agg.csv"
RUN_TIME_FILE = "evaluation_run_time"


@dataclasses.dataclass
class ScenarioConfig:
    name: str
    spec: TokensTableSpec


@dataclasses.dataclass
class EvaluationConfig:
    name: str
    num_runs: int
    scenarios: list[ScenarioConfig]


class Evaluator:
    def __init__(self, evaluation_config: EvaluationConfig,
                 estimator_configs: list[SketchEstimatorConfig],
                 out_dir: str, run_name: str = "run",
                 global_seed: int = 1, overwrite: bool = False):
        self.evaluation_config = evaluation_config
        self.estimator_configs = estimator_configs
        self.out_dir = out_dir
        self.run_name = run_name
        self.global_seed = global_seed
        self.overwrite = overwrite

    def _cell_dir(self, estimator_name: str, scenario_name: str) -> str:
        return os.path.join(self.out_dir, self.run_name,
                            self.evaluation_config.name, estimator_name,
                            scenario_name)

    def run(self) -> pd.DataFrame:
        """Run all cells; returns a summary frame (estimator, scenario, secs)."""
        # one sketch seed stream per scenario, identical across estimators
        # (evaluator.py:264-270)
        rs = np.random.RandomState(self.global_seed)
        scenario_seeds = {s.name: int(rs.randint(2**31 - 1))
                          for s in self.evaluation_config.scenarios}
        summary = []
        for est_cfg in self.estimator_configs:
            est_elapsed = 0.0
            for scen in self.evaluation_config.scenarios:
                cell = self._cell_dir(est_cfg.name, scen.name)
                raw_path = os.path.join(cell, RAW_RESULT_FILE)
                if os.path.exists(raw_path) and not self.overwrite:
                    continue  # resume: skip finished cells
                os.makedirs(cell, exist_ok=True)
                t0 = time.perf_counter()
                sim = Simulator(
                    num_runs=self.evaluation_config.num_runs,
                    scenario=scen.spec,
                    config=est_cfg,
                    sketch_random_state=np.random.RandomState(
                        scenario_seeds[scen.name]),
                )
                df, df_agg = sim.run_all_and_aggregate()
                df.to_csv(raw_path, index=False)
                df_agg.to_csv(os.path.join(cell, AGG_RESULT_FILE))
                elapsed = time.perf_counter() - t0
                est_elapsed += elapsed
                summary.append({"sketch_estimator": est_cfg.name,
                                "scenario": scen.name,
                                "running_time": elapsed})
            est_dir = os.path.join(self.out_dir, self.run_name,
                                   self.evaluation_config.name, est_cfg.name)
            os.makedirs(est_dir, exist_ok=True)
            with open(os.path.join(est_dir, RUN_TIME_FILE), "w") as f:
                f.write(f"{est_elapsed:.1f}\n")
        return pd.DataFrame(summary)
