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
    #: TokensTableSpec (counter-based, partition-invariant, 100 TB path) or
    #: SetScenarioSpec (reference-faithful sequential generators) — any
    #: dataclass with (seed, make_table, make_dataset)
    spec: "TokensTableSpec | object"


@dataclasses.dataclass
class EvaluationConfig:
    name: str
    num_runs: int
    scenarios: list[ScenarioConfig]


def _run_cell(num_runs: int, scenario_spec, est_cfg, seed: int, cell_dir: str,
              engine: str) -> float:
    """Run one (estimator, scenario) cell and write its CSVs. Returns secs."""
    t0 = time.perf_counter()
    sim = Simulator(num_runs=num_runs, scenario=scenario_spec, config=est_cfg,
                    sketch_random_state=np.random.RandomState(seed),
                    engine=engine)
    df, df_agg = sim.run_all_and_aggregate()
    os.makedirs(cell_dir, exist_ok=True)
    df.to_csv(os.path.join(cell_dir, RAW_RESULT_FILE), index=False)
    df_agg.to_csv(os.path.join(cell_dir, AGG_RESULT_FILE))
    return time.perf_counter() - t0


class Evaluator:
    """``parallel_cells=False`` (default): cells run sequentially on the
    driver, each cell a distributed Ray Data pipeline — the regime for big
    per-scenario data.  ``parallel_cells=True``: every (estimator, scenario)
    cell becomes one Ray task running the local-engine Simulator — the
    reference's pathos-pool regime (evaluator.py:286-294) expressed as Ray
    tasks, right when scenarios are small and numerous."""

    def __init__(self, evaluation_config: EvaluationConfig,
                 estimator_configs: list[SketchEstimatorConfig],
                 out_dir: str, run_name: str = "run",
                 global_seed: int = 1, overwrite: bool = False,
                 parallel_cells: bool = False):
        self.evaluation_config = evaluation_config
        self.estimator_configs = estimator_configs
        self.out_dir = out_dir
        self.run_name = run_name
        self.global_seed = global_seed
        self.overwrite = overwrite
        self.parallel_cells = parallel_cells

    def _cell_dir(self, estimator_name: str, scenario_name: str) -> str:
        return os.path.join(self.out_dir, self.run_name,
                            self.evaluation_config.name, estimator_name,
                            scenario_name)

    def _work_items(self):
        # one sketch seed stream per scenario, identical across estimators
        # (evaluator.py:264-270)
        rs = np.random.RandomState(self.global_seed)
        scenario_seeds = {s.name: int(rs.randint(2**31 - 1))
                          for s in self.evaluation_config.scenarios}
        for est_cfg in self.estimator_configs:
            for scen in self.evaluation_config.scenarios:
                cell = self._cell_dir(est_cfg.name, scen.name)
                if (os.path.exists(os.path.join(cell, RAW_RESULT_FILE))
                        and not self.overwrite):
                    continue  # resume: skip finished cells
                yield est_cfg, scen, scenario_seeds[scen.name], cell

    def _write_run_times(self, summary: list[dict]) -> None:
        per_est: dict[str, float] = {}
        for row in summary:
            per_est[row["sketch_estimator"]] = (
                per_est.get(row["sketch_estimator"], 0.0) + row["running_time"])
        for est_cfg in self.estimator_configs:
            if est_cfg.name not in per_est:
                continue  # resume run that touched no cells of this estimator
            est_dir = os.path.join(self.out_dir, self.run_name,
                                   self.evaluation_config.name, est_cfg.name)
            os.makedirs(est_dir, exist_ok=True)
            with open(os.path.join(est_dir, RUN_TIME_FILE), "w") as f:
                f.write(f"{per_est[est_cfg.name]:.1f}\n")

    def run(self) -> pd.DataFrame:
        """Run all unfinished cells; returns (estimator, scenario, secs)."""
        items = list(self._work_items())
        summary = []
        if self.parallel_cells and items:
            import ray

            run_cell_task = ray.remote(num_cpus=1)(_run_cell)
            refs = [run_cell_task.remote(
                self.evaluation_config.num_runs, scen.spec, est_cfg, seed,
                cell, "local") for est_cfg, scen, seed, cell in items]
            for (est_cfg, scen, _, _), elapsed in zip(items, ray.get(refs)):
                summary.append({"sketch_estimator": est_cfg.name,
                                "scenario": scen.name,
                                "running_time": elapsed})
        else:
            for est_cfg, scen, seed, cell in items:
                elapsed = _run_cell(self.evaluation_config.num_runs, scen.spec,
                                    est_cfg, seed, cell, "dataset")
                summary.append({"sketch_estimator": est_cfg.name,
                                "scenario": scen.name,
                                "running_time": elapsed})
        self._write_run_times(summary)
        return pd.DataFrame(summary)
