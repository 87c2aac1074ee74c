"""Simulator: per-scenario accuracy runs with prefix-union estimates.

Mirrors ``src/simulations/simulator.py:32-209``, restructured Ray-Data-first:
per run, ONE streaming pipeline builds the per-source sketch states AND the
exact-truth states in the same pass (sketch + oracle share the token read);
the prefix-union sweep ``estimator(sketches[:i+1])`` then runs driver-side
over the <= num_sources final states — which is exactly where the
reference's sequential/pairwise estimators demand an ordered fold.

Result frame columns match the reference (simulator.py:203-208):
``num_sets, estimated_cardinality_i, true_cardinality_i (i=1..max_freq),
shuffle_distance, run_index, relative_error_i``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import pandas as pd

from ..sources.datagen import TokensTableSpec
from ..stages.build import build_sketch_states, collect_states
from ..state.base import Sketch, SketchSpec
from ..state.exact import ExactMultiSetSpec


class MergingEstimator:
    """Default estimator: associative merge of the list, then estimate()."""

    def __call__(self, sketch_list) -> list[float]:
        if not sketch_list:
            return [0.0]
        acc = sketch_list[0].spec.new()
        for s in sketch_list:
            acc.merge_in(s)
        return acc.estimate()


@dataclasses.dataclass
class SketchEstimatorConfig:
    """(sketch spec, estimator, noisers, max_frequency) — configs.py:17-81."""

    name: str
    spec: SketchSpec
    estimator: Callable = dataclasses.field(default_factory=MergingEstimator)
    sketch_noiser: Callable | None = None      # Sketch -> Sketch
    estimate_noiser: Callable | None = None    # float -> float
    max_frequency: int = 1
    #: insert the exact per-source dedup pre-stage (VectorOfCounts' one-shot
    #: contract, vector_of_counts.py:103-129)
    dedup_input: bool = False


def extend_histogram(hist: list[float], max_freq: int) -> list[float]:
    """Pad/truncate to max_freq (simulator.py:114-119)."""
    hist = list(hist)
    if len(hist) <= max_freq:
        return hist + [0] * (max_freq - len(hist))
    return hist[:max_freq]


def shuffle_distance(hist1: list[float], hist2: list[float]) -> float:
    """1/2 sum |f1(k) - f2(k)| over normalized per-level frequencies
    (simulator.py:121-150)."""
    assert hist1 and hist2, "empty histogram"
    c1 = [hist1[i] - hist1[i + 1] for i in range(len(hist1) - 1)] + [hist1[-1]]
    c2 = [hist2[i] - hist2[i + 1] for i in range(len(hist2) - 1)] + [hist2[-1]]
    mf = max(len(c1), len(c2))
    f1 = np.array(extend_histogram(c1, mf)) / np.sum(c1)
    f2 = np.array(extend_histogram(c2, mf)) / np.sum(c2)
    return float(0.5 * np.sum(np.abs(f1 - f2)))


class Simulator:
    """num_runs accuracy runs of one (scenario, estimator) cell.

    ``engine="dataset"`` (default) builds states through the distributed
    Ray Data pipeline — right when one scenario's tokens are big.
    ``engine="local"`` builds in-process with the same vectorized kernels
    (the generator is a pure function of row ids) — right when scenarios are
    small and the parallelism should instead go ACROSS (scenario, estimator,
    run) cells, the reference's process-pool regime
    (evaluator.py:286-294) — see Evaluator(parallel_cells=True).
    """

    def __init__(self, num_runs: int, scenario: "TokensTableSpec | object",
                 config: SketchEstimatorConfig,
                 sketch_random_state: np.random.RandomState | None = None,
                 tree_width: int = 0, engine: str = "dataset"):
        self.num_runs = num_runs
        self.scenario = scenario
        self.config = config
        self.sketch_random_state = sketch_random_state or np.random.RandomState()
        self.tree_width = tree_width
        assert engine in ("dataset", "local")
        self.engine = engine

    def _build_states_local(self, scenario, specs):
        """In-process build: generate -> group by source -> update kernels."""
        from ..stages.build import iter_key_tokens

        tbl = scenario.make_table()
        per_key: dict = {}
        for kv, toks in iter_key_tokens(tbl, "source", "tokens"):
            if self.config.dedup_input:
                toks = np.unique(toks)
            states = {}
            for name, spec in specs.items():
                sk = spec.new()
                sk.update_tokens(toks)
                states[name] = sk
            per_key[kv] = states
        return per_key

    def run_one(self, run_index: int) -> pd.DataFrame:
        # per-run scenario seed: deterministic function of (scenario.seed, run)
        scenario = dataclasses.replace(self.scenario,
                                       seed=self.scenario.seed + 7919 * run_index)
        sketch_seed = int(self.sketch_random_state.randint(2**31 - 1))
        spec = dataclasses.replace(self.config.spec, seed=sketch_seed) \
            if hasattr(self.config.spec, "seed") else self.config.spec
        specs = {"sketch": spec, "truth": ExactMultiSetSpec()}
        if self.engine == "local":
            per_key = self._build_states_local(scenario, specs)
        elif self.config.dedup_input:
            from ..stages.dedup import exact_distinct_tokens

            ds = exact_distinct_tokens(scenario.make_dataset())
            per_key = collect_states(
                build_sketch_states(ds, specs, tokens_col="token",
                                    tree_width=self.tree_width), specs)
        else:
            per_key = collect_states(
                build_sketch_states(scenario.make_dataset(), specs,
                                    tree_width=self.tree_width), specs)
        order = sorted(per_key)
        sketches = [per_key[k]["sketch"] for k in order]
        truths = [per_key[k]["truth"] for k in order]

        if self.config.sketch_noiser is not None:
            sketches = [self.config.sketch_noiser(s) for s in sketches]

        max_freq = self.config.max_frequency
        true_union = ExactMultiSetSpec().new()
        rows = []
        for i in range(len(sketches)):
            est = extend_histogram(self.config.estimator(sketches[:i + 1]),
                                   max_freq)
            if self.config.estimate_noiser is not None:
                est = [self.config.estimate_noiser(e) for e in est]
            true_union.merge_in(truths[i])
            truth = extend_histogram(true_union.estimate(), max_freq)
            rows.append([i + 1] + est + truth
                        + [shuffle_distance(est, truth)])
        cols = (["num_sets"]
                + [f"estimated_cardinality_{i + 1}" for i in range(max_freq)]
                + [f"true_cardinality_{i + 1}" for i in range(max_freq)]
                + ["shuffle_distance"])
        return pd.DataFrame(rows, columns=cols)

    def run_all_and_aggregate(self) -> tuple[pd.DataFrame, pd.DataFrame]:
        dfs = []
        for t in range(self.num_runs):
            df = self.run_one(t)
            df["run_index"] = t
            dfs.append(df)
        df = pd.concat(dfs, ignore_index=True)
        for i in range(self.config.max_frequency):
            df[f"relative_error_{i + 1}"] = (
                (df[f"estimated_cardinality_{i + 1}"]
                 - df[f"true_cardinality_{i + 1}"])
                / df[f"true_cardinality_{i + 1}"])
        agg = {}
        for i in range(self.config.max_frequency):
            for base in ("estimated_cardinality_", "true_cardinality_",
                         "relative_error_"):
                agg[f"{base}{i + 1}"] = ["mean", "std"]
        df_agg = df.groupby("num_sets").agg(agg)
        return df, df_agg

    __call__ = run_all_and_aggregate
