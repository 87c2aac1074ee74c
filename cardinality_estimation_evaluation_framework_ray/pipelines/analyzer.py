"""Analyzer: num-estimable-sets tables over evaluator output.

Mirrors ``src/evaluations/analyzer.py:74-238``: read every cell's ``df.csv``,
compute per (estimator, scenario) the maximum number of sets whose union is
estimated within ``error_margin`` relative error for at least
``proportion_of_runs`` of runs (reach criterion), and the shuffle-distance
analog for frequency.  Metric frames are tiny (runs x sets rows), so the
aggregation is driver-side pandas, same as the reference.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .evaluator import AGG_RESULT_FILE, RAW_RESULT_FILE


def get_num_estimable_sets(df: pd.DataFrame, error_margin: float = 0.05,
                           proportion_of_runs: float = 0.95,
                           relative_error_col: str = "relative_error_1") -> int:
    """Max num_sets with >= proportion of runs within the margin, scanning for
    the first failure (analyzer.py:74-114)."""
    def count_estimable(e):
        return np.mean(np.abs(e) < error_margin) >= proportion_of_runs

    est = (df[df["num_sets"] > 1].groupby("num_sets")
           .agg({relative_error_col: count_estimable})
           .rename(columns={relative_error_col: "is_estimable"}))
    num = 0
    for n in est.index.values:
        if est.loc[n, "is_estimable"]:
            num = n
        else:
            break
    return int(num)


def get_num_estimable_sets_by_shuffle_distance(
        df: pd.DataFrame, distance_margin: float = 0.2,
        proportion_of_runs: float = 0.8) -> int:
    """Frequency criterion: shuffle distance within margin
    (doc/cardinality_...md:300-318)."""
    def count_estimable(d):
        return np.mean(np.abs(d) < distance_margin) >= proportion_of_runs

    est = (df[df["num_sets"] > 1].groupby("num_sets")
           .agg({"shuffle_distance": count_estimable})
           .rename(columns={"shuffle_distance": "is_estimable"}))
    num = 0
    for n in est.index.values:
        if est.loc[n, "is_estimable"]:
            num = n
        else:
            break
    return int(num)


def read_evaluation_results(eval_dir: str) -> pd.DataFrame:
    """Concat all cells' raw frames with estimator/scenario columns
    (analyzer.py:177-201)."""
    frames = []
    for estimator in sorted(os.listdir(eval_dir)):
        est_dir = os.path.join(eval_dir, estimator)
        if not os.path.isdir(est_dir):
            continue
        for scenario in sorted(os.listdir(est_dir)):
            raw = os.path.join(est_dir, scenario, RAW_RESULT_FILE)
            if not os.path.isfile(raw):
                continue
            df = pd.read_csv(raw)
            df["sketch_estimator"] = estimator
            df["scenario"] = scenario
            frames.append(df)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def analyze(eval_dir: str, error_margin: float = 0.05,
            proportion_of_runs: float = 0.95,
            out_csv: str | None = None) -> pd.DataFrame:
    """num_estimable_sets table per (estimator, scenario) + frequency variant."""
    df = read_evaluation_results(eval_dir)
    if df.empty:
        return pd.DataFrame(columns=["sketch_estimator", "scenario",
                                     "num_estimable_sets",
                                     "num_estimable_sets_freq"])
    rows = []
    for (est, scen), g in df.groupby(["sketch_estimator", "scenario"]):
        rows.append({
            "sketch_estimator": est,
            "scenario": scen,
            "num_estimable_sets": get_num_estimable_sets(
                g, error_margin, proportion_of_runs),
            "num_estimable_sets_freq": get_num_estimable_sets_by_shuffle_distance(g),
        })
    out = pd.DataFrame(rows)
    if out_csv:
        out.to_csv(out_csv, index=False)
    return out
