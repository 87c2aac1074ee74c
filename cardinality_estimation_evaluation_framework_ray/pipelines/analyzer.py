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


def convert_raw_to_long(raw: pd.DataFrame) -> pd.DataFrame:
    """Wide -> long frequency format via the distributed melt stage
    (the reference's convert_raw_df_to_long_format, analyzer.py:315-369):
    one row per (case, cardinality_source, frequency_level)."""
    import ray.data

    from ..stages.relational import melt

    value_vars = [c for c in raw.columns
                  if c.startswith(("estimated_cardinality_",
                                   "true_cardinality_"))]
    id_vars = [c for c in ("sketch_estimator", "scenario", "run_index",
                           "num_sets") if c in raw.columns]
    long_df = melt(ray.data.from_pandas(raw[id_vars + value_vars]),
                   id_vars=id_vars, value_vars=value_vars,
                   var_name="cardinality_source",
                   value_name="cardinality_value").to_pandas()
    split = long_df["cardinality_source"].str.rsplit("_", n=1)
    long_df["frequency_level"] = split.str[1].astype(int)
    long_df["cardinality_source"] = split.str[0]
    return long_df


def per_frequency_cardinality(long_df: pd.DataFrame) -> pd.DataFrame:
    """Cumulative k+ reach -> per-level frequency histogram via the
    distributed lag-diff stage (_get_per_frequency_cardinality,
    analyzer.py:371-427): level k gets card(k) - card(k+1), the max level
    keeps its k+ value."""
    import ray.data

    from ..stages.relational import lag_diff_per_group

    keys = [c for c in ("sketch_estimator", "scenario", "run_index",
                        "num_sets", "cardinality_source")
            if c in long_df.columns]
    df = long_df.copy()
    df["__case__"] = df[keys].astype(str).agg("|".join, axis=1)
    # descending frequency order makes lag-diff produce card(k) - card(k+1)
    # and fillna the top level with its own k+ value
    df["__neg_level__"] = -df["frequency_level"]
    out = lag_diff_per_group(ray.data.from_pandas(df), key="__case__",
                             order_col="__neg_level__",
                             value_col="cardinality_value",
                             out_col="per_level_cardinality").to_pandas()
    return (out.drop(columns=["__case__", "__neg_level__"])
            .sort_values(keys + ["frequency_level"])
            .reset_index(drop=True))


def frequency_criterion(raw: pd.DataFrame, distance_margin: float = 0.2,
                        proportion_of_runs: float = 0.8) -> pd.DataFrame:
    """The frequency criterion table, per (estimator, scenario, num_sets):
    the proportion of runs whose shuffle distance to the true frequency
    histogram is within ``distance_margin``, and whether that proportion
    meets ``proportion_of_runs`` (doc/cardinality_...md:300-318 — 'at least
    80% of runs within 20% shuffle distance')."""
    keys = [c for c in ("sketch_estimator", "scenario") if c in raw.columns]
    grouped = (raw[raw["num_sets"] > 1]
               .groupby(keys + ["num_sets"])["shuffle_distance"]
               .agg(proportion_within=lambda d:
                    float(np.mean(np.abs(d) < distance_margin)),
                    n_runs="size")
               .reset_index())
    grouped["meets_criterion"] = (
        grouped["proportion_within"] >= proportion_of_runs)
    return grouped


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
