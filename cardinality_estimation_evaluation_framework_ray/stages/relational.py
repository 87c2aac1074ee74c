"""Relational-shaped operators of the evaluation/analysis layer.

Mirrors SURVEY.md §2.7 (reference ``src/common/analysis.py``,
``src/simulations/simulator.py:75-150``, ``src/evaluations/analyzer.py``):
metric maps, grouped aggregates, small-side broadcast joins, wide->long
melt, per-group lag-diff — expressed over Ray Datasets, plus an exact
distributed group quantile (percentile_disc semantics) built from a
value-count aggregation instead of a full sort.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def relative_error_columns(ds: "ray.data.Dataset", est_prefix: str = "estimated_cardinality_",
                           true_prefix: str = "true_cardinality_") -> "ray.data.Dataset":
    """Add relative_error_i = (est_i - true_i) / true_i per freq level
    (simulator.py:100-103, analysis.py:18-30)."""

    def add(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for name in batch.schema.names:
            if name.startswith(est_prefix):
                level = name[len(est_prefix):]
                tcol = true_prefix + level
                if tcol in batch.schema.names:
                    rel = pc.divide(
                        pc.subtract(pc.cast(batch.column(name), pa.float64()),
                                    pc.cast(batch.column(tcol), pa.float64())),
                        pc.cast(batch.column(tcol), pa.float64()))
                    batch = batch.append_column(f"relative_error_{level}", rel)
        return batch

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantile_disc(ds: "ray.data.Dataset", key: str, value_col: str,
                          q: float = 0.5) -> pd.DataFrame:
    """Exact per-group discrete quantile WITHOUT a global sort.

    groupby (key, value) counts — the only shuffle, over distinct pairs —
    then a driver-side cumulative scan per key (percentile_disc semantics:
    smallest value whose cumulative fraction >= q).  Right shape for values
    with bounded distinct counts (lengths, scores); a full sort would move
    every row.
    """
    counts = ds.groupby([key, value_col]).count().to_pandas()
    out = []
    for k, g in counts.groupby(key):
        g = g.sort_values(value_col)
        cum = g["count()"].cumsum()
        total = cum.iloc[-1]
        idx = int(np.searchsorted(cum.values, q * total, side="left"))
        if cum.values[idx] < q * total:  # strict >= semantics
            idx += 1
        out.append({key: k, f"p{int(q * 100)}_{value_col}": g[value_col].iloc[idx]})
    return pd.DataFrame(out).sort_values(key).reset_index(drop=True)


def melt(ds: "ray.data.Dataset", id_vars: list[str], value_vars: list[str],
         var_name: str = "variable", value_name: str = "value") -> "ray.data.Dataset":
    """Wide -> long reshape inside map_batches (analyzer.py:296-369 shape)."""

    def melt_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(id_vars=id_vars, value_vars=value_vars,
                       var_name=var_name, value_name=value_name)

    return ds.map_batches(melt_batch, batch_format="pandas")


def lag_diff_per_group(ds: "ray.data.Dataset", key: str, order_col: str,
                       value_col: str, out_col: str = "diff") -> "ray.data.Dataset":
    """Cumulative -> per-level histogram via sorted first difference per group
    (analyzer.py:371-427)."""

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col).copy()
        g[out_col] = g[value_col].diff().fillna(g[value_col])
        return g

    return ds.groupby(key).map_groups(diff, batch_format="pandas")


def broadcast_join(big: "ray.data.Dataset", small_df: pd.DataFrame,
                   on: list[str] | str, how: str = "left") -> "ray.data.Dataset":
    """Join a big Dataset against a SMALL driver-side frame.

    The small side is ``ray.put`` once and read from the object store by
    every map task — no shuffle of the big side, no per-batch reshipping
    (analyzer.py:223-238's merge, made broadcast-shaped)."""
    small_ref = ray.put(small_df)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(small_ref), on=on, how=how)

    return big.map_batches(join, batch_format="pandas")


def union_all(datasets: Iterable["ray.data.Dataset"]) -> "ray.data.Dataset":
    """pd.concat analog (simulator.py:93-98): Dataset union."""
    datasets = list(datasets)
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out
