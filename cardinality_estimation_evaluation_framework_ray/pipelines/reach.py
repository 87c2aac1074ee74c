"""Flagship pipeline: per-source + union reach (cardinality/frequency) report.

The Dataset-granularity analog of the reference's library-direct usage
(``tests/interoperability_test.py:225-235``: build one sketch per set, union,
estimate) and of the simulator's prefix-union sweep
(``src/simulations/simulator.py:182-201``).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

import ray.data

from ..stages.build import (
    build_sketch_states,
    build_sketch_states_epoch,
    collect_states,
    state_col,
    union_across_keys,
)
from ..state.base import Sketch, SketchSpec


def _build_per_key(ds, specs, key, tokens_col, batch_size, tree_width, mode):
    if mode == "epoch":
        tbl = build_sketch_states_epoch(ds, specs, key, tokens_col, batch_size)
        return {
            tbl.column(key)[i].as_py(): {
                name: Sketch.from_bytes(spec,
                                        tbl.column(state_col(name))[i].as_py())
                for name, spec in specs.items()}
            for i in range(tbl.num_rows)
        }
    if mode != "tasks":
        # loud: "epoch_ckpt" takes FILES, not a Dataset — use
        # reach_report_resumable; a silent fallthrough here would time the
        # wrong physical plan in the bench
        raise ValueError(f"unknown build mode {mode!r}: use 'tasks', "
                         "'epoch', or reach_report_resumable for the "
                         "checkpointed plan")
    states_ds = build_sketch_states(ds, specs, key, tokens_col, batch_size,
                                    tree_width)
    return collect_states(states_ds, specs, key)


def reach_report(ds: "ray.data.Dataset", specs: dict[str, SketchSpec],
                 key: str = "source", tokens_col: str = "tokens",
                 batch_size: int | None = 8192,
                 tree_width: int = 0,
                 include_union: bool = True,
                 mode: str = "tasks") -> pd.DataFrame:
    """Build all sketches in one pass; emit per-key and union estimates.

    Output columns: ``{key}``, then one ``est_{name}`` float per sketch (the
    first histogram entry, i.e. 1+ reach / cardinality).

    ``mode="tasks"`` (default) is the stateless task-pool plan (per-batch
    partials -> combiner -> one groupby); ``mode="epoch"`` is the
    epoch-flush actor plan (``build.build_sketch_states_epoch``): states
    accumulate per actor and serialize once — faster where per-batch state
    serialization dominates, at the cost of per-batch retryability.
    """
    per_key = _build_per_key(ds, specs, key, tokens_col, batch_size,
                             tree_width, mode)
    return _assemble_report(per_key, specs, key, include_union)


def _assemble_report(per_key, specs, key, include_union) -> pd.DataFrame:
    rows = []
    for k in sorted(per_key):
        row = {key: k}
        for name in specs:
            row[f"est_{name}"] = float(per_key[k][name].estimate()[0])
        rows.append(row)
    if include_union:
        union = union_across_keys(per_key, specs)
        row = {key: "__union__"}
        for name in specs:
            row[f"est_{name}"] = float(union[name].estimate()[0])
        rows.append(row)
    return pd.DataFrame(rows)


def reach_report_resumable(files: list[str], specs: dict[str, SketchSpec],
                           ckpt_dir: str, *, key: str = "source",
                           tokens_col: str = "tokens",
                           batch_size: int | None = 8192,
                           files_per_partition: int = 1,
                           include_union: bool = True) -> pd.DataFrame:
    """``reach_report`` on the CHECKPOINTED epoch plan
    (``build_sketch_states_epoch_resumable``): per input partition one Ray
    task accumulates + atomically checkpoints its states; a re-run (or a
    retried dead worker) skips every valid checkpoint.  Same output as
    ``reach_report`` (associative merges), plus durability — the bench
    times this against the unresumable plans so the checkpoint overhead
    is a measured number, not a guess."""
    from ..stages.checkpoint import build_sketch_states_epoch_resumable

    states_ds = build_sketch_states_epoch_resumable(
        files, specs, ckpt_dir, key=key, tokens_col=tokens_col,
        files_per_partition=files_per_partition, batch_size=batch_size)
    per_key = collect_states(states_ds, specs, key)
    return _assemble_report(per_key, specs, key, include_union)


def freq_report(ds: "ray.data.Dataset", specs: dict[str, SketchSpec],
                key: str = "source", max_freq: int = 3,
                tree_width: int = 0) -> pd.DataFrame:
    """Per-key + union k+ frequency histograms (columns est_{name}_{k})."""
    states_ds = build_sketch_states(ds, specs, key, tree_width=tree_width)
    per_key = collect_states(states_ds, specs, key)
    rows = []

    def hist_row(label, sketches):
        row = {key: label}
        for name in specs:
            hist = sketches[name].estimate()
            for f in range(max_freq):
                row[f"est_{name}_{f + 1}"] = float(hist[f]) if f < len(hist) else 0.0
        return row

    for k in sorted(per_key):
        rows.append(hist_row(k, per_key[k]))
    union = union_across_keys(per_key, specs)
    rows.append(hist_row("__union__", union))
    return pd.DataFrame(rows)


def prefix_union_curve(ds: "ray.data.Dataset", specs: dict[str, SketchSpec],
                       key: str = "source",
                       order: Iterable[str] | None = None,
                       max_freq: int = 1) -> pd.DataFrame:
    """Reach curve over prefix unions sketches[:i+1] (simulator.py:185-201).

    The cumulative fold runs driver-side over the <= #keys final states — the
    ordering contract the reference's sequential estimators rely on.
    """
    states_ds = build_sketch_states(ds, specs, key)
    per_key = collect_states(states_ds, specs, key)
    keys = list(order) if order is not None else sorted(per_key)
    rows = []
    acc = {name: spec.new() for name, spec in specs.items()}
    for i, k in enumerate(keys):
        row = {"num_sets": i + 1, key: k}
        for name in specs:
            acc[name].merge_in(per_key[k][name])
            hist = acc[name].estimate()
            for f in range(max_freq):
                row[f"est_{name}_{f + 1}"] = float(hist[f]) if f < len(hist) else 0.0
        rows.append(row)
    return pd.DataFrame(rows)
