"""Checkpointed, resumable sketch builds with per-partition lineage.

North-rule requirement (SURVEY.md §4.1 "Checkpoint/resume"): a 100 TB build
must survive preemption.  The unit of recovery is an input partition (one or
more parquet files).  Each partition runs as its own streaming pipeline
(read -> partial states -> per-key merge) and lands an atomic parquet
checkpoint at

    ckpt_dir/part=<partition_id>/states.parquet

with lineage columns: key, per-sketch state blobs, n_rows, n_tokens,
partition_id, input_files, input_fingerprint (size+mtime digest),
sketch_config_hash, wall_time_s.  A rerun skips every partition whose
checkpoint exists with a MATCHING fingerprint + config hash (stale or
mismatched checkpoints are rebuilt), then reduces all checkpoints through
the usual merge tree.  Because sketch merges are associative, re-running any
subset of partitions is always safe.
"""

from __future__ import annotations

import hashlib
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.base import SketchSpec
from .build import build_partials, merge_partials, state_col


def _fingerprint(files: list[str]) -> str:
    h = hashlib.sha1()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def _config_hash(specs: dict[str, SketchSpec]) -> str:
    h = hashlib.sha1()
    for name in sorted(specs):
        h.update(name.encode())
        h.update(specs[name].config_hash().encode())
    return h.hexdigest()[:16]


def partition_input_files(files: list[str], files_per_partition: int = 1):
    files = sorted(files)
    return [files[i:i + files_per_partition]
            for i in range(0, len(files), files_per_partition)]


def _ckpt_path(ckpt_dir: str, pid: int) -> str:
    return os.path.join(ckpt_dir, f"part={pid}", "states.parquet")


def _checkpoint_is_valid(path: str, fingerprint: str, cfg_hash: str) -> bool:
    if not os.path.exists(path):
        return False
    try:
        meta = pq.read_schema(path).metadata or {}
        return (meta.get(b"input_fingerprint", b"").decode() == fingerprint
                and meta.get(b"sketch_config_hash", b"").decode() == cfg_hash)
    except Exception:
        return False


def build_partition_checkpoint(files: list[str], specs: dict[str, SketchSpec],
                               partition_id: int, ckpt_dir: str,
                               key: str = "source", tokens_col: str = "tokens",
                               batch_size: int | None = 8192) -> str:
    """Build + atomically write one partition's per-key states. Returns path."""
    path = _ckpt_path(ckpt_dir, partition_id)
    fingerprint = _fingerprint(files)
    cfg_hash = _config_hash(specs)
    if _checkpoint_is_valid(path, fingerprint, cfg_hash):
        return path
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(files, columns=[key, tokens_col])
    partials = build_partials(ds, specs, key, tokens_col, batch_size)
    merged = merge_partials(partials, specs, key)
    rows = merged.take_all()  # <= #keys rows of small states
    wall = time.perf_counter() - t0
    cols: dict[str, list] = {key: [], "n_rows": [], "n_tokens": []}
    for name in specs:
        cols[state_col(name)] = []
    for r in rows:
        cols[key].append(r[key])
        cols["n_rows"].append(r["n_rows"])
        cols["n_tokens"].append(r["n_tokens"])
        for name in specs:
            cols[state_col(name)].append(r[state_col(name)])
    n = len(rows)
    tbl = pa.table({
        **{k: pa.array(v) for k, v in cols.items()},
        "partition_id": pa.array([partition_id] * n, pa.int32()),
        "input_files": pa.array([";".join(sorted(files))] * n),
        "input_fingerprint": pa.array([fingerprint] * n),
        "sketch_config_hash": pa.array([cfg_hash] * n),
        "wall_time_s": pa.array([round(wall, 3)] * n, pa.float64()),
    })
    tbl = tbl.replace_schema_metadata({
        "input_fingerprint": fingerprint,
        "sketch_config_hash": cfg_hash,
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic publish
    return path


def build_sketch_states_resumable(files: list[str], specs: dict[str, SketchSpec],
                                  ckpt_dir: str, *, key: str = "source",
                                  tokens_col: str = "tokens",
                                  files_per_partition: int = 1,
                                  batch_size: int | None = 8192,
                                  tree_width: int = 0) -> "ray.data.Dataset":
    """Checkpoint every partition (skipping valid ones), then reduce.

    Returns the per-key merged state Dataset, same schema as
    build_sketch_states.
    """
    partitions = partition_input_files(files, files_per_partition)
    paths = []
    for pid, part_files in enumerate(partitions):
        paths.append(build_partition_checkpoint(
            part_files, specs, pid, ckpt_dir, key, tokens_col, batch_size))
    ck = ray.data.read_parquet(paths)
    keep = [key, "n_rows", "n_tokens"] + [state_col(n) for n in specs]

    def strip(tbl: pa.Table) -> pa.Table:
        tbl = tbl.select(keep)
        import numpy as np

        salt = np.arange(tbl.num_rows, dtype=np.int64)
        return tbl.append_column("salt", pa.array(salt))

    partials = ck.map_batches(strip, batch_format="pyarrow")
    del tree_width  # subsumed by the sort-free combiner in merge_partials
    return merge_partials(partials, specs, key)


def checkpoint_progress(ckpt_dir: str) -> "pa.Table":
    """Lineage/progress report across existing checkpoints."""
    import glob

    paths = sorted(glob.glob(os.path.join(ckpt_dir, "part=*", "states.parquet")))
    tables = [pq.read_table(p, columns=["partition_id", "input_files",
                                        "input_fingerprint", "n_rows",
                                        "n_tokens", "wall_time_s"])
              for p in paths]
    if not tables:
        return pa.table({"partition_id": pa.array([], pa.int32())})
    return pa.concat_tables(tables)
