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
                               partition_id: "int | str", ckpt_dir: str,
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
    pid_type = pa.int32() if isinstance(partition_id, int) else pa.string()
    tbl = pa.table({
        **{k: pa.array(v) for k, v in cols.items()},
        "partition_id": pa.array([partition_id] * n, pid_type),
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
    if batch_size is None:
        batch_size = 8192  # engine default; pyarrow iter_batches needs an int
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    partitions = partition_input_files(files, files_per_partition)
    paths = []
    for pid, part_files in enumerate(partitions):
        paths.append(build_partition_checkpoint(
            part_files, specs, pid, ckpt_dir, key, tokens_col, batch_size))
    del tree_width  # subsumed by the sort-free combiner in merge_partials
    return _reduce_checkpoints(paths, specs, key)


def _reduce_checkpoints(paths: list[str], specs: dict[str, SketchSpec],
                        key: str) -> "ray.data.Dataset":
    """Merge per-partition checkpoint tables through the usual merge tree."""
    ck = ray.data.read_parquet(paths)
    keep = [key, "n_rows", "n_tokens"] + [state_col(n) for n in specs]

    def strip(tbl: pa.Table) -> pa.Table:
        tbl = tbl.select(keep)
        import numpy as np

        salt = np.arange(tbl.num_rows, dtype=np.int64)
        return tbl.append_column("salt", pa.array(salt))

    partials = ck.map_batches(strip, batch_format="pyarrow")
    return merge_partials(partials, specs, key)


def stable_partition_label(files: list[str], *,
                           root: str | None = None) -> str:
    """Order-independent partition id: digest of the partition's file PATHS
    (not stat) — stable across corpus appends, re-listings and reorderings,
    unlike the positional ids of ``build_sketch_states_resumable``.  Full
    normalized paths, not basenames: two shard directories routinely reuse
    the same file names (2024/part-0.parquet vs 2025/part-0.parquet), and a
    basename digest would collide their checkpoints onto one path —
    double-merging one partition and silently dropping the other.

    Pass ``root`` (the corpus directory) when one is known: paths are then
    digested RELATIVE to it, so relocating or remounting the corpus — or
    listing it via a different path prefix — keeps every checkpoint valid.
    Without a root the absolute path is the identity, and moving the
    corpus invalidates checkpoints (a full rebuild, not corruption).
    NOTE: adding a root where none was used before (or vice versa) is a
    one-time invalidation of checkpoints created under the other scheme.
    """
    if root is not None:
        norm = sorted(os.path.relpath(os.path.normpath(f),
                                      os.path.normpath(root))
                      for f in files)
    else:
        norm = sorted(os.path.normpath(f) for f in files)
    joined = ";".join(norm)
    return hashlib.sha1(joined.encode()).hexdigest()[:16]


def build_sketch_states_incremental(
        files: list[str], specs: dict[str, SketchSpec], ckpt_dir: str, *,
        key: str = "source", tokens_col: str = "tokens",
        files_per_partition: int = 1, batch_size: int | None = 8192,
        corpus_root: str | None = None):
    """Append-friendly resumable build over a GROWING corpus directory.

    Partitions are keyed by ``stable_partition_label`` (a digest of their
    file names) instead of their position in the sorted listing, so
    appending files to the corpus leaves every existing checkpoint's path
    AND validity untouched: a re-run builds only the new (or
    content-changed, per input fingerprint) partitions and re-reduces.
    Positional ids would shift on append and invalidate everything after
    the insertion point.

    Pass ``corpus_root`` (the directory the files were listed under) so
    labels survive corpus relocation/remount — see
    ``stable_partition_label``; switching an existing checkpoint dir to a
    root (or away from one) is a one-time full rebuild.

    Returns ``(merged per-key state Dataset, report)`` where ``report`` is
    ``{"reused": [...], "built": [...]}`` partition labels — the lineage a
    scheduler logs per incremental run.
    """
    if batch_size is None:
        batch_size = 8192
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    cfg_hash = _config_hash(specs)
    paths, reused, built = [], [], []
    for part_files in partition_input_files(files, files_per_partition):
        label = stable_partition_label(part_files, root=corpus_root)
        path = _ckpt_path(ckpt_dir, label)
        if _checkpoint_is_valid(path, _fingerprint(part_files), cfg_hash):
            reused.append(label)
        else:
            built.append(label)
        paths.append(build_partition_checkpoint(
            part_files, specs, label, ckpt_dir, key, tokens_col, batch_size))
    merged = _reduce_checkpoints(paths, specs, key)
    return merged, {"reused": sorted(reused), "built": sorted(built)}


def _write_checkpoint(path: str, cols: dict, specs: dict[str, SketchSpec],
                      key: str, partition_id: int, files: list[str],
                      fingerprint: str, cfg_hash: str, wall: float) -> None:
    """Atomic publish of one partition's per-key state table + lineage."""
    n = len(cols[key])
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
    # pid-unique tmp so a retried/duplicate task can't corrupt a half-write
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic publish


def _epoch_partition_build(files: list[str], specs: dict[str, SketchSpec],
                           partition_id: int, ckpt_dir: str, key: str,
                           tokens_col: str, batch_size: int,
                           _test_fail_once: str | None = None) -> str:
    """Worker body: accumulate one partition epoch-style, checkpoint once.

    Epoch semantics inside the recovery unit: per-key sketches update IN
    PLACE across every batch of the partition (states serialized exactly
    once, at the flush) — the epoch plan's blast radius becomes one
    partition instead of the whole stream (VERDICT r3 item 8).  The
    partition is read directly with pyarrow (row-group streaming): the task
    IS the pipeline here, so no nested Ray Data session is needed.
    """
    import numpy as np

    from ..state.base import Sketch  # noqa: F401  (spec.new() path)
    from .build import iter_key_tokens, state_col as _sc

    path = _ckpt_path(ckpt_dir, partition_id)
    fingerprint = _fingerprint(files)
    cfg_hash = _config_hash(specs)
    if _checkpoint_is_valid(path, fingerprint, cfg_hash):
        return path
    if _test_fail_once is not None and not os.path.exists(_test_fail_once):
        # kill-an-actor injection for tests: die like a preempted worker
        open(_test_fail_once, "w").close()
        os._exit(1)
    t0 = time.time()
    states: dict = {}
    meta: dict = {}
    for f in sorted(files):
        pf = pq.ParquetFile(f)
        for rb in pf.iter_batches(batch_size=batch_size,
                                  columns=[key, tokens_col]):
            batch = pa.Table.from_batches([rb])
            keys_np = batch.column(key).to_numpy(zero_copy_only=False)
            uk, cnt = np.unique(keys_np, return_counts=True)
            rows_per_key = dict(zip(uk.tolist(), cnt.tolist()))
            for kv, toks in iter_key_tokens(batch, key, tokens_col):
                st = states.get(kv)
                if st is None:
                    st = {n: spec.new() for n, spec in specs.items()}
                    states[kv] = st
                    meta[kv] = [0, 0]
                for n in specs:
                    st[n].update_tokens(toks)
                meta[kv][0] += int(rows_per_key.get(kv, 0))
                meta[kv][1] += len(toks)
    keys_sorted = sorted(states)
    cols: dict = {
        key: keys_sorted,
        "n_rows": [meta[k][0] for k in keys_sorted],
        "n_tokens": [meta[k][1] for k in keys_sorted],
    }
    for n in specs:
        cols[_sc(n)] = [states[k][n].to_bytes() for k in keys_sorted]
    _write_checkpoint(path, cols, specs, key, partition_id, files,
                      fingerprint, cfg_hash, time.time() - t0)
    return path


def build_sketch_states_epoch_resumable(
        files: list[str], specs: dict[str, SketchSpec], ckpt_dir: str, *,
        key: str = "source", tokens_col: str = "tokens",
        files_per_partition: int = 1, batch_size: int | None = 8192,
        max_retries: int = 3,
        _test_fail_once: str | None = None) -> "ray.data.Dataset":
    """Epoch-plan build with per-partition checkpoints and task-level retry.

    Every input partition runs as ONE Ray task that accumulates its per-key
    states in place and atomically checkpoints them (``_epoch_partition_
    build``); partitions run in parallel, a dead worker is retried by Ray
    (``max_retries``) and — because the checkpoint is the recovery unit — a
    rerun of the whole build skips every partition whose checkpoint is valid.
    Estimates equal the non-resumable epoch build (associative merges).

    Returns the per-key merged state Dataset (same schema as
    ``build_sketch_states``).
    """
    import ray

    if batch_size is None:
        batch_size = 8192  # engine default; pyarrow iter_batches needs an int
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    partitions = partition_input_files(files, files_per_partition)
    task = ray.remote(num_cpus=1, max_retries=max_retries)(
        _epoch_partition_build)
    refs = []
    for pid, part_files in enumerate(partitions):
        fail = _test_fail_once if (_test_fail_once and pid == 0) else None
        refs.append(task.remote(part_files, specs, pid, ckpt_dir, key,
                                tokens_col, batch_size,
                                _test_fail_once=fail))
    paths = ray.get(refs)
    ck = ray.data.read_parquet(paths)
    keep = [key, "n_rows", "n_tokens"] + [state_col(n) for n in specs]
    partials = ck.map_batches(lambda t: t.select(keep),
                              batch_format="pyarrow")
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
