"""Streaming-memory evidence for the 10^12-sequence design point
(BASELINE.json): run the headline multi-sketch build AND an exact content-
dedup pipeline over a >= 10^10-token ON-THE-FLY synthetic corpus (datagen
is counter-based: `tokens_dataset` generates from ray.data.range, nothing
touches disk) at 1x and 10x scale, and record wall, tokens/s, peak DRIVER
heap and peak per-WORKER heap.

Measurement design (the round-4 artifact got this wrong and looked like a
leak):
  * each (leg, pipeline) cell runs in a FRESH SUBPROCESS with its own Ray
    cluster — VmHWM is kernel-monotone for a process's whole lifetime, so
    sharing one driver across legs makes every later leg inherit every
    earlier peak;
  * RssAnon (private heap) is reported separately from RssShmem (plasma
    /dev/shm pages mapped into the process) — shuffle blocks living in the
    object store are the DESIGN (spillable, shared, bounded by
    object_store_memory), not process heap, and folding them into one RSS
    number makes the bounded-heap claim unfalsifiable.

Flat anon peaks across the 10x step are the bounded-heap-at-unbounded-input
claim, measured instead of asserted (docs/SCALE.md).

Usage: python tools/scale_memory.py [out.json]
         (default docs/SCALE_MEM_r05.json; GRAFT_SCALE_TOKENS overrides the
          big leg's token target, default 1.1e10)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


# -- RSS sampling ------------------------------------------------------------

_FIELDS = ("VmHWM", "RssAnon", "RssShmem")


def _mem_kb(pid: int | str) -> dict[str, int]:
    """VmHWM / RssAnon / RssShmem of a pid in kB; {} if gone/unreadable."""
    out: dict[str, int] = {}
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                k = line.split(":", 1)[0]
                if k in _FIELDS:
                    out[k] = int(line.split()[1])
    except OSError:
        pass
    return out


def _ray_worker_pids() -> list[int]:
    """Pids of live ray worker processes (cmdline contains 'ray::' while a
    task runs, or the default_worker entrypoint between tasks)."""
    pids = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"ray::" in cmd or b"default_worker.py" in cmd:
            pids.append(int(d))
    return pids


class PeakSampler:
    """Polls driver + ray-worker memory on a thread.  VmHWM is kernel-side
    monotone per process, so sampling every 0.5 s cannot miss a peak of a
    process that survives >= one interval; RssAnon/RssShmem are
    point-in-time, so their peaks are sampled maxima (lower bounds)."""

    def __init__(self, interval: float = 0.5):
        self._interval = interval
        self._stop = threading.Event()
        self.driver = dict.fromkeys(_FIELDS, 0)
        self.worker = dict.fromkeys(_FIELDS, 0)   # max over all workers
        self._t = threading.Thread(target=self._run, daemon=True)

    def _fold(self, acc: dict, cur: dict) -> None:
        for k, v in cur.items():
            if v > acc[k]:
                acc[k] = v

    def _run(self):
        me = os.getpid()
        while not self._stop.is_set():
            self._fold(self.driver, _mem_kb(me))
            for pid in _ray_worker_pids():
                self._fold(self.worker, _mem_kb(pid))
            self._stop.wait(self._interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


# -- pipelines ---------------------------------------------------------------

def _spec_for_tokens(target_tokens: int):
    """Bench-shaped TokensTableSpec sized to ~target_tokens total."""
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        TokensTableSpec,
    )

    mean_tok = (16 + 256) / 2.0
    rows = int(target_tokens / mean_tok / 20)
    return TokensTableSpec(num_sources=20, rows_per_source=rows, min_tok=16,
                           max_tok=256, universe_size=2_000_000,
                           zipf_sources=True, seed=42)


def run_build(spec, num_blocks: int) -> dict:
    """Headline multi-sketch build over the streaming generator."""
    sys.path.insert(0, REPO)
    from bench import _multi_specs

    from cardinality_estimation_evaluation_framework_ray.pipelines.reach import (
        reach_report,
    )
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        tokens_dataset,
    )

    ds = tokens_dataset(spec, override_num_blocks=num_blocks)
    df = reach_report(ds, _multi_specs(), batch_size=16384, mode="epoch")
    return {"rows": len(df)}


def run_dedup(spec, num_blocks: int) -> dict:
    """Exact content-dedup over the same stream: per-row order-sensitive
    token digest (vectorized reduceat fold), then ONE metadata-only groupby
    over (digest) — the shuffle moves 16 bytes/row, never tokens."""
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.functions.hashing import (
        hash64,
    )
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        tokens_dataset,
    )

    def digest(t: pa.Table) -> pa.Table:
        toks = t.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(toks.flatten(), dtype=np.int64)
        offs = np.asarray(toks.offsets, dtype=np.int64)
        n = len(offs) - 1
        lengths = np.diff(offs)
        # order-sensitive: mix each token with its within-row position
        within = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], lengths)
        h = hash64(flat * np.int64(1_000_003) + within, 7).astype(np.int64)
        # per-row XOR fold + length mix (reduceat handles empty rows via
        # equal offsets only when guarded — datagen rows are never empty)
        row_x = np.bitwise_xor.reduceat(h, offs[:-1])
        d = hash64(row_x ^ (lengths * np.int64(0x9E3779B1)), 11).astype(
            np.int64)
        return pa.table({"digest": pa.array(d),
                         "one": pa.array(np.ones(n, np.int64))})

    ds = tokens_dataset(spec, override_num_blocks=num_blocks)
    narrow = ds.map_batches(digest, batch_format="pyarrow",
                            zero_copy_batch=True)
    if os.environ.get("GRAFT_SHUFFLE", "") == "coalesce":
        # the preferred narrow-shuffle fix: coalesce the 24 B/row digest
        # table so each sort-shuffle (map, reduce) cell is ~1 MB — above
        # the raylet inline threshold, so shuffle payload stays in plasma
        # instead of driver heap (functions/shuffleopt.py docstring)
        from cardinality_estimation_evaluation_framework_ray.functions.shuffleopt import (
            narrow_shuffle_blocks,
        )

        n = narrow_shuffle_blocks(spec.total_rows * 24)
        narrow = narrow.repartition(n, shuffle=False)
    dup = narrow.groupby("digest").count()
    import pyarrow.compute as pc

    def only_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("count()"), 1))

    n_dup_groups = dup.map_batches(only_dups,
                                   batch_format="pyarrow").count()
    return {"dup_groups": int(n_dup_groups)}


_PIPELINES = {"build_multi": run_build, "dedup_exact": run_dedup}


def run_cell(pipeline: str, target_tokens: int, num_blocks: int) -> dict:
    """One (leg, pipeline) measurement inside a fresh process + Ray cluster."""
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", object_store_memory=8 << 30)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # GRAFT_SHUFFLE=hash routes groupby map outputs through aggregator
    # ACTORS (ray.data ShuffleStrategy.HASH_SHUFFLE) instead of the default
    # sort shuffle, whose per-(map, reduce-partition) objects fall under
    # Ray's ~100 KB inline threshold for narrow (16 B/row) tables and are
    # then stored in the DRIVER's in-process object store — driver heap
    # grows with total shuffled bytes (measured: 450 MB -> 4.4 GB across
    # the 1x -> 10x legs).  Hash shuffle keeps the driver out of the data
    # path entirely.
    shuffle_sizing = None
    if os.environ.get("GRAFT_SHUFFLE", "") == "hash":
        from cardinality_estimation_evaluation_framework_ray.functions.shuffleopt import (
            apply_hash_shuffle,
        )

        # cluster-sized partitions/aggregators — Ray's 200/64 defaults
        # deadlock or crash a small local cluster (shuffleopt docstring)
        shuffle_sizing = apply_hash_shuffle(DataContext.get_current())
    spec = _spec_for_tokens(target_tokens)
    n_tokens_est = int(spec.total_rows * (16 + 256) / 2)
    fn = _PIPELINES[pipeline]
    # warm the cluster (worker startup, plasma map) outside the timed window
    fn(_spec_for_tokens(2_000_000), 4)
    with PeakSampler() as ps:
        t0 = time.perf_counter()
        r = fn(spec, num_blocks)
        wall = time.perf_counter() - t0
    ray.shutdown()
    return {
        **r,
        "shuffle": os.environ.get("GRAFT_SHUFFLE", "sort"),
        "hash_partitions_aggregators": shuffle_sizing,
        "rows": spec.total_rows,
        "approx_tokens": n_tokens_est,
        "wall_sec": round(wall, 2),
        "tokens_per_sec": round(n_tokens_est / wall, 1),
        "driver_peak_anon_mb": round(ps.driver["RssAnon"] / 1024, 1),
        "driver_peak_shmem_mb": round(ps.driver["RssShmem"] / 1024, 1),
        "driver_peak_rss_mb": round(ps.driver["VmHWM"] / 1024, 1),
        "worker_peak_anon_mb": round(ps.worker["RssAnon"] / 1024, 1),
        "worker_peak_shmem_mb": round(ps.worker["RssShmem"] / 1024, 1),
        "worker_peak_rss_mb": round(ps.worker["VmHWM"] / 1024, 1),
    }


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--cell":
        # child mode: --cell <pipeline> <tokens> <blocks>
        res = run_cell(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        print("CELL_JSON " + json.dumps(res), flush=True)
        return 0

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "docs", "SCALE_MEM_r05.json")
    big = int(float(os.environ.get("GRAFT_SCALE_TOKENS", "1.1e10")))
    legs = []
    # dedup_exact runs under ALL THREE shuffle plans: the default sort
    # shuffle exhibits the narrow-shuffle driver-inline pathology (the
    # round-5 finding); coalesce and hash are its two fixes — see
    # functions/shuffleopt.py for the mechanism and tradeoff.
    cells = [("build_multi", ""), ("dedup_exact", ""),
             ("dedup_exact_coalesce_fix", "coalesce"),
             ("dedup_exact_hash_fix", "hash")]
    for leg, tokens, blocks in (("1x", big // 10, 64), ("10x", big, 640)):
        row: dict = {"leg": leg, "num_blocks": blocks}
        for name, shuffle in cells:
            pipeline = name.split("_hash_fix")[0].split("_coalesce_fix")[0]
            env = dict(os.environ)
            if shuffle:
                env["GRAFT_SHUFFLE"] = shuffle
            else:
                env.pop("GRAFT_SHUFFLE", None)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cell",
                 pipeline, str(tokens), str(blocks)],
                capture_output=True, text=True, cwd=REPO, env=env)
            cell = None
            for line in proc.stdout.splitlines():
                if line.startswith("CELL_JSON "):
                    cell = json.loads(line[len("CELL_JSON "):])
            if cell is None:
                cell = {"error": (proc.stderr or proc.stdout)[-2000:],
                        "rc": proc.returncode}
            row[name] = cell
            print(json.dumps({leg: name, **cell}), flush=True)
        row["rows"] = row["build_multi"].get("rows")
        row["approx_tokens"] = row["build_multi"].get("approx_tokens")
        legs.append(row)
    payload = {
        "design_point": "10^12 sequences (BASELINE.json)",
        "method": "on-the-fly counter-based generation "
                  "(sources/datagen.py tokens_dataset); each (leg, pipeline) "
                  "cell in a fresh subprocess + fresh Ray cluster (per-cell "
                  "VmHWM honesty); RssAnon (private heap) vs RssShmem "
                  "(mapped plasma /dev/shm pages) sampled 2 Hz across "
                  "driver + ray workers; warmup run before each timed cell",
        "finding": "dedup_exact under the default sort shuffle grows DRIVER "
                   "RssAnon linearly with input (every (map, reduce) cell of "
                   "the 16 B/row digest shuffle is < Ray's ~100 KB inline "
                   "threshold, so the whole shuffled table is stored in the "
                   "driver-owned in-process object store, unspillable). "
                   "dedup_exact_coalesce_fix repartitions the narrow table "
                   "to narrow_shuffle_blocks(bytes) blocks first (cells "
                   ">= ~200 KB -> plasma): driver bounded and fastest under "
                   "contemporaneous load. dedup_exact_hash_fix uses "
                   "ShuffleStrategy.HASH_SHUFFLE aggregator actors: driver "
                   "flat but ~2x slower in Ray 2.49 (per-row aggregator "
                   "finalize). Wall times are comparable only WITHIN one "
                   "run of this tool (ambient sandbox load moved the same "
                   "sort cell 74 s -> 220 s across rounds); memory peaks "
                   "are load-independent. See functions/shuffleopt.py.",
        "legs": legs,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"out": out_path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
