"""Scale-safe shuffle plans for NARROW (metadata-only) groupbys.

Ray Data's default sort shuffle has each map task return one object per
reduce partition.  Objects under the raylet's inline threshold (~100 KB)
are not placed in plasma — they are stored in the OWNER's in-process
object store, and the owner of every Dataset block is the driver.  For a
narrow shuffle (e.g. an exact-dedup digest table at 16 B/row) every
(map, reduce-partition) cell is far below the threshold at any realistic
block count, so the ENTIRE shuffled table accumulates in driver heap until
the reduce stage drains it: measured 450 MB -> 4.4 GB driver RssAnon
across a 1.1e9 -> 1.1e10-token exact-dedup run (docs/SCALE_MEM_r05.json),
linear in input, while worker heaps stayed flat.  Inlined objects cannot
spill, so at the 10^12-sequence design point this OOMs the driver.

TWO fixes, measured head-to-head (docs/SCALE_MEM_r05.json):

* **Coalesce (preferred): keep the sort shuffle, make the cells fat.**
  ``repartition(n, shuffle=False)`` the narrow table to
  ``n = narrow_shuffle_blocks(total_bytes)`` blocks before the groupby so
  every (map, reduce) cell is ~``target_cell_bytes`` (default 1 MB) —
  above the inline threshold, so shuffle payload lives in plasma
  (spillable, shared) like any wide shuffle.  Coalesce moves block REFS,
  not an all-to-all; the sqrt sizing keeps n = 4000 even for a 16 TB
  narrow table (10^12 rows x 16 B), plenty of reduce parallelism for a
  256-node fleet while each cell stays MB-scale.

* **Hash-shuffle strategy (opt-in alternative): keep the driver out of
  the data path entirely.**  ``ShuffleStrategy.HASH_SHUFFLE`` streams map
  outputs to aggregator ACTORS.  Driver heap goes flat (measured), BUT in
  Ray 2.49 the aggregator's groupby finalize is per-row-costly: the 16
  aggregators each burned ~100% CPU for >13 min finalizing an 81 M-row
  count (vs 568 s wall for the whole sort plan) — 1.14x slower end-to-end
  at 8 M rows and CPU-pathological at 81 M.  Use it when the narrow table
  is small relative to cores, or when a future Ray release vectorizes the
  aggregator finalize.

SIZING MATTERS for hash shuffle: Ray's out-of-the-box defaults
(``default_hash_shuffle_parallelism=200``,
``max_hash_shuffle_aggregators=64``) assume a multi-node cluster.  On a
small local cluster the 64 aggregator actors fight the map tasks for
CPUs and the scheduler waits ``min_hash_shuffle_aggregator_wait_time_in_s``
(300 s) before degrading — observed as a test-suite "hang" at 4 CPUs.
``apply_hash_shuffle`` therefore caps partitions at 2x cluster CPUs and
aggregators at half the CPUs, which leaves the other half for upstream map
tasks.  On a real 256-node fleet the same formula scales the pool up with
the CPU budget.

The strategy is captured from ``DataContext.get_current()`` when a Dataset
is CREATED, so wrap dataset construction, not execution::

    with hash_shuffle():
        deduped = ds.map_batches(digest).groupby("digest").count()
    n = deduped.count()   # executes under hash shuffle

Kept opt-in (not the global default) because the sort shuffle's plans are
what every oracle-gated query was validated under, and wide-row shuffles
(where cells exceed the inline threshold) spill fine under sort.
"""

from __future__ import annotations

import math
from contextlib import contextmanager

# Raylet inline threshold is ~100 KB; target cells an order of magnitude
# above it so schema/metadata overhead can't drag a cell back under.
_INLINE_BYTES = 100 * 1024
DEFAULT_CELL_BYTES = 1 << 20


def narrow_shuffle_blocks(total_bytes: int, *,
                          target_cell_bytes: int = DEFAULT_CELL_BYTES,
                          parallelism_floor: int | None = None,
                          min_blocks: int = 8,
                          max_blocks: int = 4096) -> int:
    """Block count for a narrow table about to be sort-shuffled, sized so
    each (map, reduce) shuffle cell is at or above Ray's ~100 KB inline
    threshold (with margin), keeping shuffle payload in plasma (spillable)
    instead of the driver's in-process store.

    A sort shuffle with n map blocks and n reduce partitions splits
    ``total_bytes`` into n^2 cells, so the memory-preferred count is
    ``n = sqrt(total / target_cell_bytes)`` (~1 MB cells).  When that
    lands BELOW the cluster's CPU count, parallelism is raised back up to
    ``min(parallelism_floor, sqrt(total / 128 KB))`` — as many blocks as
    the cluster has cores, provided every cell still clears the inline
    threshold with margin.  The sqrt keeps n useful at ANY scale: a 16 TB
    narrow table (10^12 rows x 16 B digests) gives ~3.9k blocks — MB-scale
    cells and ample reduce parallelism for a 256-node fleet — while a
    200 MB table on 32 CPUs gets 32 blocks (190 KB cells) instead of
    inheriting the corpus's hundreds.  ``parallelism_floor`` defaults to
    the live cluster's CPU count (8 if Ray isn't initialised);
    ``min_blocks`` floors tiny tables, ``max_blocks`` caps scheduler
    pressure.
    """
    if total_bytes <= 0:
        return min_blocks
    if parallelism_floor is None:
        parallelism_floor = 8
        try:
            import ray

            if ray.is_initialized():
                parallelism_floor = int(
                    ray.cluster_resources().get("CPU", 0)) or 8
        except Exception:
            pass
    n_pref = int(math.sqrt(total_bytes / max(target_cell_bytes,
                                             _INLINE_BYTES)))
    # largest n that keeps every cell >= 1.25x the inline threshold
    n_safe = int(math.sqrt(total_bytes / (_INLINE_BYTES + _INLINE_BYTES // 4)))
    n = max(n_pref, min(parallelism_floor, n_safe))
    return max(min_blocks, min(max_blocks, max(n, 1)))


def apply_hash_shuffle(ctx, num_partitions: int | None = None) -> tuple[int, int]:
    """Mutate ``ctx`` (a ``DataContext``) to use HASH_SHUFFLE with
    partition / aggregator counts sized to the CURRENT cluster.

    Returns ``(num_partitions, num_aggregators)`` actually applied.

    * partitions: ``min(ctx default, 2 x cluster CPUs)`` — enough shards
      for parallelism + skew absorption without hundreds of tiny
      partitions on a small cluster (caller may override).
    * aggregators: at most half the CPUs (and never more than the
      partition count) — the other half keeps upstream map tasks running;
      Ray assigns each aggregator ``ceil(partitions / aggregators)``
      partitions and a matching fractional CPU share.
    """
    import ray
    from ray.data.context import ShuffleStrategy

    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    if num_partitions is None:
        num_partitions = max(2, min(ctx.default_hash_shuffle_parallelism,
                                    2 * cpus))
    num_aggregators = max(1, min(ctx.max_hash_shuffle_aggregators,
                                 cpus // 2 or 1, num_partitions))
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = num_partitions
    ctx.max_hash_shuffle_aggregators = num_aggregators
    return num_partitions, num_aggregators


def use_hash_shuffle(ds, num_partitions: int | None = None):
    """Switch an ALREADY-CREATED Dataset's lineage to the hash-shuffle
    strategy and return it.

    A Dataset snapshots ``DataContext`` at creation; downstream operators
    read the snapshot, so ``hash_shuffle()`` around a later ``groupby`` is
    a no-op.  Mutating ``ds.context`` retro-fits the strategy onto the
    lineage — every subsequent groupby/repartition of datasets derived
    from ``ds`` runs hash-partitioned through aggregator actors (verified:
    the plan switches to hash aggregate and results match the sort plan,
    tests/test_shuffleopt.py) — without touching the global context.

    Stages whose shuffle payload is metadata-narrow (hash+id rows) expose
    ``shuffle="hash"`` and call this; see the module docstring for why the
    sort shuffle's inline objects pin narrow tables in DRIVER heap.
    """
    apply_hash_shuffle(ds.context, num_partitions)
    return ds


@contextmanager
def hash_shuffle(num_partitions: int | None = None):
    """Temporarily set the GLOBAL Ray Data shuffle strategy to
    HASH_SHUFFLE (cluster-sized, see ``apply_hash_shuffle``) for datasets
    created inside the block; restores the previous strategy, parallelism
    and aggregator cap on exit."""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    prev = (ctx.shuffle_strategy, ctx.default_hash_shuffle_parallelism,
            ctx.max_hash_shuffle_aggregators)
    apply_hash_shuffle(ctx, num_partitions)
    try:
        yield ctx
    finally:
        (ctx.shuffle_strategy, ctx.default_hash_shuffle_parallelism,
         ctx.max_hash_shuffle_aggregators) = prev
