"""Sampling stages: deterministic per-key samples and hash-based splits.

Training-data pipelines cap per-domain document counts (anti-domination) and
carve held-out splits; both must be DETERMINISTIC (reruns and resumed runs
pick the same rows) and cheap at 100 TB (no global sort, no random state on
the driver).

Both operators rank rows by a Knuth multiplicative hash of the id column:
``priority(id) = (id * 2654435761) mod 2^32`` (Knuth, TAOCP vol. 3 §6.4).
The hash is SQL-expressible, so every sample here has an exact DuckDB oracle
— and it is uniform enough for anti-domination caps while staying replayable
from the id alone (no RNG to checkpoint).

Scale notes (100 TB design point):
  * ``per_key_sample`` is two-stage top-n: a per-batch partial top-n per key
    inside ``map_batches`` (so at most ``n_per_key`` rows per key per BLOCK
    enter the shuffle), then one ``groupby(key).map_groups`` merge.  Shuffle
    payload is candidates only — ids + keys, never documents.
  * ``hash_split`` is embarrassingly parallel (stateless filter per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["knuth_priority", "per_key_sample", "hash_split"]

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(0xFFFFFFFF)


def knuth_priority(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 — SQL mirror:
    ``(id * 2654435761) % 4294967296``."""
    with np.errstate(over="ignore"):
        return (ids.astype(np.uint64) * _KNUTH) & _MOD32


def _topn_per_key(tbl: pa.Table, key: str, id_col: str, n: int) -> pa.Table:
    """Keep the n smallest (priority, id) rows per key value — vectorized:
    one lexsort + within-key rank via cumcount."""
    if tbl.num_rows == 0:
        return tbl
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    keys = tbl.column(key)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    codes = keys.dictionary_encode()
    kc = np.asarray(codes.indices, dtype=np.int64)
    prio = knuth_priority(ids)
    order = np.lexsort((ids, prio, kc))
    kc_s = kc[order]
    boundary = np.ones(len(kc_s), dtype=bool)
    boundary[1:] = kc_s[1:] != kc_s[:-1]
    group_start = np.maximum.accumulate(np.where(boundary,
                                                 np.arange(len(kc_s)), 0))
    rank = np.arange(len(kc_s)) - group_start
    keep_sorted = order[rank < n]
    mask = np.zeros(tbl.num_rows, dtype=bool)
    mask[keep_sorted] = True
    return tbl.filter(pa.array(mask))


def per_key_sample(ds: "ray.data.Dataset", *, key: str = "source",
                   n_per_key: int = 100, id_col: str = "doc_id",
                   cols: list[str] | None = None) -> "ray.data.Dataset":
    """Deterministic uniform-without-replacement sample of ``n_per_key``
    rows per key (anti-domination cap).  Smallest Knuth priorities win;
    ties broken by id.  Output columns: ``cols`` (default: key + id only —
    join payloads back downstream; don't shuffle documents)."""
    cols = cols if cols is not None else [id_col, key]

    def partial(tbl: pa.Table) -> pa.Table:
        return _topn_per_key(tbl.select(cols), key, id_col, n_per_key)

    def final(tbl: pa.Table) -> pa.Table:
        return _topn_per_key(tbl, key, id_col, n_per_key)

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return cands.groupby(key).map_groups(final, batch_format="pyarrow")


def hash_split(ds: "ray.data.Dataset", *, test_permille: int = 100,
               id_col: str = "doc_id", split_col: str = "split"
               ) -> "ray.data.Dataset":
    """Deterministic train/test tag per row: rows whose
    ``priority mod 1000 < test_permille`` are 'test', the rest 'train'.
    Stateless per batch; the same id always lands in the same split, across
    reruns, resumes and repartitions."""

    def tag(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        is_test = (knuth_priority(ids) % np.uint64(1000)
                   < np.uint64(test_permille))
        lab = np.where(is_test, "test", "train")
        return tbl.append_column(split_col, pa.array(lab, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
