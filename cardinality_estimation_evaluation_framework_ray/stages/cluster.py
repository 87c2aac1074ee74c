"""Distributed k-means over an embedding column (full-corpus Lloyd's).

Unlike ``stages/ann.py:train_ivf_centroids`` (sample-trained coarse
quantizer), this is the full iterative operator: every Lloyd iteration is
one streaming pass where each task assigns ITS batch to the broadcast
centroids and emits only a (k x d) partial sum + (k,) counts — one tiny row
per BLOCK.  The driver folds the per-block partials (k*d floats per block;
KBs), updates centroids, and re-broadcasts.  The corpus is never shuffled
and never materialized; cost per iteration = one read + one matmul per
batch.

Determinism: centroids are initialized from the k rows with the smallest
Knuth-hash priorities (``stages/sampling.py`` contract) — no RNG on the
driver, so reruns converge identically given identical partial fold order;
``kmeans`` pins that order by enabling ``preserve_order`` on its iteration
context (without it the streaming executor may deliver blocks in any order).

At 100 TB: iterations dominate, so cap ``iters`` and use
``early_stop_shift`` (centroid drift threshold) — standard practice; the
per-iteration exchange stays KB-scale regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .ann import _emb_matrix
from .sampling import knuth_priority

__all__ = ["kmeans", "assign_clusters"]


def _init_centroids(ds: "ray.data.Dataset", k: int, emb_col: str,
                    id_col: str) -> np.ndarray:
    """k deterministic seed rows: smallest Knuth priorities of the id col."""

    def partial(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return tbl
        prio = knuth_priority(ids)
        keep = np.argsort(prio, kind="stable")[:k]
        return tbl.take(pa.array(np.sort(keep)))

    cands = ds.select_columns([id_col, emb_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    prio = knuth_priority(cands[id_col].to_numpy())
    order = np.argsort(prio, kind="stable")[:k]
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in cands[emb_col].iloc[order]])


def kmeans(ds: "ray.data.Dataset", k: int, *, iters: int = 20,
           emb_col: str = "embedding", id_col: str = "vec_id",
           early_stop_shift: float = 1e-6) -> tuple[np.ndarray, int]:
    """Lloyd's k-means; returns (centroids (k, d) float64, iterations run).

    Empty clusters keep their previous centroid (standard fallback)."""
    centroids = _init_centroids(ds, k, emb_col, id_col)
    vecs = ds.select_columns([emb_col])
    # identical reruns need a fixed float64 partial-fold order; block order
    # out of the streaming executor is only guaranteed under preserve_order.
    # The flag lives on the caller-shared DataContext, so restore it after —
    # leaking it would silently slow every later pipeline in the session.
    try:
        opts = vecs.context.execution_options
        prev_preserve = opts.preserve_order
        opts.preserve_order = True
    except AttributeError:  # older Ray without Dataset.context
        opts = prev_preserve = None
    try:
        return _lloyd_loop(vecs, centroids, iters, early_stop_shift, emb_col)
    finally:
        if opts is not None:
            opts.preserve_order = prev_preserve


def _lloyd_loop(vecs, centroids, iters, early_stop_shift, emb_col):
    n_it = 0
    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial_sums(tbl: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _emb_matrix(tbl, emb_col).astype(np.float64)
            # nearest centroid by Euclidean distance: argmax(2 x.c - |c|^2)
            assign = np.argmax(2.0 * (m @ c.T) - (c * c).sum(axis=1), axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.ravel().tolist()],
                                 pa.list_(pa.float64())),
                "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
            })

        total = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for b in vecs.map_batches(partial_sums, batch_format="pyarrow",
                                  zero_copy_batch=True).iter_batches(
                                      batch_format="pyarrow"):
            for s, c_ in zip(b.column("sums").to_pylist(),
                             b.column("counts").to_pylist()):
                total += np.asarray(s).reshape(centroids.shape)
                counts += np.asarray(c_, dtype=np.int64)
        nz = counts > 0
        new = centroids.copy()
        new[nz] = total[nz] / counts[nz, None]
        shift = float(np.sqrt(((new - centroids) ** 2).sum(axis=1)).max())
        centroids = new
        n_it += 1
        if shift < early_stop_shift:
            break
    return centroids, n_it


def assign_clusters(ds: "ray.data.Dataset", centroids: np.ndarray, *,
                    emb_col: str = "embedding", id_col: str = "vec_id"
                    ) -> "ray.data.Dataset":
    """Final assignment pass: (id, cluster, dist) per row."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(tbl: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _emb_matrix(tbl, emb_col).astype(np.float64)
        d2 = ((m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T)
              + (c * c).sum(axis=1))
        a = np.argmin(d2, axis=1)
        dist = np.sqrt(np.maximum(d2[np.arange(len(a)), a], 0.0))
        return pa.table({
            id_col: tbl.column(id_col),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(dist),
        })

    return ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
