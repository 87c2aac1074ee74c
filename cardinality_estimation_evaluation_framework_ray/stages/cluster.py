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

from contextlib import contextmanager

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .ann import _emb_matrix
from .sampling import knuth_priority

__all__ = ["kmeans", "assign_clusters", "pca_fit", "pca_transform",
           "logistic_fit", "logistic_predict"]


@contextmanager
def _preserved_order(ds: "ray.data.Dataset"):
    """Pin the streaming executor's block delivery order for the enclosed
    iteration (identical reruns need a fixed float64 partial-fold order),
    then RESTORE the caller-shared DataContext flag — leaking it would
    silently slow every later pipeline in the session.  No-op on older Ray
    without Dataset.context."""
    try:
        opts = ds.context.execution_options
        prev = opts.preserve_order
        opts.preserve_order = True
    except AttributeError:
        opts = prev = None
    try:
        yield
    finally:
        if opts is not None:
            opts.preserve_order = prev


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
    with _preserved_order(vecs):
        return _lloyd_loop(vecs, centroids, iters, early_stop_shift, emb_col)


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


def pca_fit(ds: "ray.data.Dataset", *, k: int, emb_col: str = "embedding"
            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA fit: returns (mean (d,), components (k, d),
    explained_variance (k,)).

    One streaming pass folds per-block second-moment partials — each block
    emits ONE row of (n, Σv, ΣvᵀV flattened): d²·8 bytes (d=64 → 32 KB),
    independent of block size — then the driver assembles the d×d
    covariance and runs a LOCAL ``eigh`` (d×d is tiny by contract; PCA over
    wide features needs a different algorithm, not a bigger driver).  The
    corpus is never shuffled or materialized.

    Determinism: the same preserve_order treatment as ``kmeans`` pins the
    float64 fold order; component SIGN is fixed by convention (the
    largest-|coefficient| entry of each component is made positive), so
    reruns and the transform stage agree.
    """
    vecs = ds.select_columns([emb_col])
    with _preserved_order(vecs):
        def partial(tbl: pa.Table) -> pa.Table:
            m = _emb_matrix(tbl, emb_col).astype(np.float64)
            return pa.table({
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0).tolist()],
                              pa.list_(pa.float64())),
                "ss": pa.array([(m.T @ m).ravel().tolist()],
                               pa.list_(pa.float64())),
            })

        n_tot, s_tot, ss_tot = 0, None, None
        for b in vecs.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True).iter_batches(
                                      batch_format="pyarrow"):
            for n, s, ss in zip(b.column("n").to_pylist(),
                                b.column("s").to_pylist(),
                                b.column("ss").to_pylist()):
                n_tot += n
                s_tot = np.asarray(s) if s_tot is None else s_tot + np.asarray(s)
                ss_tot = (np.asarray(ss) if ss_tot is None
                          else ss_tot + np.asarray(ss))
    d = len(s_tot)
    mu = s_tot / n_tot
    cov = ss_tot.reshape(d, d) / n_tot - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T               # (k, d)
    # sign convention: largest-|coeff| entry of each component positive
    flip = np.sign(comps[np.arange(k), np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    return mu, comps, evals[order]


def pca_transform(ds: "ray.data.Dataset", mu: np.ndarray,
                  components: np.ndarray, *, emb_col: str = "embedding",
                  id_col: str = "vec_id",
                  out_col: str = "pc") -> "ray.data.Dataset":
    """Project each embedding onto the fitted components: one broadcast of
    (μ, W) via ``ray.put``, one matmul per batch, output
    (id, list<float> of k scores)."""
    ref = ray.put((mu.astype(np.float64), components.astype(np.float64)))

    def project(tbl: pa.Table) -> pa.Table:
        m_, w_ = ray.get(ref)
        m = _emb_matrix(tbl, emb_col).astype(np.float64)
        proj = (m - m_) @ w_.T
        return pa.table({
            id_col: tbl.column(id_col),
            out_col: pa.array(proj.tolist(), pa.list_(pa.float64())),
        })

    return ds.select_columns([id_col, emb_col]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True)


def grouped_centroids(ds: "ray.data.Dataset", *, key: str,
                      emb_col: str = "embedding",
                      quant: float = 1e6) -> "pd.DataFrame":
    """Per-group embedding centroid as EXACT integer component sums: each
    batch quantizes its (n × d) block to int64 (floor(x·quant + 0.5)) and
    scatter-adds one (groups × d) partial — at most #in-batch-groups × d
    long-format rows leave a batch — then ONE KB-scale groupby folds them.
    Returns (key, dim, s, n): exact integers, so the result hash-matches a
    zipped-unnest SQL oracle with no float-fold-order caveat; the mean is
    ``s / (n · quant)`` downstream.

    This is the kmeans building block exposed as an aggregate (a kmeans
    iteration is exactly this with the assignment as ``key``), and the
    class-prototype op of an embedding-curation pipeline (per-label
    prototypes, drift checks between shards).
    """
    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from .ann import _emb_matrix

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, emb_col).astype(np.float64)
        q = np.floor(m * quant + 0.5).astype(np.int64)
        kcol = t.column(key)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = kcol.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        k, d = len(enc.dictionary), q.shape[1]
        acc = np.zeros((k, d), dtype=np.int64)
        np.add.at(acc, codes, q)
        cnt = np.bincount(codes, minlength=k).astype(np.int64)
        keys = enc.dictionary.to_numpy(zero_copy_only=False)
        return pa.table({
            key: pa.array(np.repeat(keys, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "__s": pa.array(acc.reshape(-1)),
            "__n": pa.array(np.repeat(cnt, d)),
        })

    out = (ds.select_columns([key, emb_col])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby([key, "dim"])
           .aggregate(Sum("__s", alias_name="s"),
                      Sum("__n", alias_name="n"))
           .to_pandas())
    out["s"] = out["s"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return (out.sort_values([key, "dim"]).reset_index(drop=True))


def logistic_fit(ds: "ray.data.Dataset", *, emb_col: str = "embedding",
                 label_col: str = "label", positive: int = 0,
                 iters: int = 12, l2: float = 1e-3,
                 tol: float = 1e-8) -> tuple[np.ndarray, float, int]:
    """Distributed binary logistic regression (one-vs-rest on
    ``label == positive``) by Newton / IRLS.

    Returns (weights (d,), intercept, iterations run).  Each Newton step is
    ONE streaming pass: every task emits its block's gradient (d+1,) and
    Hessian ((d+1)^2,) partials — a few KB per BLOCK regardless of corpus
    size — the driver folds them, solves the (d+1) system, and
    re-broadcasts.  Same exchange shape as ``kmeans``/``pca_fit``: the
    corpus never shuffles, never materializes; cost per iteration = one
    read + one matmul per batch.  L2 ridge (never on the intercept) keeps
    the Hessian PD on separable data, where unregularized logistic
    diverges.

    Determinism: identical reruns need a fixed float64 partial-fold order —
    the same ``preserve_order`` treatment as ``kmeans``.
    """
    first = ds.take(1)
    if not first:
        raise ValueError("logistic_fit: empty dataset")
    d = len(first[0][emb_col])
    beta = np.zeros(d + 1, dtype=np.float64)  # [w, b]
    cols = ds.select_columns([emb_col, label_col])
    with _preserved_order(cols):
        return _newton_loop(cols, beta, positive, iters, l2, tol,
                            emb_col, label_col)


def _newton_loop(cols, beta, positive, iters, l2, tol, emb_col, label_col):
    d = len(beta) - 1
    n_it = 0
    for _ in range(iters):
        b_ref = ray.put(beta)

        def partial(tbl: pa.Table) -> pa.Table:
            bt = ray.get(b_ref)
            m = _emb_matrix(tbl, emb_col).astype(np.float64)
            y = (tbl.column(label_col).to_numpy(zero_copy_only=False)
                 == positive).astype(np.float64)
            x = np.concatenate([m, np.ones((len(m), 1))], axis=1)
            eta = np.clip(x @ bt, -30.0, 30.0)  # sigmoid saturates; no overflow
            p = 1.0 / (1.0 + np.exp(-eta))
            g = x.T @ (y - p)                   # (d+1,) gradient partial
            w = p * (1.0 - p)
            h = x.T @ (x * w[:, None])          # (d+1, d+1) Hessian partial
            return pa.table({
                "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                "h": pa.array([h.ravel().tolist()], pa.list_(pa.float64())),
            })

        grad = np.zeros(d + 1)
        hess = np.zeros((d + 1, d + 1))
        for b in cols.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True).iter_batches(
                                      batch_format="pyarrow"):
            for gv, hv in zip(b.column("g").to_pylist(),
                              b.column("h").to_pylist()):
                grad += np.asarray(gv)
                hess += np.asarray(hv).reshape(d + 1, d + 1)
        # ridge on weights only; intercept unpenalized
        reg = np.full(d + 1, l2)
        reg[d] = 0.0
        grad -= reg * beta
        hess += np.diag(reg)
        step = np.linalg.solve(hess, grad)
        beta = beta + step
        n_it += 1
        if float(np.abs(step).max()) < tol:
            break
    return beta[:d], float(beta[d]), n_it


def logistic_predict(ds: "ray.data.Dataset", weights: np.ndarray,
                     intercept: float, *, emb_col: str = "embedding",
                     id_col: str = "vec_id",
                     decimals: int = 6) -> "ray.data.Dataset":
    """Scoring pass: (id, score, predicted) per row; score = P(positive)
    rounded to ``decimals`` with the shared SQL-tie-semantics helper for
    order-independent, hashable output."""
    from ..functions.rounding import micro_round

    w_ref = ray.put(np.asarray(weights, dtype=np.float64))
    b = float(intercept)

    def score(tbl: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        m = _emb_matrix(tbl, emb_col).astype(np.float64)
        eta = np.clip(m @ w + b, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-eta))
        pq = micro_round(p, decimals)
        # predicted derives from the EMITTED score, not raw p: a consumer
        # re-deriving the class as score >= 0.5 must agree with the flag
        return pa.table({
            id_col: tbl.column(id_col),
            "score": pa.array(pq),
            "predicted": pa.array(pq >= 0.5),
        })

    return ds.select_columns([id_col, emb_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)
