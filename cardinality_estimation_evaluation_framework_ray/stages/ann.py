"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` and every map task reads it from the object store (no per-batch
re-shipping); each batch does one numpy matmul and keeps only its local
top-k, so the reduce step merges #batches * k candidate rows, not the corpus.

Scale paths: LSH bucketing (random hyperplanes, Charikar 2002) — embeddings
and queries hash to sign-pattern buckets; only same-bucket (plus optional
multi-probe neighbor-bucket) candidates are scored — and IVF (coarse
k-means quantizer trained on a sample, n_probe nearest centroid buckets
searched per query).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float32, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
                     *, emb_col: str = "embedding", id_col: str = "vec_id",
                     dtype=np.float32):
    """Cosine top-k per query row. Returns pandas (query_id, rank, vec_id, score).

    Per-batch: one matmul against the broadcast query matrix + argpartition
    local top-k; the driver merges #batches x k x n_queries candidates.
    ``dtype=np.float64`` for oracle-exact comparisons; float32 at scale.
    """
    q = _normalize(np.asarray(queries, dtype=dtype))
    q_ref = ray.put(q.T)  # broadcast once; tasks read from object store

    def local_topk(batch: pa.Table) -> pa.Table:
        qt = ray.get(q_ref)
        m = _normalize(_emb_matrix(batch, emb_col).astype(dtype))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        scores = m @ qt  # (n, n_queries)
        kk = min(k, len(ids))
        part = np.argpartition(-scores, kk - 1, axis=0)[:kk]
        out_q, out_id, out_s = [], [], []
        for j in range(scores.shape[1]):
            rows = part[:, j]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_id.append(ids[rows].astype(np.int64))
            out_s.append(scores[rows, j].astype(np.float64))
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "score": pa.array(np.concatenate(out_s))})

    cands = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _finalize_topk(cands, k, id_col)


def lsh_topk(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10, *,
             n_planes: int = 12, emb_col: str = "embedding",
             id_col: str = "vec_id", seed: int = 5, multiprobe: int = 1):
    """LSH-bucketed ANN: score only vectors whose hyperplane sign pattern is
    within ``multiprobe`` bit flips of the query's bucket.

    Trades recall for touching ~ (1 + n_planes*multiprobe) / 2^n_planes of
    the corpus per query — the scale path for 100 TB embedding tables.
    """
    rs = np.random.RandomState(seed)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    dim = q.shape[1]
    planes = rs.normal(size=(dim, n_planes)).astype(np.float32)

    def bucket_of(m: np.ndarray) -> np.ndarray:
        bits = (m @ planes) > 0
        return (bits @ (1 << np.arange(n_planes, dtype=np.int64))).astype(np.int64)

    q_buckets = bucket_of(q)
    wanted: set[int] = set()
    for b in q_buckets.tolist():
        wanted.add(b)
        if multiprobe >= 1:
            for i in range(n_planes):
                wanted.add(b ^ (1 << i))
    wanted_ref = ray.put(np.array(sorted(wanted), dtype=np.int64))
    q_ref = ray.put(q.T)

    def local_topk(batch: pa.Table) -> pa.Table:
        keep_buckets = ray.get(wanted_ref)
        qt = ray.get(q_ref)
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = bucket_of(m)
        mask = np.isin(buckets, keep_buckets)
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        m, ids = m[mask], ids[mask]
        scores = m @ qt
        kk = min(k, len(ids))
        part = np.argpartition(-scores, kk - 1, axis=0)[:kk]
        out_q, out_id, out_s = [], [], []
        for j in range(scores.shape[1]):
            rows = part[:, j]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_id.append(ids[rows].astype(np.int64))
            out_s.append(scores[rows, j].astype(np.float64))
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "score": pa.array(np.concatenate(out_s))})

    cands = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _finalize_topk(cands, k, id_col)


def _finalize_topk(cands: "ray.data.Dataset", k: int, id_col: str):
    """Merge per-batch candidate rows into global per-query top-k ranks."""
    import pandas as pd

    df = cands.to_pandas()  # #batches * k * n_queries rows — small by design
    out = []
    for qid, g in df.groupby("query_id"):
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    if not out:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "score"])
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", id_col, "score"]]


def train_ivf_centroids(ds: "ray.data.Dataset", n_clusters: int, *,
                        emb_col: str = "embedding", sample_size: int = 4096,
                        iters: int = 10, seed: int = 11) -> np.ndarray:
    """Spherical k-means (Lloyd) on a corpus sample, driver-side.

    The IVF coarse quantizer: centroids are unit vectors, assignment is by
    maximum dot product.  Sampling + a few Lloyd iterations is the standard
    IVF training recipe (e.g. Johnson, Douze & Jegou, "Billion-scale
    similarity search with GPUs", 2017); at 100 TB train on ds.limit(n) of a
    shuffled snapshot and broadcast the tiny (n_clusters x dim) codebook.
    """
    rows = ds.select_columns([emb_col]).limit(sample_size).to_pandas()
    x = _normalize(np.stack([np.asarray(v, dtype=np.float32)
                             for v in rows[emb_col]]))
    rs = np.random.RandomState(seed)
    n_clusters = min(n_clusters, len(x))
    c = x[rs.choice(len(x), n_clusters, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_clusters):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10, *,
             n_clusters: int = 64, n_probe: int = 8,
             emb_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 4096, iters: int = 10, seed: int = 11):
    """IVF ANN: score only vectors assigned to each query's ``n_probe``
    nearest centroids.

    The codebook and query matrix are broadcast once via ``ray.put``; each
    batch assigns its vectors to centroids with one matmul and scores only
    the probed subset — touching ~n_probe/n_clusters of the corpus per
    query, the data-dependent counterpart of the hyperplane-LSH scale path.
    """
    centroids = train_ivf_centroids(ds, n_clusters, emb_col=emb_col,
                                    sample_size=sample_size, iters=iters,
                                    seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]  # (nq, p)
    c_ref = ray.put(centroids.T)
    q_ref = ray.put(q.T)
    p_ref = ray.put(probes)

    def local_topk(batch: pa.Table) -> pa.Table:
        ct = ray.get(c_ref)
        qt = ray.get(q_ref)
        probe_sets = ray.get(p_ref)
        m = _normalize(_emb_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        assign = np.argmax(m @ ct, axis=1)
        out_q, out_id, out_s = [], [], []
        for j in range(qt.shape[1]):
            mask = np.isin(assign, probe_sets[j])
            if not mask.any():
                continue
            sub, sub_ids = m[mask], ids[mask]
            scores = sub @ qt[:, j]
            kk = min(k, len(sub_ids))
            rows = np.argpartition(-scores, kk - 1)[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_id.append(sub_ids[rows].astype(np.int64))
            out_s.append(scores[rows].astype(np.float64))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "score": pa.array(np.concatenate(out_s))})

    cands = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _finalize_topk(cands, k, id_col)


def embedding_near_dups(ds: "ray.data.Dataset", threshold: float = 0.95, *,
                        n_planes: int = 10, emb_col: str = "embedding",
                        id_col: str = "vec_id", seed: int = 6,
                        max_bucket_size: int = 2000,
                        block_rows: int = 1024) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH buckets.

    groupby(bucket) is the wide op; in-bucket exact cosine confirms.  High
    thresholds => near-identical vectors land in the same bucket w.h.p.

    Scale guards (embeddings cluster by topic, so hot buckets are the NORM
    here, not a pathology):

    * ``max_bucket_size``: a bucket larger than this skips the O(n^2)
      all-pairs scan and emits star edges against its min-id representative
      plus chain edges between consecutive id-sorted members — O(n) output
      that keeps the bucket connected for dedup-cluster purposes.  Honest
      recall trade-off: a member whose cosine to BOTH the representative and
      its chain neighbours is below threshold loses linkage even if it is
      near some other member.
    * ``block_rows``: the in-bucket score matrix is computed in row blocks,
      bounding peak memory to ``block_rows * n`` floats instead of n^2.
    """

    # hyperplanes are a pure function of (seed, dim): generate once per
    # process and reuse across batches (the dim is only known from the first
    # batch, hence the memo instead of a driver-side ray.put)
    planes_by_dim: dict[int, np.ndarray] = {}

    def _planes(dim: int) -> np.ndarray:
        p = planes_by_dim.get(dim)
        if p is None:
            p = np.random.RandomState(seed).normal(
                size=(dim, n_planes)).astype(np.float32)
            planes_by_dim[dim] = p
        return p

    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_col))
        bits = (m @ _planes(m.shape[1])) > 0
        bucket = (bits @ (1 << np.arange(n_planes, dtype=np.int64))).astype(np.int64)
        return pa.table({"bucket": pa.array(bucket),
                         id_col: batch.column(id_col),
                         emb_col: batch.column(emb_col)})

    bucketed = ds.select_columns([id_col, emb_col]).map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n < 2:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_emb_matrix(tbl, emb_col))
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        if n > max_bucket_size:
            # hot bucket: star (min-id rep) + chain edges, O(n) not O(n^2)
            cos_star = m[1:] @ m[0]
            cos_chain = np.einsum("ij,ij->i", m[:-1], m[1:])
            a = np.concatenate([np.zeros(n - 1, np.int64),
                                np.arange(0, n - 1, dtype=np.int64)])
            b = np.concatenate([np.arange(1, n, dtype=np.int64),
                                np.arange(1, n, dtype=np.int64)])
            cos = np.concatenate([cos_star, cos_chain])
            # the (0, 1) pair appears in both star and chain -> dedup
            _, first = np.unique(a * np.int64(n) + b, return_index=True)
            a, b, cos = a[first], b[first], cos[first]
        else:
            # blocked upper-triangle scan: peak memory block_rows * n floats
            a_parts, b_parts, c_parts = [], [], []
            for s in range(0, n, block_rows):
                blk = m[s:s + block_rows] @ m.T
                rows, cols = np.nonzero(blk >= threshold)
                g = (s + rows) < cols
                a_parts.append(s + rows[g])
                b_parts.append(cols[g])
                c_parts.append(blk[rows[g], cols[g]])
            a = np.concatenate(a_parts) if a_parts else np.empty(0, np.int64)
            b = np.concatenate(b_parts) if b_parts else np.empty(0, np.int64)
            cos = np.concatenate(c_parts) if c_parts else np.empty(0, np.float32)
        keep = (cos >= threshold) & (ids[a] != ids[b])
        return pa.table({"vec_a": pa.array(ids[a][keep].astype(np.int64)),
                         "vec_b": pa.array(ids[b][keep].astype(np.int64)),
                         "cosine": pa.array(np.round(cos[keep].astype(np.float64), 4))})

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (PQ): embedding compression + LUT-scored ANN
# ---------------------------------------------------------------------------

def _sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(len(x), len(c)) squared L2 distances via the expanded form."""
    return ((x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1))


def train_pq_codebooks(ds: "ray.data.Dataset", *, m: int = 8,
                       n_codes: int = 256, emb_col: str = "embedding",
                       sample_size: int = 4096, iters: int = 10,
                       seed: int = 23) -> np.ndarray:
    """PQ codebooks (m, n_codes, dim/m) float32 — plain k-means per
    SUBSPACE on a corpus sample, driver-side (Jegou, Douze & Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011).

    At 100 TB: train on a shuffled snapshot sample (the standard recipe);
    the codebook is m * n_codes * (dim/m) floats = one dim * n_codes matrix
    total — KBs, broadcast once.
    """
    if n_codes > 256:
        raise ValueError("n_codes must be <= 256 (codes are stored uint8)")
    rows = ds.select_columns([emb_col]).limit(sample_size).to_pandas()
    x = np.stack([np.asarray(v, dtype=np.float32) for v in rows[emb_col]])
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    rs = np.random.RandomState(seed)
    books = np.empty((m, min(n_codes, len(x)), sub), np.float32)
    for j in range(m):
        xj = x[:, j * sub:(j + 1) * sub]
        c = xj[rs.choice(len(xj), books.shape[1], replace=False)].copy()
        for _ in range(iters):
            assign = np.argmin(_sq_dists(xj, c), axis=1)
            for q in range(len(c)):
                members = xj[assign == q]
                if len(members):
                    c[q] = members.mean(axis=0)
        books[j] = c
    return books


def pq_encode(ds: "ray.data.Dataset", codebooks: np.ndarray, *,
              emb_col: str = "embedding", id_col: str = "vec_id"
              ) -> "ray.data.Dataset":
    """Compress each embedding to m uint8 codes (dim*4 bytes -> m bytes,
    e.g. 16x at dim=32/m=8): per batch, one matmul per subspace against the
    broadcast codebooks.  Output: (id_col, pq_code: list<uint8>[m])."""
    m, n_codes, sub = codebooks.shape
    ref = ray.put(codebooks.astype(np.float32))

    def encode(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        x = _emb_matrix(t, emb_col)
        n = len(x)
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            xj = x[:, j * sub:(j + 1) * sub]
            codes[:, j] = np.argmin(_sq_dists(xj, books[j]),
                                    axis=1).astype(np.uint8)
        return pa.table({
            id_col: t.column(id_col),
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), m),
        })

    return ds.select_columns([id_col, emb_col]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True)


def pq_topk(codes_ds: "ray.data.Dataset", codebooks: np.ndarray,
            queries: np.ndarray, k: int = 10, *, id_col: str = "vec_id"
            ) -> "pd.DataFrame":
    """Asymmetric-distance top-k over PQ codes: per query, a (m, n_codes)
    look-up table of exact query-to-centroid sub-distances is broadcast;
    each batch scores its rows with m table gathers + adds (no float
    embedding ever read).  Returns (query_id, rank, vec_id, adc_dist) —
    approximate within quantization error (recall-tested, not oracled)."""
    import pandas as pd

    m, n_codes, sub = codebooks.shape
    q = np.asarray(queries, np.float32)
    # LUT[q, j, c] = ||q_sub_j - codebook[j, c]||^2
    lut = np.empty((len(q), m, n_codes), np.float32)
    for j in range(m):
        lut[:, j, :] = _sq_dists(q[:, j * sub:(j + 1) * sub], codebooks[j])
    ref = ray.put(lut)

    def local_topk(t: pa.Table) -> pa.Table:
        tables = ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        codes = np.asarray(t.column("pq_code").combine_chunks()
                           .flatten().to_numpy(zero_copy_only=False)
                           ).reshape(len(ids), m)
        out_q, out_id, out_d = [], [], []
        for qi in range(len(tables)):
            # ADC distance: sum the per-subspace LUT entries the codes select
            d = tables[qi][np.arange(m)[None, :], codes.astype(np.int64)]\
                .sum(axis=1)
            top = np.argsort(d, kind="stable")[:k]
            out_q.append(np.full(len(top), qi, np.int64))
            out_id.append(ids[top].astype(np.int64))
            out_d.append(d[top].astype(np.float64))
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_id)),
                         "adc_dist": pa.array(np.concatenate(out_d))})

    cands = codes_ds.map_batches(local_topk, batch_format="pyarrow")
    df = cands.to_pandas()
    if df.empty:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64"),
                             id_col: pd.Series(dtype="int64"),
                             "adc_dist": pd.Series(dtype="float64")})
    out = []
    for qi, g in df.groupby("query_id"):
        g = g.sort_values(["adc_dist", id_col], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    res = pd.concat(out).reset_index(drop=True)
    return res[["query_id", "rank", id_col, "adc_dist"]]
