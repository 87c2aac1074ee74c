import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.ann import (
    brute_force_topk,
    embedding_near_dups,
    lsh_topk,
)


def _emb_table(n=400, dim=16, seed=0):
    rs = np.random.RandomState(seed)
    m = rs.normal(size=(n, dim)).astype(np.float32)
    # plant near-duplicates: vec 1 = vec 0 + tiny noise
    m[1] = m[0] + rs.normal(scale=1e-3, size=dim).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), dim)
    return m, pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                        "embedding": arr})


@pytest.mark.usefixtures("ray_session")
def test_brute_force_topk_matches_numpy():
    m, tbl = _emb_table()
    ds = ray.data.from_arrow(tbl)
    q = m[[0, 7]]
    res = brute_force_topk(ds, q, k=5)
    mm = m / np.linalg.norm(m, axis=1, keepdims=True)
    qq = q / np.linalg.norm(q, axis=1, keepdims=True)
    truth = (mm @ qq.T)
    for qid in (0, 1):
        expect = set(np.argsort(-truth[:, qid])[:5].tolist())
        got = set(res[res.query_id == qid].vec_id.tolist())
        assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_lsh_topk_recall():
    m, tbl = _emb_table(n=1000)
    ds = ray.data.from_arrow(tbl)
    q = m[[0]]
    res = lsh_topk(ds, q, k=5, n_planes=8, multiprobe=1)
    # the query vector itself and its planted twin must be found
    got = set(res.vec_id.tolist())
    assert 0 in got and 1 in got


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dups():
    m, tbl = _emb_table(n=300)
    ds = ray.data.from_arrow(tbl)
    pairs = embedding_near_dups(ds, threshold=0.99).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.vec_a, pairs.vec_b)}
    assert (0, 1) in got
    # random gaussian vectors almost never hit cosine 0.99
    assert len(got) < 5


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall_vs_brute_force():
    """IVF with generous probes recovers most of the brute-force top-10 on
    clustered data while touching only probed buckets."""
    from cardinality_estimation_evaluation_framework_ray.stages.ann import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(8)
    # 12 well-separated cluster centers, 100 points each
    centers = rng.normal(size=(12, 16)).astype(np.float32) * 4
    pts = np.concatenate([c + rng.normal(size=(100, 16)).astype(np.float32)
                          for c in centers])
    ids = np.arange(len(pts), dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(pts.astype(np.float64)))})
    ds = ray.data.from_arrow(tbl)
    queries = pts[[5, 250, 777]]

    bf = brute_force_topk(ds, queries, k=10)
    ivf = ivf_topk(ds, queries, k=10, n_clusters=12, n_probe=4, seed=3)
    recalls = []
    for qid in range(3):
        want = set(bf[bf.query_id == qid].vec_id)
        got = set(ivf[ivf.query_id == qid].vec_id)
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.8, recalls

    cents = train_ivf_centroids(ds, 12, seed=3)
    assert cents.shape == (12, 16)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-5)


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dups_hot_bucket_guard():
    """Degenerate bucket (all vectors in one hyperplane cell): output must be
    bounded (star + chain, <= 2n-3 pairs) and the cluster must stay connected."""
    n, dim = 50, 8
    rs = np.random.RandomState(3)
    base = rs.normal(size=dim).astype(np.float32)
    m = base + rs.normal(scale=1e-4, size=(n, dim)).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), dim)
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": arr})
    ds = ray.data.from_arrow(tbl)
    guarded = embedding_near_dups(ds, threshold=0.99,
                                  max_bucket_size=10).to_pandas()
    # every vector lands in ONE bucket; star+chain emits at most 2n-3 pairs
    # per bucket (here: one bucket per band... one bucket total)
    assert len(guarded) <= 2 * n - 3
    # connectivity: union-find over guarded pairs joins all n vectors
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        dedup_clusters,
    )
    clusters = dedup_clusters(
        ray.data.from_pandas(guarded), a_col="vec_a", b_col="vec_b")
    assert set(clusters.doc_id) == set(range(n))
    assert clusters.cluster_id.nunique() == 1
    # unguarded output is identical to the blocked scan at small n
    full = embedding_near_dups(ds, threshold=0.99).to_pandas()
    assert len(full) == n * (n - 1) // 2


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dups_blocked_matches_unblocked():
    m, tbl = _emb_table(n=300)
    ds = ray.data.from_arrow(tbl)
    small_blocks = embedding_near_dups(ds, threshold=0.99,
                                       block_rows=7).to_pandas()
    one_block = embedding_near_dups(ds, threshold=0.99,
                                    block_rows=100000).to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cosine"]].values.tolist()))
    assert key(small_blocks) == key(one_block)


@pytest.mark.usefixtures("ray_session")
def test_pq_encode_and_topk_recall():
    from cardinality_estimation_evaluation_framework_ray.stages.ann import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    m, tbl = _emb_table(n=500, dim=16)
    ds = ray.data.from_arrow(tbl).repartition(4)
    books = train_pq_codebooks(ds, m=4, n_codes=64, sample_size=500, seed=5)
    assert books.shape == (4, 64, 4)

    codes = pq_encode(ds, books)
    cdf = codes.to_pandas()
    assert len(cdf) == 500
    assert all(len(c) == 4 for c in cdf["pq_code"].head(10))

    q = m[[0, 7, 123]]
    got = pq_topk(codes, books, q, k=10)
    # exact L2 ground truth
    recalls = []
    for qi in range(len(q)):
        d = ((m - q[qi]) ** 2).sum(axis=1)
        truth = set(np.argsort(d, kind="stable")[:10].tolist())
        mine = set(got[got.query_id == qi].vec_id.tolist())
        recalls.append(len(truth & mine) / 10)
    # ADC is approximate; self-NN (query 0 = vec 0) must always be found
    assert 0 in set(got[got.query_id == 0].vec_id.tolist())
    assert np.mean(recalls) >= 0.5

    # partition invariance of the encoding
    c1 = pq_encode(ray.data.from_arrow(tbl).repartition(1), books).to_pandas()
    c1 = c1.sort_values("vec_id").reset_index(drop=True)
    c4 = cdf.sort_values("vec_id").reset_index(drop=True)
    assert all((np.asarray(a) == np.asarray(b)).all()
               for a, b in zip(c1["pq_code"], c4["pq_code"]))
