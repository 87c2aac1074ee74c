"""Distributed k-means: recovery of separated clusters, determinism."""

import numpy as np
import pyarrow as pa

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.cluster import (
    assign_clusters,
    kmeans,
)


def _emb_ds(x: np.ndarray, reparts=4):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in x],
                              pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(reparts)


def _three_blobs(n_per=60, d=8, sep=20.0, seed=3):
    rng = np.random.default_rng(seed)
    blobs, labels = [], []
    for i in range(3):
        center = np.zeros(d)
        center[i] = sep
        blobs.append(center + rng.normal(0, 0.5, size=(n_per, d)))
        labels.extend([i] * n_per)
    return np.vstack(blobs).astype(np.float32), np.array(labels)


def test_kmeans_recovers_separated_blobs(ray_session):
    x, truth = _three_blobs()
    ds = _emb_ds(x)
    centroids, n_it = kmeans(ds, 3, iters=25)
    assert n_it < 25  # early stop fired on well-separated data
    out = assign_clusters(ds, centroids).to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()
    # each true blob maps to exactly one distinct predicted cluster
    mapping = {}
    for t in range(3):
        vals, counts = np.unique(got[truth == t], return_counts=True)
        assert len(vals) == 1
        mapping[t] = vals[0]
    assert len(set(mapping.values())) == 3
    # every point sits close to its centroid
    assert out["dist"].max() < 5.0


def test_kmeans_deterministic_rerun(ray_session):
    x, _ = _three_blobs(seed=9)
    ds = _emb_ds(x)
    c1, _ = kmeans(ds, 3, iters=10)
    c2, _ = kmeans(ds, 3, iters=10)
    assert np.array_equal(c1, c2)


def test_kmeans_more_clusters_than_points(ray_session):
    x = np.array([[0.0, 0.0], [10.0, 10.0]], dtype=np.float32)
    ds = _emb_ds(x, reparts=1)
    centroids, _ = kmeans(ds, 2, iters=5)
    out = assign_clusters(ds, centroids).to_pandas()
    assert sorted(out["cluster"]) == [0, 1]


def test_pca_matches_numpy_eigh(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.cluster import (
        pca_fit, pca_transform,
    )

    rng = np.random.RandomState(31)
    # anisotropic gaussian: planted principal axes
    d, n = 16, 3000
    scales = np.linspace(5.0, 0.1, d)
    basis, _ = np.linalg.qr(rng.normal(size=(d, d)))
    x = (rng.normal(size=(n, d)) * scales) @ basis.T + rng.normal(size=d)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": [r.astype("float32").tolist()
                                     for r in x]})
    ds = ray.data.from_pandas(df, override_num_blocks=8)

    mu, comps, ev = pca_fit(ds, k=3)
    xf = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                   for v in df["embedding"]])
    ref_mu = xf.mean(axis=0)
    cov = np.cov(xf.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    ref_c = evecs[:, order].T
    flip = np.sign(ref_c[np.arange(3), np.argmax(np.abs(ref_c), axis=1)])
    ref_c = ref_c * flip[:, None]

    assert np.allclose(mu, ref_mu, atol=1e-8)
    assert np.allclose(ev, evals[order], atol=1e-6)
    assert np.allclose(comps, ref_c, atol=1e-6)

    out = pca_transform(ds, mu, comps).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    proj = np.stack([np.asarray(v) for v in out["pc"]])
    ref_proj = (xf - ref_mu) @ ref_c.T
    assert np.allclose(proj, ref_proj, atol=1e-5)
    # variance actually concentrates on the first component
    assert ev[0] > ev[1] > ev[2] > 0


def test_grouped_centroids_exact_sums(ray_session):
    import pandas as pd

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.cluster import (
        grouped_centroids,
    )

    rng = np.random.RandomState(43)
    n, d = 400, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.randint(0, 3, n)
    df = pd.DataFrame({"label": lab,
                       "embedding": [r.tolist() for r in emb]})
    out = grouped_centroids(ray.data.from_pandas(df, override_num_blocks=5),
                            key="label")
    q = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for g in range(3):
        ref = q[lab == g].sum(axis=0)
        got = out[out["label"] == g].sort_values("dim")
        assert got["s"].tolist() == ref.tolist()
        assert (got["n"] == (lab == g).sum()).all()
        # recovered means are within quantization error of the true ones
        mean = got["s"].to_numpy() / (got["n"].to_numpy() * 1e6)
        np.testing.assert_allclose(mean, emb[lab == g].mean(axis=0),
                                   atol=1e-5)


# -- logistic regression -----------------------------------------------------

def _logit_ref(X, y, iters, l2, tol=1e-8):
    """Independent single-process IRLS transcription (ridge on weights,
    not intercept) — written from the textbook update, not the engine."""
    import numpy as np

    n, d = X.shape
    Xb = np.concatenate([X, np.ones((n, 1))], axis=1)
    beta = np.zeros(d + 1)
    reg = np.concatenate([np.full(d, l2), [0.0]])
    for _ in range(iters):
        eta = np.clip(Xb @ beta, -30, 30)
        p = 1 / (1 + np.exp(-eta))
        g = Xb.T @ (y - p) - reg * beta
        H = Xb.T @ (Xb * (p * (1 - p))[:, None]) + np.diag(reg)
        step = np.linalg.solve(H, g)
        beta = beta + step
        if np.abs(step).max() < tol:
            break
    return beta[:d], beta[d]


def _logit_data(n=400, d=6):
    import numpy as np

    rng = np.random.RandomState(7)
    X = rng.randn(n, d)
    w_true = np.linspace(-2, 2, d)
    y = (X @ w_true + 0.3 * rng.randn(n) > 0).astype(np.float64)
    return X, y


def _logit_ds(X, labels, blocks=1):
    import pyarrow as pa

    import ray.data

    t = pa.table({
        "vec_id": pa.array(range(len(X)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in X],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype("int32"), pa.int32()),
    })
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_logistic_fit_matches_reference(ray_session):
    import numpy as np

    from cardinality_estimation_evaluation_framework_ray.stages.cluster import (
        logistic_fit,
    )

    X, y = _logit_data()
    labels = np.where(y == 1, 0, 5)  # positive class encoded as label 0
    ds = _logit_ds(X, labels, blocks=5)
    w, b, n_it = logistic_fit(ds, positive=0, iters=12, l2=1e-3)
    # the engine reads float32 embeddings; reference must see the same
    w_ref, b_ref = _logit_ref(X.astype(np.float32).astype(np.float64),
                              y, iters=12, l2=1e-3)
    assert n_it <= 12
    assert np.allclose(w, w_ref, rtol=1e-6, atol=1e-8)
    assert np.isclose(b, b_ref, rtol=1e-6, atol=1e-8)


def test_logistic_fit_partition_invariance_and_accuracy(ray_session):
    import numpy as np

    from cardinality_estimation_evaluation_framework_ray.stages.cluster import (
        logistic_fit,
        logistic_predict,
    )

    X, y = _logit_data()
    labels = np.where(y == 1, 0, 3)
    w1, b1, _ = logistic_fit(_logit_ds(X, labels, blocks=1), positive=0)
    w7, b7, _ = logistic_fit(_logit_ds(X, labels, blocks=7), positive=0)
    # float fold order differs across partitionings -> ulp-level drift only
    assert np.allclose(w1, w7, rtol=1e-9, atol=1e-12)
    assert np.isclose(b1, b7, rtol=1e-9, atol=1e-12)
    scored = logistic_predict(_logit_ds(X, labels, blocks=7), w1, b1) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    acc = ((scored["predicted"].to_numpy()) == (y == 1)).mean()
    assert acc > 0.9          # separable-with-noise synthetic
    assert ((scored["score"] >= 0) & (scored["score"] <= 1)).all()
    # micro-quantized scores: exact multiples of 1e-6
    q = (scored["score"] * 1e6).to_numpy()
    assert np.allclose(q, np.round(q))


def test_logistic_fit_empty_raises(ray_session):
    import numpy as np

    import pytest

    from cardinality_estimation_evaluation_framework_ray.stages.cluster import (
        logistic_fit,
    )

    X, y = _logit_data(n=4)
    ds = _logit_ds(X, np.zeros(4), blocks=1).filter(
        lambda r: r["vec_id"] < 0)
    with pytest.raises(ValueError, match="empty"):
        logistic_fit(ds)
