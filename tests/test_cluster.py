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
