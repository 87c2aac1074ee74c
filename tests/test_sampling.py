"""Deterministic sampling stages: per-key top-n sample and hash split."""

import numpy as np
import pyarrow as pa

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
    hash_split,
    knuth_priority,
    per_key_sample,
)


def _tbl(n=200, keys=("a", "b", "c")):
    rng = np.random.default_rng(5)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(rng.choice(keys, size=n).tolist()),
        "payload": pa.array((np.arange(n) * 7 % 13).astype(np.int64)),
    })


def _expected_sample(tbl, n_per_key):
    ids = tbl.column("doc_id").to_numpy()
    src = np.array(tbl.column("source").to_pylist())
    prio = knuth_priority(ids)
    keep = []
    for k in np.unique(src):
        m = np.flatnonzero(src == k)
        order = m[np.lexsort((ids[m], prio[m]))]
        keep.extend(order[:n_per_key].tolist())
    return sorted(ids[sorted(keep)].tolist())


def test_per_key_sample_matches_bruteforce(ray_session):
    t = _tbl()
    out = per_key_sample(ray.data.from_arrow(t), key="source", n_per_key=10)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    assert got == _expected_sample(t, 10)


def test_per_key_sample_partition_invariance(ray_session):
    t = _tbl(n=500)
    a = per_key_sample(ray.data.from_arrow(t).repartition(1),
                       key="source", n_per_key=7).to_pandas()
    b = per_key_sample(ray.data.from_arrow(t).repartition(32),
                       key="source", n_per_key=7).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_per_key_sample_small_groups_kept_whole(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": pa.array(["x", "x", "y"])})
    out = per_key_sample(ray.data.from_arrow(t), key="source",
                         n_per_key=10).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]


def test_per_key_sample_keeps_requested_cols(ray_session):
    t = _tbl()
    out = per_key_sample(ray.data.from_arrow(t), key="source", n_per_key=5,
                         cols=["doc_id", "source", "payload"]).to_pandas()
    assert set(out.columns) == {"doc_id", "source", "payload"}
    assert (out.groupby("source").size() <= 5).all()


def test_hash_split_deterministic_and_disjoint(ray_session):
    t = _tbl(n=1000)
    a = hash_split(ray.data.from_arrow(t), test_permille=100).to_pandas()
    b = hash_split(ray.data.from_arrow(t).repartition(16),
                   test_permille=100).to_pandas()
    am = dict(zip(a["doc_id"], a["split"]))
    bm = dict(zip(b["doc_id"], b["split"]))
    assert am == bm
    frac = (a["split"] == "test").mean()
    assert 0.05 < frac < 0.15  # ~10% with hash variance
