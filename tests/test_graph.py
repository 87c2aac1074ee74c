import numpy as np
import pandas as pd
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.graph import (
    pagerank,
)


def _numpy_pagerank(edges, n, damping, iters):
    """Dense reference power iteration with uniform dangling completion."""
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = r[deg == 0].sum()
        c = np.zeros(n)
        for s, d in edges:
            c[d] += r[s] / deg[s]
        r = (1.0 - damping) / n + damping * (dm / n) + damping * c
    return r


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_numpy_power_iteration():
    # 5 nodes, node 4 dangling, node 0 a hub
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (1, 4)]
    df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    out = (pagerank(ray.data.from_pandas(df, override_num_blocks=3),
                    damping=0.85, iters=6)
           .to_pandas().sort_values("node").reset_index(drop=True))
    ref = _numpy_pagerank(edges, 5, 0.85, 6)
    assert out["node"].tolist() == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(out["rank"].to_numpy(), ref, atol=1e-9)
    assert abs(out["rank"].sum() - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pagerank_partition_invariance_and_empty():
    rng = np.random.RandomState(29)
    df = pd.DataFrame({"src": rng.randint(0, 40, 300),
                       "dst": rng.randint(0, 40, 300)}).astype("int64")
    outs = [pagerank(ray.data.from_pandas(df, override_num_blocks=nb),
                     iters=3).to_pandas()
            .sort_values("node").reset_index(drop=True)
            for nb in (1, 11)]
    np.testing.assert_allclose(outs[0]["rank"], outs[1]["rank"], atol=1e-12)

    empty = pagerank(ray.data.from_pandas(
        pd.DataFrame({"src": pd.Series(dtype="int64"),
                      "dst": pd.Series(dtype="int64")})))
    assert empty.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_matches_bruteforce():
    import itertools

    rng = np.random.RandomState(47)
    n_nodes = 30
    edges = set()
    while len(edges) < 90:
        u, v = rng.randint(0, n_nodes, 2)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    # input deliberately noisy: both directions + duplicates + self-loops
    noisy = ([(a, b) for a, b in edges] + [(b, a) for a, b in edges]
             + [(a, b) for a, b in list(edges)[:10]] + [(3, 3), (7, 7)])
    df = pd.DataFrame(noisy, columns=["src", "dst"]).astype("int64")

    from cardinality_estimation_evaluation_framework_ray.stages.graph import (
        triangle_count,
    )

    got = triangle_count(ray.data.from_pandas(df, override_num_blocks=5))
    expected = sum(1 for a, b, c in itertools.combinations(range(n_nodes), 3)
                   if (a, b) in edges and (b, c) in edges and (a, c) in edges)
    assert got == expected
    assert expected > 0  # the generated graph actually has triangles


@pytest.mark.usefixtures("ray_session")
def test_triangle_count_id_bound_guard():
    df = pd.DataFrame({"src": [2 ** 31], "dst": [1]}).astype("int64")

    from cardinality_estimation_evaluation_framework_ray.stages.graph import (
        triangle_count,
    )

    with pytest.raises(Exception, match="2\\^31"):
        triangle_count(ray.data.from_pandas(df))


def _int_pagerank_ref(edges, n, num, den, iters, scale):
    """Pure-python reference of the pagerank_int fixed-point semantics."""
    deg = [0] * n
    for s, _ in edges:
        deg[s] += 1
    r = [scale // n] * n
    for _ in range(iters):
        dm = sum(r[v] for v in range(n) if deg[v] == 0)
        c = [0] * n
        for s, d in edges:
            c[d] += (r[s] * num) // (den * deg[s])
        add = (scale * (den - num)) // (den * n) + (dm * num) // (den * n)
        r = [add + c[v] for v in range(n)]
    return r


@pytest.mark.usefixtures("ray_session")
def test_pagerank_int_matches_integer_reference():
    from cardinality_estimation_evaluation_framework_ray.stages.graph import (
        pagerank_int,
    )

    # node 4 dangling, multi-edge (0, 2) duplicated to check multiplicity
    edges = [(0, 1), (0, 2), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (1, 4)]
    df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    out = (pagerank_int(ray.data.from_pandas(df, override_num_blocks=3),
                        iters=6).to_pandas()
           .sort_values("node").reset_index(drop=True))
    ref = _int_pagerank_ref(edges, 5, 85, 100, 6, 10 ** 12)
    assert out["node"].tolist() == [0, 1, 2, 3, 4]
    assert out["rank_fp"].tolist() == ref  # EXACT, not approximate


@pytest.mark.usefixtures("ray_session")
def test_pagerank_int_bit_identical_across_partitionings():
    from cardinality_estimation_evaluation_framework_ray.stages.graph import (
        pagerank_int,
    )

    rng = np.random.RandomState(31)
    df = pd.DataFrame({"src": rng.randint(0, 50, 400),
                       "dst": rng.randint(0, 50, 400)}).astype("int64")
    outs = [pagerank_int(ray.data.from_pandas(df, override_num_blocks=nb),
                         iters=4).to_pandas()
            .sort_values("node").reset_index(drop=True)
            for nb in (1, 13)]
    # integer arithmetic: EXACT equality, not allclose
    assert outs[0]["rank_fp"].tolist() == outs[1]["rank_fp"].tolist()

    # tracks the float op within the floor-loss bound
    fl = (pagerank(ray.data.from_pandas(df, override_num_blocks=7), iters=4)
          .to_pandas().sort_values("node").reset_index(drop=True))
    np.testing.assert_allclose(outs[0]["rank_fp"].to_numpy() / 1e12,
                               fl["rank"].to_numpy(), atol=1e-8)

    empty = pagerank_int(ray.data.from_pandas(
        pd.DataFrame({"src": pd.Series(dtype="int64"),
                      "dst": pd.Series(dtype="int64")})))
    assert empty.count() == 0


def test_pagerank_int_rejects_overflowing_scale():
    from cardinality_estimation_evaluation_framework_ray.stages.graph import (
        pagerank_int,
    )

    with pytest.raises(ValueError, match="fit int64"):
        pagerank_int(None, scale=2 ** 60, damping_num=85)
    with pytest.raises(ValueError, match="damping"):
        pagerank_int(None, damping_num=0)
