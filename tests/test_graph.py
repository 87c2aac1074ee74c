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
