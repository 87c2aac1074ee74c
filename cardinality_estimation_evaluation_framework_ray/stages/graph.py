"""Distributed PageRank over an edge Dataset.

The iterative-graph sibling of the label-propagation closure in
``stages/dedup.py:dup_clusters``: rank state lives in a SHARDED Dataset
keyed by node — never a broadcast O(#nodes) vector, never a driver dict.
Each power iteration is message passing expressed in the engine's own
operators:

  1. ONE shuffle ``hash_join`` of edges against the rank table on ``src``
     (both sides sharded by the key),
  2. per-batch pre-aggregated contributions (dictionary-encode + bincount
     — at most #distinct-dst rows leave a batch),
  3. ONE ``groupby(dst)`` sum,
  4. a left join back onto the node table to apply damping and
     re-distribute the dangling mass.

The only driver-side state is two scalars per iteration (node count N and
the dangling-rank mass).  deg rides along with rank so the join count
stays at two per iteration.  Multi-edges contribute with multiplicity
(dedup upstream for simple-graph semantics); ranks sum to 1 exactly up to
float fold order, so results are reproducible to ulps, not bit-exact —
the op is rows-only at the oracle gate, with a numpy power-iteration
equality test (1e-9) in ``tests/test_graph.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .joins import hash_join

__all__ = ["pagerank", "pagerank_int", "triangle_count"]


def pagerank(edges: "ray.data.Dataset", *, src_col: str = "src",
             dst_col: str = "dst", damping: float = 0.85,
             iters: int = 10) -> "ray.data.Dataset":
    """Ranks of the directed graph ``edges`` after ``iters`` power
    iterations from the uniform vector.  Returns a Dataset of
    ``(node, rank)`` summing to ~1; dangling nodes (no out-edges) spread
    their rank uniformly, the standard PageRank completion.
    """
    from ray.data.aggregate import Sum

    edges = edges.select_columns([src_col, dst_col])

    def as_node(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column(col)})
        return fn

    nodes = (edges.map_batches(as_node(src_col), batch_format="pyarrow")
             .union(edges.map_batches(as_node(dst_col),
                                      batch_format="pyarrow"))
             .groupby("node").count()).materialize()
    # empty graph: bail before hash_join (an empty Dataset's schema is None
    # in Ray 2.49, which the join cannot consume)
    if nodes.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    deg = edges.groupby(src_col).count()
    base = hash_join(nodes.drop_columns(["count()"]), deg, on="node",
                     right_key=src_col, how="left")

    def with_deg(t: pa.Table) -> pa.Table:
        d = t.column("count()").to_numpy(zero_copy_only=False)
        d = np.nan_to_num(d.astype(np.float64), nan=0.0).astype(np.int64)
        return pa.table({"node": t.column("node"), "deg": pa.array(d)})

    base = base.map_batches(with_deg, batch_format="pyarrow").materialize()
    n_nodes = base.count()
    r0 = 1.0 / n_nodes

    def seed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array(np.full(t.num_rows, r0, np.float64)))

    rank = base.map_batches(seed, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        # joined (src, dst, deg, rank) rows: pre-aggregate per batch so at
        # most #distinct-dst rows hit the groupby shuffle
        dst = t.column(dst_col)
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        enc = dst.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        r = t.column("rank").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.bincount(codes, weights=r / d,
                        minlength=len(enc.dictionary))
        return pa.table({"node": enc.dictionary, "__c": pa.array(w)})

    def dangling_partial(t: pa.Table) -> dict:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return {"dm": np.array([float(r[d == 0].sum())])}

    for _ in range(iters):
        dm = (rank.map_batches(dangling_partial, batch_format="pyarrow")
              .sum("dm") or 0.0)
        msgs = (hash_join(edges, rank, on=src_col, right_key="node")
                .map_batches(contrib, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("__c", alias_name="c")))
        joined = hash_join(base, msgs, on="node", how="left")
        add = (1.0 - damping) / n_nodes + damping * (dm / n_nodes)

        def apply(t: pa.Table, _add=add) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False)
            c = np.nan_to_num(c.astype(np.float64), nan=0.0)
            return pa.table({
                "node": t.column("node"),
                "deg": t.column("deg"),
                "rank": pa.array(_add + damping * c),
            })

        rank = joined.map_batches(apply,
                                  batch_format="pyarrow").materialize()

    return rank.drop_columns(["deg"])


def pagerank_int(edges: "ray.data.Dataset", *, src_col: str = "src",
                 dst_col: str = "dst", damping_num: int = 85,
                 damping_den: int = 100, iters: int = 10,
                 scale: int = 10 ** 12) -> "ray.data.Dataset":
    """DETERMINISTIC fixed-point PageRank: same join/groupby plan as
    ``pagerank`` but every quantity is an int64 in units of 1/``scale``
    and every division is a floor — so the result is BIT-IDENTICAL across
    runs, partitionings and fold orders (integer sums are associative;
    float ``pagerank`` is reproducible only to ulps).  That makes the op
    SQL-oracle-hashable: the reference semantics per iteration are

        contrib(e)  = (r[src] * damping_num) // (damping_den * deg[src])
        teleport    = (scale * (damping_den - damping_num))
                          // (damping_den * N)
        dangling    = (dm * damping_num) // (damping_den * N)
        r'[v]       = teleport + dangling + sum contrib over in-edges

    exactly replicable in BIGINT CTEs (see ``__ray_entry__.py``'s
    ``_pagerank_int_oracle_sql``).  Total mass decays by < N + #edges
    units per iteration (floor losses), i.e. relative error < ~1e-6 at
    the default scale for million-node graphs — the price of exact
    reproducibility.  Overflow bound: ``scale * damping_num`` must fit
    int64 (checked), and per-node in-sums are ≤ ``scale``.

    Returns a Dataset of ``(node int64, rank_fp int64)``; rank_fp/scale
    approximates the float PageRank.
    """
    from ray.data.aggregate import Sum

    if scale * damping_num >= 2 ** 62:
        raise ValueError("scale * damping_num must fit int64 with headroom")
    if not (0 < damping_num < damping_den):
        raise ValueError("need 0 < damping_num < damping_den")

    edges = edges.select_columns([src_col, dst_col])

    def as_node(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column(col)})
        return fn

    nodes = (edges.map_batches(as_node(src_col), batch_format="pyarrow")
             .union(edges.map_batches(as_node(dst_col),
                                      batch_format="pyarrow"))
             .groupby("node").count()).materialize()
    if nodes.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_fp": pa.array([], pa.int64())}))
    deg = edges.groupby(src_col).count()
    base = hash_join(nodes.drop_columns(["count()"]), deg, on="node",
                     right_key=src_col, how="left")

    def with_deg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        d = pc.fill_null(t.column("count()"), 0)
        return pa.table({"node": t.column("node"),
                         "deg": pc.cast(d, pa.int64())})

    base = base.map_batches(with_deg, batch_format="pyarrow").materialize()
    n_nodes = base.count()
    r0 = scale // n_nodes

    def seed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank_fp", pa.array(np.full(t.num_rows, r0, np.int64)))

    rank = base.map_batches(seed, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        # joined (src, dst, deg, rank_fp) rows: int64 scatter-add partials
        # so at most #distinct-dst rows hit the groupby shuffle and the
        # fold stays exact by construction
        dst = t.column(dst_col)
        if isinstance(dst, pa.ChunkedArray):
            dst = dst.combine_chunks()
        enc = dst.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        r = t.column("rank_fp").to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        per_edge = (r * damping_num) // (damping_den * d)
        w = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(w, codes, per_edge)
        return pa.table({"node": enc.dictionary, "__c": pa.array(w)})

    def dangling_partial(t: pa.Table) -> dict:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        r = t.column("rank_fp").to_numpy(zero_copy_only=False)
        return {"dm": np.array([int(r[d == 0].sum())], dtype=np.int64)}

    for _ in range(iters):
        dm = int(rank.map_batches(dangling_partial, batch_format="pyarrow")
                 .sum("dm") or 0)
        msgs = (hash_join(edges, rank, on=src_col, right_key="node")
                .map_batches(contrib, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("__c", alias_name="c")))
        joined = hash_join(base, msgs, on="node", how="left")
        add = (scale * (damping_den - damping_num)
               // (damping_den * n_nodes)
               + dm * damping_num // (damping_den * n_nodes))

        def apply(t: pa.Table, _add=add) -> pa.Table:
            import pyarrow.compute as pc
            c = pc.fill_null(t.column("c"), 0).cast(pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": t.column("node"),
                "deg": t.column("deg"),
                "rank_fp": pa.array(_add + c),
            })

        rank = joined.map_batches(apply,
                                  batch_format="pyarrow").materialize()

    return rank.drop_columns(["deg"])


def triangle_count(edges: "ray.data.Dataset", *, a_col: str = "src",
                   b_col: str = "dst") -> int:
    """Exact global triangle count via the oriented wedge-join plan: orient
    every edge as (min, max) and dedupe (one groupby over distinct edges),
    build wedges with ONE key-sharded ``hash_join`` (x.b = y.a gives
    ordered paths a < b < c), then close them with a SEMI join of the
    wedge's (a, c) pair against the edge set — all shuffles are key-sharded
    joins over edges/wedges, no adjacency list ever materializes in one
    task.  Σ-wedge cost is the standard bound (sum of deg² over the lower
    endpoint); pre-filter high-degree nodes upstream for skewed graphs.

    Node-id contract: ids must fit 31 bits — the (a, c) pair packs into
    one int64 semi-join key (checked loudly).  Self-loops are dropped;
    multi-edges collapse.
    """

    def orient(t: pa.Table) -> pa.Table:
        u = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (u.max() >= 2 ** 31 or v.max() >= 2 ** 31
                       or u.min() < 0 or v.min() < 0):
            raise ValueError("triangle_count packs (a, c) into one int64 "
                             "key: node ids must be in [0, 2^31)")
        a, b = np.minimum(u, v), np.maximum(u, v)
        keep = a < b  # drop self-loops
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    e = (edges.select_columns([a_col, b_col])
         .map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)
         .groupby(["a", "b"]).count().drop_columns(["count()"])
         .materialize())
    if e.count() == 0:
        return 0

    def rename_y(t: pa.Table) -> pa.Table:
        return pa.table({"a2": t.column("a"), "c": t.column("b")})

    y = e.map_batches(rename_y, batch_format="pyarrow")
    wedges = hash_join(e, y, on="b", right_key="a2")  # (a, b, c), a<b<c

    def pack(x_col: str, y_col: str):
        def fn(t: pa.Table) -> pa.Table:
            x = t.column(x_col).to_numpy(zero_copy_only=False)
            z = t.column(y_col).to_numpy(zero_copy_only=False)
            return t.append_column("__k", pa.array((x << 31) | z))
        return fn

    wk = wedges.map_batches(pack("a", "c"), batch_format="pyarrow")
    ek = e.map_batches(pack("a", "b"), batch_format="pyarrow")
    closed = hash_join(wk, ek.select_columns(["__k"]), on="__k", how="semi")
    return closed.count()
