"""Distributed sketch build: map_batches partials -> groupby merge tree.

Physical plan (SURVEY.md §4.2), replacing the reference's per-id Python loop
and in-process pairwise merges (reference ``src/estimators/any_sketch.py:
376-381``, ``hyper_log_log.py:217-246``):

    read_parquet(tokens table)                       # Arrow blocks stream
      └─ map_batches(partial_builder, pyarrow)       # one small state row per
      │                                              #   (batch, key) — map-side
      │                                              #   combine, vectorized
      └─ [optional] groupby(key, salt).map_groups    # intermediate merge level
      └─ groupby(key).map_groups(merge)              # the only wide shuffle —
      │                                              #   moves only KB states
      └─ driver: cross-key union / estimate          # tiny

Only serialized sketch states (KBs) ever cross the shuffle; token data never
leaves the map stage.  All merges on this path must be associative +
commutative (enforced via ``SketchSpec.associative``); order-dependent
estimators (VoC pairwise, ADBF intersection, stratified convolution) operate
driver-side on the <= #keys final states.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa

import ray.data

from ..state.base import Sketch, SketchSpec, merge_many

GLOBAL_KEY = "__all__"


# ---------------------------------------------------------------------------
# zero-copy token access
# ---------------------------------------------------------------------------

def flat_tokens(batch: pa.Table, tokens_col: str = "tokens"):
    """Return (values, row_lengths) as NumPy views of the token column.

    Accepts either a ``list<int>`` column (canonical tokens table) or a plain
    integer column (e.g. the per-(key, token) output of the exact-dedup
    stage feeding VectorOfCounts).
    """
    col = batch.column(tokens_col)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # zero chunks edge case
        arr = pa.concat_arrays(arr.chunks) if arr.num_chunks else pa.array([], type=arr.type)
    if not pa.types.is_list(arr.type) and not pa.types.is_large_list(arr.type):
        vals = arr.to_numpy(zero_copy_only=False)
        return vals, np.ones(len(vals), dtype=np.int64)
    offsets = np.asarray(arr.offsets)
    values = arr.flatten()
    vals = values.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    return vals, lengths


def iter_key_tokens(batch: pa.Table, key: str, tokens_col: str = "tokens"):
    """Yield (key_value, token_ndarray) per distinct key in the batch.

    Tokens of rows sharing a key are concatenated; grouping is a stable
    argsort over per-token key codes (no Python per-row loop).
    """
    vals, lengths = flat_tokens(batch, tokens_col)
    keys = batch.column(key).combine_chunks()
    if isinstance(keys, pa.ChunkedArray):
        keys = pa.concat_arrays(keys.chunks) if keys.num_chunks else pa.array([], type=keys.type)
    dict_arr = keys.dictionary_encode()
    codes = np.asarray(dict_arr.indices)
    uniques = dict_arr.dictionary.to_pylist()
    if len(uniques) == 1:
        yield uniques[0], vals
        return
    token_codes = np.repeat(codes, lengths)
    order = np.argsort(token_codes, kind="stable")
    sorted_vals = vals[order]
    sorted_codes = token_codes[order]
    bounds = np.searchsorted(sorted_codes, np.arange(len(uniques) + 1))
    for ci, kv in enumerate(uniques):
        lo, hi = bounds[ci], bounds[ci + 1]
        if hi > lo:
            yield kv, sorted_vals[lo:hi]
        else:
            yield kv, sorted_vals[lo:lo]


# ---------------------------------------------------------------------------
# partial build (map side)
# ---------------------------------------------------------------------------

def state_col(name: str) -> str:
    return f"state_{name}"


def make_partial_builder(specs: dict[str, SketchSpec], key: str = "source",
                         tokens_col: str = "tokens"):
    """A map_batches fn: Arrow batch -> one partial-state row per key value.

    Emitting per-batch partials (instead of carrying actor state) keeps the
    stage stateless & retryable; the merge tree absorbs the extra partials —
    a 16 KB HLL per (batch, key) is noise next to the token payload.
    """

    def build(batch: pa.Table) -> pa.Table:
        rows_per_key: dict = {}
        for kv, toks in iter_key_tokens(batch, key, tokens_col):
            states = {}
            for name, spec in specs.items():
                sk = spec.new()
                sk.update_tokens(toks)
                states[name] = sk.to_bytes()
            rows_per_key[kv] = (states, len(toks))
        n_rows_per_key = {}
        keys_np = batch.column(key).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(keys_np, return_counts=True)
        n_rows_per_key = dict(zip(uk.tolist(), cnt.tolist()))
        out = {
            key: list(rows_per_key.keys()),
            "n_rows": [n_rows_per_key.get(k, 0) for k in rows_per_key],
            "n_tokens": [v[1] for v in rows_per_key.values()],
        }
        for name in specs:
            out[state_col(name)] = [v[0][name] for v in rows_per_key.values()]
        return pa.table(out)

    return build


def build_partials(ds: "ray.data.Dataset", specs: dict[str, SketchSpec],
                   key: str = "source", tokens_col: str = "tokens",
                   batch_size: int | None = 8192) -> "ray.data.Dataset":
    needed = [key, tokens_col]
    if set(needed) != set(ds.schema().names):
        ds = ds.select_columns(needed)
    return ds.map_batches(
        make_partial_builder(specs, key, tokens_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# merge tree (reduce side)
# ---------------------------------------------------------------------------

def _merge_rows_per_key(tbl: pa.Table, specs: dict[str, SketchSpec],
                        key: str) -> pa.Table:
    """Merge same-key state rows of one table; one output row per key."""
    keys_np = tbl.column(key).to_numpy(zero_copy_only=False)
    n_rows = tbl.column("n_rows").to_numpy(zero_copy_only=False)
    n_tokens = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
    uniq = np.unique(keys_np)
    out = {key: uniq.tolist(), "n_rows": [], "n_tokens": []}
    blob_cols = {name: tbl.column(state_col(name)).to_pylist() for name in specs}
    for name in specs:
        out[state_col(name)] = []
    for kv in uniq:
        mask = keys_np == kv
        idxs = np.flatnonzero(mask)
        out["n_rows"].append(int(n_rows[mask].sum()))
        out["n_tokens"].append(int(n_tokens[mask].sum()))
        for name, spec in specs.items():
            blobs = [blob_cols[name][i] for i in idxs]
            out[state_col(name)].append(merge_many(spec, blobs).to_bytes())
    return pa.table(out)


def merge_partials(partials: "ray.data.Dataset", specs: dict[str, SketchSpec],
                   key: str = "source",
                   combine_batch_size: int = 1024) -> "ray.data.Dataset":
    """Reduce partial states to one state row per key.

    Two levels: (1) a SORT-FREE combiner — map_batches over bundles of
    ``combine_batch_size`` partial rows merging same-key states within each
    bundle.  This is the skew guard: a hot key's partials collapse by
    ~combine_batch_size-x BEFORE any shuffle, with no extra all-to-all (an
    earlier salted-groupby level cost a second Sort barrier and starved the
    streaming executor).  (2) the single groupby(key) shuffle over the few
    surviving rows.
    """
    merger = _make_group_merger(specs, key)
    if combine_batch_size > 0:
        partials = partials.map_batches(
            lambda t: _merge_rows_per_key(t, specs, key),
            batch_size=combine_batch_size, batch_format="pyarrow")
    return partials.groupby(key).map_groups(merger, batch_format="pyarrow")


def _make_group_merger(specs: dict[str, SketchSpec], key: str):
    def merge_group(tbl: pa.Table) -> pa.Table:
        out = {
            key: [tbl.column(key)[0].as_py()],
            "n_rows": [int(np.sum(tbl.column("n_rows").to_numpy()))],
            "n_tokens": [int(np.sum(tbl.column("n_tokens").to_numpy()))],
        }
        for name, spec in specs.items():
            blobs = tbl.column(state_col(name)).to_pylist()
            out[state_col(name)] = [merge_many(spec, blobs).to_bytes()]
        return pa.table(out)

    return merge_group


def build_sketch_states(ds: "ray.data.Dataset", specs: dict[str, SketchSpec],
                        key: str = "source", tokens_col: str = "tokens",
                        batch_size: int | None = 8192,
                        tree_width: int = 0,
                        combine_batch_size: int = 1024) -> "ray.data.Dataset":
    """read -> partials -> combiner -> merged per-key states.

    ``tree_width`` is accepted for backward compatibility; the sort-free
    combiner (see merge_partials) subsumes the old salted merge level.
    """
    del tree_width  # subsumed by the combiner
    partials = build_partials(ds, specs, key, tokens_col, batch_size)
    return merge_partials(partials, specs, key, combine_batch_size)


# ---------------------------------------------------------------------------
# epoch-flush actor build (SURVEY §4.2 variant)
# ---------------------------------------------------------------------------

def build_sketch_states_epoch(ds: "ray.data.Dataset",
                              specs: dict[str, SketchSpec],
                              key: str = "source",
                              tokens_col: str = "tokens",
                              batch_size: int | None = 8192,
                              num_actors: int | None = None) -> pa.Table:
    """Epoch-flush build: per-ACTOR accumulated states, serialized ONCE.

    The task-pool path (``build_sketch_states``) re-allocates and serializes
    a fresh state set per (batch, key) — ~100s of KB per batch — and needs a
    combiner + one groupby to fold them.  Here ``streaming_split`` feeds
    ``num_actors`` accumulator actors; each actor updates ITS running
    sketches in place across every batch of its shard and emits one state
    set at end of stream.  Serialization drops from O(#batches x #keys) to
    O(#actors x #keys) state blobs, and the shuffle disappears entirely —
    the driver folds #actors partials (KBs).

    Returns the merged per-key state TABLE (same schema as
    ``build_sketch_states`` rows).  Estimates are identical to the task-pool
    path for associative sketches (property-tested); like any partitioned
    build, compaction-sampling sketches (KLL/t-digest) may differ within
    their rank-error bounds.

    Trade-off vs the task path (documented, both kept): actors pin memory
    for the whole epoch and a dead actor loses its accumulated state (the
    task path is stateless/retryable per batch).  For preemption-tolerant
    100 TB builds use ``stages/checkpoint.py:build_sketch_states_epoch_
    resumable``: the same epoch accumulation per INPUT PARTITION with an
    atomic per-partition checkpoint + Ray task retry, so a dead worker
    costs one partition, not the epoch (kill-a-worker tested).
    """
    import ray

    if num_actors is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # leave headroom for the upstream read tasks feeding the split
        num_actors = max(1, int(cpus * 0.8))
    shards = ds.select_columns([key, tokens_col]).streaming_split(
        num_actors, equal=False)

    @ray.remote(num_cpus=1)
    def run_shard(shard, specs, key, tokens_col, batch_size):
        states: dict = {}
        meta: dict = {}
        for batch in shard.iter_batches(batch_format="pyarrow",
                                        batch_size=batch_size):
            keys_np = batch.column(key).to_numpy(zero_copy_only=False)
            uk, cnt = np.unique(keys_np, return_counts=True)
            rows_per_key = dict(zip(uk.tolist(), cnt.tolist()))
            for kv, toks in iter_key_tokens(batch, key, tokens_col):
                st = states.get(kv)
                if st is None:
                    st = {name: spec.new() for name, spec in specs.items()}
                    states[kv] = st
                    meta[kv] = [0, 0]
                for name in specs:
                    st[name].update_tokens(toks)
                meta[kv][0] += int(rows_per_key.get(kv, 0))
                meta[kv][1] += len(toks)
        return {kv: ({n: s.to_bytes() for n, s in st.items()}, meta[kv])
                for kv, st in states.items()}

    results = ray.get([run_shard.remote(s, specs, key, tokens_col, batch_size)
                       for s in shards])
    merged: dict = {}
    counts: dict = {}
    for part in results:
        for kv, (blobs, (n_rows, n_toks)) in part.items():
            if kv not in merged:
                merged[kv] = {n: Sketch.from_bytes(specs[n], b)
                              for n, b in blobs.items()}
                counts[kv] = [n_rows, n_toks]
            else:
                for n, b in blobs.items():
                    merged[kv][n].merge_in(Sketch.from_bytes(specs[n], b))
                counts[kv][0] += n_rows
                counts[kv][1] += n_toks
    keys_sorted = sorted(merged)
    out = {
        key: keys_sorted,
        "n_rows": [counts[k][0] for k in keys_sorted],
        "n_tokens": [counts[k][1] for k in keys_sorted],
    }
    for name in specs:
        out[state_col(name)] = [merged[k][name].to_bytes()
                                for k in keys_sorted]
    return pa.table(out)


# ---------------------------------------------------------------------------
# driver-side finalize (small data only)
# ---------------------------------------------------------------------------

def collect_states(states_ds: "ray.data.Dataset", specs: dict[str, SketchSpec],
                   key: str = "source") -> dict[str, dict[str, Sketch]]:
    """Materialize the per-key state table (<= #keys rows) into sketches."""
    out: dict[str, dict[str, Sketch]] = {}
    for row in states_ds.take_all():
        out[row[key]] = {
            name: Sketch.from_bytes(spec, row[state_col(name)])
            for name, spec in specs.items()
        }
    return out


def union_across_keys(per_key: dict[str, dict[str, Sketch]],
                      specs: dict[str, SketchSpec],
                      order: Iterable[str] | None = None) -> dict[str, Sketch]:
    """Merge each sketch across all keys (the reference's estimator union).

    ``order`` fixes the fold order for documentation/reproducibility; for
    associative sketches the result is order-independent.
    """
    keys = list(order) if order is not None else sorted(per_key)
    out: dict[str, Sketch] = {}
    for name, spec in specs.items():
        acc = spec.new()
        for k in keys:
            acc.merge_in(per_key[k][name])
        out[name] = acc
    return out


def sketch_aggregation(spec, *, tokens_col: str = "tokens",
                       name: str | None = None, output: str = "estimate"):
    """Expose a sketch spec as a NATIVE ``ray.data.aggregate.AggregateFn``
    so callers can write idiomatic ``ds.groupby(key).aggregate(...)``
    alongside Count/Sum — the UDAF face of the same spec/state machinery
    the build stages use (vectorized block accumulate, associative merge).

    ``output='estimate'`` finalizes to the sketch's first estimate value
    (cardinality for HLL/Bloom, the sketch's own head metric otherwise);
    ``output='state'`` finalizes to the pickled state blob for downstream
    cross-key algebra.

    Accumulation is per BLOCK (one ``update_tokens`` over the block's
    flattened token values — zero-copy, no Python per row); Ray's
    hash-shuffle aggregator handles partial merge, so the shuffle payload
    per (block, key) is one serialized sketch state.
    """
    if output not in ("estimate", "state"):
        raise ValueError("output must be 'estimate' or 'state'")
    import pickle

    from ray.data.aggregate import AggregateFn

    agg_name = name or f"{output}({spec.__class__.__name__})"

    def init(_key):
        return spec.new()

    def accumulate_block(state, block: pa.Table):
        vals, _ = flat_tokens(block, tokens_col)
        if len(vals):
            state.update_tokens(vals)
        return state

    def merge(a, b):
        a.merge_in(b)
        return a

    def finalize(state):
        if output == "state":
            return pickle.dumps(state.state_dict())
        return float(np.asarray(state.estimate())[0])

    return AggregateFn(init=init, merge=merge, name=agg_name,
                       accumulate_block=accumulate_block, finalize=finalize)


def column_sketch_state(ds: "ray.data.Dataset", spec: SketchSpec,
                        col: str) -> Sketch:
    """Build ONE merged sketch over a numeric column (scalar or list):
    each block folds into a per-block partial state (one vectorized
    ``update_tokens``), only the KB-scale serialized states travel to the
    driver, and an associative fold merges them — the global (un-keyed)
    counterpart of ``build_sketch_states``.  The corpus itself never
    leaves the workers; driver cost is O(#blocks) KB blobs.
    """
    import pickle

    def partial(t: pa.Table) -> dict:
        s = spec.new()
        vals, _ = flat_tokens(t, col)
        if vals.dtype.kind == "f":   # nulls surface as NaN: drop like SQL
            vals = vals[~np.isnan(vals)]
        if len(vals):
            s.update_tokens(vals)
        return {"state": np.array([pickle.dumps(s.state_dict())],
                                  dtype=object)}

    blobs = (ds.select_columns([col])
             .map_batches(partial, batch_format="pyarrow")
             .to_pandas()["state"])
    return merge_many(spec, blobs)


def table_sketch_profile(ds: "ray.data.Dataset", cols: list[str], *,
                         hll_spec=None, dd_spec=None) -> dict:
    """ONE streaming pass builds a sketch profile of many numeric columns
    at once: per column an HLL (distinct count; exact below the sparse
    threshold) and a DDSketch (relative-error quantiles).  The
    data-quality "describe" a curation pipeline runs before committing to
    filters — at 100 TB one corpus scan replaces #cols x #stats exact
    aggregations.

    Per block, each column folds into its two partial states (vectorized);
    only KB blobs travel (one row per (block, column)); the driver merges
    per column.  Doubles count distinct by BIT pattern (float64 view as
    int64 — equal to SQL COUNT(DISTINCT) when the data has no -0.0/NaN
    mix; NaNs are dropped as SQL nulls).  Returns
    ``{col: {"hll": HllSketch, "dd": DDSketch}}``; row count per column is
    ``dd.n``.
    """
    import pickle

    from ..state import DDSketchSpec, HllSpec

    hll_spec = hll_spec or HllSpec(p=14)
    dd_spec = dd_spec or DDSketchSpec(alpha=0.01)

    def partial(t: pa.Table) -> dict:
        names, blobs = [], []
        for c in cols:
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            h = hll_spec.new()
            h.update_tokens(v.view(np.int64))
            d = dd_spec.new()
            d.update_tokens(v)
            names.append(c)
            blobs.append(pickle.dumps((h.state_dict(), d.state_dict())))
        return {"col": np.array(names, dtype=object),
                "state": np.array(blobs, dtype=object)}

    merged = {c: {"hll": hll_spec.new(), "dd": dd_spec.new()} for c in cols}
    for b in (ds.select_columns(cols)
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .iter_batches(batch_format="pandas")):
        for c, blob in zip(b["col"], b["state"]):
            hs, dds = pickle.loads(blob)
            h = hll_spec.new()
            h.load_state(hs)
            merged[c]["hll"].merge_in(h)
            d = dd_spec.new()
            d.load_state(dds)
            merged[c]["dd"].merge_in(d)
    return merged
