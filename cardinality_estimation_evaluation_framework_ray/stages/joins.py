"""Join operators: shuffle hash join, broadcast equi-join and as-of join.

Ray Data (2.49) has no native join; these are the shapes a pipeline at
this engine's scale actually wants:

* broadcast equi-join (stages/relational.py:broadcast_join): small side via
  ``ray.put`` once, map-side merge — no shuffle of the big side.
* shuffle hash join (here, ``hash_join``): big-big inner/left equi-join —
  both sides shuffled ONCE by the key (tag + union + groupby cogroup), then
  a vectorized per-group cartesian emit.  ``num_salts`` handles skewed keys
  by splitting left rows across salts and replicating right rows to every
  salt — identical output, 1/S per-task group size at an S× right payload.
* as-of join (here): both sides shuffled ONCE by the ``by`` key (tag + union
  + groupby — the cogroup composition), then a vectorized per-group
  ``merge_asof``.

Hot-key handling: by default one ``by`` group must fit in a task.  Both
joins take ``bucket_span`` (units of the ``on`` column) to switch to the
two-level scan for keys too hot for one task — rows are co-grouped on
``(by, on // bucket_span)`` so no task ever sees more than one time-bucket
of one key, with exact-output repair of the cross-bucket matches:

* range join: each right row is replicated into every bucket its band can
  serve (<= 2 adjacent buckets when ``bucket_span >= upper - lower``);
* as-of join: a per-(by, bucket) right EXTREMUM table (one metadata row per
  bucket) is scanned per key to inject each left-occupied bucket's carry —
  the latest right row before the bucket (backward) / earliest after it
  (forward) — so a group always contains its true match.

Output is identical to the single-level path (tested with one dominant key
spanning many blocks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_SIDE = "__asof_side__"
_BUCKET = "__asof_bucket__"


def _bucket_of(col: "pa.ChunkedArray | pa.Array", span) -> np.ndarray:
    """floor(on / span) as int64 (exact floor-division for integer on;
    timestamps bucket by nanosecond with a Timedelta-able span)."""
    a = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(a.dtype, np.datetime64):
        a = a.astype("datetime64[ns]").view(np.int64)
        return a // int(pd.Timedelta(span).value)
    if np.issubdtype(a.dtype, np.integer):
        return (a // span).astype(np.int64)
    return np.floor(a / span).astype(np.int64)


def _arrow_tagger(side: int, all_cols: list[str], types: dict):
    """Zero-copy Arrow column-align + side tag: existing columns pass through
    untouched; columns owned by the other side become typed nulls.  Keeps the
    big side out of pandas — only the per-key cogroup body (which needs
    ``merge_asof``) pays the conversion, one group at a time."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        present = set(t.column_names)
        cols = {}
        for c in all_cols:
            if c in present:
                col = t.column(c)
                cols[c] = col if col.type == types[c] else col.cast(types[c])
            else:
                cols[c] = pa.nulls(n, types[c])
        cols[_SIDE] = pa.array(np.full(n, side, np.int8))
        return pa.table(cols)

    return fn


def _pa_type(t) -> pa.DataType:
    """Dataset.schema() reports pyarrow types for Arrow blocks but numpy
    dtypes / Python classes for pandas blocks — normalize to pyarrow."""
    if isinstance(t, pa.DataType):
        return t
    if t is str:
        return pa.string()
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()  # numpy object dtype: text column


def _unified_types(left_schema, right_schema, all_cols: list[str]) -> dict:
    types = {}
    for name, typ in zip(right_schema.names, right_schema.types):
        types[name] = _pa_type(typ)
    for name, typ in zip(left_schema.names, left_schema.types):
        types[name] = _pa_type(typ)  # left wins on collisions
    return {c: types[c] for c in all_cols}


_SALT = "__join_salt__"


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              on: str, right_key: str | None = None, how: str = "inner",
              right_cols: list[str] | None = None, suffix: str = "_right",
              num_salts: int | None = None) -> "ray.data.Dataset":
    """Distributed big-big equi-join (inner or left), the shuffle hash join.

    One all-to-all on the key (tag + union + groupby cogroup), then a
    vectorized per-group cartesian emit — no driver-side state, neither side
    broadcast (use ``stages/relational.py:broadcast_join`` when one side
    fits in the object store; this operator is for two large inputs).

    Output: all left columns + ``right_cols`` (default: every right column
    except the key), suffixed where they collide with a left name.  Right
    rows with a null key never match (SQL semantics).

    ``how='semi'`` / ``'anti'`` emit left rows with >= 1 match / no match,
    left columns only — the EXISTS / NOT EXISTS shapes (decontamination-by-
    key, referential-integrity filters) without materializing match pairs.

    Known Ray 2.49 quirk (same as stages/cogroup.py): a result with ZERO
    rows may lose its schema in ``to_pandas()`` — consumers that can see
    empty results should reindex to the expected columns (the driver
    queries do).

    ``num_salts=S`` is the skew guard: left rows are split across S salts
    and every right row is replicated into all S, so a hot key's group
    shrinks S× on the left (build) side at an S× right payload — output
    identical (tested).  Use when one key's left rows exceed a task's
    memory; keys stay co-located per (key, salt), so the emit is unchanged.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError("how must be 'inner', 'left', 'semi' or 'anti'")
    right_key = right_key or on
    left_schema, right_schema = left.schema(), right.schema()
    left_names = list(left_schema.names)
    if on not in left_names:
        raise KeyError(f"left has no column {on!r}")
    if how in ("semi", "anti"):
        right_cols = []  # existence only: never carry right payload columns
    rc = right_cols if right_cols is not None else [
        c for c in right_schema.names if c != right_key]
    rename = {c: c + suffix if c in left_names else c for c in rc}

    types = {n: _pa_type(t) for n, t in zip(left_schema.names,
                                            left_schema.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(right_schema.names,
                                             right_schema.types)}
    for c in rc:
        types[rename[c]] = rtypes[c]
    all_cols = left_names + [rename[c] for c in rc]
    out_schema = pa.schema([(c, types[c]) for c in all_cols])
    key_type = types[on]

    def prep_right(t: pa.Table) -> pa.Table:
        cols = {on: t.column(right_key).cast(key_type)}
        for c in rc:
            cols[rename[c]] = t.column(c)
        out = pa.table(cols)
        return out.filter(out.column(on).is_valid())

    lt = left.map_batches(_arrow_tagger(0, all_cols, types),
                          batch_format="pyarrow")
    rt = (right.select_columns([right_key] + rc)
          .map_batches(prep_right, batch_format="pyarrow")
          .map_batches(_arrow_tagger(1, all_cols, types),
                       batch_format="pyarrow"))

    def per_key(t: pa.Table) -> pa.Table:
        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        l = np.flatnonzero(side == 0)
        r = np.flatnonzero(side == 1)
        if len(l) == 0 or (how in ("inner", "semi") and len(r) == 0) \
                or (how == "anti" and len(r) > 0):
            return out_schema.empty_table()
        if how in ("semi", "anti"):  # existence decided above: emit left rows
            sub = t.take(pa.array(l))
            return pa.table({c: sub.column(c).cast(types[c])
                             for c in left_names}).cast(out_schema)
        if len(r) == 0:  # left join, unmatched key
            sub = t.take(pa.array(l))
            cols = {c: sub.column(c).cast(types[c]) for c in left_names}
            for c in rc:
                cols[rename[c]] = pa.nulls(len(l), types[rename[c]])
            return pa.table(cols).cast(out_schema)
        li = np.repeat(l, len(r))
        ri = np.tile(r, len(l))
        lrows = t.take(pa.array(li))
        rrows = t.take(pa.array(ri))
        cols = {c: lrows.column(c).cast(types[c]) for c in left_names}
        for c in rc:
            cols[rename[c]] = rrows.column(rename[c]).cast(types[rename[c]])
        return pa.table(cols).cast(out_schema)

    if not num_salts or num_salts <= 1:
        return lt.union(rt).groupby(on).map_groups(per_key,
                                                   batch_format="pyarrow")

    S = int(num_salts)

    def salt_left(t: pa.Table) -> pa.Table:
        # any left-row -> salt assignment is correct (right is replicated to
        # every salt); round-robin within the batch balances group sizes
        return t.append_column(
            _SALT, pa.array(np.arange(t.num_rows, dtype=np.int64) % S))

    def salt_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), S)))
        return out.append_column(
            _SALT, pa.array(np.tile(np.arange(S, dtype=np.int64), n)))

    return (lt.map_batches(salt_left, batch_format="pyarrow")
            .union(rt.map_batches(salt_right, batch_format="pyarrow"))
            .groupby([on, _SALT])
            .map_groups(per_key, batch_format="pyarrow"))


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
              on: str, by: str, direction: str = "backward",
              right_cols: list[str] | None = None,
              suffix: str = "_right",
              bucket_span=None) -> "ray.data.Dataset":
    """For each left row, attach the latest (direction='backward') right row
    of the same ``by`` key with right.on <= left.on.

    Returns left columns + the selected right columns (suffixed where they
    collide).  Rows with no match keep nulls (left join semantics).

    ``bucket_span`` (numeric ``on`` units) selects the two-level scan for
    hot ``by`` keys: groups become ``(by, on // bucket_span)`` and each
    left-occupied bucket gets its cross-bucket carry injected (module
    docstring) — identical output, but no task sees more than one bucket of
    one key.
    """
    left_schema, right_schema = left.schema(), right.schema()
    rc = right_cols if right_cols is not None else [
        c for c in right_schema.names if c not in (on, by)]
    left_names = left_schema.names
    # one unified schema so the tagged union is well-formed
    all_cols = list(left_names) + [c for c in rc if c not in left_names]
    types = _unified_types(left_schema, right_schema, all_cols)

    rename = {c: c + suffix if c in left_names else c for c in [on] + rc}
    out_cols = list(left_names) + [rename[c] for c in [on] + rc]
    # every group emits THIS Arrow schema (typed nulls on no-match), so block
    # size accounting stays exact and empty groups can't degrade the schema
    out_schema = pa.schema(
        [(c, types[c]) for c in left_names]
        + [(rename[c], types[c]) for c in [on] + rc])

    def per_key(g: pd.DataFrame) -> pa.Table:
        lg = g[g[_SIDE] == 0][list(left_names)]
        if len(lg) == 0:
            return out_schema.empty_table()
        rg = (g[g[_SIDE] == 1][[by, on] + rc]
              .dropna(subset=[on]).rename(columns=rename))
        lg = lg.sort_values(on)
        rg = rg.sort_values(rename[on])
        out = pd.merge_asof(lg, rg, left_on=on, right_on=rename[on], by=by,
                            direction=direction)
        return pa.Table.from_pandas(out[out_cols], schema=out_schema,
                                    preserve_index=False)

    if bucket_span is None:
        lt = left.map_batches(_arrow_tagger(0, all_cols, types),
                              batch_format="pyarrow")
        rt = (right.select_columns([by, on] + rc)
              .map_batches(_arrow_tagger(1, all_cols, types),
                           batch_format="pyarrow"))
        return lt.union(rt).groupby(by).map_groups(per_key,
                                                   batch_format="pandas")

    if direction not in ("backward", "forward"):
        raise NotImplementedError(
            "bucket_span supports direction='backward'/'forward' only")
    span = bucket_span

    def tag_with_bucket(side: int):
        base = _arrow_tagger(side, all_cols, types)

        def fn(t: pa.Table) -> pa.Table:
            out = base(t)
            return out.append_column(
                _BUCKET, pa.array(_bucket_of(out.column(on), span)))

        return fn

    # --- metadata pass: which (by, bucket) cells have left rows -----------
    def lcells(t: pa.Table) -> pa.Table:
        return pa.table({by: t.column(by),
                         _BUCKET: pa.array(_bucket_of(t.column(on), span))})

    lmeta = (left.select_columns([by, on])
             .map_batches(lcells, batch_format="pyarrow")
             .groupby([by, _BUCKET]).count())

    # --- per-(by, bucket) right extremum: ONE full right row per cell -----
    def radd(t: pa.Table) -> pa.Table:
        return t.append_column(
            _BUCKET, pa.array(_bucket_of(t.column(on), span)))

    def rext_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(on, kind="stable")
        # merge_asof takes the LAST tie in sort order (backward) / first
        # (forward); the extremum row mirrors that
        return g.iloc[[-1 if direction == "backward" else 0]]

    rext = (right.select_columns([by, on] + rc)
            .map_batches(radd, batch_format="pyarrow")
            .groupby([by, _BUCKET]).map_groups(rext_group,
                                               batch_format="pandas"))

    # --- per-key scan over bucket metadata: emit each left bucket's carry --
    scan_schema = pa.schema([(by, types[by]), (_BUCKET, pa.int64()),
                             (on, types[on])]
                            + [(c, types[c]) for c in rc]
                            + [("__isl", pa.int8())])

    def tag_lmeta(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {by: t.column(by).cast(types[by]),
                _BUCKET: t.column(_BUCKET).cast(pa.int64()),
                on: pa.nulls(n, types[on])}
        for c in rc:
            cols[c] = pa.nulls(n, types[c])
        cols["__isl"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols).cast(scan_schema)

    def tag_rext(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by).cast(types[by]),
                _BUCKET: t.column(_BUCKET).cast(pa.int64()),
                on: t.column(on).cast(types[on])}
        for c in rc:
            cols[c] = t.column(c).cast(types[c])
        cols["__isl"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols).cast(scan_schema)

    carry_schema = pa.schema([(by, types[by]), (_BUCKET, pa.int64()),
                              (on, types[on])]
                             + [(c, types[c]) for c in rc])

    def carry_scan(g: pd.DataFrame) -> pa.Table:
        lq = np.sort(g.loc[g["__isl"] == 1, _BUCKET].unique())
        r = g[g["__isl"] == 0].sort_values(_BUCKET, kind="stable")
        if len(lq) == 0 or len(r) == 0:
            return carry_schema.empty_table()
        rb = r[_BUCKET].to_numpy()
        if direction == "backward":
            idx = np.searchsorted(rb, lq, side="left") - 1
            valid = idx >= 0
        else:
            idx = np.searchsorted(rb, lq, side="right")
            valid = idx < len(rb)
        out = r.iloc[idx[valid]].copy()
        out[_BUCKET] = lq[valid]
        return pa.Table.from_pandas(out[[by, _BUCKET, on] + rc],
                                    schema=carry_schema,
                                    preserve_index=False)

    carries = (lmeta.map_batches(tag_lmeta, batch_format="pyarrow")
               .union(rext.map_batches(tag_rext, batch_format="pyarrow"))
               .groupby(by).map_groups(carry_scan, batch_format="pandas"))

    def tag_carry(t: pa.Table) -> pa.Table:
        out = _arrow_tagger(1, all_cols, types)(
            t.select([by, on] + rc))
        return out.append_column(_BUCKET,
                                 t.column(_BUCKET).cast(pa.int64()))

    lt = left.map_batches(tag_with_bucket(0), batch_format="pyarrow")
    rt = (right.select_columns([by, on] + rc)
          .map_batches(tag_with_bucket(1), batch_format="pyarrow"))
    ct = carries.map_batches(tag_carry, batch_format="pyarrow")
    return (lt.union(rt).union(ct)
            .groupby([by, _BUCKET])
            .map_groups(per_key, batch_format="pandas"))


def range_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
               on: str, by: str, lower, upper,
               right_on: str | None = None,
               right_cols: list[str] | None = None,
               suffix: str = "_right",
               bucket_span=None) -> "ray.data.Dataset":
    """Interval (band) join: each left row pairs with every right row of the
    same ``by`` key whose ``right_on`` lies in [left.on + lower,
    left.on + upper] (inner join).

    Ray Data has no native join; like asof_join this is ONE shuffle on the
    ``by`` key (tag + union + groupby cogroup), then a fully vectorized
    per-group band lookup: sort the right side once, two searchsorted
    calls give each left row its [lo, hi) match band, and the pair list is
    materialized with repeat/arange arithmetic (no per-row Python).

    ``bucket_span`` (numeric, >= upper - lower) selects the two-level scan
    for hot ``by`` keys: left rows group on ``(by, on // span)`` and each
    right row is replicated into the <= 2 adjacent buckets its band can
    serve, so every (left, right) match lands in exactly one group —
    identical output, bounded per-task group size.
    """
    right_on = right_on or on
    left_schema, right_schema = left.schema(), right.schema()
    rc = right_cols if right_cols is not None else [
        c for c in right_schema.names if c not in (right_on, by)]
    left_names = left_schema.names
    all_cols = list(left_names) + [c for c in [right_on] + rc
                                   if c not in left_names]
    types = _unified_types(left_schema, right_schema, all_cols)

    rename = {c: c + suffix if c in left_names else c for c in [right_on] + rc}
    out_cols = list(left_names) + [rename[c] for c in [right_on] + rc]
    out_schema = pa.schema(
        [(c, types[c]) for c in left_names]
        + [(rename[c], types[c]) for c in [right_on] + rc])

    def per_key(g: pd.DataFrame) -> pa.Table:
        lg = g[g[_SIDE] == 0][list(left_names)]
        rg = (g[g[_SIDE] == 1][[right_on] + rc]
              .dropna(subset=[right_on]).sort_values(right_on))

        if len(lg) == 0 or len(rg) == 0:
            return out_schema.empty_table()
        rt_vals = rg[right_on].to_numpy()
        lt_vals = lg[on].to_numpy()
        lo = np.searchsorted(rt_vals, lt_vals + lower, side="left")
        hi = np.searchsorted(rt_vals, lt_vals + upper, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        li = np.repeat(np.arange(len(lg)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        ri = np.repeat(lo, counts) + within
        out = pd.concat([
            lg.iloc[li].reset_index(drop=True),
            rg.iloc[ri].reset_index(drop=True).rename(columns=rename)], axis=1)
        return pa.Table.from_pandas(out[out_cols], schema=out_schema,
                                    preserve_index=False)

    if bucket_span is None:
        lt = left.map_batches(_arrow_tagger(0, all_cols, types),
                              batch_format="pyarrow")
        rt = (right.select_columns([by, right_on] + rc)
              .map_batches(_arrow_tagger(1, all_cols, types),
                           batch_format="pyarrow"))
        return lt.union(rt).groupby(by).map_groups(per_key,
                                                   batch_format="pandas")

    if bucket_span < (upper - lower):
        raise ValueError("bucket_span must be >= upper - lower so a right "
                         "row's band spans at most 2 buckets")
    span = bucket_span

    def tag_left(t: pa.Table) -> pa.Table:
        out = _arrow_tagger(0, all_cols, types)(t)
        return out.append_column(
            _BUCKET, pa.array(_bucket_of(out.column(on), span)))

    def tag_right(t: pa.Table) -> pa.Table:
        out = _arrow_tagger(1, all_cols, types)(t)
        rv = out.column(right_on).to_numpy(zero_copy_only=False)
        # left rows matching right value v have on in [v - upper, v - lower]
        if np.issubdtype(rv.dtype, np.datetime64):
            rv = rv.astype("datetime64[ns]").view(np.int64)
            lo_ns = int(pd.Timedelta(lower).value)
            up_ns = int(pd.Timedelta(upper).value)
            sp_ns = int(pd.Timedelta(span).value)
            b1 = (rv - up_ns) // sp_ns
            b2 = (rv - lo_ns) // sp_ns
        elif np.issubdtype(rv.dtype, np.integer):
            b1 = (rv - upper) // span
            b2 = (rv - lower) // span
        else:
            b1 = np.floor((rv - upper) / span)
            b2 = np.floor((rv - lower) / span)
        b1 = b1.astype(np.int64)
        b2 = b2.astype(np.int64)
        dup = np.flatnonzero(b2 != b1)
        idx = np.concatenate([np.arange(len(rv), dtype=np.int64), dup])
        buckets = np.concatenate([b1, b2[dup]])
        return out.take(pa.array(idx)).append_column(_BUCKET,
                                                     pa.array(buckets))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = (right.select_columns([by, right_on] + rc)
          .map_batches(tag_right, batch_format="pyarrow"))
    return (lt.union(rt).groupby([by, _BUCKET])
            .map_groups(per_key, batch_format="pandas"))


def grouped_top_k_by_count(ds: "ray.data.Dataset", group_col: str,
                           item_col: str, k: int,
                           count_name: str = "n") -> "ray.data.Dataset":
    """Top-k items per group by count (the windowed
    row_number()-over-partition shape): one count aggregate over
    (group, item), then a per-group local top-k — the shuffle payload is the
    distinct (group, item) count table, never raw rows.  Deterministic
    tie-break by item."""
    import pyarrow as pa

    counts = ds.groupby([group_col, item_col]).count()

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"count()": count_name})
        df[count_name] = df[count_name].astype("int64")
        return df.sort_values([count_name, item_col],
                              ascending=[False, True]).head(k)

    return counts.groupby(group_col).map_groups(local_topk,
                                                batch_format="pandas")


def top_k_by_count(ds: "ray.data.Dataset", key_cols: list[str], k: int,
                   count_name: str = "n") -> pd.DataFrame:
    """Exact distributed top-k: groupby count (the shuffle is over DISTINCT
    keys, pre-combined map-side by Ray's aggregate) -> per-block partial
    top-k -> driver merge of <= num_blocks * k rows.  The full distinct-key
    table (web-corpus vocab can be 10^8+ keys) never reaches the driver.
    Deterministic tie-break by key."""
    counts = ds.groupby(key_cols).count()

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"count()": count_name})
        df[count_name] = df[count_name].astype("int64")
        return df.sort_values([count_name] + key_cols,
                              ascending=[False] + [True] * len(key_cols)).head(k)

    partial = counts.map_batches(local_topk, batch_format="pandas").to_pandas()
    # partial top-k is exact for counts: the aggregate emits one row per key,
    # so the global top-k is contained in the union of per-block top-k's
    out = partial.sort_values([count_name] + key_cols,
                              ascending=[False] + [True] * len(key_cols))
    return out.head(k).reset_index(drop=True)