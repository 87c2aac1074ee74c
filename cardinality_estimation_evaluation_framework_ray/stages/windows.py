"""Sliding-window aggregates: per-key trailing-window count/sum.

The SQL shape is ``agg(...) OVER (PARTITION BY key ORDER BY ts RANGE
BETWEEN <window> PRECEDING AND CURRENT ROW)`` — per row, aggregate every
row of the same key whose timestamp lies in ``[ts - window, ts]``
(inclusive of same-timestamp peers, matching the SQL RANGE frame).  The
reference has no ordering semantics beyond prefix unions (SURVEY.md §2.8);
this is the event-stream operator a feature/training pipeline needs.

Distributed shape: ONE shuffle on the key, then a fully vectorized
per-group scan — sort by ts once, two ``searchsorted`` calls give every
row its window band, and count/sum come from index arithmetic and a
cumulative-sum difference.  No per-row Python, no driver state.

Hot-key handling (``bucket_span``, must be >= ``window``): rows co-group on
``(key, ts // span)``; each row is ALSO replicated into the next bucket as
a context-only row (a trailing window from bucket b reaches at most bucket
b-1 when span >= window), the per-bucket scan runs over owner+context rows
and emits owner rows only — identical output, bounded per-task group size,
2× shuffle payload of the (id, key, ts, value) metadata columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.rounding import micro_round

__all__ = ["windowed_agg", "rolling_agg", "resample_counts",
           "sliding_window_distinct", "ewma_by_key"]

_BUCKET = "__win_bucket__"
_OWNER = "__win_owner__"


def _to_ns(arr: np.ndarray) -> np.ndarray:
    """Comparable time axis: datetimes -> int64 ns; integers -> int64;
    floats pass through UNCHANGED (searchsorted/window arithmetic works in
    float space — truncating 10.7 to 10 would conflate distinct times)."""
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[ns]").view(np.int64)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.int64)
    return arr.astype(np.float64)


def windowed_agg(ds: "ray.data.Dataset", *, key_col: str, ts_col: str,
                 id_col: str, window, value_col: str | None = None,
                 count_name: str = "n_window", sum_name: str = "sum_window",
                 bucket_span=None) -> "ray.data.Dataset":
    """Per row: count (and sum of ``value_col``) over same-key rows with
    ``ts`` in ``[row.ts - window, row.ts]``.

    Output: (id_col, key_col, count_name[, sum_name]).  ``window`` /
    ``bucket_span`` are ints for integer ``ts`` columns, anything
    ``pd.Timedelta`` can parse for timestamp columns.  Exact-sum contract:
    pass an integer ``value_col`` (quantize floats upstream) — the
    cumulative-difference sum is then exact and oracle-hashable.
    """
    cols = [id_col, key_col, ts_col] + ([value_col] if value_col else [])
    ds = ds.select_columns(cols)
    is_ts = pa.types.is_timestamp(
        _schema_type(ds, ts_col))
    win = int(pd.Timedelta(window).value) if is_ts else window

    def scan(g: pd.DataFrame, owner_mask: np.ndarray | None = None
             ) -> pd.DataFrame:
        ts = _to_ns(g[ts_col].to_numpy())
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        lo = np.searchsorted(ts_s, ts_s - win, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")
        out = {id_col: g[id_col].to_numpy()[order],
               key_col: g[key_col].to_numpy()[order],
               count_name: (hi - lo).astype(np.int64)}
        if value_col:
            v = g[value_col].to_numpy()[order].astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(v)])
            out[sum_name] = csum[hi] - csum[lo]
        df = pd.DataFrame(out)
        if owner_mask is not None:
            df = df[owner_mask[order]]
        return df

    if bucket_span is None:
        return (ds.groupby(key_col)
                .map_groups(scan, batch_format="pandas"))

    span = (int(pd.Timedelta(bucket_span).value) if is_ts
            else bucket_span)
    if span < win:
        raise ValueError("bucket_span must be >= window so a trailing "
                         "window reaches at most one previous bucket")

    def tag(t: pa.Table) -> pa.Table:
        ts = _to_ns(t.column(ts_col).to_numpy(zero_copy_only=False))
        b = np.asarray(ts // span).astype(np.int64)
        n = t.num_rows
        idx = np.concatenate([np.arange(n, dtype=np.int64),
                              np.arange(n, dtype=np.int64)])
        buckets = np.concatenate([b, b + 1])  # owner copy + context copy
        owner = np.concatenate([np.ones(n, np.int8), np.zeros(n, np.int8)])
        return (t.take(pa.array(idx))
                .append_column(_BUCKET, pa.array(buckets))
                .append_column(_OWNER, pa.array(owner)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return scan(g, owner_mask=g[_OWNER].to_numpy() == 1)

    return (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby([key_col, _BUCKET])
            .map_groups(per_bucket, batch_format="pandas"))


def rolling_agg(ds: "ray.data.Dataset", *, key_col: str, order_cols: list,
                id_col: str, frame_rows: int, value_col: str,
                count_name: str = "roll_n", sum_name: str = "roll_sum",
                max_group_rows: int | None = None) -> "ray.data.Dataset":
    """Per-key ROWS-frame rolling aggregate: for each row, count and sum of
    ``value_col`` over the ``frame_rows`` most recent same-key rows in
    ``order_cols`` order (inclusive of the current row) — the SQL
    ``agg(...) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN f-1
    PRECEDING AND CURRENT ROW)`` frame.  ``windowed_agg`` above is the
    RANGE-frame (time-bounded) sibling; this one is row-count-bounded.

    Determinism contract: ``(key_col, *order_cols)`` must totally order the
    group (append a unique id as the last order col), exactly as the SQL
    window's ORDER BY must — otherwise peer rows make both sides ambiguous.
    Exact-sum contract: integer ``value_col`` (quantize floats upstream).

    Distributed shape: ONE shuffle on the key, then a per-group lexsort +
    cumulative-sum difference — fully vectorized, no driver state.  Unlike
    a RANGE frame, a ROWS frame has no time bound, so the two-level
    bucket-with-context plan of ``windowed_agg`` does not apply (a frame
    can reach arbitrarily far back through sparse buckets); a key must fit
    one task.  ``max_group_rows`` is the loud guard for that assumption:
    a group above it raises instead of silently OOMing the worker.
    """
    if frame_rows < 1:
        raise ValueError("frame_rows must be >= 1")
    cols = list(dict.fromkeys([id_col, key_col, *order_cols, value_col]))
    ds = ds.select_columns(cols)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if max_group_rows is not None and n > max_group_rows:
            raise ValueError(
                f"rolling_agg group {g[key_col].iloc[0]!r} has {n} rows "
                f"> max_group_rows={max_group_rows}; split the key upstream "
                "or raise the guard")
        order = np.lexsort([_to_ns(g[c].to_numpy())
                            if g[c].to_numpy().dtype != object
                            else g[c].to_numpy()
                            for c in reversed(order_cols)])
        v = g[value_col].to_numpy()[order].astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(v)])
        i = np.arange(n, dtype=np.int64)
        lo = np.maximum(0, i - frame_rows + 1)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy()[order],
            key_col: g[key_col].to_numpy()[order],
            count_name: i - lo + 1,
            sum_name: csum[i + 1] - csum[lo],
        })

    return ds.groupby(key_col).map_groups(scan, batch_format="pandas")


def _schema_type(ds: "ray.data.Dataset", col: str) -> pa.DataType:
    sch = ds.schema()
    t = sch.types[sch.names.index(col)]
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def sliding_window_distinct(ds: "ray.data.Dataset", spec, *, ts_col: str,
                            id_col: str, window_buckets: int,
                            bucket: str = "hour",
                            out_col: str = "distinct_ids") -> pd.DataFrame:
    """Trailing-window COUNT(DISTINCT id) per time bucket via SKETCH ALGEBRA.

    The exact-engine shape re-scans W buckets of raw events per window (W×
    read amplification, ids shuffled for every window).  Here the corpus is
    read ONCE: one sketch state per bucket (``sketch_aggregation`` UDAF —
    the groupby's shuffle payload is KB-scale states, never ids), then each
    trailing window of ``window_buckets`` buckets is an O(W) associative
    state merge over the tiny per-bucket table.  With a sparse (hash-exact)
    spec such as ``HllSpec(p=14)`` below saturation the result EQUALS exact
    windowed COUNT(DISTINCT); dense sketches give the usual error bound.

    Output: one row per bucket present in the data — (bucket_start,
    ``out_col``) for the window of the ``window_buckets`` CALENDAR buckets
    ending at that bucket (absent intermediate buckets contribute nothing
    but still advance the window, matching the SQL RANGE-interval frame).

    Scale: the second stage touches only #buckets state rows (hours of a
    year ≈ 8.8k); the driver fold is the two-stack sliding aggregation
    (``_sliding_fold``) — amortized O(1) state merges per bucket, O(#
    buckets) total, independent of W.
    """
    import pyarrow.compute as pc

    from .build import sketch_aggregation

    def to_bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket_start": pc.floor_temporal(t.column(ts_col), unit=bucket),
            id_col: t.column(id_col),
        })

    agg = sketch_aggregation(spec, tokens_col=id_col, output="state",
                             name="__state")
    states = (ds.select_columns([ts_col, id_col])
              .map_batches(to_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("bucket_start").aggregate(agg)
              .to_pandas())
    states = states.sort_values("bucket_start").reset_index(drop=True)
    starts = states["bucket_start"].astype("datetime64[us]")
    step = {"hour": np.timedelta64(3600, "s"), "day": np.timedelta64(86400, "s"),
            "minute": np.timedelta64(60, "s")}[bucket]
    span = step * (window_buckets - 1)
    lo = np.searchsorted(starts.to_numpy(), starts.to_numpy() - span,
                         side="left")
    blobs = states["__state"].tolist()
    est = np.fromiter(
        (int(np.asarray(s.estimate())[0] + 0.5)
         for s in _sliding_fold(spec, blobs, lo)),
        dtype=np.int64, count=len(blobs))
    return pd.DataFrame({"bucket_start": starts, out_col: est})


def _sliding_fold(spec, blobs: list, lo: np.ndarray):
    """Two-stack sliding-window aggregation over serialized sketch states:
    yields, for each index i, the merge of ``blobs[lo[i]:i+1]`` — with
    amortized O(1) ``merge_in`` calls per element instead of the naive
    O(window) refold (each element is merged once on push and once on the
    back→front flush; each query is one combine).  Requires ``lo`` to be
    non-decreasing with ``lo[i] <= i`` (trailing windows over a sorted
    axis).  Yielded sketches may share internal arrays — treat them as
    read-only snapshots.
    """
    import copy
    import pickle

    def from_blob(b):
        s = spec.new()
        s.load_state(pickle.loads(b))
        return s

    front: list = []   # suffix merges of the flushed segment; top ([-1])
    #                    covers the OLDEST live element .. segment end
    back_blobs: list = []
    back_agg = None    # running merge of back_blobs
    oldest = 0         # index of the oldest element still in some window
    prev_lo = 0
    for i, b in enumerate(blobs):
        if lo[i] < prev_lo or lo[i] > i:
            raise ValueError("_sliding_fold needs non-decreasing lo <= i")
        prev_lo = lo[i]
        # push element i
        back_blobs.append(b)
        if back_agg is None:
            back_agg = from_blob(b)
        else:
            back_agg.merge_in(from_blob(b))
        # evict expired elements (amortized: each element is flushed and
        # popped at most once)
        while oldest < lo[i]:
            if not front:
                # flush: suffix-merge the back segment so pops are O(1)
                acc = None
                for bb in reversed(back_blobs):
                    s = from_blob(bb)
                    if acc is not None:
                        s.merge_in(acc)
                    front.append(s)
                    acc = s
                back_blobs = []
                back_agg = None
            front.pop()
            oldest += 1
        # query = front.top ⊕ back (either side may be absent)
        if front and back_agg is not None:
            cur = copy.deepcopy(front[-1])
            cur.merge_in(back_agg)
        elif front:
            cur = front[-1]
        else:
            cur = back_agg
        yield cur


def resample_counts(ds: "ray.data.Dataset", *, key_col: str, ts_col: str,
                    unit: str = "hour",
                    max_spine_rows: int = 10_000_000) -> pd.DataFrame:
    """Gap-filled time-series resample: event counts per (key, calendar
    bucket) with EXPLICIT ZERO rows for empty buckets over the corpus'
    global [min, max] bucket range — the shape plotting/anomaly tooling
    needs (a missing bucket and a zero bucket are different facts).

    Distributed shape: one combiner-compressed groupby over observed
    (key, bucket) pairs + a 2-number min/max aggregate; the zero-filled
    spine (distinct keys × bucket range) is driver-side metadata.
    Dimension contract: the KEY set must be bounded (event types,
    sources) — the spine is |keys| × |buckets| rows by construction,
    guarded by ``max_spine_rows`` (raise it knowingly for bigger grids).
    """
    import pyarrow.compute as pc

    if unit not in ("hour", "day", "minute"):
        raise ValueError("unit must be 'hour', 'day' or 'minute'")

    def to_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor_temporal(t.column(ts_col), unit=unit),
                    pa.timestamp("us"))
        return pa.table({key_col: t.column(key_col), "bucket": b})

    obs = (ds.select_columns([key_col, ts_col])
           .map_batches(to_bucket, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby([key_col, "bucket"]).count().to_pandas()
           .rename(columns={"count()": "n"}))
    if obs.empty:
        return pd.DataFrame({key_col: pd.Series(dtype=object),
                             "bucket": pd.Series(dtype="datetime64[us]"),
                             "n": pd.Series(dtype="int64")})
    step = {"hour": "h", "day": "D", "minute": "min"}[unit]
    spine_buckets = pd.date_range(obs["bucket"].min(), obs["bucket"].max(),
                                  freq=step)
    # no sorted(): a null key is its own partition (SQL DISTINCT keeps
    # NULL) and None doesn't compare with str; the final sort_values
    # orders the output
    keys = obs[key_col].unique()
    n_spine = len(keys) * len(spine_buckets)
    if n_spine > max_spine_rows:
        raise ValueError(
            f"resample spine would be {n_spine} rows "
            f"({len(keys)} keys x {len(spine_buckets)} buckets) > "
            f"max_spine_rows={max_spine_rows}; the bounded-key contract "
            "is violated — aggregate or bucket the key upstream")
    spine = pd.MultiIndex.from_product(
        [keys, spine_buckets], names=[key_col, "bucket"]).to_frame(
        index=False)
    out = spine.merge(obs, on=[key_col, "bucket"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    out["bucket"] = out["bucket"].astype("datetime64[us]")
    return (out.sort_values([key_col, "bucket"]).reset_index(drop=True))


def ewma_by_key(ds: "ray.data.Dataset", *, key_col: str, ts_col: str,
                value_col: str, id_col: str, alpha: float
                ) -> "ray.data.Dataset":
    """Per-key exponentially weighted moving average over event order:
    ``s_0 = v_0; s_i = (1 - alpha) * s_{i-1} + alpha * v_i`` (the pandas
    ``ewm(adjust=False)`` recurrence) with rows ordered by
    ``(ts, id)`` within a key — the id tiebreak makes same-timestamp
    events deterministic and the output oracle-hashable.

    Output: (id, key, ewma) per input row, ewma rounded to 6 dp.

    Distributed shape: ONE shuffle on the key, then a per-group
    HILLIS-STEELE DOUBLING SCAN — the recurrence is a composition of
    affine maps ``s -> c*s + b`` (c = 1-alpha), which is associative, so
    the scan closes in ceil(log2 n) fully vectorized passes instead of a
    per-row Python loop.  Numerically benign: the composed multipliers are
    powers of c < 1 and only shrink.  A key's full history co-groups in
    one task (same contract as ``sessions``/``rolling_agg``: key
    cardinality x history must fit a task; use ``windowed_agg``'s
    bucket_span pattern if a single key's history outgrows one).
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    c = 1.0 - alpha

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="stable")
        v = df[value_col].to_numpy(dtype=np.float64)
        n = len(v)
        s = alpha * v
        m = np.full(n, c)
        if n:
            s[0] = v[0]   # adjust=False seed
            m[0] = 0.0
        d = 1
        while d < n:
            s[d:] = s[d:] + m[d:] * s[:-d]
            m[d:] = m[d:] * m[:-d]
            d *= 2
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            key_col: df[key_col].to_numpy(),
            "ewma": micro_round(s),
        })

    return (ds.select_columns([id_col, key_col, ts_col, value_col])
            .groupby(key_col).map_groups(scan, batch_format="pandas"))


def interval_union(ds: "ray.data.Dataset", *, key_col: str, start_col: str,
                   end_col: str) -> pd.DataFrame:
    """Merge overlapping/touching intervals per key and report coverage —
    the interval-union (gaps-and-islands over SPANS) primitive behind
    machine-utilization, user-active-time and availability metrics.
    ``sessionize`` handles point events + a gap rule; this handles
    arbitrary, arbitrarily-overlapping [start, end] intervals.

    An island breaks where an interval's start exceeds the running max of
    previous ends (sorted by (start, end)); touching intervals
    (start == prev end) merge.  Output per key: (n_islands:int64,
    covered_us:int64) with covered = sum over islands of
    (max end - min start) in exact integer microseconds.

    Scale shape: ONE shuffle (groupby key) moves each interval row once;
    the per-group pass is a vectorized sort + cummax scan (no Python per
    row).  Single-key-fits-a-task assumption as for sessionize — pre-split
    hot keys by coarse time bucket upstream if violated (islands crossing
    bucket edges then need the sessionize-style stitch).
    """

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g[start_col].to_numpy().astype("datetime64[us]").view(np.int64)
        e = g[end_col].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((e, s))
        s, e = s[order], e[order]
        run_max = np.maximum.accumulate(e)
        brk = np.ones(len(s), dtype=bool)
        if len(s) > 1:
            brk[1:] = s[1:] > run_max[:-1]
        starts = np.flatnonzero(brk)        # islands are contiguous runs
        lo = s[starts]                      # sorted by start => island min
        hi = np.maximum.reduceat(e, starts)
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "n_islands": np.int64(len(starts)),
            "covered_us": np.int64((hi - lo).sum()),
        })

    out = (ds.select_columns([key_col, start_col, end_col])
           .groupby(key_col).map_groups(merge, batch_format="pandas")
           .to_pandas())
    out["n_islands"] = out["n_islands"].astype("int64")
    out["covered_us"] = out["covered_us"].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)
