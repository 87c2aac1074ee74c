"""Relational-shaped operators of the evaluation/analysis layer.

Mirrors SURVEY.md §2.7 (reference ``src/common/analysis.py``,
``src/simulations/simulator.py:75-150``, ``src/evaluations/analyzer.py``):
metric maps, grouped aggregates, small-side broadcast joins, wide->long
melt, per-group lag-diff — expressed over Ray Datasets, plus an exact
distributed group quantile (percentile_disc semantics) built from a
value-count aggregation instead of a full sort.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.rounding import micro_round


def relative_error_columns(ds: "ray.data.Dataset", est_prefix: str = "estimated_cardinality_",
                           true_prefix: str = "true_cardinality_") -> "ray.data.Dataset":
    """Add relative_error_i = (est_i - true_i) / true_i per freq level
    (simulator.py:100-103, analysis.py:18-30)."""

    def add(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for name in batch.schema.names:
            if name.startswith(est_prefix):
                level = name[len(est_prefix):]
                tcol = true_prefix + level
                if tcol in batch.schema.names:
                    rel = pc.divide(
                        pc.subtract(pc.cast(batch.column(name), pa.float64()),
                                    pc.cast(batch.column(tcol), pa.float64())),
                        pc.cast(batch.column(tcol), pa.float64()))
                    batch = batch.append_column(f"relative_error_{level}", rel)
        return batch

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantile_disc(ds: "ray.data.Dataset", key: str, value_col: str,
                          q: float = 0.5) -> pd.DataFrame:
    """Exact per-group discrete quantile WITHOUT a global sort.

    groupby (key, value) counts — the only shuffle, over distinct pairs —
    then a DISTRIBUTED per-key cumulative scan (``groupby(key).map_groups``
    over the count table; a task's group is one key's distinct values,
    never its raw rows) with percentile_disc semantics: smallest value
    whose cumulative fraction >= q.  Right shape for values with bounded
    distinct counts (lengths, scores); a full sort would move every row.
    """
    out_col = f"p{int(q * 100)}_{value_col}"

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col)
        v = _disc_from_counts(g[value_col].to_numpy(),
                              g["count()"].to_numpy(), q)
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [v]})

    out = (ds.groupby([key, value_col]).count()
           .groupby(key).map_groups(scan, batch_format="pandas")
           .to_pandas())
    return out.sort_values(key).reset_index(drop=True)


def _disc_from_counts(vals: np.ndarray, counts: np.ndarray,
                      q: float) -> float:
    """percentile_disc over a (sorted values, counts) run-length encoding:
    smallest value whose cumulative count reaches ``q * total`` (same
    strict->= convention as ``grouped_quantile_disc``)."""
    cum = np.cumsum(counts)
    total = cum[-1]
    idx = int(np.searchsorted(cum, q * total, side="left"))
    if cum[idx] < q * total:
        idx += 1
    return vals[idx]


def grouped_weighted_quantile_disc(ds: "ray.data.Dataset", key: str,
                                   value_col: str, weight_col: str,
                                   q: float = 0.5) -> pd.DataFrame:
    """Exact per-group WEIGHTED discrete quantile: smallest value whose
    cumulative weight reaches ``q`` of the group's total weight (e.g. the
    doc length at which half of all CHARACTERS live in shorter-or-equal
    docs — the mass-weighted median of a corpus-length distribution).

    Same 100-TB shape as ``grouped_quantile_disc``: one groupby over
    DISTINCT (key, value) pairs with summed weights — never the raw rows —
    then a per-key cumulative scan via map_groups.  Exact when weights are
    integers (int64 cumsum; only the q*total comparison is float, which
    the SQL window mirror computes identically)."""
    from ray.data.aggregate import Sum

    out_col = f"wp{int(q * 100)}_{value_col}"

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col)
        v = _disc_from_counts(g[value_col].to_numpy(),
                              g["__w"].to_numpy(), q)
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [v]})

    cols = list(dict.fromkeys([key, value_col, weight_col]))
    out = (ds.select_columns(cols)
           .groupby([key, value_col])
           .aggregate(Sum(weight_col, alias_name="__w"))
           .groupby(key).map_groups(scan, batch_format="pandas")
           .to_pandas())
    return out.sort_values(key).reset_index(drop=True)


def grouped_median_mad(ds: "ray.data.Dataset", key: str,
                       value_col: str) -> pd.DataFrame:
    """Per-group median and MAD (median absolute deviation) — the robust
    center/spread pair behind outlier cuts that survive heavy tails where
    mean/std (``group_zscore``) get dragged.  Returns (key, med_<col>,
    mad_<col>); compose with a broadcast attach to flag rows at
    |x − med| > k·MAD.

    ONE groupby over distinct (key, value) pairs feeds both statistics:
    the per-key scan computes the median from the run-length counts, then
    re-sorts the SAME counts by |value − median| for the MAD — no second
    pass over the corpus, no raw rows in any group.  Exact for integer
    values (the percentile_disc convention of ``grouped_quantile_disc``,
    which the SQL oracle mirrors)."""
    med_col, mad_col = f"med_{value_col}", f"mad_{value_col}"

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col)
        v = g[value_col].to_numpy()
        c = g["count()"].to_numpy()
        med = _disc_from_counts(v, c, 0.5)
        dev = np.abs(v - med)
        order = np.argsort(dev, kind="stable")
        mad = _disc_from_counts(dev[order], c[order], 0.5)
        return pd.DataFrame({key: [g[key].iloc[0]],
                             med_col: [med], mad_col: [mad]})

    out = (ds.select_columns([key, value_col])
           .groupby([key, value_col]).count()
           .groupby(key).map_groups(scan, batch_format="pandas")
           .to_pandas())
    return out.sort_values(key).reset_index(drop=True)


def melt(ds: "ray.data.Dataset", id_vars: list[str], value_vars: list[str],
         var_name: str = "variable", value_name: str = "value") -> "ray.data.Dataset":
    """Wide -> long reshape inside map_batches (analyzer.py:296-369 shape)."""

    def melt_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(id_vars=id_vars, value_vars=value_vars,
                       var_name=var_name, value_name=value_name)

    return ds.map_batches(melt_batch, batch_format="pandas")


def lag_diff_per_group(ds: "ray.data.Dataset", key: str, order_col: str,
                       value_col: str, out_col: str = "diff") -> "ray.data.Dataset":
    """Cumulative -> per-level histogram via sorted first difference per group
    (analyzer.py:371-427)."""

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col).copy()
        g[out_col] = g[value_col].diff().fillna(g[value_col])
        return g

    return ds.groupby(key).map_groups(diff, batch_format="pandas")


def broadcast_join(big: "ray.data.Dataset", small_df: pd.DataFrame,
                   on: list[str] | str, how: str = "left") -> "ray.data.Dataset":
    """Join a big Dataset against a SMALL driver-side frame.

    The small side is ``ray.put`` once and read from the object store by
    every map task — no shuffle of the big side, no per-batch reshipping
    (analyzer.py:223-238's merge, made broadcast-shaped)."""
    small_ref = ray.put(small_df)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(small_ref), on=on, how=how)

    return big.map_batches(join, batch_format="pandas")


def union_all(datasets: Iterable["ray.data.Dataset"]) -> "ray.data.Dataset":
    """pd.concat analog (simulator.py:93-98): Dataset union."""
    datasets = list(datasets)
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def range_cutpoints(ds: "ray.data.Dataset", col: str, num_partitions: int,
                    mode: str = "exact") -> np.ndarray:
    """``num_partitions - 1`` ascending cutpoints of ``col``: cut ``i`` is
    the value at rank ``ceil(n * (i+1) / B)`` (1-based, percentile_disc
    semantics — the smallest value whose cumulative count reaches the rank).

    ``mode='exact'``: one groupby over DISTINCT values (combiner-compressed
    map-side), then a driver-side cumulative scan of the distinct-value
    count table — exact and SQL-oracle-able; right for columns with bounded
    distinct counts.  ``mode='kll'`` builds the engine's own KLL sketch in
    one pass (state KBs, never the value table) and reads its quantiles —
    approximate within KLL rank error, the 100-TB path for continuous
    columns with unbounded distinct values.
    """
    B = int(num_partitions)
    if B < 2:
        return np.empty(0, np.float64)
    return quantiles_disc(ds, col, np.arange(1, B) / B, mode=mode)


def quantiles_disc(ds: "ray.data.Dataset", col: str, qs: np.ndarray,
                   mode: str = "exact") -> np.ndarray:
    """Discrete quantiles of ``col`` at each fraction in ``qs``
    (percentile_disc semantics: smallest value whose cumulative count
    reaches rank ``ceil(n * q)``).  Three paths, same shape as
    ``range_cutpoints``: exact distinct-value groupby; a one-pass KLL
    sketch (RANK-error bound ~2.3/k); or a one-pass DDSketch
    (``mode='ddsketch'``, VALUE-error bound — every estimate within 1%
    relative error of the true order statistic; positive columns only).
    Null values are excluded from the population (SQL percentile
    semantics)."""
    qs = np.asarray(qs, np.float64)
    if mode in ("kll", "ddsketch"):
        from ..state import DDSketchSpec, KllSpec
        from .build import column_sketch_state

        spec = (KllSpec(k=200, seed=42) if mode == "kll"
                else DDSketchSpec(alpha=0.01))
        sk = column_sketch_state(ds, spec, col)
        return np.asarray([sk.quantile(q) for q in qs], np.float64)
    if mode != "exact":
        raise ValueError("mode must be 'exact', 'kll' or 'ddsketch'")
    counts = ds.groupby(col).count().to_pandas()
    counts = counts[counts[col].notna()].sort_values(col)
    vals = counts[col].to_numpy()
    cum = counts["count()"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return np.empty(0, np.float64)
    ranks = np.ceil(n * qs).astype(np.int64)
    idx = np.searchsorted(cum, ranks, side="left")
    return vals[np.minimum(idx, len(vals) - 1)].astype(np.float64)


def range_partition(ds: "ray.data.Dataset", col: str, num_partitions: int,
                    cuts: np.ndarray | None = None, mode: str = "exact",
                    bucket_col: str = "bucket") -> "ray.data.Dataset":
    """Assign each row its range-partition bucket: ``bucket = #cutpoints
    strictly below the value`` (so bucket boundaries are closed on the
    right).  This is the building block of a distributed total order — a
    per-bucket local sort after this stage IS the global sort, without any
    all-to-all beyond the one groupby inside ``range_cutpoints`` (KLL mode:
    no shuffle at all); buckets are also the resumable unit for partitioned
    parquet output (stages/checkpoint.py).
    """
    if cuts is None:
        cuts = range_cutpoints(ds, col, num_partitions, mode=mode)
    cuts_arr = np.asarray(cuts, np.float64)
    ref = ray.put(cuts_arr)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(c, v, side="left").astype(np.int64)
        return t.append_column(bucket_col, pa.array(b))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def global_rank(ds: "ray.data.Dataset", col: str, *,
                tiebreak: list[str], num_partitions: int = 32,
                mode: str = "exact", rank_col: str = "rank"
                ) -> "ray.data.Dataset":
    """Dense global ROW_NUMBER over ``(col, *tiebreak)`` WITHOUT a global
    sort: range-partition by ``col`` (``range_cutpoints``), count rows per
    bucket (a KB-scale aggregate), prefix-sum the counts into bucket OFFSETS
    on the driver, then sort each bucket locally and emit ``offset + local
    position``.  The only all-to-all is the bucket cogroup; comparisons
    never cross buckets.  This composed with a per-bucket write IS the
    distributed total-order sort.

    ``tiebreak`` must make rows unique so ranks are deterministic (the
    ROW_NUMBER oracle contract).  1-based ranks.

    Ranks are EXACT under either cutpoint ``mode`` — cutpoints only balance
    bucket sizes; the offsets come from the actual bucket counts — so
    ``mode='kll'`` (no distinct-value shuffle) is the default-quality scale
    path here, unlike ``quantiles_disc`` where the mode changes the answer.
    """
    bucketed = range_partition(ds, col, num_partitions, mode=mode)
    counts = (bucketed.groupby("bucket").count().to_pandas()
              .sort_values("bucket"))
    # driver state: <= num_partitions offsets
    offs = {}
    acc = 0
    for b, c in zip(counts["bucket"], counts["count()"]):
        offs[int(b)] = acc
        acc += int(c)
    off_ref = ray.put(offs)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(off_ref)
        g = g.sort_values([col] + tiebreak, kind="stable").reset_index(drop=True)
        g[rank_col] = offsets[int(g["bucket"].iloc[0])] + np.arange(
            1, len(g) + 1, dtype=np.int64)
        return g.drop(columns=["bucket"])

    return bucketed.groupby("bucket").map_groups(rank_bucket,
                                                 batch_format="pandas")


def ntile(ds: "ray.data.Dataset", col: str, *, buckets: int,
          tiebreak: list[str], num_partitions: int = 32,
          mode: str = "exact", out_col: str = "tile") -> "ray.data.Dataset":
    """SQL ``NTILE(b) OVER (ORDER BY col, *tiebreak)`` without a global
    sort: the same range-partition → bucket-count → driver prefix-sum
    machinery as ``global_rank`` (comparisons never cross range buckets;
    the only all-to-all is the bucket cogroup), then the exact NTILE
    closed form per row.  SQL's contract — the first ``total mod b`` tiles
    get one extra row — is NOT ``floor(i*b/total)+1`` (brute-force
    counterexample: total=2, b=4); it is the piecewise form below, verified
    exhaustively for total<400, b<30.  ``tiebreak`` must make rows unique
    so tile assignment is deterministic.  1-based tiles.
    """
    bucketed = range_partition(ds, col, num_partitions, mode=mode)
    counts = (bucketed.groupby("bucket").count().to_pandas()
              .sort_values("bucket"))
    offs = {}
    acc = 0
    for b, c in zip(counts["bucket"], counts["count()"]):
        offs[int(b)] = acc
        acc += int(c)
    q, r = divmod(acc, buckets)
    cut = r * (q + 1)
    off_ref = ray.put(offs)

    def tile_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(off_ref)
        g = g.sort_values([col] + tiebreak, kind="stable").reset_index(drop=True)
        i = offsets[int(g["bucket"].iloc[0])] + np.arange(len(g),
                                                          dtype=np.int64)
        if q == 0:
            tile = i + 1  # fewer rows than tiles: one row per leading tile
        else:
            tile = np.where(i < cut, i // (q + 1), r + (i - cut) // q) + 1
        g[out_col] = tile.astype(np.int64)
        return g.drop(columns=["bucket"])

    return bucketed.groupby("bucket").map_groups(tile_bucket,
                                                 batch_format="pandas")


def write_sorted_partitioned(ds: "ray.data.Dataset", col: str, out_dir: str,
                             *, tiebreak: list[str] | None = None,
                             num_partitions: int = 32, mode: str = "exact"
                             ) -> pd.DataFrame:
    """Resumable distributed SORTED parquet output: range-partition by
    ``col``, then each bucket task sorts ITS rows locally and publishes

        out_dir/bucket=<i>/part.parquet   (+ _DONE marker)

    atomically (tmp + rename).  Reading ``bucket=00000..N`` in order yields
    the global total order — the classic external-sort layout, one
    directory per key range, never one giant file.  A rerun skips the WRITE
    of every bucket whose ``_DONE`` marker exists (the shuffle still runs;
    the save is the write + the idempotence — safe to re-run after a
    partial failure).  Returns a per-bucket manifest
    (bucket, n_rows, skipped).
    """
    tb = tiebreak or []
    bucketed = range_partition(ds, col, num_partitions, mode=mode)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import os

        import pyarrow.parquet as _pq

        b = int(g["bucket"].iloc[0])
        path = os.path.join(out_dir, f"bucket={b:05d}")
        done = os.path.join(path, "_DONE")
        if os.path.exists(done):
            return pd.DataFrame({"bucket": [b], "n_rows": [len(g)],
                                 "skipped": [True]})
        g = g.sort_values([col] + tb, kind="stable").drop(columns=["bucket"])
        os.makedirs(path, exist_ok=True)
        # pid-unique tmp so a retried/duplicate task can't interleave with a
        # straggler's half-write (same hazard checkpoint.py:167 guards)
        tmp = os.path.join(path, f".part.parquet.{os.getpid()}.tmp")
        _pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(path, "part.parquet"))
        with open(done, "w"):
            pass
        return pd.DataFrame({"bucket": [b], "n_rows": [len(g)],
                             "skipped": [False]})

    return (bucketed.groupby("bucket")
            .map_groups(write_bucket, batch_format="pandas").to_pandas())



def _key_codes(t: "pa.Table", key: str):
    """Shared key-encoding of the grouped primitives: combine chunks,
    dictionary-encode, return (distinct-key Arrow array, int64 codes)."""
    kcol = t.column(key)
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    enc = kcol.dictionary_encode()
    return enc.dictionary, np.asarray(enc.indices, dtype=np.int64)


def group_zscore(ds: "ray.data.Dataset", key: str, value_col: str, *,
                 id_col: str, out_col: str = "z",
                 max_keys: int = 100_000) -> "ray.data.Dataset":
    """Per-group standardization (the feature-normalization pass): z =
    (v - mean_g) / std_g, population std.

    Two passes, broadcast-stats shape: one groupby over EXACT integer
    (sum, sum-of-squares, count) partials — ``value_col`` must be integer
    (quantize floats upstream) so the moments are order-independent ints —
    then the KB-scale stats table is ``ray.put`` once and every task
    normalizes its batch locally.  The float expression tree (mean = s/n,
    var = (ss - s*s/n)/n) is fixed, so results are bit-reproducible and
    SQL-hashable.  Groups with zero variance emit z = 0.

    Dimension contract: the KEY set must be bounded (event types,
    sources) — the stats table is one row per distinct key and is
    collected to the driver and broadcast.  ``max_keys`` guards the
    contract LOUDLY (checked on the distributed groupby result BEFORE
    collecting): for an unbounded key (user ids), shard the key upstream
    or normalize via a cogroup attach instead.
    """
    from ray.data.aggregate import Count, Sum

    def with_sq(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key: t.column(key), value_col: pa.array(v),
                         "__sq": pa.array(v * v)})

    stats_ds = (ds.select_columns([key, value_col])
                .map_batches(with_sq, batch_format="pyarrow")
                .groupby(key)
                .aggregate(Sum(value_col, alias_name="__s"),
                           Sum("__sq", alias_name="__ss"),
                           Count(alias_name="__n"))
                .materialize())
    n_keys = stats_ds.count()
    if n_keys > max_keys:
        raise ValueError(
            f"group_zscore stats table would hold {n_keys} distinct "
            f"{key!r} keys > max_keys={max_keys}; the bounded-key "
            "broadcast contract is violated — bucket the key upstream or "
            "raise the guard knowingly")
    stats = stats_ds.to_pandas()
    lut = {k: (float(s), float(ss), float(n)) for k, s, ss, n in zip(
        stats[key], stats["__s"], stats["__ss"], stats["__n"])}
    ref = ray.put(lut)

    def normalize(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        dictionary, codes = _key_codes(t, key)
        vocab = dictionary.to_pylist()  # distinct keys only, tiny
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.array([m[k][0] for k in vocab])[codes]
        ss = np.array([m[k][1] for k in vocab])[codes]
        n = np.array([m[k][2] for k in vocab])[codes]
        mean = s / n
        var = (ss - s * s / n) / n
        std = np.sqrt(var)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(std > 0, (v - mean) / std, 0.0)
        return pa.table({id_col: t.column(id_col), key: t.column(key),
                         out_col: pa.array(np.round(z, 6))})

    return ds.select_columns([id_col, key, value_col]).map_batches(
        normalize, batch_format="pyarrow", zero_copy_batch=True)


#: batch-size cap for the exact-int64 moment partials below: a per-batch
#: float64 bincount sum is <= batch_size * max|term|, and 65536 * 1.37e11
#: < 2^53, so terms bounded by ~1.37e11 (|x̂| <= 1e5 for squares/products,
#: |x̂| <= 500 for 4th powers) stay integer-exact within every batch; the
#: cross-batch fold is int64 (bound: group total < 2^63, document per use).
_EXACT_BATCH = 65536


# Half-away-from-zero rounding to 1e-6 (SQL ROUND tie semantics), shared
# engine-wide; kept under this module's historical name for its many call
# sites.  Mirror ``round(x, 6)`` literally in the oracle SQL expressions.
_micro_round = micro_round


def _grouped_int_moments(ds: "ray.data.Dataset", key: str, cols: list[str],
                         quantize: float, terms: dict) -> pd.DataFrame:
    """Shared exact-moment plan of grouped_corr / grouped_ols /
    grouped_moments: quantize ``cols`` to int64 (floor(v/quantize + 0.5)),
    dictionary-encode the key, emit per-batch (n, Σterm...) int64 partials
    — at most #distinct-keys rows leave a batch — and fold them in one
    KB-scale groupby.  ``terms`` maps output name -> fn(*quantized_cols)
    returning the per-row int64 term; per-batch accumulation is float64
    ``bincount`` kept integer-exact by the ``_EXACT_BATCH`` cap."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        qs = []
        for c in cols:
            x = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            qs.append(np.floor(x / quantize + 0.5).astype(np.int64))
        dictionary, codes = _key_codes(t, key)
        k = len(dictionary)
        out = {key: dictionary,
               "__n": pa.array(np.bincount(codes, minlength=k)
                               .astype(np.int64))}
        for name, fn in terms.items():
            w = fn(*qs).astype(np.float64)
            out["__" + name] = pa.array(
                np.bincount(codes, weights=w, minlength=k).astype(np.int64))
        return pa.table(out)

    aggs = [Sum("__n", alias_name="n")] + [
        Sum("__" + name, alias_name=name) for name in terms]
    return (ds.select_columns([key] + cols)
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=_EXACT_BATCH)
            .groupby(key).aggregate(*aggs).to_pandas())


def grouped_corr(ds: "ray.data.Dataset", key: str, x_col: str, y_col: str, *,
                 quantize: float = 1.0) -> pd.DataFrame:
    """Per-group Pearson correlation + population covariance, streaming.

    One pass: each batch pre-aggregates (n, Σx, Σy, Σx², Σy², Σxy) per key —
    at most #distinct-keys rows leave a batch regardless of batch size — and
    one KB-scale groupby folds the partials.  Moments are EXACT int64 (both
    columns are quantized to ``round(v / quantize)`` ints first), so the
    fold is order-independent and the final float expression tree
    (corr = (nΣxy − ΣxΣy) / √((nΣx²−Σx²)(nΣy²−Σy²))) is fixed →
    bit-reproducible and SQL-hashable against an oracle computing the same
    formula from the same integer sums.

    Scale: the shuffle carries only the tiny partial-moment rows; the corpus
    itself never moves.  int64 bound: Σ(x̂²) must stay < 2^63 — pick
    ``quantize`` so |v/quantize| ≲ 10^5 at ~10^8 rows (document per use).
    Zero-variance groups return NaN (same as SQL ``corr``).
    """
    m = _grouped_int_moments(
        ds, key, [x_col, y_col], quantize,
        {"sx": lambda x, y: x, "sy": lambda x, y: y,
         "sxx": lambda x, y: x * x, "syy": lambda x, y: y * y,
         "sxy": lambda x, y: x * y})
    n = m["n"].astype("float64")
    sx, sy = m["sx"].astype("float64"), m["sy"].astype("float64")
    sxx, syy = m["sxx"].astype("float64"), m["syy"].astype("float64")
    sxy = m["sxy"].astype("float64")
    cov_num = n * sxy - sx * sy
    den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = cov_num / den
    # covar_pop is exactly rational (integer sums / n^2) -> half-away
    # micro-rounding; corr carries an irrational sqrt, np.round is safe.
    out = pd.DataFrame({key: m[key], "n": m["n"].astype("int64"),
                        "corr": np.round(corr, 6),
                        "covar_pop": _micro_round(cov_num / (n * n))})
    return out.sort_values(key).reset_index(drop=True)


def value_histogram(ds: "ray.data.Dataset", col: str, *, lo: float,
                    hi: float, bins: int) -> pd.DataFrame:
    """Fixed-bin histogram: bin = clip(floor((v - lo) / width), 0, bins-1)
    (under/overflow clamp into the edge bins).  Per-batch ``bincount``
    partials, one KB-scale groupby sum — the shuffle carries at most
    ``bins`` rows per batch regardless of corpus size.  Returns
    (bin, n_rows) for non-empty bins.
    """
    from ray.data.aggregate import Sum

    width = (hi - lo) / bins

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((v - lo) / width), 0, bins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n_rows": pa.array(counts[nz])})

    out = (ds.select_columns([col])
           .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("bin").aggregate(Sum("n_rows", alias_name="n_rows"))
           .to_pandas())
    return out.astype({"bin": "int64", "n_rows": "int64"}).sort_values(
        "bin").reset_index(drop=True)


def pivot_sum(ds: "ray.data.Dataset", *, index: str, columns: str,
              value: str, col_values: list | None = None
              ) -> "ray.data.Dataset":
    """Long -> wide pivot with a SUM cell aggregate (``melt``'s inverse):
    one output row per ``index`` value, one int64 column per distinct
    ``columns`` value, missing cells 0.

    ``col_values`` (the output column set) is collected once if not given —
    bounded by contract (a pivot with unbounded columns is a malformed
    report).  The wide step runs on the ALREADY-AGGREGATED long table
    (distinct (index, columns) pairs — the only corpus-wide shuffle), so
    each ``map_groups`` group is at most ``len(col_values)`` rows.
    """
    import pandas as pd

    if col_values is None:
        col_values = sorted(ds.select_columns([columns]).unique(columns))
    col_values = [str(c) for c in col_values]

    long = ds.groupby([index, columns]).sum(value)
    sum_col = f"sum({value})"

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        cells = dict(zip(g[columns].astype(str), g[sum_col]))
        row = {index: g[index].iloc[0]}
        for c in col_values:
            row[c] = cells.get(c, 0)  # native sum dtype (int or float)
        return pd.DataFrame([row])

    return long.groupby(index).map_groups(widen, batch_format="pandas")


def rollup_counts(ds: "ray.data.Dataset", keys: list[str], *,
                  total_label: str = "ALL", count_name: str = "n"
                  ) -> "ray.data.Dataset":
    """SQL ``GROUP BY ROLLUP(k1, .., kn)`` counts: the finest level plus
    every prefix subtotal and the grand total, with rolled-up key columns
    holding ``total_label`` (string keys required — a sentinel, not NULL,
    so results hash identically to a ``coalesce``'d SQL oracle).

    Scale shape: ONE corpus-wide groupby builds the finest count table;
    every coarser level re-aggregates those partial counts (distinct-key
    metadata, not rows), so n levels cost one data pass + (n-1) KB-scale
    shuffles.
    """
    # the finest count table is distinct-key metadata — materialize it so
    # the coarser levels and the grand total re-read it instead of
    # re-executing the corpus groupby per level
    finest = ds.groupby(keys).count().materialize()

    def norm_finest(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {k: t.column(k) for k in keys}
        cols[count_name] = pc.cast(t.column("count()"), pa.int64())
        return pa.table(cols)

    levels = [finest.map_batches(norm_finest, batch_format="pyarrow",
                                 zero_copy_batch=True)]
    for i in range(len(keys) - 1, 0, -1):
        kept = keys[:i]
        sub = finest.groupby(kept).sum("count()")

        def norm_sub(t: pa.Table, kept=kept) -> pa.Table:
            import pyarrow.compute as pc

            n_rows = t.num_rows
            cols = {k: t.column(k) for k in kept}
            for k in keys[len(kept):]:
                cols[k] = pa.array([total_label] * n_rows, pa.string())
            cols[count_name] = pc.cast(t.column("sum(count())"), pa.int64())
            return pa.table(cols)

        levels.append(sub.map_batches(norm_sub, batch_format="pyarrow",
                                      zero_copy_batch=True))
    total = int(finest.sum("count()"))
    levels.append(ray.data.from_arrow(pa.table(
        {**{k: pa.array([total_label], pa.string()) for k in keys},
         count_name: pa.array([total], pa.int64())})))
    return union_all(levels)


def cube_counts(ds: "ray.data.Dataset", keys: list[str], *,
                total_label: str = "ALL", count_name: str = "n"
                ) -> "ray.data.Dataset":
    """SQL ``GROUP BY CUBE(k1, .., kn)`` counts: every one of the 2ⁿ key
    subsets, rolled-up columns holding ``total_label`` (string keys, same
    sentinel contract as ``rollup_counts``).

    Scale shape mirrors ``rollup_counts``: ONE corpus-wide groupby builds
    the finest table, every other subset re-aggregates that distinct-key
    metadata — 2ⁿ−1 KB-scale shuffles, one data pass.  n is bounded by
    contract (a cube over many columns is 2ⁿ output families).
    """
    from itertools import combinations

    finest = ds.groupby(keys).count().materialize()
    levels = []
    for r in range(len(keys), -1, -1):
        for kept in combinations(keys, r):
            kept = list(kept)
            if r == len(keys):
                sub, src_col = finest, "count()"
            elif r == 0:
                total = int(finest.sum("count()"))
                levels.append(ray.data.from_arrow(pa.table(
                    {**{k: pa.array([total_label], pa.string())
                        for k in keys},
                     count_name: pa.array([total], pa.int64())})))
                continue
            else:
                sub, src_col = (finest.groupby(kept).sum("count()"),
                                "sum(count())")

            def norm(t: pa.Table, kept=kept, src_col=src_col) -> pa.Table:
                import pyarrow.compute as pc

                cols = {}
                for k in keys:  # preserve original column order
                    if k in kept:
                        cols[k] = t.column(k)
                    else:
                        cols[k] = pa.array([total_label] * t.num_rows,
                                           pa.string())
                cols[count_name] = pc.cast(t.column(src_col), pa.int64())
                return pa.table(cols)

            levels.append(sub.map_batches(norm, batch_format="pyarrow",
                                          zero_copy_batch=True))
    return union_all(levels)


def set_op(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
           on: list[str], op: str = "intersect") -> "ray.data.Dataset":
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct set semantics) over the
    ``on`` columns: distinct left rows that do (``intersect``) or do not
    (``except``) appear in right.

    One shuffle over DISTINCT tagged rows, fully vectorized: both sides are
    projected to ``on`` + a side tag, unioned, then a single
    ``groupby(on).aggregate(Min/Max(tag))`` decides membership per distinct
    row — no per-group Python, no driver state.  (``union`` here is Ray's
    lazy concatenation — blocks are chained, not copied.)
    """
    if op not in ("intersect", "except"):
        raise ValueError("op must be 'intersect' or 'except'")
    from ray.data.aggregate import Max, Min

    def tag(value: int):
        def add(t: pa.Table) -> pa.Table:
            sel = t.select(on)
            return sel.append_column(
                "__side", pa.array(np.full(t.num_rows, value, np.int64)))
        return add

    tagged = (left.map_batches(tag(0), batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(right.map_batches(tag(1), batch_format="pyarrow",
                                       zero_copy_batch=True)))
    agg = tagged.groupby(on).aggregate(Min("__side"), Max("__side"))

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lo = t.column("min(__side)")
        hi = t.column("max(__side)")
        present_left = pc.equal(lo, 0)
        in_right = pc.equal(hi, 1)
        mask = (pc.and_(present_left, in_right) if op == "intersect"
                else pc.and_(present_left, pc.invert(in_right)))
        return t.filter(mask).select(on)

    return agg.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def quantiles_cont(ds: "ray.data.Dataset", col: str, qs: np.ndarray,
                   mode: str = "exact") -> np.ndarray:
    """Interpolated quantiles (SQL ``percentile_cont``): linear
    interpolation between the order statistics at rank ``1 + q*(n-1)``.

    ``mode='exact'`` reuses the distinct-value count scan (one groupby over
    distinct values; the order statistics fall out of the cumulative count
    without materializing rows).  ``mode='kll'`` returns the KLL sketch's
    quantile (already interpolation-free within rank error) — the 100-TB
    path.  Nulls excluded, as in SQL.
    """
    qs = np.asarray(qs, np.float64)
    if mode == "kll":
        return quantiles_disc(ds, col, qs, mode="kll")
    if mode != "exact":
        raise ValueError("mode must be 'exact' or 'kll'")
    counts = ds.groupby(col).count().to_pandas()
    counts = counts[counts[col].notna()].sort_values(col)
    vals = counts[col].to_numpy(dtype=np.float64)
    cum = counts["count()"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return np.full(len(qs), np.nan)
    # fractional rank h in [1, n]; value = v[h0] + (h - h0) * (v[h1] - v[h0])
    h = 1.0 + qs * (n - 1)
    h0 = np.floor(h).astype(np.int64)
    h1 = np.minimum(h0 + 1, n)
    v_lo = vals[np.searchsorted(cum, h0, side="left")]
    v_hi = vals[np.searchsorted(cum, h1, side="left")]
    return v_lo + (h - h0) * (v_hi - v_lo)


def grouped_lead_lag(ds: "ray.data.Dataset", *, key: str, order_col: str,
                     value_col: str, offset: int = 1,
                     tiebreak: list[str] | None = None
                     ) -> "ray.data.Dataset":
    """SQL ``LAG(value, offset) OVER (PARTITION BY key ORDER BY order_col
    [, tiebreak...])`` (negative ``offset`` = LEAD): one shuffle by
    ``key``, per-group sort + shift — the generic peer of the fixed
    ``lag_diff_per_group``.

    Output: input columns + ``lag_<value_col>`` (None at window edges).
    Single-key-fits-a-task assumption as for the other cogroup consumers
    (sessions/asof) — pre-bucket hot keys upstream if violated.
    """
    sort_cols = [order_col] + (tiebreak or [])

    def shift(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols).copy()
        g[f"lag_{value_col}"] = g[value_col].shift(offset)
        return g

    return ds.groupby(key).map_groups(shift, batch_format="pandas")


def grouped_moments(ds: "ray.data.Dataset", key: str, value_col: str, *,
                    quantize: float = 1.0) -> pd.DataFrame:
    """Per-group population skewness and excess kurtosis, streaming — the
    3rd/4th-moment extension of ``grouped_corr``'s plan: each batch
    pre-aggregates (n, Σx, Σx², Σx³, Σx⁴) per key over quantized ints, one
    KB-scale groupby folds the partials, and the driver evaluates a FIXED
    float64 expression tree from the exact integer sums (mirrored verbatim
    in the oracle SQL, so results hash-compare bit-for-bit).

    central moments: m_k = Σxᵏ/n − binomial expansion in mean;
    skew_pop = m₃ / (m₂·√m₂);  kurt_excess = m₄ / m₂² − 3.

    int64 bound: Σ(x̂⁴) < 2^63 — pick ``quantize`` so |v/quantize|⁴ ×
    group_rows ≲ 9e18 (|x̂| ≤ 500 is safe to ~10^8 rows/group; the
    ``_EXACT_BATCH`` cap keeps the per-batch float64 partials exact at
    that bound).  Zero-variance groups divide by m₂ = 0 → engine NaN; SQL
    division by zero yields NULL, so keep such groups out of
    oracle-compared inputs.
    """
    m = _grouped_int_moments(
        ds, key, [value_col], quantize,
        {"s1": lambda x: x, "s2": lambda x: x * x,
         "s3": lambda x: x * x * x, "s4": lambda x: (x * x) * (x * x)})
    n = m["n"].astype("float64")
    s1, s2 = m["s1"].astype("float64"), m["s2"].astype("float64")
    s3, s4 = m["s3"].astype("float64"), m["s4"].astype("float64")
    # expression tree mirrored in the oracle SQL — keep the op order fixed
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
    m4 = (s4 / n - 4.0 * mean * (s3 / n)
          + 6.0 * (mean * mean) * (s2 / n)
          - 3.0 * mean * mean * mean * mean)
    with np.errstate(invalid="ignore", divide="ignore"):
        skew = m3 / (m2 * np.sqrt(m2))
        kurt = m4 / (m2 * m2) - 3.0
    # kurtosis (and degenerate skews) are exactly rational — half-away
    # micro-rounding, mirrored in the oracle
    out = pd.DataFrame({key: m[key], "n": m["n"].astype("int64"),
                        "skew_pop": _micro_round(skew),
                        "kurt_excess": _micro_round(kurt)})
    return out.sort_values(key).reset_index(drop=True)


def group_concat(ds: "ray.data.Dataset", key: str, value_col: str, *,
                 sep: str = ",", out_col: str = "concat"
                 ) -> "ray.data.Dataset":
    """SQL ``STRING_AGG(value, sep ORDER BY value)`` per group: one shuffle
    on the key, per-group codepoint sort + join (Python str order ==
    DuckDB's default binary collation, so the oracle hashes identically).

    Scale contract: the OUTPUT row carries the whole group, so this is a
    dimension-table op (labels per region, tags per doc) — group size is
    the row size and a hot key cannot be split by construction.  Corpus-
    scale concatenation belongs in a sink, not a column.
    """

    def cat(g: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(g[value_col].astype(str).tolist())
        return pd.DataFrame({key: [g[key].iloc[0]],
                             out_col: [sep.join(vals)]})

    return (ds.select_columns([key, value_col])
            .groupby(key).map_groups(cat, batch_format="pandas"))


def grouped_ols(ds: "ray.data.Dataset", key: str, x_col: str, y_col: str, *,
                quantize: float = 1.0) -> pd.DataFrame:
    """Per-group simple linear regression (SQL ``regr_slope`` /
    ``regr_intercept``), streaming — same plan as ``grouped_corr``: exact
    int64 moment partials (n, Σx, Σy, Σx², Σxy) per batch, KB groupby
    fold, fixed float64 expression tree mirrored in the oracle SQL.

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²);  intercept = ȳ − slope·x̄.
    Zero-x-variance groups return NaN.  Outputs are rational → half-away
    micro-rounding on both sides (see ``grouped_corr.covar_pop``).
    """
    m = _grouped_int_moments(
        ds, key, [x_col, y_col], quantize,
        {"sx": lambda x, y: x, "sy": lambda x, y: y,
         "sxx": lambda x, y: x * x, "sxy": lambda x, y: x * y})
    n = m["n"].astype("float64")
    sx, sy = m["sx"].astype("float64"), m["sy"].astype("float64")
    sxx, sxy = m["sxx"].astype("float64"), m["sxy"].astype("float64")
    with np.errstate(invalid="ignore", divide="ignore"):
        # expression tree mirrored in the oracle SQL — keep op order fixed
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = sy / n - slope * (sx / n)
    out = pd.DataFrame({key: m[key], "n": m["n"].astype("int64"),
                        "slope": _micro_round(slope),
                        "intercept": _micro_round(intercept)})
    return out.sort_values(key).reset_index(drop=True)


def grouped_count_distinct(ds: "ray.data.Dataset", key: str, val_col: str,
                           *, out_col: str = "n_distinct") -> pd.DataFrame:
    """EXACT ``COUNT(DISTINCT val)`` per key at any cardinality — the
    two-level relational plan (vs the sketch path in
    ``stages/build.py:sketch_aggregation``, which is approximate past
    sparse saturation): ``groupby(key, val)`` collapses duplicates with
    map-side combining (the only shuffle, over DISTINCT pairs), then a
    per-batch key bincount + one KB-scale ``groupby(key)`` sum counts the
    surviving pairs.  No per-key value set ever materializes in one task,
    so a key with 10^9 distinct values costs its pair rows, not a set.
    NULL values are excluded, matching SQL ``COUNT(DISTINCT ...)``.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def drop_null_vals(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(val_col)))

    pairs = (ds.select_columns([key, val_col])
             .map_batches(drop_null_vals, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([key, val_col]).count())

    def per_key(t: pa.Table) -> pa.Table:
        dictionary, codes = _key_codes(t, key)
        return pa.table({
            key: dictionary,
            "__c": pa.array(np.bincount(
                codes, minlength=len(dictionary)).astype(np.int64)),
        })

    out = (pairs.map_batches(per_key, batch_format="pyarrow")
           .groupby(key).aggregate(Sum("__c", alias_name=out_col))
           .to_pandas())
    out[out_col] = out[out_col].astype("int64")
    return out.sort_values(key).reset_index(drop=True)


def latest_per_key(ds: "ray.data.Dataset", *, key: str, order_col: str,
                   tiebreak: list[str] | None = None) -> "ray.data.Dataset":
    """Keep the NEWEST full row per key — SQL ``ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY order DESC, tiebreak DESC) = 1``, the
    upsert/compaction primitive (dedup a change-log to current state).

    Two-level argmax: each batch first reduces to its per-key winner (at
    most #in-batch-keys rows leave a batch — the map-side combine), then
    one groupby over the surviving candidates re-runs the same reduction.
    A key's task-side group is ≤ #blocks candidate rows, never its full
    history.  ``(order_col, *tiebreak)`` must totally order each key's
    rows for a deterministic, oracle-hashable winner.
    """
    sort_cols = [order_col] + list(tiebreak or [])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(sort_cols, ascending=False, kind="stable")
                .drop_duplicates(subset=[key], keep="first"))

    candidates = ds.map_batches(best, batch_format="pandas")
    return candidates.groupby(key).map_groups(best, batch_format="pandas")


def grouped_value_histogram(ds: "ray.data.Dataset", key: str, col: str, *,
                            lo: float, hi: float, bins: int) -> pd.DataFrame:
    """Per-key fixed-bin histogram — ``value_histogram`` with a group
    dimension: each batch emits at most (#in-batch-keys × bins) nonzero
    partial rows (2-D bincount over key-code × bin), one KB-scale groupby
    folds them.  The per-source length/score distribution diagnostic of a
    curation pipeline.  Returns (key, bin, n_rows) for non-empty cells;
    rows with a null key, or a null/NaN/inf value, are excluded.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo for a nonzero bin width, got "
                         f"lo={lo} hi={hi}")
    width = (hi - lo) / bins

    def partial(t: pa.Table) -> pa.Table:
        # nulls AND non-finite values excluded (documented contract): a
        # null key poisons the codes, and NaN/inf are pa-valid but
        # np.floor(NaN).astype(int64) is undefined — it would scatter the
        # row to an arbitrary bin
        t = t.filter(pc.and_(pc.is_valid(t.column(key)),
                             pc.is_valid(t.column(col))))
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        if not fin.all():
            t = t.filter(pa.array(fin))
            v = v[fin]
        b = np.clip(np.floor((v - lo) / width), 0, bins - 1).astype(np.int64)
        dictionary, codes = _key_codes(t, key)
        k = len(dictionary)
        counts = np.bincount(codes * bins + b, minlength=k * bins)
        nz = np.flatnonzero(counts)
        keys = dictionary.take(pa.array(nz // bins))
        return pa.table({key: keys,
                         "bin": pa.array((nz % bins).astype(np.int64)),
                         "n_rows": pa.array(counts[nz].astype(np.int64))})

    out = (ds.select_columns([key, col])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby([key, "bin"]).aggregate(Sum("n_rows",
                                                alias_name="n_rows"))
           .to_pandas())
    out["bin"] = out["bin"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values([key, "bin"]).reset_index(drop=True)


def profile_numeric_columns(ds: "ray.data.Dataset", cols: list[str]
                            ) -> pd.DataFrame:
    """Data-quality profile of numeric columns in ONE streaming pass: per
    column (n_rows, n_null, min_val, max_val).  Each batch emits one tiny
    partial row per column (no shuffle of the data, only the per-batch
    stats), one KB-scale groupby folds them.  min/max are actual data
    values (no arithmetic), so the result hash-matches SQL exactly even
    for doubles.  All-null columns yield null min/max (SQL semantics).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        names, n, nn, mn, mx = [], [], [], [], []
        for c in cols:
            col = t.column(c)
            names.append(c)
            n.append(t.num_rows)
            nn.append(col.null_count)
            mm = pc.min_max(col)
            mn.append(mm["min"].as_py())
            mx.append(mm["max"].as_py())
        return pa.table({"column": pa.array(names),
                         "__n": pa.array(n, pa.int64()),
                         "__nn": pa.array(nn, pa.int64()),
                         "__mn": pa.array(mn, pa.float64()),
                         "__mx": pa.array(mx, pa.float64())})

    out = (ds.select_columns(cols)
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("column")
           .aggregate(Sum("__n", alias_name="n_rows"),
                      Sum("__nn", alias_name="n_null"),
                      Min("__mn", alias_name="min_val"),
                      Max("__mx", alias_name="max_val"))
           .to_pandas())
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return out.sort_values("column").reset_index(drop=True)


def contingency_expected(ds: "ray.data.Dataset", a_col: str, b_col: str
                         ) -> pd.DataFrame:
    """Contingency table with independence diagnostics: per (a, b) cell the
    observed count, the expected count under independence
    (row_total × col_total / n) and the chi-square contribution
    ((o − e)² / e) — the building blocks of a chi² independence test,
    returned PER CELL so no cross-cell float summation order can perturb
    the oracle hash (sum the contributions downstream for the statistic).

    Distributed shape: ONE combiner-compressed groupby over distinct
    (a, b) pairs; marginals and the per-cell expression are driver-side
    over the ≤ |A|·|B| cell table.  The grid is COMPLETED with
    zero-observed cells (their contribution is e, and omitting them would
    understate the chi² sum on sparse tables).  Rows with a null key are
    excluded.  Rational outputs → half-away micro-rounding mirrored in
    the SQL oracle.
    """
    import pyarrow.compute as pc

    def drop_null_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t.column(a_col)),
                                pc.is_valid(t.column(b_col))))

    cells = (ds.select_columns([a_col, b_col])
             .map_batches(drop_null_keys, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([a_col, b_col]).count().to_pandas()
             .rename(columns={"count()": "n_obs"}))
    cells["n_obs"] = cells["n_obs"].astype("int64")
    # complete the grid: every (a, b) combination, unobserved cells at 0
    grid = pd.MultiIndex.from_product(
        [sorted(cells[a_col].unique()), sorted(cells[b_col].unique())],
        names=[a_col, b_col]).to_frame(index=False)
    cells = grid.merge(cells, on=[a_col, b_col], how="left")
    cells["n_obs"] = cells["n_obs"].fillna(0).astype("int64")
    n = float(cells["n_obs"].sum())
    rt = cells.groupby(a_col)["n_obs"].transform("sum").astype("float64")
    ct = cells.groupby(b_col)["n_obs"].transform("sum").astype("float64")
    o = cells["n_obs"].astype("float64")
    # expression tree mirrored in the oracle SQL — keep op order fixed
    e = rt * ct / n
    contrib = (o - e) * (o - e) / e
    out = pd.DataFrame({a_col: cells[a_col], b_col: cells[b_col],
                        "n_obs": cells["n_obs"],
                        "e_micro": _micro_round(e),
                        "chi2_micro": _micro_round(contrib)})
    return out.sort_values([a_col, b_col]).reset_index(drop=True)


def unnest_list(ds: "ray.data.Dataset", *, list_col: str, id_col: str,
                out_col: str = "value", pos_col: str = "pos"
                ) -> "ray.data.Dataset":
    """SQL UNNEST / explode: one output row per list element with its
    0-based position — embarrassingly parallel (pure Arrow offsets
    arithmetic per batch, the id column repeated by list lengths; no
    Python per row, no shuffle).  Null lists yield no rows (SQL unnest
    semantics); output order within a batch follows input order.
    """

    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # null list slots must contribute zero rows AND zero offsets drift
        valid = pc.is_valid(col)
        t = t.filter(valid)
        col = col.filter(valid)
        offsets = np.asarray(col.offsets, dtype=np.int64)
        starts = offsets[:-1] - offsets[0]  # length n, degrades to empty
        lengths = np.diff(offsets)
        values = col.flatten()
        ids = t.column(id_col).take(pa.array(
            np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)))
        pos = (np.arange(int(lengths.sum()), dtype=np.int64)
               - np.repeat(starts, lengths))
        return pa.table({id_col: ids, pos_col: pa.array(pos),
                         out_col: values})

    return ds.select_columns([id_col, list_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)


def top_k_rows_per_group(ds: "ray.data.Dataset", *, key: str,
                         order_col: str, k: int,
                         tiebreak: list[str] | None = None,
                         ascending: bool = False) -> "ray.data.Dataset":
    """Per-group leaderboard: the k FULL rows with the largest (default)
    or smallest ``order_col`` per key — SQL ``ROW_NUMBER() OVER (PARTITION
    BY key ORDER BY ...) <= k``, generalizing ``latest_per_key`` (k = 1).

    Two-level plan: each batch keeps at most k candidate rows per in-batch
    key (map-side combine), then one groupby re-runs the same selection
    over ≤ #blocks·k candidates per key — never a key's full history in
    one task.  ``(order_col, *tiebreak)`` must totally order each key's
    rows for a deterministic, oracle-hashable result.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sort_cols = [order_col] + list(tiebreak or [])
    asc = [ascending] * len(sort_cols)

    def best(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a null key is its own partition (SQL PARTITION BY
        # semantics, and what latest_per_key's drop_duplicates does at k=1)
        return (df.sort_values(sort_cols, ascending=asc, kind="stable")
                .groupby(key, sort=False, dropna=False).head(k))

    candidates = ds.map_batches(best, batch_format="pandas")
    return candidates.groupby(key).map_groups(best, batch_format="pandas")


def corr_matrix(ds: "ray.data.Dataset", cols: list[str], *,
                quantize: list[float] | None = None) -> pd.DataFrame:
    """All pairwise Pearson correlations between ``cols`` in ONE streaming
    pass: a single partial computes every Σx_i and Σx_i·x_j per batch
    (len(cols) + C(n+1,2) int64 sums through the shared
    ``_grouped_int_moments`` plan under a constant group), and the driver
    evaluates the ``grouped_corr`` expression tree per pair — mirrored in
    the oracle SQL.  ``quantize`` is per-column (floor(v/q + 0.5) ints;
    defaults to 1.0 each); pick each q so |v/q| ≲ 1e5 (see
    ``_EXACT_BATCH``).  Returns (col_a, col_b, corr) for i < j pairs.
    """
    import itertools

    if quantize is None:
        quantize = [1.0] * len(cols)

    def scaled(t: pa.Table) -> pa.Table:
        out = {"__g": pa.array(np.zeros(t.num_rows, dtype=np.int64))}
        for c, q in zip(cols, quantize):
            v = t.column(c).to_numpy(zero_copy_only=False).astype(
                np.float64)
            out[c] = pa.array(v / q)
        return pa.table(out)

    terms = {}
    for i in range(len(cols)):
        terms[f"s{i}"] = (lambda idx: lambda *q: q[idx])(i)
    for i, j in itertools.combinations_with_replacement(
            range(len(cols)), 2):
        terms[f"s{i}_{j}"] = (lambda a, b: lambda *q: q[a] * q[b])(i, j)

    pre = ds.select_columns(cols).map_batches(
        scaled, batch_format="pyarrow", zero_copy_batch=True)
    m = _grouped_int_moments(pre, "__g", cols, 1.0, terms).iloc[0]
    n = float(m["n"])
    rows = []
    for i, j in itertools.combinations(range(len(cols)), 2):
        si, sj = float(m[f"s{i}"]), float(m[f"s{j}"])
        sij = float(m[f"s{i}_{j}"])
        sii, sjj = float(m[f"s{i}_{i}"]), float(m[f"s{j}_{j}"])
        with np.errstate(invalid="ignore", divide="ignore"):
            # expression tree mirrored in the oracle SQL
            corr = ((n * sij - si * sj)
                    / np.sqrt((n * sii - si * si) * (n * sjj - sj * sj)))
        rows.append({"col_a": cols[i], "col_b": cols[j],
                     "corr": float(np.round(corr, 6))})
    return (pd.DataFrame(rows).sort_values(["col_a", "col_b"])
            .reset_index(drop=True))
