"""Sampling stages: deterministic per-key samples and hash-based splits.

Training-data pipelines cap per-domain document counts (anti-domination) and
carve held-out splits; both must be DETERMINISTIC (reruns and resumed runs
pick the same rows) and cheap at 100 TB (no global sort, no random state on
the driver).

Both operators rank rows by a Knuth multiplicative hash of the id column:
``priority(id) = (id * 2654435761) mod 2^32`` (Knuth, TAOCP vol. 3 §6.4).
The hash is SQL-expressible, so every sample here has an exact DuckDB oracle
— and it is uniform enough for anti-domination caps while staying replayable
from the id alone (no RNG to checkpoint).

Scale notes (100 TB design point):
  * ``per_key_sample`` is two-stage top-n: a per-batch partial top-n per key
    inside ``map_batches`` (so at most ``n_per_key`` rows per key per BLOCK
    enter the shuffle), then one ``groupby(key).map_groups`` merge.  Shuffle
    payload is candidates only — ids + keys, never documents.
  * ``hash_split`` is embarrassingly parallel (stateless filter per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["knuth_priority", "per_key_sample", "hash_split",
           "mixture_sample", "global_sample", "weighted_sample",
           "temperature_budgets", "temperature_mixture_sample"]

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(0xFFFFFFFF)


def knuth_priority(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 — SQL mirror:
    ``(id * 2654435761) % 4294967296``."""
    with np.errstate(over="ignore"):
        return (ids.astype(np.uint64) * _KNUTH) & _MOD32


def _topn_per_key(tbl: pa.Table, key: str, id_col: str, n: int) -> pa.Table:
    """Keep the n smallest (priority, id) rows per key value — vectorized:
    one lexsort + within-key rank via cumcount."""
    if tbl.num_rows == 0:
        return tbl
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    keys = tbl.column(key)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    codes = keys.dictionary_encode()
    kc = np.asarray(codes.indices, dtype=np.int64)
    prio = knuth_priority(ids)
    order = np.lexsort((ids, prio, kc))
    kc_s = kc[order]
    boundary = np.ones(len(kc_s), dtype=bool)
    boundary[1:] = kc_s[1:] != kc_s[:-1]
    group_start = np.maximum.accumulate(np.where(boundary,
                                                 np.arange(len(kc_s)), 0))
    rank = np.arange(len(kc_s)) - group_start
    keep_sorted = order[rank < n]
    mask = np.zeros(tbl.num_rows, dtype=bool)
    mask[keep_sorted] = True
    return tbl.filter(pa.array(mask))


def per_key_sample(ds: "ray.data.Dataset", *, key: str = "source",
                   n_per_key: int = 100, id_col: str = "doc_id",
                   cols: list[str] | None = None) -> "ray.data.Dataset":
    """Deterministic uniform-without-replacement sample of ``n_per_key``
    rows per key (anti-domination cap).  Smallest Knuth priorities win;
    ties broken by id.  Output columns: ``cols`` (default: key + id only —
    join payloads back downstream; don't shuffle documents)."""
    cols = cols if cols is not None else [id_col, key]

    def partial(tbl: pa.Table) -> pa.Table:
        return _topn_per_key(tbl.select(cols), key, id_col, n_per_key)

    def final(tbl: pa.Table) -> pa.Table:
        return _topn_per_key(tbl, key, id_col, n_per_key)

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return cands.groupby(key).map_groups(final, batch_format="pyarrow")


def hash_split(ds: "ray.data.Dataset", *, test_permille: int = 100,
               id_col: str = "doc_id", split_col: str = "split"
               ) -> "ray.data.Dataset":
    """Deterministic train/test tag per row: rows whose
    ``priority mod 1000 < test_permille`` are 'test', the rest 'train'.
    Stateless per batch; the same id always lands in the same split, across
    reruns, resumes and repartitions."""

    def tag(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        is_test = (knuth_priority(ids) % np.uint64(1000)
                   < np.uint64(test_permille))
        lab = np.where(is_test, "test", "train")
        return tbl.append_column(split_col, pa.array(lab, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _mixture_scan(g: "pd.DataFrame", budgets: dict, key_col: str,
                  id_col: str, weight_col: str) -> "pd.DataFrame":
    """Greedy prefix of the (priority, id)-ordered rows of ONE key: take a
    row iff the cumulative weight BEFORE it is under the key's budget (so
    the last taken row may overshoot — 'fill until reached' semantics, the
    SQL ``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING`` window mirror)."""
    import pandas as pd  # noqa: F401 — annotation-only import at module top

    budget = int(budgets.get(g[key_col].iloc[0], 0))
    ids = g[id_col].to_numpy()
    w = g[weight_col].to_numpy().astype(np.int64)
    prio = knuth_priority(ids)
    order = np.lexsort((ids, prio))
    cum_before = np.concatenate([[0], np.cumsum(w[order])[:-1]])
    take = order[cum_before < budget]
    return g.iloc[np.sort(take)][[id_col, key_col, weight_col]]


def mixture_sample(ds: "ray.data.Dataset", *, budgets: dict[str, int],
                   key_col: str = "source", id_col: str = "doc_id",
                   weight_col: str = "n_chars",
                   n_buckets: int | None = None) -> "ray.data.Dataset":
    """Deterministic domain-mixture curation: per key (domain), select rows
    in Knuth-priority order until the cumulative ``weight_col`` reaches the
    key's budget (token/char budget per domain — the data-mixing step of a
    training-data pipeline).  Replayable from ids alone; exact SQL oracle.

    Output: (id_col, key_col, weight_col) for the selected rows — metadata
    only; join payloads back downstream rather than shuffling documents.

    Scale (``n_buckets=B``): a domain's group is ALL its rows, so the
    single-level scan caps at one task's memory.  The two-level path range-
    partitions each key by priority into B buckets (priority order is bucket
    order), reduces per-(key, bucket) weight TOTALS (K x B rows), scans that
    tiny table per key to classify buckets as fully-taken / cut / rejected,
    and rescans only the (at most one per key) cut bucket's rows at its
    remaining budget — identical output, and no task ever holds more than
    1/B of a domain.
    """
    cols = [id_col, key_col, weight_col]
    ds = ds.select_columns(cols)

    if not n_buckets or n_buckets <= 1:
        return ds.groupby(key_col).map_groups(
            lambda g: _mixture_scan(g, budgets, key_col, id_col, weight_col),
            batch_format="pandas")

    B = int(n_buckets)
    shift = np.uint64(32)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        b = (knuth_priority(ids).astype(np.uint64)
             * np.uint64(B)) >> shift  # range partition of [0, 2^32)
        return t.append_column("__pbucket", pa.array(b.astype(np.int64)))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    from ray.data.aggregate import Sum

    totals = (bucketed.groupby([key_col, "__pbucket"])
              .aggregate(Sum(weight_col, alias_name="__w")))

    def classify(g):
        g = g.sort_values("__pbucket").reset_index(drop=True)
        budget = int(budgets.get(g[key_col].iloc[0], 0))
        w = g["__w"].to_numpy().astype(np.int64)
        cum_before = np.concatenate([[0], np.cumsum(w)[:-1]])
        cum_after = cum_before + w
        # full: even the last row's cum_before < budget is implied
        g["__verdict"] = np.where(cum_after <= budget, 1,
                                  np.where(cum_before < budget, 2, 0))
        g["__rem"] = np.maximum(budget - cum_before, 0)
        return g[[key_col, "__pbucket", "__verdict", "__rem"]]

    verdicts = (totals.groupby(key_col)
                .map_groups(classify, batch_format="pandas").to_pandas())
    # K x B rows of metadata — broadcast once
    import ray

    vref = ray.put(verdicts[[key_col, "__pbucket", "__verdict"]])

    def keep(verdict_wanted: int):
        def fn(t: pa.Table) -> pa.Table:
            # vectorized semi-join against the broadcast verdict table (a
            # C-level hash merge, no per-row Python)
            vdf = ray.get(vref)
            probe = t.select([key_col, "__pbucket"]).to_pandas()
            m = probe.merge(vdf, how="left", on=[key_col, "__pbucket"])
            mask = (m["__verdict"] == verdict_wanted).to_numpy()
            return t.filter(pa.array(mask)).select(cols)
        return fn

    full = bucketed.map_batches(keep(1), batch_format="pyarrow")

    # at most one cut bucket per key -> its rows rescan at the REMAINING budget
    rem = {k: int(r) for k, v, r in zip(verdicts[key_col],
                                        verdicts["__verdict"],
                                        verdicts["__rem"]) if v == 2}
    cut_rows = bucketed.map_batches(keep(2), batch_format="pyarrow")
    cut = cut_rows.groupby(key_col).map_groups(
        lambda g: _mixture_scan(g, rem, key_col, id_col, weight_col),
        batch_format="pandas")
    return full.union(cut)


def global_sample(ds: "ray.data.Dataset", *, n: int, id_col: str = "doc_id",
                  cols: list[str] | None = None) -> "ray.data.Dataset":
    """Deterministic uniform-without-replacement sample of exactly ``n``
    rows from the whole dataset: the ``n`` smallest Knuth priorities win
    (ties by id) — replayable from ids alone, like ``per_key_sample`` with
    one global key but WITHOUT the all-to-one groupby.  Assumes ``id_col``
    values are unique (the table-key contract all samplers here share).

    Two passes, both metadata-light: per-batch partial top-n emits at most
    ``n`` (priority, id) candidate rows per BLOCK; the driver merges
    ``<= num_blocks * n`` candidates (ids only, never payloads) and
    broadcasts the winning id set; a stateless filter pass then keeps the
    winners with ``cols`` (default id only — join payloads downstream)."""
    cols = cols if cols is not None else [id_col]

    def partial(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], tbl.schema.field(id_col).type)})
        prio = knuth_priority(ids)
        order = np.lexsort((ids, prio))[:n]
        return pa.table({id_col: pa.array(ids[order])})

    cand = np.concatenate(
        [b.column(id_col).to_numpy(zero_copy_only=False)
         for b in ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
         .iter_batches(batch_format="pyarrow")] or
        [np.empty(0, np.int64)])
    order = np.lexsort((cand, knuth_priority(cand)))[:n]
    winners_ref = ray.put(np.sort(cand[order]))

    def keep(tbl: pa.Table) -> pa.Table:
        win = ray.get(winners_ref)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(win, ids)
        hit = (pos < len(win)) & (win[np.minimum(pos, max(len(win) - 1, 0))]
                                  == ids) if len(win) else \
            np.zeros(len(ids), dtype=bool)
        return tbl.select(cols).filter(pa.array(hit))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(ds: "ray.data.Dataset", *, n: int, weight_col: str,
                    id_col: str = "doc_id",
                    cols: list[str] | None = None) -> "ray.data.Dataset":
    """Deterministic weighted-without-replacement sample of exactly ``n``
    rows — Efraimidis-Spirakis A-Res with the Knuth-hash uniform: row i
    wins with key ``ln(u_i) / w_i`` (top-n by key), u_i =
    (knuth_priority(id) + 0.5) / 2^32, so inclusion probability follows the
    weights (sample docs ∝ length/quality for token-budget curation) and
    the draw is replayable from ids alone — no driver RNG, same contract as
    ``global_sample``.

    Same two metadata-light passes as ``global_sample``: per-block partial
    top-n of (key, id) candidates, driver merge of ≤ blocks×n candidates,
    broadcast winner ids, stateless filter.  Rows with weight <= 0 are
    excluded (SQL mirror: WHERE w > 0).  The key is one fixed float64
    expression, so a DuckDB ORDER BY of the same expression ranks
    identically.
    """
    cols = cols if cols is not None else [id_col]

    def key_of(ids: np.ndarray, w: np.ndarray) -> np.ndarray:
        u = (knuth_priority(ids).astype(np.float64) + 0.5) / 4294967296.0
        return np.log(u) / w

    def partial(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        w = tbl.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        if len(ids) == 0:
            return pa.table({id_col: pa.array(
                [], tbl.schema.field(id_col).type),
                "__w": pa.array([], pa.float64())})
        k = key_of(ids, w)
        order = np.lexsort((ids, -k))[:n]  # largest key wins
        return pa.table({id_col: pa.array(ids[order]),
                         "__w": pa.array(w[order])})

    cand_ids, cand_w = [], []
    for b in ds.select_columns([id_col, weight_col]).map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        cand_ids.append(b.column(id_col).to_numpy(zero_copy_only=False))
        cand_w.append(b.column("__w").to_numpy(zero_copy_only=False))
    ids = (np.concatenate(cand_ids) if cand_ids
           else np.empty(0, np.int64))
    w = np.concatenate(cand_w) if cand_w else np.empty(0, np.float64)
    order = np.lexsort((ids, -key_of(ids, w)))[:n] if len(ids) else []
    winners_ref = ray.put(np.sort(ids[order]) if len(ids)
                          else np.empty(0, np.int64))

    def keep(tbl: pa.Table) -> pa.Table:
        win = ray.get(winners_ref)
        ids_ = tbl.column(id_col).to_numpy(zero_copy_only=False)
        if len(win):
            pos = np.searchsorted(win, ids_)
            hit = (pos < len(win)) & (win[np.minimum(pos, len(win) - 1)]
                                      == ids_)
        else:
            hit = np.zeros(len(ids_), dtype=bool)
        return tbl.select(cols).filter(pa.array(hit))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def temperature_budgets(ds: "ray.data.Dataset", *, total_budget: int,
                        alpha: float = 0.5, key_col: str = "source",
                        weight_col: str = "n_chars",
                        quant: int = 1_000_000,
                        max_keys: int = 100_000) -> dict[str, int]:
    """Per-key budgets proportional to (key weight total)^alpha — the
    temperature-smoothed mixing rule of multilingual-LM pipelines
    (alpha=1 keeps the natural mix, alpha=0 is uniform, 0.3–0.7 upweights
    the tail; cf. the sampling exponent in the mBERT/XLM-R recipes).

    Exact-integer derivation so reruns AND a SQL oracle agree bitwise:
    s_k = floor(w_k^alpha * quant) as an integer, then
    budget_k = total_budget * s_k // sum(s)  (Python ints — no float
    division).  For alpha=0.5 the float step is a single IEEE
    correctly-rounded sqrt + one multiply, so DuckDB's
    ``floor(sqrt(w) * quant)`` reproduces s_k bit-for-bit; other alphas
    use ``pow``, which is not guaranteed correctly rounded across libms —
    fine for production, use 0.5 when an exact oracle must mirror it.
    Requires w_k < 2^53 (exact int64→float64; ~9 PB of chars per key).

    One small groupby (K = #keys rows) lands on the driver — bounded-key
    contract, guarded by ``max_keys`` like ``group_zscore``.  Floor-based
    splitting under-allocates by < K rows of ``quant`` rounding; callers
    who need the total exactly should distribute the remainder themselves.
    """
    from ray.data.aggregate import Sum

    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    totals = (ds.select_columns([key_col, weight_col])
              .groupby(key_col).aggregate(
                  Sum(weight_col, alias_name="__w")).to_pandas())
    totals = totals[totals[key_col].notna()]
    if len(totals) > max_keys:
        raise ValueError(
            f"temperature_budgets: {len(totals)} distinct {key_col!r} keys "
            f"> max_keys={max_keys}; the bounded-key contract does not "
            f"hold — raise max_keys knowingly or pre-aggregate the key")
    w = totals["__w"].to_numpy().astype(np.float64)
    if (w >= 2.0 ** 53).any():
        raise ValueError("per-key weight total >= 2^53: int64->float64 is "
                         "no longer exact, the bitwise-deterministic "
                         "contract breaks")
    if alpha == 0.5:
        s_f = np.floor(np.sqrt(w) * float(quant))
    else:
        with np.errstate(divide="ignore"):
            s_f = np.floor(np.power(w, alpha) * float(quant))
    s = [int(x) for x in s_f]
    S = sum(s)
    if S <= 0:
        return {k: 0 for k in totals[key_col]}
    return {k: int(total_budget) * sk // S
            for k, sk in zip(totals[key_col], s)}


def temperature_mixture_sample(ds: "ray.data.Dataset", *, total_budget: int,
                               alpha: float = 0.5,
                               key_col: str = "source",
                               id_col: str = "doc_id",
                               weight_col: str = "n_chars",
                               n_buckets: int | None = None,
                               max_keys: int = 100_000
                               ) -> "ray.data.Dataset":
    """``mixture_sample`` with budgets derived by ``temperature_budgets``:
    one global weight budget split across keys proportional to
    (key total)^alpha, then the deterministic Knuth-priority greedy fill
    per key.  Two passes over the corpus metadata (one tiny groupby for
    the budgets, one for the fill); documents never shuffle.  Same
    two-level ``n_buckets`` hot-key path as ``mixture_sample``."""
    budgets = temperature_budgets(
        ds, total_budget=total_budget, alpha=alpha, key_col=key_col,
        weight_col=weight_col, max_keys=max_keys)
    return mixture_sample(ds, budgets=budgets, key_col=key_col,
                          id_col=id_col, weight_col=weight_col,
                          n_buckets=n_buckets)
