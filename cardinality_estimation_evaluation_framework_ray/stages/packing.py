"""Sequence packing: assign documents to fixed-length training examples.

Pretraining pipelines concatenate a corpus stream into back-to-back
``seq_len``-token examples ("document packing"); what a distributed engine
must produce is each document's OFFSET in its stream and therefore which
example(s) it lands in.  The contract here is the standard concat-and-split
scheme: within a stream (``key``), documents are laid end-to-end in
ascending id order, and example ``p`` covers tokens ``[p*seq_len,
(p+1)*seq_len)`` — documents may straddle example boundaries.

Output per doc: (id, key, start_off, end_off, first_pack, last_pack).

Scale notes (100 TB design point):
  * only METADATA shuffles — (id, key, length) triples at ~24 B/doc; token
    payloads never move.  Readers later fetch each pack's docs by id from
    the (already partitioned) tokens table.
  * the prefix sum runs per key inside ``groupby(key).map_groups`` —
    one task per stream, vectorized cumsum inside.  Same pre-bucketing
    assumption as sessionization (``stages/sessions.py``): a single key's
    metadata must fit a task (~16 GB per BILLION docs); for hotter streams,
    pre-split the key into id-range buckets, pack each bucket, then shift
    each bucket's offsets by the (tiny) per-bucket totals prefix — the
    classic two-level scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

__all__ = ["pack_sequences"]


def _pack_frame(g: pd.DataFrame, key: str, id_col: str, len_col: str,
                seq_len: int, base: int = 0) -> pd.DataFrame:
    ids = g[id_col].to_numpy()
    order = np.argsort(ids, kind="stable")
    n = g[len_col].to_numpy()[order].astype(np.int64)
    end = base + np.cumsum(n)
    start = end - n
    first = start // seq_len
    last = np.where(n > 0, (end - 1) // seq_len, first)
    return pd.DataFrame({
        id_col: ids[order],
        key: g[key].to_numpy()[order],
        "start_off": start,
        "end_off": end,
        "first_pack": first,
        "last_pack": last,
    })


def pack_sequences(ds: "ray.data.Dataset", *, seq_len: int,
                   key: str = "source", id_col: str = "doc_id",
                   len_col: str = "n_tok",
                   bucket_size: int | None = None) -> "ray.data.Dataset":
    """Concat-order offsets and example ids per document.

    ``first_pack``/``last_pack`` are the example indices the doc's tokens
    touch (``last_pack`` is inclusive; an empty doc touches only the example
    at its offset).

    ``bucket_size`` selects the two-level scan for keys too hot for one
    task: docs are grouped by ``(key, id // bucket_size)``, per-bucket
    totals are aggregated first (one tiny groupby), the driver computes the
    per-key exclusive prefix over buckets (#buckets entries, KBs) and
    broadcasts it, and each bucket packs independently with its base offset
    added — output identical to the single-level path (tested), but no task
    ever sees more than one bucket's metadata.  Requires integer ids whose
    order matches the concat order (true for the canonical tokens schema).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    ds = ds.select_columns([id_col, key, len_col])

    if bucket_size is None:
        def pack(g: pd.DataFrame) -> pd.DataFrame:
            return _pack_frame(g, key, id_col, len_col, seq_len)

        return ds.groupby(key).map_groups(pack, batch_format="pandas")

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column("__bucket",
                               pa.array((ids // bucket_size).astype(np.int64)))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    # pass 1: per-bucket token totals (pre-aggregated per batch)
    def partial_totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t.column(key).to_pandas(),
            "__bucket": t.column("__bucket").to_numpy(zero_copy_only=False),
            "n": t.column(len_col).to_numpy(zero_copy_only=False).astype(np.int64),
        })
        g = df.groupby([key, "__bucket"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    totals = (bucketed.map_batches(partial_totals, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby([key, "__bucket"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())  # #buckets rows — KB-scale by construction
    totals = totals.sort_values([key, "__bucket"]).reset_index(drop=True)
    csum = totals.groupby(key)["n"].cumsum() - totals["n"]
    base_map = {(k, int(b)): int(o) for k, b, o in
                zip(totals[key], totals["__bucket"], csum)}
    base_obj = ray.put(base_map)

    # pass 2: pack each bucket independently at its broadcast base offset
    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_obj)
        base = bases[(g[key].iloc[0], int(g["__bucket"].iloc[0]))]
        return _pack_frame(g, key, id_col, len_col, seq_len, base=base)

    return (bucketed.groupby([key, "__bucket"])
            .map_groups(pack_bucket, batch_format="pandas"))
