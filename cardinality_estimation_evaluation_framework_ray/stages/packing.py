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

import ray.data

__all__ = ["pack_sequences"]


def pack_sequences(ds: "ray.data.Dataset", *, seq_len: int,
                   key: str = "source", id_col: str = "doc_id",
                   len_col: str = "n_tok") -> "ray.data.Dataset":
    """Concat-order offsets and example ids per document.

    ``first_pack``/``last_pack`` are the example indices the doc's tokens
    touch (``last_pack`` is inclusive; an empty doc touches only the example
    at its offset).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        n = g[len_col].to_numpy()[order].astype(np.int64)
        end = np.cumsum(n)
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

    return (ds.select_columns([id_col, key, len_col])
            .groupby(key).map_groups(pack, batch_format="pandas"))
