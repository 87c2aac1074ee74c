"""Corpus-trained bigram-LM perplexity scoring (CCNet-style quality filter).

Wenzek et al. (2020) "CCNet" rank web documents by the perplexity of a
Kneser-Ney LM; the distributed shape of that operator is what matters here:

  pass 1 (train): aggregate bigram/prefix counts over the corpus —
      pre-aggregated inside every ``map_batches`` task (one ``np.unique``
      per batch), so the ``groupby().sum`` exchange carries DISTINCT grams,
      not token occurrences;
  pass 2 (score): the count model is ``ray.put`` ONCE (sorted key arrays +
      counts, binary-search lookup) and every task scores its docs locally —
      the corpus is read twice and shuffled never.

The model here is add-k smoothed bigram MLE (simpler than Kneser-Ney but the
same data flow):  ``P(w2|w1) = (c(w1 w2) + k) / (c(w1·) + k·V)`` with
``c(w1·)`` = occurrences of w1 as a bigram prefix and ``V`` = corpus
unigram vocabulary size.  Per-doc perplexity = ``exp(-mean log P)`` over the
doc's bigrams (docs with < 2 words score perplexity 1).  Word identity is
the tokenizer's SQL-reproducible contract, so the whole operator has an
exact DuckDB oracle (hash collisions aside, same digest contract as
``minhash_exact_dups``).

Scale note: at 100 TB the driver-side model must be capped (top-V vocabulary
by count, everything else folded into an <unk> bucket) — the cap bounds the
broadcast at V + V' entries and is standard for CCNet-style filters; the
uncapped exact model here is the oracle-checkable special case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import _mix
from .dedup import _doc_word_hashes

__all__ = ["train_bigram_counts", "perplexity_scores", "lm_perplexity"]

_FNV = np.uint64(0x100000001B3)


def _doc_bigrams(batch: pa.Table, text_col: str, seed: int):
    """(pair_hash, prefix_hash, unigram_hash, per-doc bigram counts)."""
    word_h, lengths = _doc_word_hashes(batch, text_col, seed)
    n_big = np.maximum(lengths - 1, 0).astype(np.int64)
    if len(word_h) == 0:
        e = np.empty(0, np.uint64)
        return e, e, word_h, n_big
    # bigram positions: every index except each doc's last word
    ends = np.cumsum(lengths)
    last = ends[lengths > 0] - 1
    mask = np.ones(len(word_h), dtype=bool)
    mask[last] = False
    h1 = word_h[:-1][mask[:-1]]
    h2 = word_h[1:][mask[:-1]]
    with np.errstate(over="ignore"):
        pair = _mix(h1 * _FNV + h2)
    return pair, h1, word_h, n_big


def train_bigram_counts(ds: "ray.data.Dataset", *, text_col: str = "text",
                        seed: int = 97):  # noqa: D401 — seed shared w/ scorer
    """Corpus model: (sorted pair keys, counts), (sorted prefix keys,
    counts), vocab size V.  Pre-aggregated per batch; the groupby exchange
    carries one row per DISTINCT gram per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        pair, pref, uni, _ = _doc_bigrams(batch, text_col, seed)
        pk, pc_ = np.unique(pair, return_counts=True)
        fk, fc = np.unique(pref, return_counts=True)
        uk = np.unique(uni)
        kind = np.concatenate([np.zeros(len(pk), np.int8),
                               np.ones(len(fk), np.int8),
                               np.full(len(uk), 2, np.int8)])
        key = np.concatenate([pk, fk, uk]).view(np.int64)
        cnt = np.concatenate([pc_, fc, np.ones(len(uk), np.int64)])
        return pa.table({"kind": pa.array(kind), "key": pa.array(key),
                         "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = (ds.select_columns([text_col])
           .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["kind", "key"]).aggregate(Sum("n", alias_name="n")))
    kinds, keys, cnts = [], [], []
    for b in agg.iter_batches(batch_format="pyarrow"):
        kinds.append(b.column("kind").to_numpy(zero_copy_only=False))
        keys.append(b.column("key").to_numpy(zero_copy_only=False))
        cnts.append(b.column("n").to_numpy(zero_copy_only=False))
    kind = np.concatenate(kinds) if kinds else np.empty(0, np.int8)
    key = np.concatenate(keys) if keys else np.empty(0, np.int64)
    cnt = np.concatenate(cnts) if cnts else np.empty(0, np.int64)

    def sorted_kind(k):
        m = kind == k
        kk, cc = key[m].view(np.uint64), cnt[m]
        o = np.argsort(kk)
        return kk[o], cc[o]

    pairs = sorted_kind(0)
    prefixes = sorted_kind(1)
    vocab = int((kind == 2).sum())
    return pairs, prefixes, vocab


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray,
            probe: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), np.int64)
    pos = np.searchsorted(sorted_keys, probe)
    pos_c = np.minimum(pos, len(sorted_keys) - 1)
    hit = sorted_keys[pos_c] == probe
    return np.where(hit, counts[pos_c], 0)


def perplexity_scores(ds: "ray.data.Dataset", model, *, k: float = 1.0,
                      text_col: str = "text", id_col: str = "doc_id",
                      seed: int = 97) -> "ray.data.Dataset":
    """Score pass: per-doc add-k bigram perplexity against a broadcast model
    (``train_bigram_counts`` output).  Output: (doc_id, n_bigrams, ppl).
    ``seed`` must match the one used for training (same word-hash space)."""
    (pair_k, pair_c), (pref_k, pref_c), vocab = model
    ref = ray.put((pair_k, pair_c, pref_k, pref_c, vocab))

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.segments import segment_sums

        pk, pc_, fk, fc, v = ray.get(ref)
        pair, pref, _, n_big = _doc_bigrams(batch, text_col, seed)
        c12 = _lookup(pk, pc_, pair)
        c1 = _lookup(fk, fc, pref)
        logp = np.log((c12 + k) / (c1 + k * v)) if len(pair) else np.empty(0)
        tot = segment_sums(logp, n_big)
        ppl = np.exp(-tot / np.maximum(n_big, 1))
        ppl = np.where(n_big > 0, ppl, 1.0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(n_big),
            "ppl": pa.array(np.round(ppl, 4)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def lm_perplexity(ds: "ray.data.Dataset", *, k: float = 1.0,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> "ray.data.Dataset":
    """Train on ``ds`` and score ``ds`` (the CCNet loop trains on a clean
    reference corpus instead — pass a different ``ds`` to
    ``train_bigram_counts`` for that)."""
    model = train_bigram_counts(ds, text_col=text_col)
    return perplexity_scores(ds, model, k=k, text_col=text_col,
                             id_col=id_col)
