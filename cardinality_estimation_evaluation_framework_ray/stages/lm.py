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

Scale control (``max_vocab``): at 100 TB the driver-side model must be
capped — pass ``max_vocab=V`` and training first selects the top-V words by
occurrence count (distributed partial top-V, the ``top_k_by_count`` shape:
the full distinct-word table never reaches the driver), then folds every
other word into a single ``<unk>`` token BEFORE bigrams are formed.  The
model arrays are then functions of V, not of the corpus vocabulary:
<= V+1 unigrams/prefixes and <= (V+1)^2 distinct bigrams (in practice far
fewer).  ``max_vocab=None`` is the uncapped exact model — the
oracle-checkable special case.
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
# the <unk> fold target for capped vocabularies: a fixed word-hash value.
# Membership in the top-V keep-set decides the fold, so a real word hashing
# to this value is simply remapped to itself when kept — no special casing.
_UNK = np.uint64(0x556E6B6E6F776E21)  # b"Unknown!"


def _fold_unk(word_h: np.ndarray, keep: np.ndarray | None) -> np.ndarray:
    """Remap word hashes outside the sorted ``keep`` set to ``_UNK``."""
    if keep is None or len(word_h) == 0:
        return word_h
    if len(keep) == 0:
        return np.full(len(word_h), _UNK, np.uint64)
    pos = np.minimum(np.searchsorted(keep, word_h), len(keep) - 1)
    return np.where(keep[pos] == word_h, word_h, _UNK)


def _doc_bigrams(batch: pa.Table, text_col: str, seed: int,
                 keep: np.ndarray | None = None):
    """(pair_hash, prefix_hash, unigram_hash, per-doc bigram counts).

    With ``keep`` (sorted uint64 top-V word hashes), out-of-vocabulary words
    are folded to ``<unk>`` BEFORE bigram formation, so pair/prefix hashes
    live in the capped space on both the train and score sides."""
    word_h, lengths = _doc_word_hashes(batch, text_col, seed)
    word_h = _fold_unk(word_h, keep)
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


def _top_vocab(ds: "ray.data.Dataset", text_col: str, seed: int,
               max_vocab: int) -> np.ndarray:
    """Sorted uint64 hashes of the ``max_vocab`` most frequent words.

    Distributed partial top-V: per-batch ``np.unique`` pre-aggregation, one
    groupby over distinct words, a per-block local top-V, and a driver merge
    of <= #blocks x V rows — the full distinct-word table never reaches the
    driver.  Deterministic tie-break by word hash."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        word_h, _ = _doc_word_hashes(batch, text_col, seed)
        wk, wc = np.unique(word_h, return_counts=True)
        return pa.table({"key": pa.array(wk.view(np.int64)),
                         "n": pa.array(wc.astype(np.int64))})

    counts = (ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("key").aggregate(Sum("n", alias_name="n")))

    def local_top(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -n))[:max_vocab]
        return pa.table({"key": pa.array(k[order]), "n": pa.array(n[order])})

    tops = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    order = np.lexsort((tops["key"].to_numpy(), -tops["n"].to_numpy()))
    keys = tops["key"].to_numpy()[order[:max_vocab]]
    return np.sort(keys.astype(np.int64).view(np.uint64))


def train_bigram_counts(ds: "ray.data.Dataset", *, text_col: str = "text",
                        seed: int = 97,  # noqa: D401 — seed shared w/ scorer
                        max_vocab: int | None = None):
    """Corpus model: (sorted pair keys, counts), (sorted prefix keys,
    counts), vocab size V, keep-set (or None).  Pre-aggregated per batch;
    the groupby exchange carries one row per DISTINCT gram per batch.

    ``max_vocab``: cap the model at the top-V words by occurrence, folding
    the rest into ``<unk>`` (see module docstring) — bounds driver memory by
    V, not corpus vocabulary.  None = exact (oracle mode)."""
    keep = (_top_vocab(ds, text_col, seed, max_vocab)
            if max_vocab is not None else None)
    keep_ref = None
    if keep is not None:
        import ray

        keep_ref = ray.put(keep)

    def partial(batch: pa.Table) -> pa.Table:
        kp = None
        if keep_ref is not None:
            import ray

            kp = ray.get(keep_ref)
        pair, pref, uni, _ = _doc_bigrams(batch, text_col, seed, keep=kp)
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
    return pairs, prefixes, vocab, keep


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
    ``seed`` must match the one used for training (same word-hash space).
    A capped model's keep-set travels with it, so scoring folds OOV words to
    ``<unk>`` exactly as training did."""
    if len(model) == 3:  # pre-cap 3-tuple compatibility
        (pair_k, pair_c), (pref_k, pref_c), vocab = model
        keep = None
    else:
        (pair_k, pair_c), (pref_k, pref_c), vocab, keep = model
    ref = ray.put((pair_k, pair_c, pref_k, pref_c, vocab, keep))

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.segments import segment_sums

        pk, pc_, fk, fc, v, kp = ray.get(ref)
        pair, pref, _, n_big = _doc_bigrams(batch, text_col, seed, keep=kp)
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
                  text_col: str = "text", id_col: str = "doc_id",
                  max_vocab: int | None = None) -> "ray.data.Dataset":
    """Train on ``ds`` and score ``ds`` (the CCNet loop trains on a clean
    reference corpus instead — pass a different ``ds`` to
    ``train_bigram_counts`` for that).  ``max_vocab`` caps the model at the
    top-V words with an ``<unk>`` fold (None = exact / oracle mode)."""
    model = train_bigram_counts(ds, text_col=text_col, max_vocab=max_vocab)
    return perplexity_scores(ds, model, k=k, text_col=text_col,
                             id_col=id_col)
