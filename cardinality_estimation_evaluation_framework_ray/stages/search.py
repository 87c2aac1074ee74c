"""Full-text relevance scoring: distributed BM25 over the documents table.

Okapi BM25 (Robertson et al., TREC-3) for a FIXED query term set — the
retrieval scoring pass of a corpus search / RAG pipeline:

  idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)          (Lucene form)
  score(d) = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b*dl/avgdl))

Distributed shape (two passes, no shuffle of the corpus):

  pass 1 (stats): each batch emits ONE metadata row — (n_docs, sum_len,
      df per query term), computed by a vectorized membership probe of the
      batch's word hashes against the sorted query-hash array; the driver
      folds #batches tiny rows.  Payload is O(#batches * Q).
  pass 2 (score): (idf vector, avgdl, query hashes) broadcast once via
      ``ray.put``; every task scores its docs locally with a bincount over
      (doc x term) cells.  Docs matching no term are dropped (score 0).

Word identity is the tokenizer's SQL-reproducible contract
(stages/text.py), so the operator has an exact DuckDB oracle; per-term
contributions are quantized to integer micros (floor(x * 1e6 + 0.5)) before
the per-doc sum, making the score an ORDER-INDEPENDENT integer — hashable
against SQL regardless of float summation order (hash collisions aside,
the same digest contract as minhash_exact_dups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import hash_strings
from .dedup import _doc_word_hashes

__all__ = ["corpus_stats", "bm25_scores", "doc_term_frequencies",
           "tfidf_top_terms"]


def _term_tf(word_h: np.ndarray, lengths: np.ndarray,
             q_sorted: np.ndarray) -> np.ndarray:
    """(n_docs, Q) term-frequency matrix for one batch — one searchsorted
    over the batch's concatenated word hashes, one bincount."""
    n_docs, Q = len(lengths), len(q_sorted)
    if len(word_h) == 0 or Q == 0:
        return np.zeros((n_docs, Q), np.int64)
    pos = np.searchsorted(q_sorted, word_h)
    pos_c = np.minimum(pos, Q - 1)
    hit = q_sorted[pos_c] == word_h
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    cells = doc_of[hit] * Q + pos_c[hit]
    return np.bincount(cells, minlength=n_docs * Q).reshape(n_docs, Q)


def corpus_stats(ds: "ray.data.Dataset", terms: list[str], *,
                 text_col: str = "text", seed: int = 97):
    """(N docs, total token count, df per term — aligned to ``terms``
    order) in one streaming pass; per-batch payload is one (2 + Q)-number
    row."""
    h = hash_strings([t.lower() for t in terms], seed)
    order = np.argsort(h)
    q = h[order]

    def partial(t: pa.Table):
        word_h, lengths = _doc_word_hashes(t, text_col, seed)
        tf = _term_tf(word_h, lengths, q)
        return {"n_docs": np.array([t.num_rows], np.int64),
                "sum_len": np.array([int(lengths.sum())], np.int64),
                "df": np.array([(tf > 0).sum(axis=0)], dtype=np.int64)}

    n_docs = sum_len = 0
    df = np.zeros(len(terms), np.int64)
    for b in (ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pandas")):
        n_docs += int(b["n_docs"].sum())
        sum_len += int(b["sum_len"].sum())
        df += np.sum(np.stack(b["df"].to_numpy()), axis=0)
    df_terms = np.empty_like(df)
    df_terms[order] = df  # df was accumulated in sorted-hash order
    return n_docs, sum_len, df_terms


def bm25_scores(ds: "ray.data.Dataset", terms: list[str], *,
                k1: float = 1.2, b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id", seed: int = 97) -> "ray.data.Dataset":
    """Score every document against ``terms``; emit docs matching >= 1 term.

    Output: (id_col, n_matched:int64, score_micros:int64) — the BM25 score
    in integer micros (see module docstring for why integers).
    ``terms`` must already be tokenizer-normal ([a-z0-9]+); raises
    otherwise so query and corpus live in the same token space.
    """
    terms = [t.lower() for t in terms]
    for t in terms:
        if not t or not all(c.islower() or c.isdigit() for c in t):
            raise ValueError(f"term {t!r} is not tokenizer-normal [a-z0-9]+")
    q_hash = hash_strings(terms, seed)
    order = np.argsort(q_hash)
    q_sorted = q_hash[order]

    N, total_len, df_in_term_order = corpus_stats(
        ds, terms, text_col=text_col, seed=seed)
    df = df_in_term_order[order]  # align to q_sorted
    avgdl = (total_len / N) if N else 1.0
    idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((q_sorted, idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        qs, idf_v, adl = ray.get(ref)
        word_h, lengths = _doc_word_hashes(t, text_col, seed)
        tf = _term_tf(word_h, lengths, qs).astype(np.float64)
        dl = lengths.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dl / adl))[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            contrib = idf_v[None, :] * tf * (k1 + 1.0) / denom
        contrib = np.where(tf > 0, contrib, 0.0)
        micros = np.floor(contrib * 1e6 + 0.5).astype(np.int64)
        total = micros.sum(axis=1)
        matched = (tf > 0).sum(axis=1).astype(np.int64)
        keep = matched > 0
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "n_matched": pa.array(matched[keep]),
            "score_micros": pa.array(total[keep]),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

def doc_term_frequencies(ds: "ray.data.Dataset", *, text_col: str = "text",
                         id_col: str = "doc_id") -> "ray.data.Dataset":
    """One row per (doc, DISTINCT word): ``(doc_id, word, tf)``.

    Vectorized per batch (lexsort over (doc, word-code) + run-length
    counts); the output is the distinct-pair table — the only thing later
    TF-IDF stages ever shuffle, never the text."""
    from .text import _split_lists

    def tf(batch: pa.Table) -> pa.Table:
        values, lengths = _split_lists(batch.column(text_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        if len(values) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "word": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        d = values.dictionary_encode()
        codes = np.asarray(d.indices, dtype=np.int64)
        order = np.lexsort((codes, doc_of))
        dd, cc = doc_of[order], codes[order]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(dd)))
        words = d.dictionary.take(pa.array(cc[starts]))
        return pa.table({
            id_col: pa.array(ids[dd[starts]]),
            "word": pa.array(words.to_pylist(), type=pa.string()),
            "tf": pa.array(runs.astype(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        tf, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms(ds: "ray.data.Dataset", *, k: int = 3,
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> "ray.data.Dataset":
    """Per-doc keyword extraction: the ``k`` highest-TF-IDF words of every
    document — ``tfidf = tf * ln(N / df)`` rounded to 6dp, ties broken by
    word ascending (both engines rank on the ROUNDED score, so float ulps
    can't reorder).

    Distributed shape (100 TB): three exchanges, all over metadata —
      1. tf pass emits the distinct (doc, word, tf) pair table;
      2. df = one groupby over distinct words (combiner-compressed);
      3. ``hash_join`` tf⋈df on word (big-big — the vocabulary is NOT
         broadcast, unlike the capped-LM model path), then a groupby(doc)
         local top-k where each group is one doc's distinct words.
    The raw text is read once and never shuffled.
    """
    import pandas as pd

    from .joins import hash_join

    n_docs = ds.count()
    # tf feeds BOTH the df aggregate and the join probe side; materialize
    # the narrow pair table once (spillable) instead of re-reading and
    # re-tokenizing the corpus for each consumer
    tf = doc_term_frequencies(ds, text_col=text_col,
                              id_col=id_col).materialize()

    def as_df(batch: pa.Table) -> pa.Table:
        cnt = batch.column("count()")
        return pa.table({"word": batch.column("word"),
                         "df": pc.cast(cnt, pa.int64())})

    dfreq = tf.groupby("word").count().map_batches(
        as_df, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(tf, dfreq, on="word")

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = np.round(tfv * np.log(n_docs / dfv), 6)
        return pa.table({id_col: batch.column(id_col),
                         "word": batch.column("word"),
                         "tfidf": pa.array(tfidf)})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["tfidf", "word"],
                             ascending=[False, True]).head(k)

    return (joined.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(id_col).map_groups(topk, batch_format="pandas"))


def boolean_and_search(ds: "ray.data.Dataset", terms: list[str], *,
                       text_col: str = "text", id_col: str = "doc_id",
                       seed: int = 99) -> "ray.data.Dataset":
    """Conjunctive (AND) boolean retrieval: docs containing EVERY query
    term as a standalone word.  Embarrassingly parallel — each doc's text
    lives in one row, so membership of all q terms is a batch-local
    vectorized check (word-hash equality per term, segment-any fold); NO
    shuffle, no inverted index needed for the streaming-scan form.  (The
    index-backed form for repeated queries is ``doc_term_frequencies``
    semi-joined on the term set — same contract, amortized cost.)

    Output: (id_col) of matching docs.  The hash probe is a PRE-FILTER;
    survivors are re-verified against the LITERAL term strings (filter-
    then-verify, the Bloom-semi-join composition), so a 64-bit word-hash
    collision between a query term and a different vocabulary word cannot
    false-match — the SQL-oracle equivalence is exact, not
    collision-probable.  ``terms`` are lowercased and must be
    tokenizer-normal ([a-z0-9]+) — same guard as ``bm25_scores``, since a
    non-normal term can never equal any tokenized doc word and would
    silently match nothing.
    """
    import re

    terms = [t.lower() for t in terms]
    for t in terms:
        if not t or not all(c.islower() or c.isdigit() for c in t):
            raise ValueError(f"term {t!r} is not tokenizer-normal [a-z0-9]+")
    # unique: a duplicated term would leave its second sorted slot at
    # tf 0 and veto every doc
    q_sorted = np.unique(hash_strings(terms, seed))
    term_set = frozenset(terms)
    split = re.compile(r"[^a-z0-9]+")

    def probe(t: pa.Table) -> pa.Table:
        word_h, lengths = _doc_word_hashes(t, text_col, seed)
        tf = _term_tf(word_h, lengths, q_sorted)
        hit_all = (tf > 0).all(axis=1)
        if hit_all.any():
            # exact verify of the (few) hash-probe survivors: every term
            # must appear LITERALLY as a standalone token
            texts = t.column(text_col).to_pylist()
            for i in np.flatnonzero(hit_all):
                toks = set(split.split((texts[i] or "").lower()))
                if not term_set <= toks:
                    hit_all[i] = False
        return pa.table({id_col: t.column(id_col).filter(
            pa.array(hit_all))})

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)
