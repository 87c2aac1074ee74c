"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding subword training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") the way
production trainers structure it (e.g. the HuggingFace `tokenizers` BPE
trainer): ONE distributed pass reduces the corpus to a (word, count)
table — everything after that operates on word TYPES weighted by count,
never on the corpus again — then the merge loop runs over that bounded
table, and a distributed actor-pool stage applies the learned merges.

The reference framework has no tokenizer surface at all; this extends the
repo's LLM-pipeline layer (same role as `stages/lm.py`, whose `max_vocab`
top-V bound this module reuses: the driver never holds more than V word
types regardless of corpus size).

Scale shape (100 TB):
  * `word_count_table` is the only stage that touches the corpus: per-batch
    `value_counts` pre-aggregation (map-side combine), one groupby over
    DISTINCT words, per-block local top-V, driver merge of <= #blocks x V
    rows.  At the design point the distinct-word table is ~10^7-10^8 rows
    of ~20 B — a wide-enough shuffle that the sort plan's cells clear the
    inline threshold; the top-V cap bounds the driver.
  * `train_bpe` is DRIVER-side over <= max_vocab word types — the same
    deliberate bound as the bigram LM (`stages/lm.py:54`): BPE's merge loop
    is inherently sequential (merge k+1's counts depend on merge k), so the
    parallel resource is the corpus reduction, not the loop.  Pair counts
    are recomputed per merge (O(V x avg_word_len)); fine for the
    tokenizer-sized V x num_merges this is for.
  * `bpe_encode_stats` re-streams the corpus with the merge ranks broadcast
    once per actor; each batch encodes its DISTINCT words only (types, not
    tokens) and maps lengths back through inverse indices.

Correctness: the merge loop is iterative state (not SQL-expressible), so
its queries are rows-only at the driver gate; exactness is pinned by
`tests/test_bpe.py` equality against an independent readable reference
implementation, determinism (count desc, pair lexicographic asc
tie-break), and partition invariance of the corpus reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.rounding import micro_round
from .text import _split_lists

__all__ = ["word_count_table", "train_bpe", "bpe_encode_stats",
           "encode_word"]


def word_count_table(ds: "ray.data.Dataset", *, text_col: str = "text",
                     max_vocab: int = 100_000) -> pd.DataFrame:
    """Top-``max_vocab`` (word, count) types by corpus frequency.

    Repo tokenizer contract (lowercase, split ``[^a-z0-9]+``, drop
    empties).  Distributed partial top-V exactly as
    ``stages/lm.py:_top_vocab``, but over LITERAL words (the merge loop
    needs characters, not hashes).  Ties broken by word ascending, so the
    result — and everything trained from it — is deterministic.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        values, _ = _split_lists(batch.column(text_col))
        vc = values.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts")})

    counts = (ds.select_columns([text_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("word").aggregate(Sum("n", alias_name="n")))

    def local_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["n", "word"], ascending=[False, True],
                            kind="stable")
        return pa.Table.from_pandas(df.head(max_vocab),
                                    preserve_index=False)

    tops = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    if tops.empty:
        # all-empty corpus: to_pandas() on an all-empty Dataset drops the
        # columns (the Ray quirk tests/test_filters.py documents) — return
        # the contract schema explicitly so train_bpe gets its documented
        # empty-input behavior (no merges)
        return pd.DataFrame({"word": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    tops = tops.sort_values(["n", "word"], ascending=[False, True],
                            kind="stable").head(max_vocab)
    return tops.reset_index(drop=True).astype({"n": "int64"})


def _pair_counts(symbol_lists: list[tuple[str, ...]],
                 weights: np.ndarray) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, w in zip(symbol_lists, weights):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + int(w)
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]
                ) -> tuple[str, ...]:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(word_counts: pd.DataFrame, *,
              num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from a (word, n) type table.

    Classic Sennrich training: every word starts as its character
    sequence; each round merges the most frequent adjacent symbol pair
    (weighted by word count) everywhere at once.  Deterministic tie-break:
    count desc, then pair lexicographic asc.  Stops early when no pair
    occurs twice — a merge with count 1 generalizes to nothing.

    Driver-side by design over the <= max_vocab types from
    ``word_count_table`` (module docstring: the loop is sequential; the
    corpus-sized work already happened).
    """
    words = [tuple(w) for w in word_counts["word"].tolist()]
    weights = word_counts["n"].to_numpy()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(words, weights)
        if not counts:
            break
        top = max(counts.values())
        if top < 2:
            break
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        words = [_merge_word(w, best) if len(w) > 1 else w for w in words]
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> tuple[str, ...]:
    """Encode ONE word with learned merges: repeatedly apply the
    lowest-rank applicable merge (exactly how trained merges replay)."""
    syms: tuple[str, ...] = tuple(word)
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        syms = _merge_word(syms, best)
    return syms


def bpe_encode_stats(ds: "ray.data.Dataset",
                     merges: list[tuple[str, str]], *,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc token statistics under the learned merges:
    (doc_id, n_words, n_tokens, compression) where compression =
    n_chars_of_words / n_tokens rounded to 6 dp.

    Actor-pool stage: merge ranks build ONCE per actor in ``__init__``;
    each batch encodes only its DISTINCT words (per-type cost, not
    per-token) and maps token counts back through the inverse index —
    the standard type/token split that makes encoding cheap on natural
    corpora where types << tokens.
    """

    class Encoder:
        def __init__(self):
            self.ranks = {p: i for i, p in enumerate(merges)}
            self.cache: dict[str, int] = {}

        def _tok_len(self, w: str) -> int:
            n = self.cache.get(w)
            if n is None:
                n = len(encode_word(w, self.ranks))
                self.cache[w] = n
            return n

        def __call__(self, batch: pa.Table) -> pa.Table:
            values, lengths = _split_lists(batch.column(text_col))
            words = values.to_pylist()
            uniq, inv = np.unique(np.asarray(words, dtype=object),
                                  return_inverse=True)
            tok_per_type = np.array([self._tok_len(w) for w in uniq],
                                    dtype=np.int64)
            chr_per_type = np.array([len(w) for w in uniq], dtype=np.int64)
            doc_of = np.repeat(np.arange(len(lengths)), lengths)
            n_tokens = np.bincount(doc_of, weights=tok_per_type[inv],
                                   minlength=len(lengths)).astype(np.int64)
            n_chars = np.bincount(doc_of, weights=chr_per_type[inv],
                                  minlength=len(lengths)).astype(np.int64)
            comp = np.divide(n_chars, n_tokens,
                             out=np.zeros(len(lengths), dtype=np.float64),
                             where=n_tokens > 0)
            return pa.table({
                id_col: batch.column(id_col),
                "n_words": pa.array(lengths.astype(np.int64)),
                "n_tokens": pa.array(n_tokens),
                "compression": pa.array(micro_round(comp)),
            })

    return ds.select_columns([id_col, text_col]).map_batches(
        Encoder, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8))
