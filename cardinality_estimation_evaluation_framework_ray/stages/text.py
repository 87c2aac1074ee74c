"""Text stages: tokenization + text analysis over the documents table.

The reference has no text layer (its inputs are already integer ids); these
stages adapt raw documents into the engine's canonical tokens schema
``(doc_id, tokens:list<int32>, n_tok, source)`` (BASELINE.json input_hint) and
provide the training-data-pipeline text operators (token counting, quality
scoring, language id, fingerprinting).

Tokenizer contract (kept deliberately SQL-reproducible for the oracle):
lowercase, split on the regex ``[^a-z0-9]+``, drop empties — identical to
DuckDB's ``list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'),
x -> x <> '')``.  Word -> int32 id is a seeded 64-bit string hash truncated to
31 bits; the hash is computed once per DISTINCT word per batch (dictionary
encode first), and a per-actor vocabulary cache makes repeated batches cheap —
the stateful-actor-pool pattern (state built in ``__init__``, reused per
``__call__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash_strings

TOKEN_PATTERN = "[^a-z0-9]+"


def _split_lists(texts: pa.ChunkedArray | pa.Array):
    """lowercase + regex split + empty-filter -> (values, row_lengths)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lowered = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(lowered, TOKEN_PATTERN)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lengths = np.diff(np.asarray(lists.offsets))
    values = lists.flatten()
    keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(lengths)), lengths)
    kept_rows = row_idx[keep]
    new_lengths = np.bincount(kept_rows, minlength=len(lengths))
    return values.filter(pa.array(keep)), new_lengths


class Tokenizer:
    """Stateful map_batches callable: documents batch -> tokens batch."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 source_col: str = "source", seed: int = 97):
        self.text_col = text_col
        self.id_col = id_col
        self.source_col = source_col
        self.seed = seed
        self._vocab: dict[str, int] = {}  # word -> int32 id cache (per actor)

    def _word_ids(self, words: list[str]) -> np.ndarray:
        missing = [w for w in words if w not in self._vocab]
        if missing:
            ids = (hash_strings(missing, self.seed) & np.uint64(0x7FFFFFFF)).astype(np.int32)
            self._vocab.update(zip(missing, ids.tolist()))
        return np.fromiter((self._vocab[w] for w in words), dtype=np.int32, count=len(words))

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, lengths = _split_lists(batch.column(self.text_col))
        dict_arr = values.dictionary_encode()
        codes = np.asarray(dict_arr.indices) if len(dict_arr) else np.empty(0, np.int64)
        vocab_ids = self._word_ids(dict_arr.dictionary.to_pylist())
        toks = vocab_ids[codes] if len(codes) else np.empty(0, np.int32)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        tok_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(toks, type=pa.int32()))
        doc_id = pc.cast(batch.column(self.id_col), pa.string())
        return pa.table({
            "doc_id": doc_id,
            "tokens": tok_arr,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": batch.column(self.source_col),
        })


def tokenize_documents(ds: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id", source_col: str = "source",
                       seed: int = 97, concurrency=None) -> "ray.data.Dataset":
    ds = ds.select_columns([id_col, text_col, source_col])
    if concurrency is not None:
        # actor-pool mode: vocab cache built once per actor, reused per batch
        return ds.map_batches(
            Tokenizer,
            fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                       source_col=source_col, seed=seed),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return ds.map_batches(
        Tokenizer(text_col, id_col, source_col, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# text analysis operators (training-data-pipeline additions)
# ---------------------------------------------------------------------------

def quality_stats(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc quality signals: word/char counts, punctuation count, mean word
    length, uppercase ratio.  Pure Arrow kernels; SQL-reproducible."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        values, lengths = _split_lists(texts)
        word_chars = pc.utf8_length(values).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        # clip starts for zero-length rows (reduceat rejects start == len)
        safe_starts = np.minimum(starts, max(len(word_chars) - 1, 0))
        sum_word_chars = (np.add.reduceat(word_chars, safe_starts)
                          if len(word_chars) else np.zeros(len(lengths), np.int64))
        sum_word_chars = np.where(lengths > 0, sum_word_chars, 0)
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        punct = pc.count_substring_regex(texts, r"[,.!?;:]").to_numpy(zero_copy_only=False)
        upper = pc.count_substring_regex(texts, r"[A-Z]").to_numpy(zero_copy_only=False)
        mean_wl = np.where(lengths > 0, sum_word_chars / np.maximum(lengths, 1), 0.0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(lengths.astype(np.int64)),
            "n_chars_text": pa.array(n_chars.astype(np.int64)),
            "n_punct": pa.array(punct.astype(np.int64)),
            "n_upper": pa.array(upper.astype(np.int64)),
            "mean_word_len": pa.array(np.round(mean_wl, 6)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True)


# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "que"},
    "zh": set(),  # CJK detected by codepoint range, not stopwords
}


class LangId:
    """Heuristic language id: CJK codepoint ratio + stopword-profile votes.

    Stateful stage: profiles compiled once per actor.  A real system drops in
    fastText/CLD3 here; the Ray plumbing is identical.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def _classify(self, text: str) -> str:
        if not text:
            return "und"
        cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
        if cjk > 0.05 * min(len(text), 400):
            return "zh"
        words = text.lower().split()[:200]
        best, best_hits = "und", 0
        for lang, prof in self.profiles.items():
            hits = sum(1 for w in words if w in prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs = [self._classify(t) for t in texts]
        return pa.table({self.id_col: batch.column(self.id_col),
                         "lang_pred": pa.array(langs)})


def lang_id(ds: "ray.data.Dataset", text_col: str = "text",
            id_col: str = "doc_id", concurrency=None) -> "ray.data.Dataset":
    ds = ds.select_columns([id_col, text_col])
    if concurrency is not None:
        return ds.map_batches(LangId,
                              fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
                              batch_format="pyarrow", zero_copy_batch=True,
                              concurrency=concurrency)
    return ds.map_batches(LangId(text_col, id_col), batch_format="pyarrow",
                          zero_copy_batch=True)


def doc_fingerprints(ds: "ray.data.Dataset", *, k: int = 5, window: int = 8,
                     seed: int = 71, text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
    rolling k-gram hashes, minimum per sliding window, deduped.

    Output: (doc_id, fingerprint) rows — the index for copy detection."""
    from ..functions.hashing import hash_strings

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out_ids, out_fp = [], []
        for i, t in enumerate(texts):
            t = (t or "").lower()
            if len(t) < k:
                grams = [t]
            else:
                grams = [t[j:j + k] for j in range(len(t) - k + 1)]
            h = hash_strings(grams, seed).astype(np.int64)
            if len(h) >= window:
                # sliding-window minimum via stride trick
                sw = np.lib.stride_tricks.sliding_window_view(h, window)
                mins = sw.min(axis=1)
            else:
                mins = np.array([h.min()])
            fps = np.unique(mins)
            out_ids.append(np.full(len(fps), ids[i]))
            out_fp.append(fps)
        return pa.table({id_col: pa.array(np.concatenate(out_ids).astype(np.int64)),
                         "fingerprint": pa.array(np.concatenate(out_fp))})

    return ds.select_columns([id_col, text_col]).map_batches(
        fp, batch_format="pyarrow", zero_copy_batch=True)


def token_counts(ds: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """(doc_id, n_tok): whitespace+punct tokenization count per doc."""

    def count(batch: pa.Table) -> pa.Table:
        _, lengths = _split_lists(batch.column(text_col))
        return pa.table({id_col: batch.column(id_col),
                         "n_tok": pa.array(lengths.astype(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        count, batch_format="pyarrow", zero_copy_batch=True)
