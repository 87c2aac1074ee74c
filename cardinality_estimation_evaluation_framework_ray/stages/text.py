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

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash_strings
from ..functions.rounding import micro_round
from ..functions.segments import segment_sums

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
        sum_word_chars = segment_sums(word_chars.astype(np.int64), lengths)
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
            "mean_word_len": pa.array(micro_round(mean_wl)),
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

    Fully vectorized (no per-row Python): CJK ratio via one Arrow regex count
    over the first 400 codepoints; stopword votes looked up once per DISTINCT
    word (dictionary-encode) and summed per doc with ``np.add.reduceat``.
    Deterministic contract, mirrored 1:1 by the lang_id_counts SQL oracle:
    tokens = whitespace-split of lower(text), empties dropped, first 200;
    lang = 'zh' if cjk_count > 0.05*min(len,400), else argmax of profile hits
    in the fixed order en,de,fr,es (ties -> earlier), 'und' if zero hits.
    """

    #: vote order = tie-break order
    LANGS = ("en", "de", "fr", "es")
    HEAD = 400       # codepoints scanned for CJK
    MAX_WORDS = 200  # words voted per doc

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        n_docs = len(texts)

        head = pc.utf8_slice_codeunits(texts, 0, self.HEAD)
        cjk = pc.count_substring_regex(head, "[一-鿿]").to_numpy(zero_copy_only=False)
        tlen = np.minimum(
            pc.utf8_length(texts).to_numpy(zero_copy_only=False), self.HEAD)
        is_zh = cjk > 0.05 * tlen

        # whitespace-split words, empties dropped (mirrors str.split())
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lengths = np.diff(np.asarray(lists.offsets))
        values = lists.flatten()
        keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
        kept_vals = values.filter(pa.array(keep))
        kept_rows = np.repeat(np.arange(n_docs), lengths)[keep]
        new_lengths = np.bincount(kept_rows, minlength=n_docs)

        hits = np.zeros((n_docs, len(self.LANGS)), dtype=np.int64)
        total = len(kept_vals)
        if total:
            d = kept_vals.dictionary_encode()
            codes = np.asarray(d.indices)
            vocab = d.dictionary.to_pylist()
            vote_mat = np.zeros((len(vocab), len(self.LANGS)), dtype=np.int64)
            for j, lang in enumerate(self.LANGS):
                prof = self.profiles[lang]
                vote_mat[:, j] = np.fromiter(
                    (w in prof for w in vocab), dtype=np.int64, count=len(vocab))
            token_votes = vote_mat[codes]
            starts = np.concatenate([[0], np.cumsum(new_lengths)[:-1]]).astype(np.int64)
            within = np.arange(total) - np.repeat(starts, new_lengths)
            token_votes[within >= self.MAX_WORDS] = 0
            hits = segment_sums(token_votes, new_lengths)

        best = np.asarray(self.LANGS, dtype=object)[np.argmax(hits, axis=1)]
        langs = np.where(is_zh, "zh",
                         np.where(hits.max(axis=1) > 0, best, "und"))
        return pa.table({self.id_col: batch.column(self.id_col),
                         "lang_pred": pa.array(langs.tolist(), type=pa.string())})


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

    Output: (doc_id, fingerprint) rows — the index for copy detection.

    Whole-batch vectorized: the batch's texts are concatenated into one
    codepoint array, k-gram rolling hashes come from the same boundary-aware
    accumulation as MinHash shingling (one pass, no per-doc loop), window
    minima from a single ``sliding_window_view`` with boundary-crossing
    windows dropped, and per-doc dedup from one lexsort."""
    from ..functions.hashing import seed_offset, _mix
    from ..stages.dedup import _shingle_hashes

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.utf8_lower(pc.fill_null(texts, ""))
        lengths = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(lengths)
        empty = pa.table({id_col: ids.slice(0, 0),
                          "fingerprint": pa.array([], pa.int64())})
        if n_docs == 0:
            return empty
        joined = "".join(texts.to_pylist())
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        with np.errstate(over="ignore"):
            char_h = _mix(cps + seed_offset(seed))
        # k-gram rolling hashes; docs shorter than k -> single whole-doc hash
        grams, counts = _shingle_hashes(char_h, lengths, k)
        G = len(grams)
        g_off = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        doc_parts, val_parts = [], []
        big = counts >= window
        if G >= window and big.any():
            w_mins = np.lib.stride_tricks.sliding_window_view(grams, window).min(axis=1)
            bi = np.flatnonzero(big)
            wc = counts[bi] - window + 1
            within = np.arange(int(wc.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(wc)[:-1]]), wc)
            doc_parts.append(np.repeat(bi, wc))
            val_parts.append(w_mins[np.repeat(g_off[bi], wc) + within])
        small = np.flatnonzero(~big)
        if len(small):
            seg_min = np.minimum.reduceat(grams, g_off)
            doc_parts.append(small)
            val_parts.append(seg_min[small])
        all_doc = np.concatenate(doc_parts)
        all_val = np.concatenate(val_parts)
        # per-doc unique fingerprints via one lexsort
        order = np.lexsort((all_val, all_doc))
        ad, av = all_doc[order], all_val[order]
        first = np.ones(len(ad), dtype=bool)
        first[1:] = (ad[1:] != ad[:-1]) | (av[1:] != av[:-1])
        return pa.table({id_col: ids.take(pa.array(ad[first])),
                         "fingerprint": pa.array(av[first].view(np.int64))})

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


def chunk_documents(ds: "ray.data.Dataset", *, chunk_chars: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """RAG-style overlapping character chunking.

    Each document becomes ``1 + max(0, ceil((len - chunk_chars) / stride))``
    chunks (``stride = chunk_chars - overlap``); chunk ``i`` is
    ``text[i*stride : i*stride + chunk_chars]`` in CHARACTERS (codepoints),
    so the operator has an exact DuckDB ``substr`` oracle.  Every doc emits
    at least one chunk (empty docs emit one empty chunk).

    Output: (id_col, chunk_id:int64 0-based, chunk_text, n_chunk_chars).

    Shape: embarrassingly parallel flat-map.  The inner loop is over CHUNK
    ORDINALS, not rows — iteration ``i`` slices every doc with > i chunks in
    one vectorized ``utf8_slice_codeunits`` kernel call, so per-batch work is
    O(max_chunks_per_doc) Arrow kernels regardless of batch row count.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap

    def chunk(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = t.column(id_col)
        lengths = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        n_chunks = 1 + np.maximum(
            0, -(-(lengths - chunk_chars) // stride)).astype(np.int64)
        pieces = []
        i = 0
        remaining = n_chunks.copy()
        sel = np.arange(len(lengths))
        while len(sel):
            sub_text = text.take(pa.array(sel))
            sliced = pc.utf8_slice_codeunits(
                sub_text, start=i * stride, stop=i * stride + chunk_chars)
            pieces.append(pa.table({
                id_col: ids.take(pa.array(sel)),
                "chunk_id": pa.array(np.full(len(sel), i, np.int64)),
                "chunk_text": sliced,
                "n_chunk_chars": pc.utf8_length(sliced).cast(pa.int64()),
            }))
            i += 1
            sel = sel[remaining[sel] > i]
        if not pieces:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "n_chunk_chars": pa.array([], pa.int64())})
        return pa.concat_tables(pieces)

    return ds.select_columns([id_col, text_col]).map_batches(
        chunk, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(ds: "ray.data.Dataset", *, text_col: str = "text",
                   id_col: str = "doc_id",
                   out_col: str = "norm_text") -> "ray.data.Dataset":
    """Canonical text normalization: lowercase, collapse whitespace runs to
    one space, trim.  Pure Arrow RE2 kernels (zero Python per row), and the
    transform is byte-for-byte the DuckDB expression
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` — oracle-exact.
    Output: (id_col, out_col, n_norm_chars)."""

    def norm(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t.column(text_col))
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim_whitespace(x)
        return pa.table({
            id_col: t.column(id_col),
            out_col: x,
            "n_norm_chars": pc.utf8_length(x).cast(pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True)


def extract_json_int(ds: "ray.data.Dataset", *, col: str, key: str,
                     id_col: str, out_col: str | None = None
                     ) -> "ray.data.Dataset":
    """Pull an integer field out of a flat-JSON string column (the
    semi-structured "props" pattern): ``{"k": 42, ...}`` -> 42.

    Pure Arrow RE2 (``extract_regex``) per batch — no JSON parser in the
    hot path, no Python per row; rows without the key (or with a
    non-numeric value) yield null.  The regex anchors on the quoted key
    (``re.escape``d, so metachar keys like ``a.b`` match literally and
    can't false-match a sibling field) and tolerates JSON whitespace on
    either side of the colon.  Contract: the field must be a JSON
    integer — a float field yields its integer PREFIX (RE2 has no
    lookahead to reject it), unlike ``CAST(json_extract(...))`` which
    rounds; keep the op on integer fields.
    """
    out_col = out_col or key
    pattern = '"' + re.escape(key) + '"\\s*:\\s*(?P<v>-?[0-9]+)'

    def extract(batch: pa.Table) -> pa.Table:
        text = batch.column(col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        m = pc.extract_regex(pc.fill_null(text, ""), pattern)
        vals = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({id_col: batch.column(id_col), out_col: vals})

    return ds.select_columns([id_col, col]).map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True)


def word_entropy(ds: "ray.data.Dataset", *, text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc Shannon entropy (nats) of the word distribution — the
    information-density quality score (low entropy = repetitive/boilerplate,
    complements ``stages/filters.py:repetition_stats``).

    H = ln(T) − (Σ c·ln c)/T over per-doc word counts c (T = doc tokens).
    Embarrassingly parallel: dictionary-encode the batch's flattened words,
    one lexsort per batch gives (doc, word) run lengths, ``bincount`` folds
    Σ c·ln c per doc.  No shuffle; only (doc_id, 2 numbers) leave the task.
    Empty docs emit entropy 0.
    """

    def stats(batch: pa.Table) -> pa.Table:
        values, lengths = _split_lists(batch.column(text_col))
        n_docs = len(lengths)
        codes = np.asarray(values.dictionary_encode().indices,
                           dtype=np.int64)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        order = np.lexsort((codes, doc_idx))
        dd, cc = doc_idx[order], codes[order]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(dd)))  # count per (doc, word)
        run_doc = dd[first]
        clnc = np.bincount(run_doc, weights=runs * np.log(runs),
                           minlength=n_docs)
        tot = lengths.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = np.where(tot > 0, np.log(tot) - clnc / np.maximum(tot, 1),
                           0.0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(lengths.astype(np.int64)),
            "word_entropy": pa.array(np.round(ent, 6)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True)


def zipf_slope_by_group(ds: "ray.data.Dataset", *, group_col: str = "source",
                        text_col: str = "text") -> "pd.DataFrame":
    """Per-group Zipf exponent: OLS slope of ln(word-frequency) on ln(rank)
    over the group's frequency-ranked vocabulary (natural text ≈ −1; a
    corpus-mix drift diagnostic).

    Shape: flatten words → ``groupby(group, word).count()`` (hash-agg with
    combiner — raw tokens never form a group) → per-group ``map_groups``
    sorts its ≤-vocab-size count table by (−count, word) and folds the four
    OLS moments.  The per-task group is ONE GROUP'S VOCABULARY (counts, not
    occurrences): ~10⁵–10⁷ rows even for a web-scale source, the documented
    single-key-fits-a-task assumption.  Rank ties break on the word string,
    matching the SQL ``ORDER BY c DESC, word`` oracle.
    """
    import pandas as pd

    def words(batch: pa.Table) -> pa.Table:
        values, lengths = _split_lists(batch.column(text_col))
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        return pa.table({group_col: pa.array(np.repeat(grp, lengths)),
                         "word": values})

    counts = (ds.select_columns([group_col, text_col])
              .map_batches(words, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby([group_col, "word"]).count())

    def slope(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["count()", "word"],
                          ascending=[False, True], kind="stable")
        c = g["count()"].to_numpy(dtype=np.float64)
        x = np.log(np.arange(1, len(c) + 1, dtype=np.float64))
        y = np.log(c)
        v = float(len(c))
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        den = v * sxx - sx * sx
        val = (v * sxy - sx * sy) / den if den > 0 else 0.0
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "n_distinct_words": [np.int64(len(c))],
                             "zipf_slope": [np.round(val, 6)]})

    out = counts.groupby(group_col).map_groups(
        slope, batch_format="pandas").to_pandas()
    return out.sort_values(group_col).reset_index(drop=True)


def jsd_source_matrix(ds: "ray.data.Dataset", *, group_col: str = "source",
                      text_col: str = "text") -> "pd.DataFrame":
    """Pairwise Jensen-Shannon divergence (nats) between the groups' word
    distributions — the corpus-mix drift matrix (which sources' language
    actually differs, not just which share spans like
    ``stages/filters.py:source_overlap_matrix``).

    Join-based decomposition — no per-word group ever forms: for the shared
    vocabulary the per-word JSD term needs (c_a, c_b) jointly, which is ONE
    self-``hash_join`` of the (group, word, count) table on word (group
    size ≤ #groups per word, bounded); words private to one side contribute
    analytically — ½·ln2·(1 − Σ_shared p) per side — so only shared-word
    rows carry float work.  Totals are a KB broadcast; the pair sums are a
    ≤(#groups²)-row groupby.  Exact formula:
    JSD(P,Q) = ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q)).
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .joins import hash_join

    def words(batch: pa.Table) -> pa.Table:
        values, lengths = _split_lists(batch.column(text_col))
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        return pa.table({group_col: pa.array(np.repeat(grp, lengths)),
                         "word": values})

    counts = (ds.select_columns([group_col, text_col])
              .map_batches(words, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby([group_col, "word"]).count())
    # The (group, word, count) table feeds THREE consumers (totals, join
    # left, join right) and Ray Data re-executes the whole corpus tokenize
    # per consumer on a diamond (SCALE.md) — pin the narrow aggregate once.
    counts = counts.materialize()
    # totals per group: KB-scale, broadcast once
    tot = (counts.groupby(group_col)
           .aggregate(Sum("count()", alias_name="t")).to_pandas())
    t_lut = dict(zip(tot[group_col], tot["t"].astype("float64")))
    t_ref = ray.put(t_lut)

    def rename_b(t: pa.Table) -> pa.Table:
        return t.rename_columns(["gb", "word", "cb"])

    right = counts.map_batches(rename_b, batch_format="pyarrow")
    joined = hash_join(counts, right, on="word")

    def pair_partials(t: pa.Table) -> pa.Table:
        lut = ray.get(t_ref)
        ga = t.column(group_col).to_numpy(zero_copy_only=False)
        gb = t.column("gb").to_numpy(zero_copy_only=False)
        keep = ga < gb  # unordered pairs once
        if not keep.any():
            return pa.table({"ga": pa.array([], pa.string()),
                             "gb": pa.array([], pa.string()),
                             "__jsd": pa.array([], pa.float64()),
                             "__pa": pa.array([], pa.float64()),
                             "__pb": pa.array([], pa.float64())})
        ga, gb = ga[keep], gb[keep]
        ca = t.column("count()").to_numpy(zero_copy_only=False)[keep]
        cb = t.column("cb").to_numpy(zero_copy_only=False)[keep]
        ta = np.array([lut[g] for g in ga])
        tb = np.array([lut[g] for g in gb])
        p, q = ca / ta, cb / tb
        m = p + q
        contrib = 0.5 * (p * np.log(2.0 * p / m) + q * np.log(2.0 * q / m))
        # batch pre-agg: one row per pair
        key = pd.MultiIndex.from_arrays([ga, gb])
        dfp = pd.DataFrame({"__jsd": contrib, "__pa": p, "__pb": q},
                           index=key).groupby(level=[0, 1]).sum()
        return pa.table({
            "ga": pa.array(dfp.index.get_level_values(0)),
            "gb": pa.array(dfp.index.get_level_values(1)),
            "__jsd": pa.array(dfp["__jsd"].to_numpy()),
            "__pa": pa.array(dfp["__pa"].to_numpy()),
            "__pb": pa.array(dfp["__pb"].to_numpy()),
        })

    folded = (joined.map_batches(pair_partials, batch_format="pyarrow")
              .groupby(["ga", "gb"])
              .aggregate(Sum("__jsd", alias_name="s_jsd"),
                         Sum("__pa", alias_name="s_pa"),
                         Sum("__pb", alias_name="s_pb"))
              .to_pandas())
    half_ln2 = 0.5 * np.log(2.0)
    jsd = (folded["s_jsd"].to_numpy()
           + half_ln2 * (1.0 - folded["s_pa"].to_numpy())
           + half_ln2 * (1.0 - folded["s_pb"].to_numpy()))
    out = pd.DataFrame({"source_a": folded["ga"], "source_b": folded["gb"],
                        "jsd": np.round(jsd, 6)})
    # pairs with NO shared vocabulary never appear in the join: JSD = ln 2
    groups = sorted(t_lut)
    allp = pd.DataFrame([(a, b) for i, a in enumerate(groups)
                         for b in groups[i + 1:]],
                        columns=["source_a", "source_b"])
    out = allp.merge(out, on=["source_a", "source_b"], how="left")
    out["jsd"] = out["jsd"].fillna(np.round(np.log(2.0), 6))
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)
