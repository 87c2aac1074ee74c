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
