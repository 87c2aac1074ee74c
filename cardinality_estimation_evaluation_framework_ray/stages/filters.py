"""Corpus-filter stages: benchmark decontamination, repetition quality
scores, PII scrubbing.

Training-data-pipeline operators beyond the reference's scope (the reference
evaluates sketches over id sets; a production corpus pipeline also has to
REMOVE data: held-out-benchmark contamination, pathological repetition, and
personally identifying strings).

All three keep the tokenizer's SQL-reproducible word contract
(``stages/text.py``: lowercase, split ``[^a-z0-9]+``, drop empties) so each
operator has an exact DuckDB oracle.  Word n-grams are ``n`` consecutive
words joined by a single space; a doc with fewer than ``n`` words yields ONE
gram = all its words joined (mirrors ``_shingle_hashes``'s short-doc fold).

Scale notes (100 TB design point):
  * ``decontaminate`` is a broadcast semi-join: the benchmark side (test
    sets, by contract MBs not TBs) is reduced to a sorted unique gram-hash
    array, ``ray.put`` ONCE, and every task runs a binary-search membership
    probe — the corpus never shuffles;
  * ``repetition_stats`` is embarrassingly parallel (per-doc reduction
    inside ``map_batches``, no wide op at all);
  * ``scrub_pii`` is a pure Arrow compute stage (RE2 kernels, zero-copy).

Gram identity is hash-based (mixed 64-bit FNV over word hashes,
``stages/dedup.py::_shingle_hashes``); a collision across 2^64 would flag a
clean doc, which the oracle gate would catch — same digest contract as
``minhash_exact_dups``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.rounding import micro_round
from ..functions.segments import segment_sums
from .dedup import _doc_word_hashes, _shingle_hashes

__all__ = ["benchmark_gram_hashes", "decontaminate", "fuzzy_decontaminate",
           "repetition_stats",
           "cross_doc_dup_stats",
           "scrub_pii", "PII_PATTERNS", "quantile_threshold_filter",
           "build_top_vocab", "oov_rate", "source_overlap_matrix",
           "build_bloom_membership", "filter_by_bloom"]


def _doc_gram_hashes(batch: pa.Table, text_col: str, n: int, seed: int):
    """(gram-hash values, per-doc gram counts) for a documents batch."""
    word_h, lengths = _doc_word_hashes(batch, text_col, seed)
    return _shingle_hashes(word_h, lengths, n)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def benchmark_gram_hashes(benchmark: "ray.data.Dataset", *, n: int = 8,
                          seed: int = 101,
                          text_col: str = "text") -> np.ndarray:
    """Sorted unique n-gram hashes of the (small) benchmark set.

    The benchmark is map-reduced distributedly (per-batch unique inside
    ``map_batches``), and only the DEDUPED gram hashes come back to the
    driver — memory is bounded by the benchmark's distinct-gram count (test
    sets are MBs by contract), never by the corpus.
    """

    def grams(batch: pa.Table) -> pa.Table:
        g, _ = _doc_gram_hashes(batch, text_col, n, seed)
        return pa.table({"gram": pa.array(np.unique(g).view(np.int64))})

    parts = benchmark.select_columns([text_col]).map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True)
    arrs = [b.column("gram").to_numpy(zero_copy_only=False)
            for b in parts.iter_batches(batch_format="pyarrow")]
    if not arrs:
        return np.empty(0, dtype=np.uint64)
    # dedup + sort in UINT64 space: an int64-space unique would leave hashes
    # >= 2^63 (negative as int64) at the FRONT, breaking searchsorted callers
    return np.unique(np.concatenate(arrs).astype(np.int64).view(np.uint64))


def decontaminate(ds: "ray.data.Dataset", benchmark: "ray.data.Dataset", *,
                  n: int = 8, seed: int = 101, text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    """Flag corpus docs sharing any word n-gram with a benchmark set.

    Output: (doc_id, n_grams, n_contaminated, contaminated) — callers filter
    ``contaminated == False`` to drop leakage before training.

    Broadcast semi-join: the benchmark's sorted unique gram hashes are
    ``ray.put`` once; each task probes membership with ``searchsorted``
    (binary search per gram, no shuffle of the corpus).
    """
    bench = benchmark_gram_hashes(benchmark, n=n, seed=seed,
                                  text_col=text_col)  # sorted uint64
    bench_ref = ray.put(bench)

    def probe(batch: pa.Table) -> pa.Table:
        ref = ray.get(bench_ref)
        g, counts = _doc_gram_hashes(batch, text_col, n, seed)
        if len(ref):
            pos = np.searchsorted(ref, g)
            hit = (pos < len(ref)) & (ref[np.minimum(pos, len(ref) - 1)] == g)
        else:
            hit = np.zeros(len(g), dtype=bool)
        n_cont = segment_sums(hit.astype(np.int64), counts)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(counts.astype(np.int64)),
            "n_contaminated": pa.array(n_cont),
            "contaminated": pa.array(n_cont > 0),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)


def fuzzy_decontaminate(ds: "ray.data.Dataset",
                        benchmark: "ray.data.Dataset", *,
                        n: int = 2, threshold: float = 0.5, seed: int = 101,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_id_col: str = "doc_id",
                        max_bench_postings: int = 50_000_000,
                        expand_chunk: int = 4_000_000
                        ) -> "ray.data.Dataset":
    """NEAR-duplicate benchmark contamination: corpus docs whose word
    n-gram SET has Jaccard >= ``threshold`` against any benchmark doc
    (Brown et al. 2020 GPT-3 appendix C / Touvron et al. 2023 use fuzzy
    overlap, not exact membership, because paraphrased eval items share
    most-but-not-all grams with their source).

    Output: one row per contaminated (corpus doc, bench doc) pair —
    (doc_id, bench_id, n_common, jaccard) with jaccard rounded to 6 dp
    (same contract as ``ngram_jaccard_pairs``).  Callers drop
    ``SELECT DISTINCT doc_id`` from the result before training.

    EXACT by construction, not LSH-probable: the benchmark's gram->doc
    inverted index is broadcast (``ray.put`` once), and every corpus doc's
    intersection with every CANDIDATE bench doc (one sharing >= 1 gram) is
    counted in full — a pair below any-gram overlap has Jaccard 0 and can
    never pass a positive threshold, so recall is 1.0 and the SQL oracle
    match is unconditional (up to 64-bit gram-hash collisions, the
    ``minhash_exact_dups`` digest caveat).

    100-TB shape: the corpus STREAMS (no shuffle, no corpus-side state);
    the benchmark is the small side by contract (test sets are MBs).  The
    broadcast index is O(benchmark postings) — guarded loudly by
    ``max_bench_postings``; for big-big near-dup joins use
    ``ngram_jaccard_pairs`` / ``minhash_near_dups`` over the union instead.
    The per-batch probe is fully vectorized: one ``searchsorted`` per batch
    for gram membership, ``np.repeat`` posting expansion, and ``np.unique``
    over (doc, bench) pair keys for intersection counts — no per-row loop.
    The expansion is processed in slices of <= ``expand_chunk`` expanded
    rows (a stop-word gram shared by most bench AND corpus docs can expand
    to batch_docs x n_bench rows — far past the index-size guard), so task
    temporaries stay ~``8 x expand_chunk`` bytes; only the DEDUPED
    per-chunk (pair, count) rows accumulate, bounded by true candidate-pair
    density.
    """
    # ---- build the broadcast index from the (small) benchmark ----------
    def bench_pairs(batch: pa.Table) -> pa.Table:
        g, counts = _doc_gram_hashes(batch, text_col, n, seed)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        key = np.stack([doc_of, g.astype(np.int64)], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        ids = batch.column(bench_id_col).to_numpy(zero_copy_only=False)
        return pa.table({"bench_id": pa.array(ids[doc_of[first]]),
                         "gram": pa.array(g.astype(np.int64)[first])})

    parts = benchmark.select_columns([bench_id_col, text_col]).map_batches(
        bench_pairs, batch_format="pyarrow", zero_copy_batch=True)
    tbls = [b for b in parts.iter_batches(batch_format="pyarrow")]
    pairs_tbl = (pa.concat_tables(tbls) if tbls
                 else pa.table({"bench_id": pa.array([], pa.int64()),
                                "gram": pa.array([], pa.int64())}))
    if pairs_tbl.num_rows > max_bench_postings:
        raise ValueError(
            f"benchmark has {pairs_tbl.num_rows} (doc, gram) postings > "
            f"max_bench_postings={max_bench_postings}: fuzzy_decontaminate "
            "broadcasts the benchmark index and is for a SMALL benchmark "
            "side; use ngram_jaccard_pairs/minhash_near_dups over the "
            "union for big-big near-dup joins")
    bid = pairs_tbl.column("bench_id").to_numpy(zero_copy_only=False)
    grams = pairs_tbl.column("gram").to_numpy(
        zero_copy_only=False).astype(np.int64).view(np.uint64)
    # bench-doc codes + per-doc set sizes
    bench_ids, bcodes = np.unique(bid, return_inverse=True)
    bench_sizes = np.bincount(bcodes, minlength=len(bench_ids))
    # postings grouped by gram: sorted unique grams + offsets + bench codes
    order = np.argsort(grams, kind="stable")
    g_sorted, b_sorted = grams[order], bcodes[order]
    uniq_grams, starts = np.unique(g_sorted, return_index=True)
    offsets = np.append(starts, len(g_sorted)).astype(np.int64)
    n_bench = len(bench_ids)
    index_ref = ray.put((uniq_grams, offsets, b_sorted.astype(np.int64),
                         bench_ids.astype(np.int64),
                         bench_sizes.astype(np.int64)))

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "bench_id": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})

    def probe(batch: pa.Table) -> pa.Table:
        ug, off, post, b_ids, b_sz = ray.get(index_ref)
        if len(ug) == 0:
            return empty
        g, counts = _doc_gram_hashes(batch, text_col, n, seed)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        # per-doc SET semantics, same dedup as the benchmark side
        key = np.stack([doc_of, g.astype(np.int64)], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        doc_of, g = doc_of[first], g[first].astype(np.int64).view(np.uint64)
        doc_sizes = np.bincount(doc_of, minlength=len(counts))
        pos = np.searchsorted(ug, g)
        pos = np.minimum(pos, len(ug) - 1)
        hit = ug[pos] == g
        if not hit.any():
            return empty
        d_h, p_h = doc_of[hit], pos[hit]
        reps = (off[p_h + 1] - off[p_h]).astype(np.int64)
        # expand posting lists in bounded chunks (each (doc-unique gram,
        # posting) contributes exactly 1 to its pair's intersection);
        # within a chunk the expansion is loop-free: flat index = repeated
        # start + within-list offset (ramp minus segment base)
        csum = np.cumsum(reps)
        keys_parts, cnts_parts = [], []
        start = 0
        while start < len(reps):
            base = int(csum[start - 1]) if start else 0
            stop = int(np.searchsorted(csum, base + expand_chunk,
                                       side="left")) + 1
            stop = min(max(stop, start + 1), len(reps))
            r = reps[start:stop]
            starts_rep = np.repeat(off[p_h[start:stop]], r)
            within = np.arange(int(r.sum())) - np.repeat(
                np.cumsum(r) - r, r)
            pair_key = (np.repeat(d_h[start:stop], r) * n_bench
                        + post[starts_rep + within])
            uk, uc = np.unique(pair_key, return_counts=True)
            keys_parts.append(uk)
            cnts_parts.append(uc)
            start = stop
        all_k = np.concatenate(keys_parts)
        all_c = np.concatenate(cnts_parts)
        uniq_pairs, inv = np.unique(all_k, return_inverse=True)
        inter = np.zeros(len(uniq_pairs), dtype=np.int64)
        np.add.at(inter, inv, all_c)
        pd_idx = (uniq_pairs // n_bench).astype(np.int64)
        pb_idx = (uniq_pairs % n_bench).astype(np.int64)
        union = doc_sizes[pd_idx] + b_sz[pb_idx] - inter
        jac = inter / union
        keep = jac >= threshold
        if not keep.any():
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[pd_idx[keep]].astype(np.int64)),
            "bench_id": pa.array(b_ids[pb_idx[keep]]),
            "n_common": pa.array(inter[keep].astype(np.int64)),
            "jaccard": pa.array(micro_round(jac[keep])),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# within-document repetition (Gopher-style quality rule)
# ---------------------------------------------------------------------------

def repetition_stats(ds: "ray.data.Dataset", *, n: int = 2, seed: int = 101,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc duplicate n-gram fraction (Rae et al. 2021 "Gopher" repetition
    filters): (doc_id, n_grams, n_distinct, dup_frac).

    ``dup_frac = 1 - n_distinct / n_grams`` — high values mean boilerplate /
    looping text.  Embarrassingly parallel: distinct-counting happens inside
    the batch via one sort over the doc-id-prefixed gram array.
    """

    def stats(batch: pa.Table) -> pa.Table:
        g, counts = _doc_gram_hashes(batch, text_col, n, seed)
        n_docs = len(counts)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        order = np.lexsort((g, doc_idx))
        dd, gg = doc_idx[order], g[order]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = (dd[1:] != dd[:-1]) | (gg[1:] != gg[:-1])
        n_distinct = np.bincount(dd[first], minlength=n_docs).astype(np.int64)
        total = counts.astype(np.int64)
        dup = 1.0 - n_distinct / np.maximum(total, 1)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(total),
            "n_distinct": pa.array(n_distinct),
            "dup_frac": pa.array(micro_round(dup)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# cross-document duplicated-span diagnostics (Lee et al. 2022 shape)
# ---------------------------------------------------------------------------

def cross_doc_dup_stats(ds: "ray.data.Dataset", *, n: int = 3,
                        seed: int = 101, text_col: str = "text",
                        id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-doc fraction of its DISTINCT word n-grams that also occur in at
    least one OTHER document — the corpus-level duplicated-span diagnostic
    of "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022), complementing ``repetition_stats`` (within-doc).

    Output: (doc_id, n_distinct_grams, n_dup_grams, dup_frac).

    Scale shape — ALL aggregates, nothing ever materializes a gram group:
    a gram is cross-doc-duplicated iff its doc-frequency df >= 2, so
    ``n_dup = n_distinct - #grams UNIQUE to the doc``, and uniqueness is an
    aggregate: ``groupby(gram).agg(Count, Min(doc_id))`` — for df == 1
    groups the min IS the owning doc.  Hot grams (df ~ #docs) collapse in
    the hash-agg combiner instead of forming a giant cogroup; only 16-byte
    (gram-hash, doc_id) pairs ever shuffle, never text.
    """
    from ray.data.aggregate import Count, Min, Sum

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        g, counts = _doc_gram_hashes(batch, text_col, n, seed)
        doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        order = np.lexsort((g, doc_idx))
        dd, gg = doc_idx[order], g[order]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = (dd[1:] != dd[:-1]) | (gg[1:] != gg[:-1])
        return pa.table({
            "gram": pa.array(gg[first].astype(np.int64)),
            id_col: pa.array(doc_ids[dd[first]]),
        })

    def totals(batch: pa.Table) -> pa.Table:
        g, counts = _doc_gram_hashes(batch, text_col, n, seed)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        order = np.lexsort((g, doc_idx))
        dd, gg = doc_idx[order], g[order]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = (dd[1:] != dd[:-1]) | (gg[1:] != gg[:-1])
        n_distinct = np.bincount(dd[first],
                                 minlength=len(counts)).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "__tot": pa.array(n_distinct),
            "__uniq": pa.array(np.zeros(len(counts), dtype=np.int64)),
        })

    docs = ds.select_columns([id_col, text_col])
    pairs = docs.map_batches(distinct_pairs, batch_format="pyarrow",
                             zero_copy_batch=True)
    per_gram = pairs.groupby("gram").aggregate(
        Count(alias_name="__df"), Min(id_col, alias_name="__owner"))

    def owner_rows(t: pa.Table) -> pa.Table:
        df = t.column("__df").to_numpy(zero_copy_only=False)
        own = t.column("__owner").to_numpy(zero_copy_only=False)
        sel = df == 1
        # batch pre-agg: one (owner, count) row per distinct owner
        uk, cnt = np.unique(own[sel], return_counts=True)
        return pa.table({id_col: pa.array(uk.astype(np.int64)),
                         "__tot": pa.array(np.zeros(len(uk), np.int64)),
                         "__uniq": pa.array(cnt.astype(np.int64))})

    uniq = per_gram.map_batches(owner_rows, batch_format="pyarrow")
    folded = (docs.map_batches(totals, batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(uniq)
              .groupby(id_col)
              .aggregate(Sum("__tot", alias_name="n_distinct_grams"),
                         Sum("__uniq", alias_name="n_uniq")))

    def finish(t: pa.Table) -> pa.Table:
        tot = t.column("n_distinct_grams").to_numpy(zero_copy_only=False)
        tot = tot.astype(np.int64)
        uq = t.column("n_uniq").to_numpy(zero_copy_only=False).astype(np.int64)
        dup = tot - uq
        # integer micro-units, not ROUND(x, 6): small rationals like 1/128
        # land exactly on a .5 at the 7th decimal, where np.round
        # (half-even) and SQL ROUND (half-away) disagree
        micros = np.floor(dup * 1_000_000 / np.maximum(tot, 1) + 0.5)
        return pa.table({id_col: t.column(id_col),
                         "n_distinct_grams": pa.array(tot),
                         "n_dup_grams": pa.array(dup),
                         "dup_frac_micros": pa.array(micros.astype(np.int64))})

    return folded.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# RE2 syntax only (both Arrow and DuckDB compile these with RE2, so the
# engine and the SQL oracle redact identically).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]"),
)


def scrub_pii(ds: "ray.data.Dataset", *, text_col: str = "text",
              id_col: str = "doc_id",
              patterns: tuple[tuple[str, str], ...] = PII_PATTERNS
              ) -> "ray.data.Dataset":
    """Redact PII spans with ``<NAME>`` placeholders, counting matches.

    Output: (doc_id, text [redacted], n_<name> per pattern).  Pure Arrow RE2
    kernels (``count_substring_regex`` + ``replace_substring_regex``) — no
    Python per row, zero-copy in.  Patterns apply in declaration order, each
    over the previous pattern's output (emails are consumed before the phone
    pattern can see their digit runs, deterministically on both sides of the
    oracle).
    """

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        cols: dict = {id_col: batch.column(id_col)}
        counts = {}
        for name, pat in patterns:
            counts[f"n_{name}"] = pc.count_substring_regex(text, pat)
            text = pc.replace_substring_regex(text, pat, f"<{name.upper()}>")
        cols["text"] = text
        for k, v in counts.items():
            cols[k] = pc.cast(v, pa.int64())
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quantile-threshold quality filter
# ---------------------------------------------------------------------------

def quantile_threshold_filter(ds: "ray.data.Dataset", value_col: str,
                              q: float = 0.7, *, mode: str = "exact",
                              keep: str = "top") -> "ray.data.Dataset":
    """Keep rows above (``keep='top'``) or below (``keep='bottom'``) the
    corpus-wide discrete ``q``-quantile of ``value_col`` — the
    percentile-based quality cut every curation pipeline runs ("keep the
    top 30 % by quality score").

    Cutoff = ``percentile_disc(q)`` (smallest value whose cumulative count
    reaches rank ``ceil(n*q)``), computed by
    ``stages/relational.py::quantiles_disc``:

      * ``mode='exact'`` — one groupby over DISTINCT score values (combiner-
        compressed map-side; shuffle payload is distinct values, never rows)
        then a driver cumulative scan.  Exact, SQL-oracle-able; right for
        bounded-cardinality scores.
      * ``mode='kll'`` — one-pass KLL sketch (state KBs, NO shuffle at all):
        the 100-TB path for continuous scores, cutoff exact within KLL rank
        error.

    The filter itself is a stateless Arrow-kernel ``map_batches`` — the
    dataset streams through once more; only the scalar cutoff crosses the
    driver.  Rows where ``value_col`` is null are dropped (no quality
    signal -> no keep decision), matching SQL comparison-with-NULL.
    """
    if keep not in ("top", "bottom"):
        raise ValueError("keep must be 'top' or 'bottom'")
    from .relational import quantiles_disc

    cutoff = float(quantiles_disc(ds, value_col, np.array([q]), mode=mode)[0])

    def flt(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(value_col), pa.float64())
        mask = (pc.greater_equal(v, cutoff) if keep == "top"
                else pc.less_equal(v, cutoff))
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------

def build_top_vocab(ds: "ray.data.Dataset", *, top_k: int = 100,
                    text_col: str = "text") -> np.ndarray:
    """The corpus's ``top_k`` most frequent words (ties -> lexicographically
    smaller word), returned as a SORTED object array for binary-search
    membership probes.

    One word-count groupby (map-side combiner collapses repeats, so the
    shuffle moves distinct (word, count) pairs); only the top-k head —
    bounded by contract, like a real tokenizer vocabulary — reaches the
    driver via ``top_k_by_count``'s two-stage partial top-k.
    """
    from .joins import top_k_by_count
    from .text import _split_lists

    def words(batch: pa.Table) -> pa.Table:
        values, _ = _split_lists(batch.column(text_col))
        return pa.table({"word": values})

    head = top_k_by_count(
        ds.select_columns([text_col]).map_batches(
            words, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], top_k)
    return np.sort(np.asarray(head["word"].tolist(), dtype=object))


def oov_rate(ds: "ray.data.Dataset", vocab: np.ndarray, *,
             text_col: str = "text", id_col: str = "doc_id"
             ) -> "ray.data.Dataset":
    """Per-doc out-of-vocabulary rate against a broadcast ``vocab``
    (sorted word array, e.g. ``build_top_vocab``'s output): the coverage
    stat a training pipeline computes before committing to a tokenizer.

    Output: (doc_id, n_words, oov_rate [round 6]).  Docs with zero words
    are dropped (no denominator), matching the SQL oracle's inner GROUP BY.

    Scale shape: the vocab is ``ray.put`` ONCE and binary-searched per
    batch (``np.searchsorted`` over the distinct words of the batch, then
    gathered through the dictionary codes) — the corpus never shuffles and
    the per-batch work is O(words + distinct·log|V|).
    """
    from .text import _split_lists

    vocab_ref = ray.put(np.asarray(vocab, dtype=object))

    def rate(batch: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        values, lengths = _split_lists(batch.column(text_col))
        n_docs = len(lengths)
        oov = np.zeros(n_docs, np.int64)
        if len(values):
            d = values.dictionary_encode()
            codes = np.asarray(d.indices, dtype=np.int64)
            dwords = np.asarray(d.dictionary.to_pylist(), dtype=object)
            pos = np.searchsorted(voc, dwords)
            pos = np.minimum(pos, max(len(voc) - 1, 0))
            in_vocab = (voc[pos] == dwords) if len(voc) else \
                np.zeros(len(dwords), bool)
            oov_tok = (~in_vocab[codes]).astype(np.int64)
            oov = segment_sums(oov_tok, lengths)
        keep = lengths > 0
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(keep)),
            "n_words": pa.array(lengths[keep].astype(np.int64)),
            "oov_rate": pa.array(
                micro_round(oov[keep] / lengths[keep])),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        rate, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# cross-source n-gram overlap matrix
# ---------------------------------------------------------------------------

def source_overlap_matrix(ds: "ray.data.Dataset", *, n: int = 8,
                          seed: int = 101, text_col: str = "text",
                          key_col: str = "source"):
    """Cross-source duplication diagnostic: for every pair of sources
    (``source_a < source_b``), the number of DISTINCT word ``n``-grams
    present in both — the matrix a curation pipeline inspects before
    deciding which crawl snapshots overlap enough to dedup jointly.

    Gram identity is the same mixed-FNV hash contract as ``decontaminate``
    (a 2^64 collision would over-count one shared gram; the oracle gate
    would catch it).  Docs with fewer than ``n`` words contribute their
    one folded gram, mirroring ``_shingle_hashes``.

    Scale shape (100 TB):
      * map side emits DISTINCT (gram, source) pairs per batch (lexsort +
        boundary mask — no Python per row), so repeats inside a batch never
        enter the shuffle;
      * one groupby over gram hashes; each group holds at most
        ``num_blocks x num_sources`` rows and emits at most
        ``num_sources^2`` pair rows — bounded by the source count, not the
        corpus;
      * the pair-count aggregate output is ``num_sources^2`` rows: driver-
        safe by construction.
    """
    import pandas as pd

    def pairs(batch: pa.Table) -> pa.Table:
        g, counts = _doc_gram_hashes(batch, text_col, n, seed)
        src = batch.column(key_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        codes = np.asarray(d.indices, dtype=np.int64)
        vocab = np.asarray(d.dictionary.to_pylist(), dtype=object)
        gram_src = np.repeat(codes, counts)
        gi = g.view(np.int64)
        order = np.lexsort((gram_src, gi))
        gs, cs = gi[order], gram_src[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = (gs[1:] != gs[:-1]) | (cs[1:] != cs[:-1])
        return pa.table({
            "gram": pa.array(gs[first]),
            key_col: pa.array(vocab[cs[first]].tolist(), type=pa.string()),
        })

    pairs_ds = ds.select_columns([key_col, text_col]).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True)

    def emit(g: pa.Table) -> pa.Table:
        srcs = np.unique(np.asarray(g.column(key_col).to_pylist(),
                                    dtype=object))
        ia, ib = np.triu_indices(len(srcs), k=1)
        return pa.table({
            "source_a": pa.array(srcs[ia].tolist(), type=pa.string()),
            "source_b": pa.array(srcs[ib].tolist(), type=pa.string()),
        })

    out = (pairs_ds.groupby("gram")
           .map_groups(emit, batch_format="pyarrow")
           .groupby(["source_a", "source_b"]).count().to_pandas())
    if out.empty:  # no shared grams at all: keep the schema stable
        return pd.DataFrame({"source_a": pd.Series(dtype=object),
                             "source_b": pd.Series(dtype=object),
                             "shared_grams": pd.Series(dtype="int64")})
    out = out.rename(columns={"count()": "shared_grams"})
    out["shared_grams"] = out["shared_grams"].astype("int64")
    return (out.sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Bloom-broadcast approximate semi-join (sketch-as-filter)
# ---------------------------------------------------------------------------

def build_bloom_membership(keys_ds: "ray.data.Dataset", *, key_col: str,
                           length: int, num_hashes: int = 4,
                           seed: int = 211) -> "object":
    """One streaming pass folds a membership Bloom filter over ``keys_ds``'s
    key column: each block emits ONE bit-PACKED partial (``np.packbits``,
    exactly ceil(length/8) bytes, independent of block size), the driver
    ORs ≤ #blocks packed partials and unpacks once.  Returns the merged
    ``BloomSketch``.

    Size rule: FPR ≈ (1 − e^(−kn/m))^k — for n keys at m = 10n bits and
    k = 4, FPR ≈ 1.2%.  The filter is the 100-TB mechanism for BIG-BIG
    semi-joins whose exact form would shuffle both sides: m/8 bytes
    broadcast once vs an all-to-all of the probe corpus.
    """
    from ..state.bloom import BloomSpec

    spec = BloomSpec(length=length, distribution="uniform",
                     num_hashes=num_hashes, seed=seed)

    def partial(t: pa.Table):
        sk = spec.new()
        sk.update_tokens(t.column(key_col).to_numpy(zero_copy_only=False))
        packed = np.packbits(sk.registers > 0, bitorder="little")
        return {"bits": np.array([packed.tobytes()], dtype=object)}

    packed = np.zeros((length + 7) // 8, dtype=np.uint8)
    for b in (keys_ds.select_columns([key_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .iter_batches(batch_format="pandas")):
        for blob in b["bits"]:
            np.bitwise_or(packed, np.frombuffer(blob, dtype=np.uint8),
                          out=packed)
    merged = spec.new()
    merged.registers[:] = np.unpackbits(
        packed, count=length, bitorder="little")
    return merged


def filter_by_bloom(ds: "ray.data.Dataset", bloom, *, key_col: str,
                    how: str = "semi") -> "ray.data.Dataset":
    """Approximate semi/anti join against a broadcast Bloom filter: keep
    rows whose key is (``semi``) / is not (``anti``) in the filter.

    Guarantees: NO false negatives — ``semi`` keeps every true match
    (plus ~FPR extras); ``anti`` drops every true match (plus ~FPR true
    negatives).  Use ``semi`` + an exact per-key verify on the (much
    smaller) survivor set when exactness is required — the standard
    filter-then-verify plan.  Probe is vectorized: num_hashes hash+gather
    rounds per batch over the bit-packed filter (m/8 bytes broadcast once
    via ``ray.put``), no shuffle, no per-batch sketch allocation.
    """
    from ..functions.hashing import hash64
    from ..state.bloom import register_indexes

    if how not in ("semi", "anti"):
        raise ValueError("how must be 'semi' or 'anti'")
    spec = bloom.spec
    packed_ref = ray.put(np.packbits(bloom.registers > 0,
                                     bitorder="little"))

    def probe(t: pa.Table) -> pa.Table:
        packed = ray.get(packed_ref)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        hit = np.ones(len(keys), dtype=bool)
        for i in range(spec.num_hashes):
            idx = register_indexes(
                spec, hash64(keys, spec.seed + 1000003 * i))
            hit &= ((packed[idx >> 3] >> (idx & 7)) & 1).astype(bool)
        if how == "anti":
            hit = ~hit
        return t.filter(pa.array(hit))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def build_cuckoo_membership(keys_ds: "ray.data.Dataset", *, key_col: str,
                            spec=None, delete_ds: "ray.data.Dataset" = None
                            ) -> "object":
    """Fold a cuckoo filter (`state/cuckoo.py`) over ``keys_ds``'s key
    column — the deletable counterpart of ``build_bloom_membership``:
    each block builds a local filter and emits only its OCCUPIED
    (bucket, fingerprint) pairs (~10 bytes per key, never the full table),
    which the driver re-inserts through partial-key hashing.

    ``delete_ds`` optionally streams a multiset of keys to REMOVE from the
    merged filter (e.g. the revoked / filtered-out subset of the same key
    stream).  Deletion is a driver-side fold (inserts commute with each
    other but not with deletes, so deletes apply AFTER the merge — same
    non-associative-tail pattern as the VoC pairwise ops); the delete
    stream iterates in batches, never materializing.  Every deleted key
    must have been inserted; because copies of a colliding fingerprint are
    fungible WITHIN a bucket pair, matched insert/delete streams can never
    push another key's count to zero — no false negatives, by multiset
    accounting (see the module docstring of ``state/cuckoo.py``).

    Default spec sizes ``log2_buckets`` from the key count for <= ~70%
    load (b=4 kicks stay rare; the paper allows 95%); the key column is
    materialized first so the sizing count and the build pass don't
    execute a lazy upstream pipeline twice (pass ``spec`` explicitly to
    keep the build single-pass streaming).
    """
    from ..state.cuckoo import CuckooFilterSpec

    keys_ds = keys_ds.select_columns([key_col])
    if spec is None:
        keys_ds = keys_ds.materialize()
        n = keys_ds.count()
        log2 = max(4, int(np.ceil(np.log2(max(n, 1) / (4 * 0.7)))))
        spec = CuckooFilterSpec(log2_buckets=log2)

    def partial(t: pa.Table):
        sk = spec.new()
        sk.update_tokens(t.column(key_col).to_numpy(zero_copy_only=False))
        rows, _ = np.nonzero(sk.table)
        fps = sk.table[sk.table != 0]
        return {"idx": np.array([rows.astype(np.int64).tobytes()], dtype=object),
                "fp": np.array([fps.tobytes()], dtype=object)}

    merged = spec.new()
    for b in (keys_ds
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .iter_batches(batch_format="pandas")):
        for idx_b, fp_b in zip(b["idx"], b["fp"]):
            idx = np.frombuffer(idx_b, dtype=np.int64)
            fps = np.frombuffer(fp_b, dtype=np.uint16)
            if len(idx):
                merged._insert_fps(fps, idx, merged._alt_index(idx, fps))
    if delete_ds is not None:
        for b in (delete_ds.select_columns([key_col])
                  .iter_batches(batch_format="pyarrow")):
            merged.delete_tokens(
                b.column(key_col).to_numpy(zero_copy_only=False))
    return merged


def filter_by_cuckoo(ds: "ray.data.Dataset", cf, *, key_col: str,
                     how: str = "semi") -> "ray.data.Dataset":
    """Approximate semi/anti join against a broadcast cuckoo filter —
    ``filter_by_bloom`` with deletion-aware membership: rows survive
    (``semi``) / are dropped (``anti``) when the key's remaining multiset
    count in the filter is > 0.  ``semi`` has NO false negatives (plus
    ~``spec.fpr_bound`` extras) — compose with an exact verify join for
    exactness.  ``anti`` inherits the same asymmetry as ``filter_by_bloom``:
    it drops every true match, PLUS ~FPR genuinely-absent rows that
    collide with stored fingerprints — those rows are unrecoverable
    downstream, so ``anti`` is approximate by nature.  The table
    (2^log2_buckets x bucket_size uint16) is
    ``ray.put`` once; probes are two vectorized gather+compare rounds per
    batch."""
    from ..state.cuckoo import CuckooFilter

    if how not in ("semi", "anti"):
        raise ValueError("how must be 'semi' or 'anti'")
    spec = cf.spec
    table_ref = ray.put(cf.table)

    def probe(t: pa.Table) -> pa.Table:
        # zero-copy read-only view over the plasma-shared table
        view = CuckooFilter.view(spec, ray.get(table_ref))
        hit = view.contains(t.column(key_col).to_numpy(zero_copy_only=False))
        if how == "anti":
            hit = ~hit
        return t.filter(pa.array(hit))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)
