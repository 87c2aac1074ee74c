"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators beyond the reference's scope (the reference
only dedups ids inside ``ExactMultiSet``, ``src/estimators/exact_set.py:56-58``
— here dedup is a first-class distributed stage over documents / tokens).

Scale notes (100 TB design point):
  * every stage dedups map-side within a batch before any shuffle;
  * the only wide ops are groupbys on content-hash / band-bucket keys, whose
    shuffled payload is hashes + ids (not documents);
  * MinHash banding follows Broder (1997) / Leskovec-Rajaraman-Ullman ch.3:
    with ``num_perm`` permutations split into b bands of r rows, a pair with
    Jaccard s collides in >= 1 band w.p. 1-(1-s^r)^b;
  * SimHash follows Charikar (STOC 2002); near-dup candidates via the
    pigeonhole banding of the 64-bit signature into 4 x 16-bit chunks
    (guarantees recall for Hamming distance <= 3).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash64, seed_offset, _mix
from ..functions.rounding import micro_round
from .build import iter_key_tokens
from .text import _split_lists

# per-byte popcount lookup table (module-level: built once per worker process)
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

_SHUFFLE_PLANS = ("sort", "hash", "coalesce")


def _check_shuffle(shuffle: str, narrow_bytes_hint: int | None) -> None:
    """Validate the narrow-groupby shuffle plan args (LOUD contract).

    Plans (measured head-to-head in docs/SCALE_MEM_r05.json; mechanism in
    functions/shuffleopt.py):

    * ``"sort"`` (default) — Ray Data's plan as validated by the oracle
      gate.  UNSAFE for narrow tables at scale: sub-100 KB (map, reduce)
      cells are inlined into the DRIVER's in-process store (unspillable;
      measured 450 MB -> 4.97 GB driver heap at 1.1e9 -> 1.1e10 tokens).
    * ``"coalesce"`` — the scale default: keep the sort shuffle but
      ``repartition(shuffle=False)`` the narrow intermediate to
      ``narrow_shuffle_blocks(narrow_bytes_hint)`` blocks first, making
      every shuffle cell ~1 MB (plasma-backed, spillable).  Requires
      ``narrow_bytes_hint`` ~= rows x bytes/row of the narrow table; an
      order-of-magnitude estimate is fine (cells land 10x over the inline
      threshold).
    * ``"hash"`` — hash-shuffle aggregator actors; driver heap flat but
      ~2x slower end-to-end in Ray 2.49 (per-row aggregator finalize).
    """
    if shuffle not in _SHUFFLE_PLANS:
        raise ValueError(
            f"shuffle must be one of {_SHUFFLE_PLANS}, got {shuffle!r}")
    if shuffle == "coalesce" and not narrow_bytes_hint:
        raise ValueError(
            "shuffle='coalesce' needs narrow_bytes_hint (approx rows x "
            "bytes/row of the narrow shuffled table) to size its blocks — "
            "see functions/shuffleopt.narrow_shuffle_blocks")


def _narrow_plan(narrow: "ray.data.Dataset", shuffle: str,
                 narrow_bytes_hint: int | None):
    """'coalesce' repartitions the NARROW intermediate so sort-shuffle
    cells clear the inline threshold ('hash' is applied to the SOURCE
    lineage by the caller before building).  Returns the dataset to
    group by."""
    if shuffle == "coalesce":
        from ..functions.shuffleopt import narrow_shuffle_blocks

        return narrow.repartition(narrow_shuffle_blocks(narrow_bytes_hint),
                                  shuffle=False)
    return narrow


def exact_distinct_tokens(ds: "ray.data.Dataset", key: str = "source",
                          tokens_col: str = "tokens", *,
                          shuffle: str = "sort",
                          narrow_bytes_hint: int | None = None
                          ) -> "ray.data.Dataset":
    """Distinct (key, token) pairs: hash-partition + per-group first.

    Feeds VectorOfCounts (one-shot contract) and the exact oracle. Map-side
    batch dedup shrinks the shuffle; the groupby is the wide op.

    The (key, token) rows are ~24 B each — a NARROW shuffle; pick the
    ``shuffle`` plan per ``_check_shuffle`` ("coalesce" at scale: the
    default sort plan pins the whole shuffled table in driver heap,
    docs/SCALE_MEM_r05.json).
    """
    _check_shuffle(shuffle, narrow_bytes_hint)
    if shuffle == "hash":
        from ..functions.shuffleopt import use_hash_shuffle

        ds = use_hash_shuffle(ds)

    def batch_dedup(batch: pa.Table) -> pa.Table:
        keys, toks = [], []
        for kv, t in iter_key_tokens(batch, key, tokens_col):
            u = np.unique(t)
            keys.append(np.full(len(u), kv, dtype=object))
            toks.append(u)
        if not keys:
            return pa.table({key: pa.array([], pa.string()),
                             "token": pa.array([], pa.int64())})
        return pa.table({key: pa.array(np.concatenate(keys).tolist()),
                         "token": pa.array(np.concatenate(toks).astype(np.int64))})

    dd = ds.map_batches(batch_dedup, batch_format="pyarrow", zero_copy_batch=True)
    dd = _narrow_plan(dd, shuffle, narrow_bytes_hint)
    out = dd.groupby([key, "token"]).count()
    return out.select_columns([key, "token"])


def dedup_exact_texts(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", seed: int = 1291, *,
                      shuffle: str = "sort",
                      narrow_bytes_hint: int | None = None
                      ) -> "ray.data.Dataset":
    """Exact-content dedup: content-hash -> keep min(id), count copies.

    Output: (kept_doc_id, n_copies).  Only 16-byte hash + id cross the
    shuffle; document bodies never leave the map stage.

    That narrowness is exactly what makes the DEFAULT sort shuffle unsafe
    at scale: sub-100 KB (map, reduce) cells are inlined into the
    driver-owned in-process store and cannot spill (driver RssAnon grew
    450 MB -> 4.97 GB across a 1.1e9 -> 1.1e10-token run,
    docs/SCALE_MEM_r05.json).  At scale pass ``shuffle="coalesce"`` with
    ``narrow_bytes_hint`` ~= n_docs x 16 (see ``_check_shuffle``); kept
    opt-in so small oracle-gated runs keep the plan they were validated
    under.
    """
    _check_shuffle(shuffle, narrow_bytes_hint)
    if shuffle == "hash":
        from ..functions.shuffleopt import use_hash_shuffle

        ds = use_hash_shuffle(ds)
    from ..functions.hashing import hash_strings

    def to_hashes(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = hash_strings(texts, seed).astype(np.int64)
        return pa.table({"content_hash": pa.array(h),
                         id_col: batch.column(id_col)})

    hashed = ds.select_columns([id_col, text_col]).map_batches(
        to_hashes, batch_format="pyarrow", zero_copy_batch=True)
    hashed = _narrow_plan(hashed, shuffle, narrow_bytes_hint)

    def keep_first(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"kept_doc_id": [int(ids.min())],
                         "n_copies": [len(ids)]})

    return hashed.groupby("content_hash").map_groups(keep_first,
                                                     batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# ---------------------------------------------------------------------------

def _doc_word_hashes(batch: pa.Table, text_col: str, seed: int):
    """(word-hash values, per-doc lengths) for a documents batch."""
    values, lengths = _split_lists(batch.column(text_col))
    dict_arr = values.dictionary_encode()
    codes = np.asarray(dict_arr.indices) if len(dict_arr) else np.empty(0, np.int64)
    from ..functions.hashing import hash_strings

    vocab_h = hash_strings(dict_arr.dictionary.to_pylist(), seed) if len(codes) else np.empty(0, np.uint64)
    return (vocab_h[codes] if len(codes) else np.empty(0, np.uint64)), lengths


def _shingle_hashes(word_h: np.ndarray, lengths: np.ndarray, n: int):
    """Rolling n-gram hashes per doc (combined by mixing shifted word hashes).

    Returns (shingle values, per-doc shingle counts); docs shorter than n
    contribute their single full-doc hash so they still get a signature.

    Whole-batch vectorized: ONE FNV-style accumulation over the concatenated
    word-hash array (n-1 shifted vector ops total, no per-doc Python loop);
    grams that would cross a doc boundary are simply never selected, because
    the valid grams of doc i occupy a contiguous prefix of its segment.
    Docs shorter than n fall to a masked fold (< n vector steps).  Values
    and output order are identical to the per-doc formulation.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    counts = np.maximum(lengths - n + 1, 1).astype(np.int64)
    total = int(lengths.sum())
    out = np.empty(int(counts.sum()), dtype=np.uint64)
    if len(lengths) == 0:
        return out, counts
    in_off = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    out_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
    FNV = np.uint64(0x100000001B3)
    word_h = np.ascontiguousarray(word_h, dtype=np.uint64)
    with np.errstate(over="ignore"):
        M = total - n + 1
        long_docs = lengths >= n
        if M > 0 and long_docs.any():
            acc = word_h[0:M].copy()
            for j in range(1, n):
                acc = acc * FNV + word_h[j:j + M]
            acc = _mix(acc)
            li = np.flatnonzero(long_docs)
            c = counts[li]
            within = np.arange(int(c.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(c)[:-1]]), c)
            src = np.repeat(in_off[li], c) + within
            dst = np.repeat(out_off[li], c) + within
            out[dst] = acc[src]
        short = np.flatnonzero(~long_docs)
        if len(short):
            acc_s = np.full(len(short), 0xCBF29CE484222325, dtype=np.uint64)
            Ls = lengths[short]
            for j in range(int(Ls.max()) if len(Ls) else 0):
                m = Ls > j
                acc_s[m] = acc_s[m] * FNV + word_h[in_off[short[m]] + j]
            out[out_off[short]] = _mix(acc_s)
    return out, counts


class MinHashSignatures:
    """Actor-pool map_batches stage: documents -> MinHash signatures.

    Permutation seeds are derived once per actor in __init__ (stateful-stage
    pattern); per batch everything is vectorized: one mix per permutation +
    segmented minimum (np.minimum.reduceat) over doc boundaries.
    """

    def __init__(self, num_perm: int = 64, shingle: int = 3, seed: int = 77,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.num_perm = num_perm
        self.shingle = shingle
        self.seed = seed
        self.text_col = text_col
        self.id_col = id_col
        self.offsets = np.array([seed_offset(seed + 31 * j) for j in range(num_perm)],
                                dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        word_h, lengths = _doc_word_hashes(batch, self.text_col, self.seed)
        sh, counts = _shingle_hashes(word_h, lengths, self.shingle)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        sigs = np.empty((len(counts), self.num_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.num_perm):
                hj = _mix(sh + self.offsets[j])
                sigs[:, j] = np.minimum.reduceat(hj, starts) if len(sh) else 0
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64)), self.num_perm)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "minhash": sig_list})


def minhash_near_dups(ds: "ray.data.Dataset", *, num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.7,
                      shingle: int = 3, seed: int = 77,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket_size: int | None = 2000,
                      concurrency=None) -> "ray.data.Dataset":
    """Near-duplicate pairs (doc_a, doc_b, est_jaccard >= threshold).

    documents -> signatures -> per-band bucket keys -> groupby bucket ->
    in-bucket signature comparison -> distinct pairs.  The shuffle payload is
    (bucket key, id, signature); signatures are num_perm*8 bytes.

    ``max_bucket_size`` bounds the O(|bucket|^2) in-bucket comparison: a
    bucket larger than this is a degenerate near-identical cluster (or a
    pathological band); instead of all-pairs it emits star edges against the
    min-id representative PLUS chain edges between consecutive id-sorted
    members — O(n) output that keeps the bucket connected for clustering.
    Recall trade-off (documented, not silent): a member whose similarity to
    both the representative and its chain neighbours is below ``threshold``
    loses linkage within this bucket even if it is near some other member;
    components reported through ``dedup_clusters`` stay intact because star +
    chain keep one surviving edge per genuinely-similar member in practice.
    ``None`` disables the guard (exact all-pairs regardless of bucket size).
    """
    assert num_perm % bands == 0
    rows = num_perm // bands

    sig_kwargs = dict(num_perm=num_perm, shingle=shingle, seed=seed,
                      text_col=text_col, id_col=id_col)
    if concurrency is not None:
        sigs = ds.map_batches(MinHashSignatures, fn_constructor_kwargs=sig_kwargs,
                              batch_format="pyarrow", zero_copy_batch=True,
                              concurrency=concurrency)
    else:
        sigs = ds.map_batches(MinHashSignatures(**sig_kwargs),
                              batch_format="pyarrow", zero_copy_batch=True)

    def to_buckets(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.asarray(batch.column("minhash").combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)).reshape(n, num_perm).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_bucket = np.empty(n * bands, dtype=np.int64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                band = sig[:, b * rows:(b + 1) * rows]
                acc = np.full(n, seed_offset(seed + 7777 * b), dtype=np.uint64)
                for r in range(rows):
                    acc = _mix(acc + band[:, r])
                out_bucket[b::bands] = (acc >> np.uint64(1)).astype(np.int64)
        rep_ids = np.repeat(ids, bands)
        rep_sig = np.repeat(sig, bands, axis=0)
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(rep_sig.reshape(-1).astype(np.int64)), num_perm)
        return pa.table({"bucket": pa.array(out_bucket), id_col: pa.array(rep_ids),
                         "minhash": sig_list})

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def pairs_in_bucket(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        sig = np.asarray(tbl.column("minhash").combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)).reshape(n, num_perm)
        order = np.argsort(ids, kind="stable")
        ids, sig = ids[order], sig[order]
        if max_bucket_size is not None and n > max_bucket_size:
            # hot bucket: star (min-id rep) + chain edges, O(n) not O(n^2);
            # the (0, 1) pair appears in both -> drop the duplicate chain edge
            a_idx = np.concatenate([np.zeros(n - 1, dtype=np.int64),
                                    np.arange(1, n - 1, dtype=np.int64)])
            b_idx = np.concatenate([np.arange(1, n, dtype=np.int64),
                                    np.arange(2, n, dtype=np.int64)])
        else:
            a_idx, b_idx = np.triu_indices(n, k=1)
        est = (sig[a_idx] == sig[b_idx]).mean(axis=1)
        keep = est >= threshold
        # drop same-id self pairs that appear when a doc lands twice in a bucket
        keep &= ids[a_idx] != ids[b_idx]
        return pa.table({"doc_a": pa.array(ids[a_idx][keep].astype(np.int64)),
                         "doc_b": pa.array(ids[b_idx][keep].astype(np.int64)),
                         "est_jaccard": pa.array(est[keep])})

    pairs = buckets.groupby("bucket").map_groups(pairs_in_bucket,
                                                 batch_format="pyarrow")
    # a pair can surface from several bands -> dedup on (a, b)
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


def shingle_set_digests(ds: "ray.data.Dataset", *, shingle: int = 1,
                        seed: int = 77, text_col: str = "text",
                        id_col: str = "doc_id",
                        carry_cols: tuple = ()) -> "ray.data.Dataset":
    """(doc_id, digest): order-invariant digest (wrapping sum of distinct
    shingle hashes) of each doc's shingle SET.  Equal sets => equal digests;
    unequal sets collide w.p. ~2^-64 — the exact-verification side-channel
    for LSH candidate pairs.  ``carry_cols`` pass through unchanged (e.g. a
    quality score for downstream keep-best selection)."""

    def dig(batch: pa.Table) -> pa.Table:
        word_h, lengths = _doc_word_hashes(batch, text_col, seed)
        sh, counts = _shingle_hashes(word_h, lengths, shingle)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        key = np.stack([doc_of, sh.astype(np.int64)], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        d_doc, d_sh = doc_of[first], sh[first]
        digest = np.zeros(len(counts), dtype=np.uint64)
        with np.errstate(over="ignore"):
            np.add.at(digest, d_doc, d_sh)
        cols = {id_col: batch.column(id_col),
                "digest": pa.array(digest.view(np.int64))}
        for c in carry_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(dig, batch_format="pyarrow", zero_copy_batch=True)


def keep_best_per_duplicate_set(ds: "ray.data.Dataset", *, score_col: str,
                                shingle: int = 1, seed: int = 77,
                                text_col: str = "text",
                                id_col: str = "doc_id") -> pd.DataFrame:
    """Canonical-document selection over exact duplicate SETS: docs whose
    shingle sets are identical (digest equality — the
    ``minhash_exact_dups`` verification key; distinct sets collide w.p.
    ~2^-64, documented) group together, and every group of >= 2 keeps its
    best member by (``score_col`` desc, ``id_col`` asc) — the
    keep-best-of-cluster dedup policy of a curation pipeline (vs
    ``dedup_exact_texts``'s keep-first).

    Output: (kept_<id_col>, n_members, best_<score_col>), one row per
    duplicate group.  Scale shape: ONE shuffle over (id, digest, score)
    triples — never the texts; per-group work is bounded by the dup-group
    size (small by construction).  Singleton groups drop out map-side
    after the groupby (the task sees one digest's rows only).
    """
    trip = shingle_set_digests(
        ds.select_columns([id_col, text_col, score_col]), shingle=shingle,
        seed=seed, text_col=text_col, id_col=id_col,
        carry_cols=(score_col,))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({f"kept_{id_col}": [], "n_members": [],
                                 f"best_{score_col}": []})
        g = g.sort_values([score_col, id_col], ascending=[False, True],
                          kind="stable")
        return pd.DataFrame({f"kept_{id_col}": [g[id_col].iloc[0]],
                             "n_members": [len(g)],
                             f"best_{score_col}": [g[score_col].iloc[0]]})

    out = (trip.groupby("digest").map_groups(pick, batch_format="pandas")
           .to_pandas())
    out[f"kept_{id_col}"] = out[f"kept_{id_col}"].astype("int64")
    out["n_members"] = out["n_members"].astype("int64")
    return out.sort_values(f"kept_{id_col}").reset_index(drop=True)


def minhash_exact_dups(ds: "ray.data.Dataset", *, num_perm: int = 64,
                       bands: int = 16, shingle: int = 1, seed: int = 77,
                       text_col: str = "text", id_col: str = "doc_id",
                       num_partitions: int = 8) -> "ray.data.Dataset":
    """Pairs of docs with IDENTICAL shingle sets: LSH candidates (threshold
    1.0 — identical sets have identical signatures, so recall is 1.0 by
    construction) verified exactly by the per-doc set digest.

    The bucket guard is DISABLED here on purpose: the contract is the full
    clique of identical-set pairs (the SQL oracle's ``a.wordset = b.wordset
    AND a.doc_id < b.doc_id`` join), so the output itself is O(cluster^2) —
    star expansion would save nothing asymptotically while dropping
    intra-cluster pairs the contract requires.

    Digest verification is a distributed cogroup join of the (doc_id,
    digest) table onto the candidate pairs (once per side) — no driver-side
    per-doc dict: memory per task is bounded by one key group, not the
    corpus.
    """
    del num_partitions  # shuffle fan-out is decided by the groupby backend
    from .cogroup import attach_by_key

    cands = minhash_near_dups(ds, num_perm=num_perm, bands=bands,
                              threshold=1.0, shingle=shingle, seed=seed,
                              text_col=text_col, id_col=id_col,
                              max_bucket_size=None)
    # consumed by both attaches: materialize once (distributed, object store)
    digs = shingle_set_digests(ds, shingle=shingle, seed=seed,
                               text_col=text_col, id_col=id_col).materialize()
    pairs = cands.select_columns(["doc_a", "doc_b"])
    i64 = pa.int64()
    sch1 = pa.schema([("doc_a", i64), ("doc_b", i64)])
    sch2 = pa.schema([("doc_a", i64), ("doc_b", i64), ("digest_a", i64)])
    j1 = attach_by_key(pairs, "doc_a", digs, id_col, "digest", "digest_a",
                       ds_schema=sch1, val_type=i64)
    j2 = attach_by_key(j1, "doc_b", digs, id_col, "digest", "digest_b",
                       ds_schema=sch2, val_type=i64)

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("digest_a"), batch.column("digest_b"))
        return batch.filter(keep).select(["doc_a", "doc_b"])

    return j2.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-duplicate detection
# ---------------------------------------------------------------------------

def simhash_signatures(ds: "ray.data.Dataset", *, seed: int = 99,
                       text_col: str = "text", id_col: str = "doc_id") -> "ray.data.Dataset":
    """64-bit SimHash per document (Charikar 2002), vectorized per batch."""

    def sign(batch: pa.Table) -> pa.Table:
        from ..functions.segments import segment_sums

        word_h, lengths = _doc_word_hashes(batch, text_col, seed)
        total = np.maximum(lengths, 1)
        # one unpack + ONE segmented reduce instead of 64 shift/mask passes:
        # (n_words, 64) bit matrix; int32 counts bound memory at 256 B/word
        # (little-endian uint64 view: byte j holds bits 8j..8j+7, and
        # bitorder="little" keeps column k == bit k of the signature)
        bits = np.unpackbits(word_h.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int32)
        ones = segment_sums(bits, lengths)  # (n_docs, 64)
        maj = (2 * ones.astype(np.int64) > total[:, None])
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sig = (maj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(sig.astype(np.int64))})

    return ds.map_batches(sign, batch_format="pyarrow", zero_copy_batch=True)


def simhash_near_dups(ds: "ray.data.Dataset", *, max_hamming: int = 3,
                      seed: int = 99, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_bucket_size: int | None = 2000) -> "ray.data.Dataset":
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming (<= 3 for full
    recall with the 4x16-bit pigeonhole banding).

    ``max_bucket_size`` bounds the O(|bucket|^2) in-bucket scan exactly like
    MinHash's guard: a 16-bit chunk shared by more than this many docs (e.g.
    the all-zeros chunk of short/templated docs) emits star edges against the
    min-id member PLUS chain edges between consecutive id-sorted members
    instead of all-pairs — O(n) output, no quadratic blowup.  Recall
    trade-off (documented, not silent): after the Hamming filter a member
    farther than ``max_hamming`` from both the representative and its chain
    neighbours loses linkage within this bucket even if it is near some other
    member; the other 3 chunk bands independently re-try every pair, so only
    docs differing from ALL their near-neighbours in every band's hot bucket
    are affected.  ``None`` disables the guard."""
    sigs = simhash_signatures(ds, seed=seed, text_col=text_col, id_col=id_col)

    def to_chunks(batch: pa.Table) -> pa.Table:
        sig = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out = {"chunk_key": [], id_col: [], "simhash": []}
        for c in range(4):
            chunk = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            out["chunk_key"].append(chunk + (c << 32))
            out[id_col].append(ids)
            out["simhash"].append(sig.astype(np.int64))
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in out.items()})

    chunked = sigs.map_batches(to_chunks, batch_format="pyarrow")

    def pairs(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if n < 2:
            return empty
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        sig = tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sig = ids[order], sig[order]
        if max_bucket_size is not None and n > max_bucket_size:
            # hot chunk: star (min-id rep) + chain edges, O(n) not O(n^2)
            a = np.concatenate([np.zeros(n - 1, dtype=np.int64),
                                np.arange(1, n - 1, dtype=np.int64)])
            b = np.concatenate([np.arange(1, n, dtype=np.int64),
                                np.arange(2, n, dtype=np.int64)])
        else:
            a, b = np.triu_indices(n, k=1)
        x = sig[a] ^ sig[b]
        # vectorized popcount: byte-LUT over the uint64 viewed as 8 uint8 lanes
        # (8 gathers instead of a 64-pass bit loop)
        ham = _POPCNT8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
        keep = (ham <= max_hamming) & (ids[a] != ids[b])
        return pa.table({"doc_a": pa.array(ids[a][keep].astype(np.int64)),
                         "doc_b": pa.array(ids[b][keep].astype(np.int64)),
                         "hamming": pa.array(ham[keep])})

    allpairs = chunked.groupby("chunk_key").map_groups(pairs, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return allpairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def label_propagation_clusters(pairs: "ray.data.Dataset", *,
                               a_col: str = "doc_a", b_col: str = "doc_b",
                               num_partitions: int = 8,
                               max_iters: int = 64) -> "ray.data.Dataset":
    """Distributed transitive closure: min-label propagation + pointer jump.

    (doc_id, cluster_id = component minimum), computed entirely as Dataset
    ops — nothing is ever collected to the driver, so it works on edge lists
    beyond driver memory (the 100 TB near-dup-graph case):

      labels(node) := node
      repeat:
        labels(node) := min(labels(node), min over neighbours
                            labels(neighbour))      [join + groupby-min]
        labels(node) := labels(labels(node))        [pointer jump: one join]
      until sum(labels) is unchanged (labels are monotone non-increasing
      integers bounded below, so the sum is a valid fixpoint witness).

    The pointer-jump step halves the remaining path length every round
    (labels are node ids, and label(v) <= v is invariant), so convergence is
    O(log diameter) rounds instead of O(diameter) — the difference between
    ~5 and ~1000 all-to-alls on a long chain.  Per round: two hash joins and
    one groupby-min over two-int64-column tables.

    The groupby-min input is exactly the 16 B/row narrow-shuffle shape that
    inlines into driver heap under the default sort shuffle
    (docs/SCALE_MEM_r05.json), and it recurs EVERY iteration — so the label
    tables are auto-coalesced via ``narrow_shuffle_blocks`` sized from the
    (already materialized, metadata-cheap) edge count.  Self-sizing, not a
    caller knob: unlike ``dedup_exact_texts`` the row count is known here.
    """
    from ray.data.aggregate import Min

    from ..functions.shuffleopt import narrow_shuffle_blocks

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = pairs.select_columns([a_col, b_col]).map_batches(
        both_dirs, batch_format="pyarrow").materialize()
    # per-iteration groupby input is <= (2E msgs + N labels) 16 B rows
    n_blocks = narrow_shuffle_blocks(3 * edges.count() * 16)

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("src"),
                         "label": batch.column("src")})

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
              .repartition(n_blocks, shuffle=False)
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())
    prev_sum = labels.sum("label")
    for _ in range(max_iters):
        msgs = edges.join(labels, "inner", num_partitions=num_partitions,
                          on=("src",), right_on=("node",))

        def msg_rows(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column("dst"),
                             "label": batch.column("label")})

        l1 = msgs.map_batches(msg_rows, batch_format="pyarrow") \
            .union(labels) \
            .repartition(n_blocks, shuffle=False) \
            .groupby("node").aggregate(Min("label", alias_name="label")) \
            .materialize()
        # pointer jump: label(v) <- label(label(v)); label(v) is itself a
        # node (labels are node ids), so an inner self-join covers all rows
        jumped = l1.join(l1, "inner", num_partitions=num_partitions,
                         on=("label",), right_on=("node",),
                         left_suffix="_old", right_suffix="_new")

        def take_jump(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column("node"),
                             "label": batch.column("label_new")})

        candidates = jumped.map_batches(take_jump,
                                        batch_format="pyarrow").materialize()
        new_sum = candidates.sum("label")
        labels = candidates
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "cluster_id": batch.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")


def dedup_clusters(pairs: "ray.data.Dataset", *, a_col: str = "doc_a",
                   b_col: str = "doc_b", engine: str = "auto",
                   max_driver_pairs: int = 2_000_000,
                   num_partitions: int = 8):
    """Near-dup PAIRS -> duplicate CLUSTERS: (doc_id, cluster_id) where
    cluster_id is the minimum id of the connected component.  Docs that
    appear in no pair (singletons) are not emitted.

    Two engines, same contract (tested label-equal):

    * ``driver``: path-compressed union-find over the collected edge list —
      O(E α(E)) and exact, right for LSH-sized pair lists (their boundedness
      is the LSH stage's job).
    * ``distributed``: iterative min-label propagation
      (``label_propagation_clusters``) — never materializes edges on the
      driver; the path for web-scale near-dup graphs with billions of edges.
    * ``auto``: count the pairs (cheap metadata pass over the materialized
      edge list) and pick driver iff count <= max_driver_pairs.
    """
    import pandas as pd

    sel = pairs.select_columns([a_col, b_col])
    if engine == "auto":
        sel = sel.materialize()
        engine = "driver" if sel.count() <= max_driver_pairs else "distributed"
    if engine == "distributed":
        out = label_propagation_clusters(sel, a_col=a_col, b_col=b_col,
                                         num_partitions=num_partitions)
        return (out.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
    edges = sel.to_pandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges[a_col], edges[b_col]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps cluster_id = component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(set(edges[a_col]) | set(edges[b_col]))
    return pd.DataFrame({"doc_id": nodes,
                         "cluster_id": [find(n) for n in nodes]})


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (posting-list join; test-scale verifier for LSH)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds: "ray.data.Dataset", *, n: int = 1,
                        threshold: float = 0.5, seed: int = 55,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_df: int | None = None,
                        pair_chunk: int = 262_144) -> "ray.data.Dataset":
    """Exact Jaccard over word n-gram SETS via a posting-list self-join.

    Shuffle key = shingle hash; each group emits co-occurrence counts in
    bounded chunks, a second groupby sums them, and |A u B| = |A| + |B| -
    |A n B| closes the formula.

    Scale controls (the per-shingle all-pairs step is quadratic in a
    shingle's document frequency — a stopword shingle in D docs emits D^2/2
    rows):

    * ``max_df``: drop shingles whose document frequency exceeds this BEFORE
      sizes/pairs are computed (the standard df-cut of set-similarity joins;
      e.g. Chaudhuri et al. 2006 prefix filtering drops exactly the
      ubiquitous features).  Jaccard is then computed over the df-filtered
      shingle sets ON BOTH SIDES of the comparison — the SQL oracle applies
      the identical ``HAVING count(*) <= max_df`` cut.  None = no cut.
      The cut is enforced INSIDE the per-shingle group (a group's row count
      IS the shingle's document frequency, postings being (doc, shingle)-
      deduped) — no df table, no driver-side keep-set, no broadcast.
    * ``pair_chunk``: per-shingle pair emission is a generator of tables of
      at most this many rows, so one hot group never materialises a giant
      block.

    One groupby(shingle) produces BOTH outputs: co-occurrence pair rows and
    per-doc size contributions (tagged ``doc_b = -1``; requires integer doc
    ids, which the pair columns already assume) — so the df-filtered set
    sizes come from the same pass that emits pairs.  Sizes are then attached
    to the pairs by two distributed hash joins of the (doc_id, size) table —
    no O(#docs) driver dict or broadcast: per-task memory is bounded by a
    join partition.  At 100 TB this exact mode is gated behind LSH candidates
    (minhash_near_dups); the df-cut and chunking keep it robust at
    oracle/correctness scale.
    """

    def doc_shingles(batch: pa.Table) -> pa.Table:
        word_h, lengths = _doc_word_hashes(batch, text_col, seed)
        sh, counts = _shingle_hashes(word_h, lengths, n)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            # doc_b == -1 is the size-row sentinel downstream; a real -1 id
            # would corrupt both pair and size outputs
            raise ValueError("ngram_jaccard_pairs requires non-negative "
                             "integer doc ids")
        doc_of = np.repeat(np.arange(len(counts)), counts)
        # per-doc set semantics: dedup (doc, shingle)
        key = np.stack([doc_of, sh.astype(np.int64)], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        return pa.table({id_col: pa.array(ids[doc_of[first]]),
                         "shingle": pa.array(sh.astype(np.int64)[first])})

    postings = ds.map_batches(doc_shingles, batch_format="pyarrow",
                              zero_copy_batch=True)

    from ray.data.aggregate import Sum

    def cooccur(tbl: pa.Table) -> pa.Table:
        """One shingle's postings -> pair rows + size-contribution rows.

        Group row count = the shingle's document frequency (postings are
        (doc, shingle)-deduped), so the df-cut is a group-local check; kept
        groups also emit one (doc, doc_b=-1, 1) size row per member doc, so
        the df-filtered per-doc set sizes need no second shuffle of the
        postings.
        """
        ids = np.unique(tbl.column(id_col).to_numpy(zero_copy_only=False))
        m = len(ids)
        if max_df is not None and m > max_df:
            m = 0  # df-cut: the shingle contributes neither sizes nor pairs
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "n_common": pa.array([], pa.int64())})
        if m == 0:
            return empty
        ids = ids.astype(np.int64)
        chunks = [pa.table({
            "doc_a": pa.array(ids),
            "doc_b": pa.array(np.full(m, -1, dtype=np.int64)),
            "n_common": pa.array(np.ones(m, dtype=np.int64))})]
        # chunked upper-triangle construction: the output table is built from
        # bounded record batches (map_groups can't stream generators), and
        # max_df bounds m, so the per-group output is <= max_df^2/2 rows
        if m >= 2:
            a_all, b_all = np.triu_indices(m, k=1)
            for s in range(0, len(a_all), pair_chunk):
                a = a_all[s:s + pair_chunk]
                b = b_all[s:s + pair_chunk]
                chunks.append(pa.table({
                    "doc_a": pa.array(ids[a]),
                    "doc_b": pa.array(ids[b]),
                    "n_common": pa.array(np.ones(len(a), dtype=np.int64))}))
        return pa.concat_tables(chunks)

    # consumed twice (sizes + pairs): materialize once (object store)
    co = postings.groupby("shingle").map_groups(
        cooccur, batch_format="pyarrow").materialize()

    def size_rows(t: pa.Table) -> pa.Table:
        db = t.column("doc_b").to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(db == -1))
        return pa.table({id_col: sub.column("doc_a"),
                         "n": sub.column("n_common")})

    sizes = (co.map_batches(size_rows, batch_format="pyarrow")
             .groupby(id_col).aggregate(Sum("n", alias_name="sz"))
             .materialize())  # consumed by both attach joins

    def pair_rows(t: pa.Table) -> pa.Table:
        db = t.column("doc_b").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(db != -1))

    common = (co.map_batches(pair_rows, batch_format="pyarrow")
              .groupby(["doc_a", "doc_b"])
              .aggregate(Sum("n_common", alias_name="n_common")))

    from .cogroup import attach_by_key

    i64 = pa.int64()
    sch1 = pa.schema([("doc_a", i64), ("doc_b", i64), ("n_common", i64)])
    sch2 = pa.schema([("doc_a", i64), ("doc_b", i64), ("n_common", i64),
                      ("sz_a", i64)])
    j1 = attach_by_key(common, "doc_a", sizes, id_col, "sz", "sz_a",
                       ds_schema=sch1, val_type=i64)
    j2 = attach_by_key(j1, "doc_b", sizes, id_col, "sz", "sz_b",
                       ds_schema=sch2, val_type=i64)

    def jaccard(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        nc = batch.column("n_common").to_numpy(zero_copy_only=False).astype(np.float64)
        sa = batch.column("sz_a").to_numpy(zero_copy_only=False).astype(np.float64)
        sb = batch.column("sz_b").to_numpy(zero_copy_only=False).astype(np.float64)
        j = nc / (sa + sb - nc)
        keep = j >= threshold
        return pa.table({"doc_a": pa.array(da[keep]), "doc_b": pa.array(db[keep]),
                         "jaccard": pa.array(micro_round(j[keep]))})

    return j2.map_batches(jaccard, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact edit-distance verification of candidate pairs
# ---------------------------------------------------------------------------

def _levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein distance, row-DP with the prefix-relaxation trick:
    the insertion dependency ``cur[j] = min(cur[j], cur[j-1]+1)`` equals
    ``min_k<=j (cur[k] + (j-k)) = j + running_min(cur[k]-k)`` — one
    ``np.minimum.accumulate`` instead of a per-cell Python scan, so the
    inner loop is O(len(a)) numpy row ops on codepoint arrays."""
    if a == b:
        return 0
    A = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    B = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    if len(A) == 0 or len(B) == 0:
        return max(len(A), len(B))
    idx = np.arange(len(B) + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(len(B) + 1, dtype=np.int64)
    for i in range(len(A)):
        cur[0] = i + 1
        np.minimum(prev[:-1] + (B != A[i]), prev[1:] + 1, out=cur[1:])
        np.minimum(cur, idx + np.minimum.accumulate(cur - idx), out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_pairs(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                        *, id_a: str = "doc_a", id_b: str = "doc_b",
                        id_col: str = "doc_id", text_col: str = "text"
                        ) -> "ray.data.Dataset":
    """Exact Levenshtein distance for every candidate pair — the final
    verification stage of a near-dup pipeline (LSH/Jaccard candidates ->
    character-exact evidence before dropping a document).

    Texts are attached through TWO cogroup joins on near-unique doc ids
    (``stages/cogroup.py:attach_by_key``) — the corpus never broadcasts
    and only candidate-pair rows carry text.  The DP itself is
    O(len_a * len_b / vector-width) per pair; run it AFTER candidate
    pruning, never on the cross product.

    Output: (id_a, id_b, edit_distance:int64).
    """
    from .cogroup import attach_by_key

    kv = docs.select_columns([id_col, text_col])
    with_a = attach_by_key(pairs, id_a, kv, id_col, text_col, "__ta")
    with_b = attach_by_key(with_a, id_b, kv, id_col, text_col, "__tb")

    def dist(t: pa.Table) -> pa.Table:
        ta = t.column("__ta").to_pylist()
        tb = t.column("__tb").to_pylist()
        d = np.fromiter((_levenshtein(x or "", y or "")
                         for x, y in zip(ta, tb)), dtype=np.int64,
                        count=t.num_rows)
        return pa.table({id_a: t.column(id_a), id_b: t.column(id_b),
                         "edit_distance": pa.array(d)})

    return with_b.map_batches(dist, batch_format="pyarrow",
                              zero_copy_batch=True)
