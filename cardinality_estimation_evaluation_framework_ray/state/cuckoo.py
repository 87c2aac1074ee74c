"""Cuckoo filter: set membership with DELETION and bounded false-positive rate.

Not in the reference (north-rule §2.8 extension; the reference's membership
structures are the Bloom/ADBF family, `/root/reference/src/estimators/
bloom_filters.py`, which cannot delete).  Implemented from the published
algorithm: Fan, Andersen, Kaminsky & Mitzenmacher, "Cuckoo Filter:
Practically Better Than Bloom" (CoNEXT 2014), partial-key cuckoo hashing:

  * an item's fingerprint ``fp`` (``fp_bits`` wide, never 0 — 0 marks an
    empty slot) lives in one of two buckets ``i1 = h(x)`` and
    ``i2 = i1 XOR h(fp)`` — the XOR trick makes the pair recoverable from
    (bucket, fp) alone, which is what makes the filter mergeable and
    fingerprints relocatable without the original keys;
  * each bucket holds ``bucket_size`` fingerprint slots; inserts evict and
    relocate on collision (the cuckoo kick chain);
  * DELETE removes one stored copy of the fingerprint — multiset semantics:
    k inserts of x need k deletes to clear membership.

MULTISET CONTRACT: membership answers are a pure function of the inserted
fingerprint multiset, so ``contains`` is partition/merge-order invariant as
long as no insert overflows (overflow raises loudly — size the filter for
<= ~95% load, the paper's b=4 bound, rather than degrade silently).
The backing state is NOT bit-identical across merge orders (fingerprints
may sit in either of their two buckets); property tests pin the ANSWERS.

Deletion caveat (paper §3.3): a fingerprint collision (two keys sharing a
bucket pair AND a fingerprint, prob ~ 2/(n_buckets * 2^fp_bits) per pair)
makes copies indistinguishable, so a delete may physically clear "the other
key's" slot.  But copies within a (bucket-pair, fingerprint) cell are
FUNGIBLE: when every delete had a matching prior insert, multiset
accounting guarantees the cell's remaining count >= each surviving key's
own insert balance — deletes can make false POSITIVES only, never false
negatives.  Deleting a key never inserted raises KeyError (when no
matching fingerprint exists at all).  Exact pipelines still
filter-then-VERIFY (``cuckoo_filtered_semi_join`` composes with an exact
join on the survivors) to strip the FPR extras.

False-positive bound: <= 2 * bucket_size * load / 2^fp_bits (two buckets x
``bucket_size`` slots x uniform fingerprints) — ~0.1% at b=4, f=12, 50% load.

Scale shape: the table is ``2^log2_buckets * bucket_size`` uint16 slots
(1 MB at log2=17, b=4) — built from per-block partial states on the merge
tree, then ``ray.put`` ONCE and probed vectorized per batch (the Bloom
broadcast-semi-join plan, `stages/filters.py`).  Inserts are two vectorized
placement rounds (argsort-grouped slot assignment) with a sequential kick
loop only for the overflow tail — empty at the load factors the contract
allows.  Deletes are vectorized per distinct key (documented O(#distinct)
per batch; delete streams are key-bounded in every pipeline here).
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import numpy as np

from ..functions.hashing import hash64
from .base import Sketch, SketchSpec, register_spec


@register_spec
@dataclasses.dataclass(frozen=True)
class CuckooFilterSpec(SketchSpec):
    kind: ClassVar[str] = "cuckoo"
    log2_buckets: int = 16
    bucket_size: int = 4
    fp_bits: int = 12         # fingerprint width; stored in uint16 slots
    seed: int = 1
    max_kicks: int = 500

    def new(self) -> "CuckooFilter":
        return CuckooFilter(self)

    @property
    def n_buckets(self) -> int:
        return 1 << self.log2_buckets

    def fpr_bound(self, load: float) -> float:
        """Paper's false-positive bound at the given load factor."""
        return 2.0 * self.bucket_size * load / (1 << self.fp_bits)


class CuckooFilter(Sketch):
    def __init__(self, spec: CuckooFilterSpec):
        if not (1 <= spec.fp_bits <= 16):
            raise ValueError(f"fp_bits must be in [1, 16], got {spec.fp_bits}")
        self.spec = spec
        self.table = np.zeros((spec.n_buckets, spec.bucket_size),
                              dtype=np.uint16)
        self.n = 0  # multiset size (inserts - deletes)

    # -- hashing ----------------------------------------------------------
    def _fingerprints(self, keys: np.ndarray) -> np.ndarray:
        mod = np.uint64((1 << self.spec.fp_bits) - 1)
        return ((hash64(keys, self.spec.seed * 3 + 1) % mod) + np.uint64(1)
                ).astype(np.uint16)

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        mask = np.uint64(self.spec.n_buckets - 1)
        return (hash64(keys, self.spec.seed) & mask).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """i2 = i1 XOR h(fp) — involutive, so alt(alt(i)) == i."""
        mask = np.uint64(self.spec.n_buckets - 1)
        h = hash64(fps.astype(np.uint64), self.spec.seed * 7 + 3) & mask
        return (idx.astype(np.uint64) ^ h).astype(np.int64)

    # -- occupancy (slots are kept compacted: occupied = prefix) ----------
    def _occupancy(self, buckets: np.ndarray) -> np.ndarray:
        return (self.table[buckets] != 0).sum(axis=1).astype(np.int64)

    def _place_round(self, fps: np.ndarray, buckets: np.ndarray
                     ) -> np.ndarray:
        """Vectorized placement: for each (fp, bucket) pair, claim a free
        slot if the bucket has room, racing same-bucket items by stable
        argsort rank.  Returns the boolean mask of PLACED items."""
        order = np.argsort(buckets, kind="stable")
        b = buckets[order]
        first = np.r_[True, b[1:] != b[:-1]] if len(b) else np.empty(0, bool)
        starts = np.where(first, np.arange(len(b)), 0)
        rank = np.arange(len(b)) - np.maximum.accumulate(starts)
        occ = self._occupancy(b)
        accept = rank < (self.spec.bucket_size - occ)
        self.table[b[accept], (occ + rank)[accept]] = fps[order[accept]]
        placed = np.zeros(len(fps), dtype=bool)
        placed[order[accept]] = True
        return placed

    def _insert_fps(self, fps: np.ndarray, i1: np.ndarray,
                    i2: np.ndarray) -> None:
        placed = self._place_round(fps, i1)
        if not placed.all():
            rest = ~placed
            placed2 = np.zeros(len(fps), dtype=bool)
            placed2[rest] = self._place_round(fps[rest], i2[rest])
            rest &= ~placed2
            for t in np.flatnonzero(rest):  # overflow tail: kick chains
                self._kick_insert(int(fps[t]), int(i2[t]))
        self.n += len(fps)

    def _kick_insert(self, fp: int, idx: int) -> None:
        b = self.spec.bucket_size
        for kick in range(self.spec.max_kicks):
            row = self.table[idx]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = fp
                return
            slot = kick % b
            fp, row[slot] = int(row[slot]), fp
            idx = int(self._alt_index(np.array([idx], dtype=np.int64),
                                      np.array([fp], dtype=np.uint16))[0])
        raise RuntimeError(
            "cuckoo filter full: kick chain exceeded max_kicks — size "
            "log2_buckets for <= ~95% load (Fan et al. §5)")

    # -- public multiset ops ------------------------------------------------
    def update_tokens(self, tokens: np.ndarray) -> None:
        keys = np.asarray(tokens, dtype=np.int64)
        if len(keys) == 0:
            return
        fps = self._fingerprints(keys)
        i1 = self._index1(keys)
        self._insert_fps(fps, i1, self._alt_index(i1, fps))

    def delete_tokens(self, tokens: np.ndarray) -> None:
        """Multiset delete: each occurrence removes ONE stored copy of the
        key's fingerprint; raises KeyError if a copy is missing (delete of
        an item never inserted — modulo the documented
        fingerprint-collision caveat).  ATOMIC per call: on KeyError the
        table and count roll back to the pre-call state (one table copy,
        <= n_buckets * bucket_size * 2 bytes, only on the delete path),
        so callers that catch the exception keep a consistent filter.
        Vectorized per distinct key; buckets stay compacted."""
        keys = np.asarray(tokens, dtype=np.int64)
        if len(keys) == 0:
            return
        snapshot = self.table.copy()
        uk, need = np.unique(keys, return_counts=True)
        fps = self._fingerprints(uk)
        i1 = self._index1(uk)
        i2 = self._alt_index(i1, fps)
        for t in range(len(uk)):
            remaining = int(need[t])
            for idx in (int(i1[t]), int(i2[t])):
                if remaining == 0:
                    break
                row = self.table[idx]
                hits = np.flatnonzero(row == fps[t])[:remaining]
                if len(hits):
                    row[hits] = 0
                    keep = row[row != 0]  # re-compact the bucket
                    row[:] = 0
                    row[:len(keep)] = keep
                    remaining -= len(hits)
            if remaining:
                self.table = snapshot  # atomic rollback
                raise KeyError(
                    f"delete of absent key {int(uk[t])}: "
                    f"{remaining} copies not present")
        self.n -= len(keys)

    def contains(self, tokens: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: no false negatives; false positives
        bounded by ``spec.fpr_bound(load)``."""
        keys = np.asarray(tokens, dtype=np.int64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fingerprints(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fps)
        f = fps[:, None]
        return ((self.table[i1] == f).any(axis=1)
                | (self.table[i2] == f).any(axis=1))

    @property
    def load_factor(self) -> float:
        return float((self.table != 0).mean())

    def merge_in(self, other: "CuckooFilter") -> None:
        """Union of fingerprint multisets: other's occupied (bucket, fp)
        slots re-insert through partial-key hashing (the XOR trick recovers
        each fingerprint's bucket pair without the original keys)."""
        assert self.spec == other.spec
        rows, _ = np.nonzero(other.table)
        if len(rows) == 0:
            return
        fps = other.table[other.table != 0]
        idx = rows.astype(np.int64)
        # n invariant: occupied slots == multiset size, so _insert_fps's
        # += len(fps) adds exactly other.n
        self._insert_fps(fps, idx, self._alt_index(idx, fps))

    @classmethod
    def view(cls, spec: CuckooFilterSpec, table: np.ndarray,
             n: int = 0) -> "CuckooFilter":
        """Read-only probe view over an existing (possibly shared-memory)
        table — no allocation, for broadcast probes (`filter_by_cuckoo`)."""
        obj = object.__new__(cls)
        obj.spec = spec
        obj.table = table
        obj.n = n
        return obj

    def estimate(self) -> list[float]:
        return [float(self.n)]

    def state_dict(self):
        return {"t": self.table, "n": self.n}

    def load_state(self, d):
        self.table = np.asarray(d["t"], dtype=np.uint16)
        self.n = int(d["n"])
