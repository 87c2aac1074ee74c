"""Count-min sketch: frequency estimation over token multisets.

Not present in the reference (north-rule addition); semantics follow Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch and its
applications" (J. Algorithms 2005).  Guarantees: point estimates never
underestimate; overestimate <= (e/width) * N with probability >= 1 - e^-depth.
The evaluation-harness treatment (build per key, merge tree, error-band
tests) mirrors how the reference treats its sketches.
"""

from __future__ import annotations

import dataclasses
import math
from typing import ClassVar

import numpy as np

from ..functions.hashing import _mix, hash64, seed_offset
from .base import Sketch, SketchSpec, register_spec


def _double_hash(tokens: np.ndarray, seed: int):
    """Two independent 64-bit streams from ONE hashing pass for
    Kirsch-Mitzenmeyer double hashing: row d uses (h1 + d * h2) mod width
    (Kirsch & Mitzenmeyer, "Less hashing, same performance: building a
    better Bloom filter", ESA 2006 — preserves the CM ε–δ guarantee while
    doing 1 hash instead of depth)."""
    h1 = hash64(tokens, seed)
    with np.errstate(over="ignore"):
        h2 = _mix(h1 + seed_offset(seed + 0x9E3779B9))
    return h1, h2


@register_spec
@dataclasses.dataclass(frozen=True)
class CountMinSpec(SketchSpec):
    kind: ClassVar[str] = "countmin"
    depth: int = 5
    width: int = 16384
    seed: int = 1
    #: conservative update (Estan & Varghese, SIGCOMM 2002): on insert only
    #: raise registers to min-estimate + count — strictly tighter point
    #: queries, same never-underestimate guarantee.  Batched variant: per
    #: distinct token t with in-batch count c, registers[d, idx_d(t)] =
    #: max(old, min_d(old) + c).  Sum-merge preserves the guarantee:
    #: min_d(a_d + b_d) >= min_d(a_d) + min_d(b_d) >= f_a + f_b.
    conservative: bool = False

    def new(self) -> "CountMinSketch":
        return CountMinSketch(self)

    def reducer(self):
        """uint64 hash -> int64 register index; bitmask when width is a
        power of two (u64 modulo is the hot-loop cost otherwise)."""
        w = self.width
        if w & (w - 1) == 0:
            mask = np.uint64(w - 1)
            return lambda h: (h & mask).astype(np.int64)
        wu = np.uint64(w)
        return lambda h: (h % wu).astype(np.int64)

    def epsilon(self) -> float:
        """Additive overestimate factor: err <= epsilon * N w.p. 1-delta."""
        return math.e / self.width

    def delta(self) -> float:
        return math.exp(-self.depth)


class CountMinSketch(Sketch):
    def __init__(self, spec: CountMinSpec):
        self.spec = spec
        self.counts = np.zeros((spec.depth, spec.width), dtype=np.int64)
        self.total = 0

    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        tokens = np.asarray(tokens)
        if self.spec.conservative:
            self._update_conservative(tokens)
            return
        acc, h2 = _double_hash(tokens, self.spec.seed)
        red = self.spec.reducer()
        with np.errstate(over="ignore"):
            for row in range(self.spec.depth):
                self.counts[row] += np.bincount(red(acc),
                                                minlength=self.spec.width)
                acc = acc + h2
        self.total += len(tokens)

    def _update_conservative(self, tokens: np.ndarray) -> None:
        uniq, cnt = np.unique(tokens, return_counts=True)
        acc, h2 = _double_hash(uniq, self.spec.seed)
        red = self.spec.reducer()
        d = self.spec.depth
        idx = np.empty((d, len(uniq)), dtype=np.int64)
        with np.errstate(over="ignore"):
            for row in range(d):
                idx[row] = red(acc)
                acc = acc + h2
        est = self.counts[0][idx[0]].copy()
        for row in range(1, d):
            np.minimum(est, self.counts[row][idx[row]], out=est)
        target = est + cnt
        for row in range(d):
            np.maximum.at(self.counts[row], idx[row], target)
        self.total += len(tokens)

    def merge_in(self, other: "CountMinSketch") -> None:
        assert self.spec == other.spec
        self.counts += other.counts
        self.total += other.total

    def point_query(self, tokens: np.ndarray) -> np.ndarray:
        """Estimated frequency per queried token (vectorized min over rows)."""
        tokens = np.asarray(tokens)
        acc, h2 = _double_hash(tokens, self.spec.seed)
        red = self.spec.reducer()
        est = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
        with np.errstate(over="ignore"):
            for row in range(self.spec.depth):
                np.minimum(est, self.counts[row][red(acc)], out=est)
                acc = acc + h2
        return est

    def estimate(self) -> list[float]:
        """Total stream length (exact: every update adds to every row)."""
        return [float(self.total)]

    def state_dict(self):
        return {"c": self.counts, "n": self.total}

    def load_state(self, d):
        self.counts, self.total = d["c"], int(d["n"])
