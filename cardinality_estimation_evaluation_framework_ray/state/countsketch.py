"""Count-Sketch (signed counters): unbiased frequency + F2 estimation.

Not present in the reference (north-rule §2.8 extension, registered through
the same Sketch protocol as count-min / KLL / theta); semantics follow
Charikar, Chen & Farach-Colton, "Finding frequent items in data streams"
(ICALP 2002), and the F2 (self-join size / second frequency moment) estimate
follows Alon, Matias & Szegedy, "The space complexity of approximating the
frequency moments" (STOC 1996) — each Count-Sketch row IS an AMS sketch with
pairwise-independent buckets, so median-of-rows sum-of-squares estimates
Σ f_t² within ~ O(F2/√width) per row.

Where count-min (``state/countmin.py``) never underestimates but is biased
upward by +ε·N, Count-Sketch's signed updates make every per-row point
estimate UNBIASED (collisions cancel in expectation); the median over
``depth`` rows gives |err| ≤ 3·sqrt(F2/width) with probability ≥ 1 − δ for
depth = O(log 1/δ).  Use count-min when overcounting is the safe direction
(never miss a heavy hitter), count-sketch when bias matters (frequency
regression targets, F2).

Merge is elementwise sum — associative/commutative, same groupby merge tree
and UDAF face (``stages/build.py``) as every other sketch here.  One hashing
pass per update: the bucket stream reuses the Kirsch-Mitzenmeyer double
hashing of count-min, and the ±1 sign per (row, token) comes from one extra
bit of the same 64-bit stream (bit 63, independent of the low bucket bits
for power-of-two widths).
"""

from __future__ import annotations

import dataclasses
import math
from typing import ClassVar

import numpy as np

from ..functions.hashing import _mix, hash64, seed_offset
from .base import Sketch, SketchSpec, register_spec


def _double_hash(tokens: np.ndarray, seed: int):
    """Same construction as countmin._double_hash (one pass, two streams)."""
    h1 = hash64(tokens, seed)
    with np.errstate(over="ignore"):
        h2 = _mix(h1 + seed_offset(seed + 0x9E3779B9))
    return h1, h2


@register_spec
@dataclasses.dataclass(frozen=True)
class CountSketchSpec(SketchSpec):
    kind: ClassVar[str] = "countsketch"
    depth: int = 5
    width: int = 16384
    seed: int = 1

    def new(self) -> "CountSketch":
        return CountSketch(self)

    def reducer(self):
        """uint64 hash -> (bucket index int64, sign ±1 int64).

        Bucket from the LOW bits (mask when width is a power of two), sign
        from bit 63 — disjoint bits of one avalanche-mixed stream, so bucket
        and sign are independent per (row, token)."""
        w = self.width
        sign_shift = np.uint64(63)

        if w & (w - 1) == 0:
            mask = np.uint64(w - 1)

            def red(h):
                idx = (h & mask).astype(np.int64)
                sgn = ((h >> sign_shift).astype(np.int64) << 1) - 1
                return idx, sgn
            return red
        wu = np.uint64(w)

        def red(h):
            idx = (h % wu).astype(np.int64)
            sgn = ((h >> sign_shift).astype(np.int64) << 1) - 1
            return idx, sgn
        return red

    def point_error_bound(self, f2: float) -> float:
        """|err| ≤ 3·sqrt(F2/width) per query w.p. ≥ 1 − exp(−depth/4)."""
        return 3.0 * math.sqrt(f2 / self.width)


class CountSketch(Sketch):
    def __init__(self, spec: CountSketchSpec):
        self.spec = spec
        self.counts = np.zeros((spec.depth, spec.width), dtype=np.int64)
        self.total = 0

    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        tokens = np.asarray(tokens)
        acc, h2 = _double_hash(tokens, self.spec.seed)
        red = self.spec.reducer()
        w = self.spec.width
        with np.errstate(over="ignore"):
            for row in range(self.spec.depth):
                idx, sgn = red(acc)
                # one signed bincount per row (no per-token Python loop)
                self.counts[row] += np.bincount(
                    idx, weights=sgn, minlength=w).astype(np.int64)
                acc = acc + h2
        self.total += len(tokens)

    def merge_in(self, other: "CountSketch") -> None:
        assert self.spec == other.spec
        self.counts += other.counts
        self.total += other.total

    def point_query(self, tokens: np.ndarray) -> np.ndarray:
        """Unbiased estimated frequency per token: median over rows of
        sign · counter (vectorized)."""
        tokens = np.asarray(tokens)
        acc, h2 = _double_hash(tokens, self.spec.seed)
        red = self.spec.reducer()
        est = np.empty((self.spec.depth, len(tokens)), dtype=np.int64)
        with np.errstate(over="ignore"):
            for row in range(self.spec.depth):
                idx, sgn = red(acc)
                est[row] = sgn * self.counts[row][idx]
                acc = acc + h2
        # median of an even depth averages the two middle rows — keep it
        # integer-exact by flooring toward the true median pair midpoint
        return np.median(est, axis=0)

    def f2(self) -> float:
        """Second frequency moment Σ f_t² (self-join size): median over
        rows of the row's sum of squared counters (AMS estimator)."""
        sq = (self.counts.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(sq))

    def estimate(self) -> list[float]:
        """Total stream length (exact: Σ sgn·c is not it — we track N)."""
        return [float(self.total)]

    def state_dict(self):
        return {"c": self.counts, "n": self.total}

    def load_state(self, d):
        self.counts, self.total = d["c"], int(d["n"])
