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

from ..functions.hashing import hash64_2d
from .base import Sketch, SketchSpec, register_spec


@register_spec
@dataclasses.dataclass(frozen=True)
class CountMinSpec(SketchSpec):
    kind: ClassVar[str] = "countmin"
    depth: int = 5
    width: int = 16384
    seed: int = 1

    def new(self) -> "CountMinSketch":
        return CountMinSketch(self)

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
        w = np.uint64(self.spec.width)
        for row in range(self.spec.depth):
            idx = (hash64_2d(tokens, self.spec.seed, row) % w).astype(np.int64)
            self.counts[row] += np.bincount(idx, minlength=self.spec.width).astype(np.int64)
        self.total += len(tokens)

    def merge_in(self, other: "CountMinSketch") -> None:
        assert self.spec == other.spec
        self.counts += other.counts
        self.total += other.total

    def point_query(self, tokens: np.ndarray) -> np.ndarray:
        """Estimated frequency per queried token (vectorized min over rows)."""
        tokens = np.asarray(tokens)
        w = np.uint64(self.spec.width)
        est = np.full(len(tokens), np.iinfo(np.int64).max, dtype=np.int64)
        for row in range(self.spec.depth):
            idx = (hash64_2d(tokens, self.spec.seed, row) % w).astype(np.int64)
            np.minimum(est, self.counts[row][idx], out=est)
        return est

    def estimate(self) -> list[float]:
        """Total stream length (exact: every update adds to every row)."""
        return [float(self.total)]

    def state_dict(self):
        return {"c": self.counts, "n": self.total}

    def load_state(self, d):
        self.counts, self.total = d["c"], int(d["n"])
