"""Vector of Counts sketch + pairwise/sequential estimators.

Mirrors ``src/estimators/vector_of_counts.py``: per-bucket counts of hashed
ids, with the documented ONE-SHOT contract — ids must be deduplicated before
they enter the sketch (``vector_of_counts.py:103-129``).  In the distributed
build this becomes an explicit pre-stage: tokens are exact-deduped per key
(see stages/dedup.exact_distinct_tokens), after which per-partition partials
hold DISJOINT token sets and the ``+`` merge is lossless and associative.

The cross-key union (PairwiseEstimator.merge: a + b - intersection*share,
``vector_of_counts.py:244-281``) is order-dependent and stays a driver-side
fold (SequentialEstimator, ``vector_of_counts.py:294-334``).
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import numpy as np

from ..functions.hashing import hash64
from .base import Sketch, SketchSpec, register_spec


@register_spec
@dataclasses.dataclass(frozen=True)
class VocSpec(SketchSpec):
    kind: ClassVar[str] = "voc"
    num_buckets: int = 4096
    seed: int = 1

    def new(self) -> "VocSketch":
        return VocSketch(self)


class VocSketch(Sketch):
    def __init__(self, spec: VocSpec):
        self.spec = spec
        self.stats = np.zeros(spec.num_buckets, dtype=np.float64)

    def update_tokens(self, tokens: np.ndarray) -> None:
        """Add PRE-DEDUPLICATED tokens (one-shot contract; see module doc)."""
        if len(tokens) == 0:
            return
        idx = (hash64(np.asarray(tokens), self.spec.seed)
               % np.uint64(self.spec.num_buckets)).astype(np.int64)
        self.stats += np.bincount(idx, minlength=self.spec.num_buckets)

    def merge_in(self, other: "VocSketch") -> None:
        """+ merge: lossless only for partition-disjoint token sets."""
        assert self.spec == other.spec
        self.stats += other.stats

    def cardinality(self) -> float:
        return float(np.sum(self.stats))

    def estimate(self) -> list[float]:
        return [self.cardinality()]

    def state_dict(self):
        return {"s": self.stats}

    def load_state(self, d):
        self.stats = d["s"]


def laplace_noise_voc(sketch: VocSketch, epsilon: float,
                      random_state=None) -> VocSketch:
    """VoC LaplaceNoiser (vector_of_counts.py:45-71)."""
    rs = random_state or np.random.RandomState()
    out = sketch.spec.new()
    out.stats = sketch.stats + rs.laplace(loc=0, scale=1.0 / epsilon,
                                          size=sketch.spec.num_buckets)
    return out


class PairwiseEstimator:
    """Dot-product union of two VoCs, with optional clipping
    (vector_of_counts.py:135-291)."""

    def __init__(self, clip: bool = False, epsilon: float = np.log(3),
                 clip_threshold: float = 3):
        self.clip = clip
        self.epsilon = epsilon
        self.clip_threshold = clip_threshold

    @staticmethod
    def _intersection(this: VocSketch, that: VocSketch,
                      this_card: float, that_card: float) -> float:
        b_this = this_card / this.spec.num_buckets
        b_that = that_card / that.spec.num_buckets
        return float(np.dot(this.stats - b_this, that.stats - b_that))

    def _std_of_intersection(self, inter: float, this: VocSketch,
                             that: VocSketch) -> float:
        var = (this.cardinality() * that.cardinality() + inter ** 2) / this.spec.num_buckets
        var += this.spec.num_buckets * 4 / self.epsilon ** 4
        var += (this.cardinality() + that.cardinality()) * 2 / self.epsilon ** 2
        return float(np.sqrt(var))

    def _z(self, inter: float, value: float, this, that) -> float:
        # numpy division semantics (reference vector_of_counts.py:228-230):
        # empty sketches under epsilon=inf give std 0 -> z = 0/0 = nan, and
        # nan fails both clip comparisons, so the general merge path runs —
        # a plain-float division would raise ZeroDivisionError instead
        std = self._std_of_intersection(value, this, that)
        with np.errstate(invalid="ignore", divide="ignore"):
            return float(np.float64(inter - value) / np.float64(std))

    def has_zero_intersection(self, inter, this, that) -> bool:
        return self._z(inter, 0.0, this, that) < self.clip_threshold

    def has_full_intersection(self, inter, this, that) -> bool:
        value = min(this.cardinality(), that.cardinality())
        return self._z(inter, value, this, that) > -self.clip_threshold

    def merge(self, this: VocSketch, that: VocSketch) -> VocSketch:
        assert this.spec == that.spec, "VectorOfCounts size/hash mismatch"
        this_card, that_card = this.cardinality(), that.cardinality()
        inter = self._intersection(this, that, this_card, that_card)
        merged = this.spec.new()
        if self.clip:
            if self.has_zero_intersection(inter, this, that):
                merged.stats = this.stats + that.stats
                return merged
            if self.has_full_intersection(inter, this, that):
                merged.stats = np.array(this.stats, copy=True)
                return merged
        if this_card + that_card == 0:
            # avoid div-by-zero under local DP (vector_of_counts.py:267-276)
            merged.stats = this.stats + that.stats - inter / this.spec.num_buckets
            return merged
        share = inter * (this.stats + that.stats) / (this_card + that_card)
        merged.stats = this.stats + that.stats - share
        return merged

    def clip_empty(self, sketch: VocSketch) -> VocSketch:
        std = np.sqrt(sketch.spec.num_buckets * 2) / self.epsilon
        with np.errstate(invalid="ignore", divide="ignore"):
            z = float(np.sum(sketch.stats) / np.float64(std))
        # epsilon=inf -> std 0 -> z nan/inf; nan fails the comparison (no
        # clip), matching the reference's numpy semantics (:286-291)
        if z < self.clip_threshold:
            out = sketch.spec.new()
            return out
        return sketch

    def __call__(self, sketch_list) -> list[float]:
        assert len(sketch_list) == 2
        merged = self.merge(sketch_list[0], sketch_list[1])
        return [merged.cardinality()]


class SequentialEstimator:
    """Ordered left fold of pairwise merges (vector_of_counts.py:294-334)."""

    def __init__(self, clip: bool = False, epsilon: float = np.log(3),
                 clip_threshold: float = 3):
        self._pair = PairwiseEstimator(clip, epsilon, clip_threshold)
        self.clip = clip

    def __call__(self, sketch_list) -> list[float]:
        sketches = list(sketch_list)
        if self.clip:
            sketches = [self._pair.clip_empty(s) for s in sketches]
        current = sketches[0]
        for s in sketches[1:]:
            current = self._pair.merge(current, s)
        return [current.cardinality()]


# stratified set operators (vector_of_counts_sketch_operator.py:45-99)
class VocSketchOperator:
    """union = +, intersection via pairwise merge, difference = - (assumes
    disjoint / subset relationships respectively)."""

    def __init__(self, clip: bool = False, epsilon: float = np.log(3),
                 clip_threshold: float = 3):
        self._pair = PairwiseEstimator(clip, epsilon, clip_threshold)

    def union(self, this: VocSketch | None, that: VocSketch | None):
        if this is None:
            return that
        if that is None:
            return this
        out = this.spec.new()
        out.stats = this.stats + that.stats
        return out

    def intersection(self, this, that):
        if this is None or that is None:
            return None
        merged = self._pair.merge(this, that)
        out = this.spec.new()
        out.stats = this.stats + that.stats - merged.stats
        return out

    def difference(self, this, that):
        if this is None:
            return None
        if that is None:
            return this
        out = this.spec.new()
        out.stats = this.stats - that.stats
        return out
