"""Exact multiset "sketch" — the ground-truth oracle.

Mirrors the reference's ``ExactMultiSet`` + ``LosslessEstimator``
(``src/estimators/exact_set.py:26-98``): an id -> frequency map whose
estimator emits the k+ reach histogram via reversed cumulative sums.  Here the
map is a pair of parallel sorted NumPy arrays (tokens, counts) so updates and
merges stay vectorized; only intended for test/oracle scale.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import numpy as np

from .base import Sketch, SketchSpec, register_spec


@register_spec
@dataclasses.dataclass(frozen=True)
class ExactMultiSetSpec(SketchSpec):
    kind: ClassVar[str] = "exact"
    max_freq: int = 0  # 0 = full histogram; k>0 = clip histogram at k+

    def new(self) -> "ExactMultiSetSketch":
        return ExactMultiSetSketch(self)


class ExactMultiSetSketch(Sketch):
    def __init__(self, spec: ExactMultiSetSpec):
        self.spec = spec
        self.tokens = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)

    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        t, c = np.unique(np.asarray(tokens).astype(np.int64, copy=False),
                         return_counts=True)
        self._combine(t, c)

    def _combine(self, t: np.ndarray, c: np.ndarray) -> None:
        if len(self.tokens) == 0:
            self.tokens, self.counts = t, c
            return
        allt = np.concatenate([self.tokens, t])
        allc = np.concatenate([self.counts, c])
        uniq, inv = np.unique(allt, return_inverse=True)
        summed = np.bincount(inv, weights=allc).astype(np.int64)
        self.tokens, self.counts = uniq, summed

    def merge_in(self, other: "ExactMultiSetSketch") -> None:
        self._combine(other.tokens, other.counts)

    def cardinality(self) -> int:
        return int(len(self.tokens))

    def frequency_of(self, token: int) -> int:
        i = np.searchsorted(self.tokens, token)
        if i < len(self.tokens) and self.tokens[i] == token:
            return int(self.counts[i])
        return 0

    def estimate(self) -> list[float]:
        """k+ histogram: h[i] = #tokens with frequency >= i+1.

        Reverse-cumsum construction per reference exact_set.py:88-98.
        """
        if len(self.counts) == 0:
            return [0.0]
        maxf = int(self.counts.max())
        freq_of_count = np.bincount(self.counts, minlength=maxf + 1)[1:]
        hist = np.cumsum(freq_of_count[::-1])[::-1].astype(np.float64)
        if self.spec.max_freq and len(hist) > self.spec.max_freq:
            hist = hist[: self.spec.max_freq]
        return list(hist)

    def state_dict(self):
        return {"t": self.tokens, "c": self.counts}

    def load_state(self, d):
        self.tokens, self.counts = d["t"], d["c"]


class LosslessEstimator:
    """Union exact sketches, emit the true k+ histogram (exact_set.py:69-98)."""

    def __call__(self, sketch_list) -> list[float]:
        if not sketch_list:
            return [0.0]
        union = sketch_list[0].spec.new()
        for s in sketch_list:
            union.merge_in(s)
        return union.estimate()


class LessOneEstimator:
    """Known-bias estimator for harness plumbing tests (exact_set.py:101-113)."""

    def __call__(self, sketch_list) -> list[float]:
        hist = LosslessEstimator()(sketch_list)
        if sum(hist) == 0:
            raise ValueError("Attempt to create a histogram with a negative value!")
        return [max(h - 1, 0) for h in hist]


class AddRandomElementsNoiser:
    """Sketch noiser inserting n random unseen tokens (exact_set.py:116-133)."""

    def __init__(self, num_random_elements: int,
                 random_state: np.random.RandomState):
        self.num_random_elements = num_random_elements
        self.random_state = random_state

    def __call__(self, sketch: ExactMultiSetSketch) -> ExactMultiSetSketch:
        out = sketch.spec.new()
        out.load_state({"t": sketch.tokens.copy(), "c": sketch.counts.copy()})
        added = 0
        while added < self.num_random_elements:
            x = int(self.random_state.randint(2**62))
            if out.frequency_of(x) == 0:
                out.update_tokens(np.array([x]))
                added += 1
        return out
