"""Exponential Same-Key Aggregator + StandardizedHistogramEstimator.

Mirrors ``src/estimators/same_key_aggregator.py``: three exponential-ADBF-
shaped registers updated with ONE hashing pass per batch (the reference's
three AnySketches draw identical hash seeds, same_key_aggregator.py:59-74,
so all three share the index):

  * bits      — exponential Bloom filter (reach),
  * unique    — unique-key tracker (token+1 / EMPTY 0 / COLLIDED -1,
                any_sketch.py:50-105),
  * counts    — frequency counts (SumFunction).

All three merges are associative + commutative (soft-OR == max on raw bits,
unique-key aggregate, sum — same_key_aggregator.py:233-264), so the whole
SKA rides the distributed merge tree; only the final histogram math runs on
the driver.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import numpy as np

from ..functions.hashing import hash64
from .base import Sketch, SketchSpec, register_spec
from .bloom import BloomSpec, FirstMomentEstimator, _FloatView
from .legions import (
    UNIQUE_COLLIDED,
    UNIQUE_EMPTY,
    unique_key_batch,
    unique_key_combine,
)


@register_spec
@dataclasses.dataclass(frozen=True)
class SkaSpec(SketchSpec):
    kind: ClassVar[str] = "ska"
    length: int = 100_000
    decay_rate: float = 10.0
    seed: int = 1

    def bloom_spec(self) -> BloomSpec:
        return BloomSpec(length=self.length, distribution="exp",
                         decay_rate=self.decay_rate, seed=self.seed)

    def new(self) -> "SkaSketch":
        return SkaSketch(self)


class SkaSketch(Sketch):
    def __init__(self, spec: SkaSpec):
        self.spec = spec
        m = spec.length
        self.bits = np.zeros(m, dtype=np.uint8)
        self.unique = np.zeros(m, dtype=np.int64)
        self.counts = np.zeros(m, dtype=np.int64)

    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        tokens = np.asarray(tokens)
        bspec = self.spec.bloom_spec()
        h = hash64(tokens, bspec.seed + 0)  # hash_no=0 stream, shared by all 3
        from .bloom import register_indexes

        idx = register_indexes(bspec, h)
        self.bits[idx] = 1
        self.counts += np.bincount(idx, minlength=self.spec.length).astype(np.int64)
        # unique keys are token+1 (any_sketch.py:92-105)
        keys = tokens.astype(np.int64) + 1
        incoming = unique_key_batch(idx, keys, self.spec.length)
        self.unique = unique_key_combine(self.unique, incoming)

    def merge_in(self, other: "SkaSketch") -> None:
        assert self.spec == other.spec
        np.maximum(self.bits, other.bits, out=self.bits)  # OR == soft union on raw bits
        self.unique = unique_key_combine(self.unique, other.unique)
        self.counts += other.counts

    def effective_mask(self) -> np.ndarray:
        return (self.unique != UNIQUE_EMPTY) & (self.unique != UNIQUE_COLLIDED)

    def estimate(self) -> list[float]:
        return StandardizedHistogramEstimator(max_freq=10)([self])

    def state_dict(self):
        return {"b": self.bits, "u": self.unique, "c": self.counts}

    def load_state(self, d):
        self.bits, self.unique, self.counts = d["b"], d["u"], d["c"]


class StandardizedHistogramEstimator:
    """k+ reach histogram = 1+ reach x normalized effective-key frequency
    distribution (same_key_aggregator.py:99-335).

    ``reach_noiser`` / ``frequency_noiser`` are callables (see state.noise);
    frequency noise is applied per histogram bucket with the reference's
    sensitivity-2 halving of the budget handled by the caller.
    """

    def __init__(self, max_freq: int = 10, reach_noiser=None,
                 frequency_noiser=None):
        self.max_freq = max_freq
        self.reach_noiser = reach_noiser
        self.frequency_noiser = frequency_noiser

    @staticmethod
    def merge_sketch_list(sketch_list) -> SkaSketch:
        out = sketch_list[0].spec.new()
        for s in sketch_list:
            out.merge_in(s)
        return out

    def estimate_one_plus_reach(self, ska: SkaSketch) -> float:
        est = FirstMomentEstimator("exp", noiser=self.reach_noiser)
        return est([_FloatView(ska.spec.bloom_spec(),
                               ska.bits.astype(np.float64))])

    def estimate_histogram_from_effective_keys(self, ska: SkaSketch) -> np.ndarray:
        freq = ska.counts[ska.effective_mask()].copy()
        if self.max_freq is not None:
            freq[freq > self.max_freq] = self.max_freq
        hist = np.bincount(freq, minlength=self.max_freq + 1)[1:].astype(np.float64)
        if self.frequency_noiser is not None:
            hist = np.array([self.frequency_noiser(h) for h in hist])
        return hist

    @staticmethod
    def standardize_histogram(histogram: np.ndarray, total: float) -> np.ndarray:
        s = histogram.sum()
        if s <= 0:
            import warnings

            warnings.warn("Zero or negative histogram; returning zeros "
                          "(same_key_aggregator.py:308-315).")
            return np.zeros(len(histogram))
        return histogram / s * total

    def __call__(self, sketch_list) -> list[float]:
        ska = self.merge_sketch_list(sketch_list)
        one_plus = self.estimate_one_plus_reach(ska)
        hist = self.estimate_histogram_from_effective_keys(ska)
        std = self.standardize_histogram(hist, one_plus)
        return list(np.cumsum(std[::-1])[::-1])
