"""Theta / KMV (k minimum values) sketch — mergeable distinct counting with
closed SET ALGEBRA (union / intersection / difference estimates), the
Dasgupta-Lang-Rhodes-Thaler "theta sketch framework" (public literature;
no counterpart in the reference, which estimates intersections via
model-based deconvolution — SURVEY.md §2.8 extension surface).

State: the set of retained 64-bit hashes strictly below the threshold
theta.  Below saturation (fewer than k distinct items) theta = 2^64 and the
sketch is EXACT — that regime backs the SQL-oracle queries; above it,
estimate = |retained| / (theta/2^64) with relative error ~ 1/sqrt(k - 1).
theta is kept as an EXACT python int (a float64 threshold cannot represent
every uint64 and would mis-classify hashes adjacent to it).

Set algebra (``theta_intersect`` / ``theta_difference``): operate at
theta' = min(theta_a, theta_b); each retained hash is a uniform sample of
the underlying set at rate theta'/2^64, so |A op B| ≈ |retained_a op
retained_b below theta'| / (theta'/2^64).  All ops return a REAL sketch
(hashes + theta), so expressions compose: (A ∩ B) ∪ C works.

Distributed shape: same contract as every sketch here — vectorized
``update_tokens`` (one hash64 + partition per batch), associative
``merge_in`` (union + re-truncate), KB-scale serialized state (k × 8
bytes), so it rides ``stages/build.py``'s partial/combiner/epoch plans and
the ``sketch_aggregation`` UDAF unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import numpy as np

from ..functions.hashing import hash64
from .base import Sketch, SketchSpec, register_spec

_U64_SPAN = 2 ** 64  # exclusive-threshold sentinel: "keep everything"


@register_spec
@dataclasses.dataclass(frozen=True)
class ThetaSpec(SketchSpec):
    kind: ClassVar[str] = "theta"
    k: int = 4096
    seed: int = 1

    def __post_init__(self):
        if self.k < 2:
            raise ValueError(f"theta sketch needs k >= 2, got {self.k}")

    def new(self) -> "ThetaSketch":
        return ThetaSketch(self)


def _below(hashes: np.ndarray, theta: int) -> np.ndarray:
    """Exact uint64-domain threshold filter (no float rounding)."""
    if theta >= _U64_SPAN:
        return hashes
    return hashes[hashes < np.uint64(theta)]


class ThetaSketch(Sketch):
    """Retained hashes are kept SORTED unique uint64; ``theta`` is the
    exclusive integer threshold (hashes < theta are retained)."""

    def __init__(self, spec: ThetaSpec):
        self.spec = spec
        self.hashes = np.empty(0, dtype=np.uint64)
        self.theta = _U64_SPAN

    # -- update ------------------------------------------------------------
    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        h = hash64(np.asarray(tokens), self.spec.seed).astype(np.uint64)
        h = _below(h, self.theta)
        if len(h) == 0:
            return
        self._truncate(np.union1d(self.hashes, h))

    # -- merge -------------------------------------------------------------
    def merge_in(self, other: "ThetaSketch") -> None:
        if other.spec != self.spec:
            raise ValueError("theta merge across different specs")
        self.theta = min(self.theta, other.theta)
        merged = _below(np.union1d(self.hashes, other.hashes), self.theta)
        self._truncate(merged)

    def _truncate(self, sorted_hashes: np.ndarray) -> None:
        k = self.spec.k
        if len(sorted_hashes) > k:
            # keep the k smallest; theta becomes the (k+1)-th value so the
            # retained set is exactly {h < theta}
            self.theta = int(sorted_hashes[k])
            sorted_hashes = sorted_hashes[:k]
        self.hashes = sorted_hashes

    # -- estimate ----------------------------------------------------------
    def estimate(self) -> list[float]:
        if self.theta >= _U64_SPAN:
            return [float(len(self.hashes))]
        return [len(self.hashes) / (self.theta / _U64_SPAN)]

    # -- serialization -----------------------------------------------------
    def state_dict(self) -> dict:
        return {"hashes": self.hashes, "theta": int(self.theta)}

    def load_state(self, d: dict) -> None:
        self.hashes = np.asarray(d["hashes"], dtype=np.uint64)
        self.theta = int(d["theta"])


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """A ∩ B as a composable theta sketch (theta' = min; retained =
    intersection of the two below-theta' samples)."""
    if a.spec != b.spec:
        raise ValueError("theta set ops need identical specs")
    out = ThetaSketch(a.spec)
    out.theta = min(a.theta, b.theta)
    out.hashes = np.intersect1d(_below(a.hashes, out.theta),
                                _below(b.hashes, out.theta))
    return out


def theta_difference(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """A \\ B as a composable theta sketch."""
    if a.spec != b.spec:
        raise ValueError("theta set ops need identical specs")
    out = ThetaSketch(a.spec)
    out.theta = min(a.theta, b.theta)
    out.hashes = np.setdiff1d(_below(a.hashes, out.theta),
                              _below(b.hashes, out.theta))
    return out
