"""DDSketch: fully-mergeable quantile sketch with RELATIVE-error guarantee.

Not in the reference (north-rule §2.8 extension: the sketch registry is the
documented growth surface, `state/base.py`).  Implemented from the published
algorithm: Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable Quantile
Sketch with Relative-Error Guarantees" (VLDB 2019).

Where KLL / t-digest (`state/quantiles.py`) bound RANK error, DDSketch bounds
VALUE error: every returned quantile is within ``alpha`` RELATIVE error of the
true order statistic — the right contract for heavy-tailed positive metrics
(latencies, prices, document lengths) where the p99 matters in its own units.

Mechanics: a positive value ``v`` maps to the logarithmic bucket
``i = ceil(log_gamma(v))`` with ``gamma = (1 + alpha) / (1 - alpha)``; the
bucket's representative ``2 * gamma^i / (gamma + 1)`` (the harmonic midpoint
of ``(gamma^(i-1), gamma^i]``) is within ``alpha`` of every value in the
bucket.  The state is a sparse (bucket-index -> count) table held as two
sorted int64 arrays — merging is exact integer addition of counts, hence
associative/commutative and BIT-IDENTICAL under any merge-tree fold order
AS LONG AS NO COLLAPSE FIRES (property-tested in ``tests/test_ddsketch.py``;
at the default alpha=0.01 / max_buckets=4096 the uncollapsed span is
(1e-9, 1e9) in ~2100 buckets = ~33 KB, so real positive metrics never
collapse).  Values below ``min_value`` (including zeros; negatives are
rejected) land in a dedicated underflow count, as in the paper's zero
bucket.

Memory is bounded by the collapsing-lowest variant (paper §2.3): past
``max_buckets`` distinct indices the LOWEST buckets fold into the lowest
surviving one.  Collapse weakens the merge contract from bit-identical to
VALUE-level: different fold orders may cut at different low buckets, so
collapsed states can differ bitwise across runs — but ``n`` is always
preserved exactly and every quantile whose rank falls above the collapsed
mass keeps the full ``alpha`` contract in every order (tested).  Pipelines
that hash-compare outputs must size ``max_buckets`` (or ``alpha``) so
collapse cannot fire; bound-assert gates (the ``within_alpha`` pattern)
are safe either way for high quantiles.  Per-(block, key) shuffle payloads
stay KB-scale on the same groupby merge tree every other sketch rides
(`stages/build.py:sketch_aggregation`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import ClassVar

import numpy as np

from .base import Sketch, SketchSpec, register_spec


@register_spec
@dataclasses.dataclass(frozen=True)
class DDSketchSpec(SketchSpec):
    kind: ClassVar[str] = "ddsketch"
    #: relative-error guarantee: |quantile(q) - x_q| <= alpha * x_q
    alpha: float = 0.01
    #: collapsing-lowest memory bound (paper §2.3); <=0 disables collapsing
    max_buckets: int = 4096
    #: values in [0, min_value) count as underflow (the paper's zero bucket)
    min_value: float = 1e-9

    def new(self) -> "DDSketch":
        return DDSketch(self)

    @property
    def gamma(self) -> float:
        return (1.0 + self.alpha) / (1.0 - self.alpha)


class DDSketch(Sketch):
    def __init__(self, spec: DDSketchSpec):
        if not (0.0 < spec.alpha < 1.0):
            raise ValueError(f"alpha must be in (0, 1), got {spec.alpha}")
        if spec.min_value <= 0.0:
            raise ValueError(f"min_value must be > 0, got {spec.min_value}")
        self.spec = spec
        self._log_gamma = math.log(spec.gamma)
        self.keys = np.empty(0, dtype=np.int64)     # sorted bucket indices
        self.counts = np.empty(0, dtype=np.int64)   # aligned counts, > 0
        self.n_underflow = 0                        # values in [0, min_value)

    # -- internals ------------------------------------------------------
    def _bucket_of(self, v: np.ndarray) -> np.ndarray:
        # ceil(log_gamma(v)); v is validated positive and >= min_value
        return np.ceil(np.log(v) / self._log_gamma).astype(np.int64)

    def _fold(self, k: np.ndarray, c: np.ndarray) -> None:
        """Merge (bucket, count) pairs into the sorted sparse table (exact
        int64 addition — the merge is associative by construction)."""
        if len(self.keys):
            k = np.concatenate([self.keys, k])
            c = np.concatenate([self.counts, c])
        uk, inv = np.unique(k, return_inverse=True)
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, inv, c)
        self.keys, self.counts = uk, uc
        self._collapse()

    def _collapse(self) -> None:
        """Collapsing-lowest: fold the smallest indices into the lowest
        surviving bucket so len(keys) <= max_buckets.  Only ranks inside
        the collapsed low-value mass lose the alpha contract."""
        m = self.spec.max_buckets
        if m <= 0 or len(self.keys) <= m:
            return
        cut = len(self.keys) - m  # buckets [0, cut) fold into keys[cut]
        folded = int(self.counts[:cut].sum())
        self.keys = self.keys[cut:]
        self.counts = self.counts[cut:].copy()
        self.counts[0] += folded

    # -- sketch protocol --------------------------------------------------
    def update_tokens(self, values: np.ndarray) -> None:
        """Vectorized add of positive measurements (prices, lengths,
        latencies).  NaN is ignored (SQL null semantics); negatives raise —
        DDSketch's log buckets are defined on (0, inf) only."""
        v = np.asarray(values, dtype=np.float64)
        if len(v) == 0:
            return
        v = v[~np.isnan(v)]
        if len(v) and float(v.min()) < 0.0:
            raise ValueError("DDSketch accepts non-negative values only")
        small = v < self.spec.min_value
        self.n_underflow += int(small.sum())
        v = v[~small]
        if len(v) == 0:
            return
        uk, uc = np.unique(self._bucket_of(v), return_counts=True)
        self._fold(uk, uc.astype(np.int64))

    def merge_in(self, other: "DDSketch") -> None:
        assert self.spec == other.spec
        self.n_underflow += other.n_underflow
        if len(other.keys):
            self._fold(other.keys, other.counts)

    @property
    def n(self) -> int:
        return self.n_underflow + int(self.counts.sum())

    def quantile(self, q: float) -> float:
        """Value estimate at rank ``q * (n - 1)`` (the paper's rank
        convention); within ``alpha`` relative error of the true order
        statistic for un-collapsed ranks.  Underflow ranks return 0.0."""
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"q must be in [0, 1], got {q}")
        n = self.n
        if n == 0:
            return float("nan")
        rank = q * (n - 1)
        if rank < self.n_underflow:
            return 0.0
        cum = self.n_underflow + np.cumsum(self.counts)
        i = int(np.searchsorted(cum, rank, side="right"))
        i = min(i, len(self.keys) - 1)
        g = self.spec.gamma
        return float(2.0 * g ** int(self.keys[i]) / (g + 1.0))

    def quantiles(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(float(q)) for q in qs], np.float64)

    def estimate(self) -> list[float]:
        return [self.quantile(0.5)]

    # -- serialization ----------------------------------------------------
    def state_dict(self):
        return {"k": self.keys, "c": self.counts, "u": self.n_underflow}

    def load_state(self, d):
        self.keys = np.asarray(d["k"], dtype=np.int64)
        self.counts = np.asarray(d["c"], dtype=np.int64)
        self.n_underflow = int(d["u"])
