"""Quantile sketches over token-count distributions: KLL and t-digest.

Not in the reference (north-rule additions).  Implemented from the published
algorithms:
  * KLL: Karnin, Lang & Liberty, "Optimal quantile approximation in streams"
    (FOCS 2016) — lazy compactor hierarchy, capacity k*(2/3)^depth, uniform
    odd/even downsampling, rank error ~ O(1/k) with high probability.
  * t-digest: Dunning & Ertl, "Computing extremely accurate quantiles using
    t-digests" (2019) — merging digest with the k1 (arcsin) scale function.

Both are mergeable (merge = concatenate + recompress) and ride the
distributed merge tree; estimates are approximate, so their tests assert
rank-error bounds, not equality (SURVEY.md §5 statistical-band style).
"""

from __future__ import annotations

import dataclasses
import math
from typing import ClassVar

import numpy as np

from .base import Sketch, SketchSpec, register_spec


# ---------------------------------------------------------------------------
# KLL
# ---------------------------------------------------------------------------

@register_spec
@dataclasses.dataclass(frozen=True)
class KllSpec(SketchSpec):
    kind: ClassVar[str] = "kll"
    k: int = 200
    seed: int = 1

    def new(self) -> "KllSketch":
        return KllSketch(self)

    def rank_error(self) -> float:
        """~99% rank-error bound (empirical constant from the KLL paper)."""
        return 2.296 / self.k


class KllSketch(Sketch):
    _C = 2.0 / 3.0

    def __init__(self, spec: KllSpec):
        self.spec = spec
        self.compactors: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(spec.seed)

    # -- capacity machinery -------------------------------------------------
    def _capacity(self, level: int) -> int:
        depth = len(self.compactors) - level - 1
        return max(2, int(math.ceil(self.spec.k * (self._C ** depth))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.compactors)))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _compress(self) -> None:
        while self._size() >= self._total_capacity():
            for level in range(len(self.compactors)):
                if len(self.compactors[level]) >= self._capacity(level):
                    if level + 1 == len(self.compactors):
                        self.compactors.append(np.empty(0, dtype=np.float64))
                    c = np.sort(self.compactors[level])
                    offset = int(self._rng.integers(2))
                    promoted = c[offset::2]
                    self.compactors[level] = np.empty(0, dtype=np.float64)
                    self.compactors[level + 1] = np.concatenate(
                        [self.compactors[level + 1], promoted])
                    break
            else:
                break

    # -- sketch protocol ----------------------------------------------------
    def update_tokens(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self.compactors[0] = np.concatenate(
            [self.compactors[0], np.asarray(values, dtype=np.float64)])
        self.n += len(values)
        self._compress()

    def merge_in(self, other: "KllSketch") -> None:
        assert self.spec == other.spec
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        for level, c in enumerate(other.compactors):
            self.compactors[level] = np.concatenate([self.compactors[level], c])
        self.n += other.n
        self._compress()

    def _weighted_items(self):
        vals, weights = [], []
        for level, c in enumerate(self.compactors):
            if len(c):
                vals.append(c)
                weights.append(np.full(len(c), 2 ** level, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target))
        return float(v[min(i, len(v) - 1)])

    def rank(self, value: float) -> float:
        """Approximate fraction of items <= value."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cum = np.concatenate([[0.0], np.cumsum(w)])
        i = int(np.searchsorted(v, value, side="right"))
        return float(cum[i] / cum[-1])

    def estimate(self) -> list[float]:
        return [self.quantile(0.5)]

    def state_dict(self):
        return {"c": self.compactors, "n": self.n,
                "rng": self._rng.bit_generator.state}

    def load_state(self, d):
        self.compactors = list(d["c"])
        self.n = int(d["n"])
        self._rng.bit_generator.state = d["rng"]


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------

@register_spec
@dataclasses.dataclass(frozen=True)
class TDigestSpec(SketchSpec):
    kind: ClassVar[str] = "tdigest"
    compression: float = 100.0

    def new(self) -> "TDigestSketch":
        return TDigestSketch(self)


class TDigestSketch(Sketch):
    def __init__(self, spec: TDigestSpec):
        self.spec = spec
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.vmin = math.inf
        self.vmax = -math.inf

    # k1 scale function: delta/(2*pi) * asin(2q - 1)
    def _k(self, q: np.ndarray | float) -> np.ndarray | float:
        return self.spec.compression / (2 * math.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _merge_centroids(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        acc_m, acc_w = means[0], weights[0]
        w_so_far = 0.0
        k_lo = self._k(0.0)
        for m, w in zip(means[1:], weights[1:]):
            q_hi = (w_so_far + acc_w + w) / total
            if self._k(q_hi) - k_lo <= 1.0:
                acc_m = (acc_m * acc_w + m * w) / (acc_w + w)
                acc_w += w
            else:
                out_m.append(acc_m)
                out_w.append(acc_w)
                w_so_far += acc_w
                k_lo = self._k(w_so_far / total)
                acc_m, acc_w = m, w
        out_m.append(acc_m)
        out_w.append(acc_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)
        self.n = total

    def update_tokens(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.asarray(values, dtype=np.float64)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._merge_centroids(np.concatenate([self.means, v]),
                              np.concatenate([self.weights, np.ones(len(v))]))

    def merge_in(self, other: "TDigestSketch") -> None:
        assert self.spec == other.spec
        if other.n == 0:
            return
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._merge_centroids(np.concatenate([self.means, other.means]),
                              np.concatenate([self.weights, other.weights]))

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        target = q * self.n
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            return self.vmin if q <= 0 else float(
                self.vmin + (self.means[0] - self.vmin) * (target / cum[0]))
        if target >= cum[-1]:
            span = self.n - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 0.0
            return float(self.means[-1] + (self.vmax - self.means[-1]) * min(frac, 1.0))
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + (self.means[i + 1] - self.means[i]) * frac)

    def estimate(self) -> list[float]:
        return [self.quantile(0.5)]

    def state_dict(self):
        return {"m": self.means, "w": self.weights, "n": self.n,
                "lo": self.vmin, "hi": self.vmax}

    def load_state(self, d):
        self.means, self.weights = d["m"], d["w"]
        self.n, self.vmin, self.vmax = float(d["n"]), d["lo"], d["hi"]
