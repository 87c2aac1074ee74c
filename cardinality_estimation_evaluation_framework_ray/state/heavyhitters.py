"""Misra-Gries / SpaceSaving heavy-hitters summary: top-k frequent tokens.

Not in the reference (north-rule addition); implemented from the published
algorithms: Misra & Gries, "Finding repeated elements" (Sci. Comp. Prog.
1982); Metwally, Agrawal & El Abbadi, "Efficient computation of frequent
and top-k elements in data streams" (ICDT 2005, SpaceSaving); Agarwal et
al., "Mergeable summaries" (PODS 2012) — MG and SpaceSaving are isomorphic
and merge associatively, which is what lets the sketch ride this engine's
partial-fold + merge-tree build plans unchanged.

Semantics (batched MG formulation, deterministic and vectorized):
  * fold the incoming batch's exact per-token counts into the counter set;
  * if more than ``capacity`` counters survive, subtract the
    (capacity+1)-th largest count m from every counter and drop the
    non-positive ones (at most ``capacity`` remain — only counters
    strictly above m survive); accumulate m into the decrement total.

Guarantees: every estimate lies in ``[true - decremented, true]`` and the
total decrement is <= N/(capacity+1), so any token with frequency >
N/(capacity+1) is guaranteed present.  EXACT below saturation: while the
stream's distinct-token count never exceeds ``capacity`` (across every
partial and merge), no decrement ever fires and the counters are exact
frequencies — the engine's usual exact-below-saturation oracle mode
(see ``state/hll.py`` sparse mode, ``state/theta.py``).
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import numpy as np

from .base import Sketch, SketchSpec, register_spec


@register_spec
@dataclasses.dataclass(frozen=True)
class HeavyHittersSpec(SketchSpec):
    kind: ClassVar[str] = "heavyhitters"
    capacity: int = 1024

    def new(self) -> "HeavyHittersSketch":
        return HeavyHittersSketch(self)

    def error_bound(self, n: int) -> float:
        """Worst-case undercount after n stream items."""
        return n / (self.capacity + 1)


class HeavyHittersSketch(Sketch):
    """keys kept SORTED ascending (np.unique invariant) so point queries
    are a searchsorted and merges are a concatenate + unique."""

    def __init__(self, spec: HeavyHittersSpec):
        self.spec = spec
        self.keys = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)
        self.decremented = 0  # total MG decrement: undercount bound
        self.n = 0

    def _fold(self, keys: np.ndarray, counts: np.ndarray) -> None:
        k = np.concatenate([self.keys, keys])
        c = np.concatenate([self.counts, counts])
        uk, inv = np.unique(k, return_inverse=True)
        # int64 scatter-add, NOT float64 bincount weights: merged counts
        # above 2^53 would silently lose integer exactness and break the
        # exact-below-saturation contract at extreme stream sizes
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, inv, c)
        cap = self.spec.capacity
        if len(uk) > cap:
            # batched MG decrement: m = (capacity+1)-th largest count
            m = int(np.partition(uc, len(uc) - cap - 1)[len(uc) - cap - 1])
            uc = uc - m
            keep = uc > 0
            uk, uc = uk[keep], uc[keep]
            self.decremented += m
        self.keys, self.counts = uk, uc

    # -- sketch protocol ----------------------------------------------------
    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        uniq, cnt = np.unique(np.asarray(tokens, dtype=np.int64),
                              return_counts=True)
        self._fold(uniq, cnt.astype(np.int64))
        self.n += len(tokens)

    def merge_in(self, other: "HeavyHittersSketch") -> None:
        assert self.spec == other.spec, "incompatible heavy-hitter specs"
        self._fold(other.keys, other.counts)
        self.decremented += other.decremented
        self.n += other.n

    def point_query(self, tokens: np.ndarray) -> np.ndarray:
        """Estimated count per token (0 for untracked — true count is then
        <= ``decremented``)."""
        tokens = np.asarray(tokens, dtype=np.int64)
        idx = np.searchsorted(self.keys, tokens)
        idx = np.clip(idx, 0, max(len(self.keys) - 1, 0))
        if len(self.keys) == 0:
            return np.zeros(len(tokens), dtype=np.int64)
        hit = self.keys[idx] == tokens
        return np.where(hit, self.counts[idx], 0).astype(np.int64)

    def topk(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k tracked tokens by (count desc, key asc) — deterministic."""
        order = np.lexsort((self.keys, -self.counts))[:k]
        return self.keys[order], self.counts[order]

    def estimate(self) -> list[float]:
        """REFUSED, loudly: the base contract reads ``estimate()[0]`` as a
        reach/cardinality value (``state/base.py``), and a heavy-hitters
        summary cannot know the distinct count once decrements fire —
        returning stream length or tracked-key count here would hand
        generic consumers (``sketch_aggregation(output='estimate')``,
        reach reports) a silently wrong number.  Use ``topk`` /
        ``point_query``, or compose with an HLL for reach."""
        raise NotImplementedError(
            "heavy-hitters summary has no reach estimate; use topk() / "
            "point_query(), or pair with an HLL/Theta sketch for reach")

    def state_dict(self):
        return {"k": self.keys, "c": self.counts,
                "d": self.decremented, "n": self.n}

    def load_state(self, d):
        self.keys = np.asarray(d["k"], dtype=np.int64)
        self.counts = np.asarray(d["c"], dtype=np.int64)
        self.decremented = int(d["d"])
        self.n = int(d["n"])
