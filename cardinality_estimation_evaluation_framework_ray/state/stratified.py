"""Stratified frequency sketch: per-frequency-level cardinality sketches.

Mirrors ``src/estimators/stratified_sketch.py``: strata for frequency
1..max_freq-1, 'max+' and '1+', built lazily from an exact multiset.  In the
distributed engine the underlying multiset is the per-key output of the
exact-sketch merge tree (tokens partitioned by frequency level with one
vectorized pass); the convolution merge
``Merged(k) = U_{i+j=k} A(i) n B(j)`` (stratified_sketch.py:408-476) is
PAIRWISE and expensive, so it stays a driver-side fold over the <= #keys
final sketches — exactly the reference's order contract.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, ClassVar

import numpy as np

from .base import Sketch, SketchSpec, register_spec
from .exact import ExactMultiSetSketch, ExactMultiSetSpec

ONE_PLUS = "1+"


class ExactSetOperator:
    """Set algebra on ExactMultiSetSketch token arrays, frequencies reset to 1
    (stratified_sketch.py:26-68)."""

    @classmethod
    def _make(cls, template: ExactMultiSetSketch, tokens: np.ndarray) -> ExactMultiSetSketch:
        out = template.spec.new()
        out.tokens = np.asarray(tokens, dtype=np.int64)
        out.counts = np.ones(len(out.tokens), dtype=np.int64)
        return out

    @classmethod
    def union(cls, this, that):
        if this is None:
            return None if that is None else cls._make(that, that.tokens)
        if that is None:
            return cls._make(this, this.tokens)
        return cls._make(this, np.union1d(this.tokens, that.tokens))

    @classmethod
    def intersection(cls, this, that):
        if this is None or that is None:
            return None
        return cls._make(this, np.intersect1d(this.tokens, that.tokens))

    @classmethod
    def difference(cls, this, that):
        if this is None:
            return None
        if that is None:
            return cls._make(this, this.tokens)
        return cls._make(this, np.setdiff1d(this.tokens, that.tokens))


@register_spec
@dataclasses.dataclass(frozen=True)
class StratifiedSpec(SketchSpec):
    kind: ClassVar[str] = "stratified"
    associative: ClassVar[bool] = False  # convolution merge is pairwise-only
    max_freq: int = 3
    # spec of the per-stratum cardinality sketch (exact by default)
    cardinality_kind: str = "exact"
    cardinality_params: tuple = ()
    seed: int = 1

    def cardinality_spec(self) -> SketchSpec:
        from .base import _REGISTRY

        return _REGISTRY[self.cardinality_kind](**dict(self.cardinality_params))

    def new(self) -> "StratifiedSketch":
        return StratifiedSketch(self)


class StratifiedSketch(Sketch):
    """Holds the underlying exact multiset; strata materialize lazily
    (stratified_sketch.py:152-214)."""

    def __init__(self, spec: StratifiedSpec):
        self.spec = spec
        self.underlying = ExactMultiSetSpec().new()
        self.sketches: dict = {}

    # -- build --------------------------------------------------------------
    def update_tokens(self, tokens: np.ndarray) -> None:
        if self.sketches:
            self.sketches = {}  # adds after creation destroy strata (":230-236")
        self.underlying.update_tokens(tokens)

    def merge_in(self, other: "StratifiedSketch") -> None:
        """Merge of UNDERLYING multisets (valid for same-key partials; the
        cross-key merge is the estimator's convolution, not this)."""
        if self.sketches:
            self.sketches = {}
        self.underlying.merge_in(other.underlying)

    def create_sketches(self, noiser: Callable | None = None,
                        one_plus_noiser: Callable | None = None,
                        one_plus_union: Callable | None = None) -> None:
        """Materialize strata 1..max_freq-1, 'max+' and '1+'.

        ``noiser`` perturbs each frequency stratum; ``one_plus_noiser``
        (default: ``noiser``) perturbs the 1+ sketch.  When
        ``one_plus_union`` is given, the 1+ sketch is the union-merge of the
        strata (the reference's epsilon_split=0 path,
        stratified_sketch.py:207-210); otherwise it is built from the
        underlying exact set (epsilon_split>0, ":163-185").
        """
        if self.sketches:
            return
        maxf = self.spec.max_freq
        cspec = self.spec.cardinality_spec()
        levels = np.minimum(self.underlying.counts, maxf)
        max_key = f"{maxf}+"
        for freq in range(1, maxf):
            sk = cspec.new()
            sk.update_tokens(self.underlying.tokens[levels == freq])
            self.sketches[freq] = sk
        sk = cspec.new()
        sk.update_tokens(self.underlying.tokens[levels == maxf])
        self.sketches[max_key] = sk
        if one_plus_union is not None:
            one_plus = None
            for freq in range(1, maxf):
                one_plus = one_plus_union(one_plus, self.sketches[freq])
            one_plus = one_plus_union(one_plus, self.sketches[max_key])
        else:
            one_plus = cspec.new()
            one_plus.update_tokens(self.underlying.tokens)
        self.sketches[ONE_PLUS] = one_plus
        if one_plus_noiser is None:
            one_plus_noiser = noiser
        if noiser is not None:
            for k in list(self.sketches):
                if k != ONE_PLUS:
                    self.sketches[k] = noiser(self.sketches[k])
        if one_plus_noiser is not None:
            self.sketches[ONE_PLUS] = one_plus_noiser(self.sketches[ONE_PLUS])

    def estimate(self) -> list[float]:
        return PairwiseEstimator(ExactSetOperator,
                                 lambda sl: [sl[0].cardinality()]
                                 ).estimate_cardinality(self._created())

    def _created(self) -> "StratifiedSketch":
        self.create_sketches()
        return self

    def state_dict(self):
        return {"t": self.underlying.tokens, "c": self.underlying.counts}

    def load_state(self, d):
        self.underlying.tokens, self.underlying.counts = d["t"], d["c"]
        self.sketches = {}


class AdbfStratifiedOperator:
    """Adapt a register-array ADBF SketchOperator (bloom.py:367-438, methods
    ``(spec, this_regs, that_regs)``) to the stratified two-operand sketch
    contract used by PairwiseEstimator.  Operands/results are BloomSketch-like
    objects exposing ``float_registers()``; results are float views over the
    shared spec (bloom_filter_sketch_operators.py:29-77 shape)."""

    def __init__(self, op, spec):
        self._op = op
        self._spec = spec

    @staticmethod
    def _regs(s):
        return None if s is None else s.float_registers()

    def _wrap(self, regs):
        from .bloom import _FloatView

        return None if regs is None else _FloatView(self._spec, regs)

    def union(self, this, that):
        return self._wrap(self._op.union(self._spec, self._regs(this),
                                         self._regs(that)))

    def intersection(self, this, that):
        return self._wrap(self._op.intersection(self._spec, self._regs(this),
                                                self._regs(that)))

    def difference(self, this, that):
        return self._wrap(self._op.difference(self._spec, self._regs(this),
                                              self._regs(that)))


class StratifiedSketchNoiser:
    """Config-level Sketch -> Sketch noiser for stratified sketches: triggers
    stratum creation with the reference's epsilon-split local-DP semantics
    (stratified_sketch.py:144-150 + 207-222).

    epsilon_split == 0: 1+ is the union-merge of the strata (``one_plus_union``
    required) and every sketch is noised with the full epsilon.
    epsilon_split > 0: 1+ is built from the underlying exact set and noised
    with epsilon*split; the strata get epsilon*(1-split).
    """

    def __init__(self, noiser_factory: Callable[[float], Callable],
                 epsilon: float | None, epsilon_split: float = 0.5,
                 one_plus_union: Callable | None = None):
        assert 0 <= epsilon_split < 1, "epsilon split not in [0, 1)"
        self._union = one_plus_union if epsilon_split == 0 else None
        if epsilon is None or not np.isfinite(epsilon):
            self._rest = self._one_plus = None
        elif epsilon_split == 0:
            self._rest = noiser_factory(epsilon)
            self._one_plus = noiser_factory(epsilon)
        else:
            self._rest = noiser_factory(epsilon * (1 - epsilon_split))
            self._one_plus = noiser_factory(epsilon * epsilon_split)

    def __call__(self, sketch: "StratifiedSketch") -> "StratifiedSketch":
        sketch.create_sketches(noiser=self._rest,
                               one_plus_noiser=self._one_plus,
                               one_plus_union=self._union)
        return sketch


class PairwiseEstimator:
    """Convolution merge of two stratified sketches + estimate
    (stratified_sketch.py:328-513)."""

    def __init__(self, sketch_operator, cardinality_estimator,
                 denoiser: Callable | None = None):
        self.op = sketch_operator
        self.cardinality_estimator = cardinality_estimator
        self.denoiser = denoiser

    def prepare(self, s: StratifiedSketch) -> StratifiedSketch:
        s.create_sketches()
        if self.denoiser is not None:
            for k in list(s.sketches):
                s.sketches[k] = self.denoiser(s.sketches[k])
        return s

    def merge_sketches(self, this: StratifiedSketch, that: StratifiedSketch) -> StratifiedSketch:
        assert this.spec.max_freq == that.spec.max_freq
        maxf = this.spec.max_freq
        max_key = f"{maxf}+"
        this_1p, that_1p = this.sketches[ONE_PLUS], that.sketches[ONE_PLUS]
        merged_sketch = this.spec.new()
        merged_sketch.sketches = dict(this.sketches)

        for k in range(1, maxf):
            # A(k) & B(0) = A(k) - (A(k) & B(1+))
            merged = self.op.difference(
                this.sketches[k], self.op.intersection(this.sketches[k], that_1p))
            # A(0) & B(k) = B(k) - (B(k) & A(1+))
            merged = self.op.union(
                merged, self.op.difference(
                    that.sketches[k], self.op.intersection(this_1p, that.sketches[k])))
            for i in range(1, k):
                merged = self.op.union(
                    merged, self.op.intersection(this.sketches[i], that.sketches[k - i]))
            merged_sketch.sketches[k] = merged

        merged = this.sketches[max_key]
        rest = that_1p
        for k in range(1, maxf):
            merged = self.op.union(
                merged, self.op.intersection(this.sketches[maxf - k], rest))
            rest = self.op.difference(rest, that.sketches[k])
        merged = self.op.union(
            merged, self.op.difference(
                that.sketches[max_key],
                self.op.intersection(that.sketches[max_key], this_1p)))
        merged_sketch.sketches[max_key] = merged

        one_plus = None
        for k in range(1, maxf):
            one_plus = self.op.union(one_plus, merged_sketch.sketches[k])
        one_plus = self.op.union(one_plus, merged_sketch.sketches[max_key])
        merged_sketch.sketches[ONE_PLUS] = one_plus
        return merged_sketch

    def estimate_cardinality(self, s: StratifiedSketch) -> list[float]:
        maxf = s.spec.max_freq
        result = []
        for freq in range(1, maxf):
            hist = self.cardinality_estimator([s.sketches[freq]])
            assert len(hist) == 1, "cardinality sketch has >1 freq bucket"
            result.append(hist[0])
        hist = self.cardinality_estimator([s.sketches[f"{maxf}+"]])
        assert len(hist) == 1
        result.append(hist[0])
        return list(np.cumsum(result[::-1])[::-1])

    def __call__(self, this: StratifiedSketch, that: StratifiedSketch) -> list[float]:
        merged = self.merge_sketches(self.prepare(this), self.prepare(that))
        return self.estimate_cardinality(merged)


class SequentialEstimator:
    """Ordered fold of convolution merges (stratified_sketch.py:516-534)."""

    def __init__(self, sketch_operator, cardinality_estimator,
                 denoiser: Callable | None = None):
        self.pairwise = PairwiseEstimator(sketch_operator, cardinality_estimator,
                                          denoiser)

    def __call__(self, sketch_list) -> list[float]:
        prepared = [self.pairwise.prepare(s) for s in sketch_list]
        merged = prepared[0]
        for s in prepared[1:]:
            merged = self.pairwise.merge_sketches(merged, s)
        return self.pairwise.estimate_cardinality(merged)
