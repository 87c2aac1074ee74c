"""Sketch protocol: mergeable, Arrow-serializable UDAF states.

The reference models a sketch as a mutable Python object with ``add(x)`` /
``add_ids(iterable)`` and per-class ``merge`` (reference
``src/estimators/base.py:17-69``).  Our engine keeps the same algebra but at
Dataset granularity: a sketch is a small state object that is

  * built per Arrow batch with a vectorized ``update_tokens(np.ndarray)``,
  * merged through a groupby-aggregate tree (``merge_in`` must be associative
    and commutative unless the spec says otherwise — non-associative
    estimators run as driver-side folds over the few final states),
  * serialized to a ``binary`` Arrow column between stages.

Every sketch family registers a frozen ``*Spec`` dataclass (the config — what
the reference calls the sketch factory + hash seeds) and a state class.
"""

from __future__ import annotations

import dataclasses
import io
import pickle
from typing import Any, Callable, ClassVar

import numpy as np

_REGISTRY: dict[str, type] = {}


def register_spec(cls):
    """Class decorator: register a SketchSpec subclass under its ``kind``."""
    _REGISTRY[cls.kind] = cls
    return cls


def spec_from_dict(d: dict) -> "SketchSpec":
    d = dict(d)
    kind = d.pop("kind")
    return _REGISTRY[kind](**d)


@dataclasses.dataclass(frozen=True)
class SketchSpec:
    """Base class for sketch configs. Frozen => hashable, shippable to tasks."""

    kind: ClassVar[str] = "base"
    #: merges commute/associate => safe for arbitrary-order merge trees
    associative: ClassVar[bool] = True

    def new(self) -> "Sketch":
        raise NotImplementedError

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["kind"] = self.kind
        return d

    def config_hash(self) -> str:
        import hashlib

        return hashlib.sha1(repr(sorted(self.to_dict().items())).encode()).hexdigest()[:12]


class Sketch:
    """Base state object. Subclasses hold NumPy arrays + small scalars."""

    spec: SketchSpec

    def update_tokens(self, tokens: np.ndarray) -> None:
        """Vectorized multiset add of an int token array (may contain repeats)."""
        raise NotImplementedError

    def merge_in(self, other: "Sketch") -> None:
        raise NotImplementedError

    def estimate(self) -> list[float]:
        """k+ reach histogram; h[i] = estimated #tokens with frequency >= i+1.

        Length-1 list for pure cardinality sketches (reference
        ``src/estimators/base.py:53-69`` estimator contract).
        """
        raise NotImplementedError

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        """Serialize state (not spec) to a compact binary blob."""
        return pickle.dumps(self.state_dict(), protocol=pickle.HIGHEST_PROTOCOL)

    def state_dict(self) -> dict[str, Any]:
        raise NotImplementedError

    def load_state(self, d: dict[str, Any]) -> None:
        raise NotImplementedError

    @classmethod
    def from_bytes(cls, spec: SketchSpec, blob: bytes) -> "Sketch":
        obj = spec.new()
        obj.load_state(pickle.loads(blob))
        return obj


def merge_many(spec: SketchSpec, blobs) -> Sketch:
    """Fold-merge serialized states into one sketch (associative path)."""
    it = iter(blobs)
    first = spec.new()
    try:
        first.load_state(pickle.loads(next(it)))
    except StopIteration:
        return first
    for b in it:
        first.merge_in(Sketch.from_bytes(spec, b))
    return first


def pack_array(a: np.ndarray) -> bytes:
    """Compact ndarray -> bytes with dtype/shape header (no pickle overhead)."""
    buf = io.BytesIO()
    np.save(buf, a, allow_pickle=False)
    return buf.getvalue()


def unpack_array(b: bytes) -> np.ndarray:
    return np.load(io.BytesIO(b), allow_pickle=False)
