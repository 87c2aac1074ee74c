"""Cascading Legions and Liquid Legions sketches + DP estimators.

Mirrors ``src/estimators/cascading_legions.py`` and ``liquid_legions.py``.
Dict-of-register state becomes dense NumPy arrays (counts + unique-key), and
the per-fingerprint Python loops become vectorized batch kernels:

  * CascadingLegions bucket: legion = min(trailing_zeros(f), l-1), position =
    (f >> (tz+1)) % m  (cascading_legions.py:55-63) — trailing zeros via the
    (f & -f) isolate-lowest-bit trick;
  * LiquidLegions bucket: inverse-CDF of the truncated exponential,
    1 - log(e^a + u(1-e^a))/a  (liquid_legions.py:64-79), closed-form on the
    whole fingerprint array;
  * the reference's per-register fingerprint SET ("mask",
    cascading_legions.py:70) is replaced by a unique-key register (value /
    EMPTY / COLLIDED) — equivalent for its only use (len(mask)==1 tests
    whether exactly one distinct key hit the register) at O(1) memory.

Registers store fingerprint+1 so 0 can mean EMPTY (the same trick as
``any_sketch.UniqueKeyFunction.get_value_from_id``, any_sketch.py:92-105).

Merges (counts add, unique-key aggregate, cascading_legions.py:118-124,
liquid_legions.py:149-156) are associative + commutative -> distributed tree.
The correction-matrix estimators, Venn estimator and Monte-Carlo posterior
Sampler / SequentialEstimator (liquid_legions.py:205-593) are driver-side,
operating on the <= #keys final states (the sampler's sequential merge is
order-dependent by construction).
"""

from __future__ import annotations

import dataclasses
import math
from typing import ClassVar

import numpy as np

from ..functions.hashing import bit_length_u64, expi_negative, hash64, invert_monotonic
from .base import Sketch, SketchSpec, register_spec

UNIQUE_EMPTY = 0
UNIQUE_COLLIDED = -1


# ---------------------------------------------------------------------------
# unique-key register algebra (vectorized)
# ---------------------------------------------------------------------------

def unique_key_batch(idx: np.ndarray, keys: np.ndarray, num_registers: int) -> np.ndarray:
    """Fold a batch of (register, key) pairs into a unique-key register array.

    Result[r] = the single distinct key that hit r, or COLLIDED if several,
    or EMPTY.  Vectorized: sort by (idx, key); a register is unique iff its
    first and last sorted keys agree.
    """
    out = np.zeros(num_registers, dtype=np.int64)
    if len(idx) == 0:
        return out
    order = np.lexsort((keys, idx))
    sidx, skey = idx[order], keys[order]
    starts = np.concatenate([[True], sidx[1:] != sidx[:-1]])
    ends = np.concatenate([sidx[1:] != sidx[:-1], [True]])
    regs = sidx[starts]
    first_key = skey[starts]
    last_key = skey[ends]
    out[regs] = np.where(first_key == last_key, first_key, UNIQUE_COLLIDED)
    return out


def unique_key_combine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise unique_aggregator (liquid_legions.py:25-41) on flag arrays."""
    out = np.where(a == UNIQUE_EMPTY, b, a)
    both = (a != UNIQUE_EMPTY) & (b != UNIQUE_EMPTY)
    out = np.where(both & ((a == UNIQUE_COLLIDED) | (b == UNIQUE_COLLIDED) | (a != b)),
                   UNIQUE_COLLIDED, out)
    return out


def _fingerprints(tokens: np.ndarray, seed: int) -> np.ndarray:
    """32-bit fingerprints (reference farmhash.hash32withseed analog)."""
    return (hash64(tokens, seed) & np.uint64(0xFFFFFFFF)).astype(np.int64)


# ---------------------------------------------------------------------------
# Cascading Legions
# ---------------------------------------------------------------------------

@register_spec
@dataclasses.dataclass(frozen=True)
class CascadingLegionsSpec(SketchSpec):
    kind: ClassVar[str] = "cascading_legions"
    l: int = 32           # number of legions
    m: int = 10_000       # positions per legion
    seed: int = 1

    def new(self) -> "CascadingLegionsSketch":
        return CascadingLegionsSketch(self)


class CascadingLegionsSketch(Sketch):
    def __init__(self, spec: CascadingLegionsSpec):
        self.spec = spec
        n = spec.l * spec.m
        self.counts = np.zeros(n, dtype=np.int64)
        self.unique = np.zeros(n, dtype=np.int64)
        self.added_noise = 0.0

    def _buckets(self, f: np.ndarray) -> np.ndarray:
        f = f.astype(np.uint64)
        nz = f != 0
        tz = np.zeros(len(f), dtype=np.int64)
        tz[nz] = bit_length_u64(f[nz] & (~f[nz] + np.uint64(1))) - 1
        legion = np.minimum(tz, self.spec.l - 1)
        residual = f >> (tz + 1).astype(np.uint64)
        pos = (residual % np.uint64(self.spec.m)).astype(np.int64)
        pos[~nz] = 0
        legion[~nz] = self.spec.l - 1
        return legion * self.spec.m + pos

    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        f = _fingerprints(np.asarray(tokens), self.spec.seed)
        b = self._buckets(f)
        self.counts += np.bincount(b, minlength=len(self.counts)).astype(np.int64)
        incoming = unique_key_batch(b, f + 1, len(self.counts))
        self.unique = unique_key_combine(self.unique, incoming)

    def merge_in(self, other: "CascadingLegionsSketch") -> None:
        assert self.spec == other.spec
        assert self.added_noise == other.added_noise == 0.0 or True
        self.counts += other.counts
        self.unique = unique_key_combine(self.unique, other.unique)
        self.added_noise = max(self.added_noise, other.added_noise)

    # -- noise (cascading_legions.py:95-107) --------------------------------
    def add_dp_noise(self, p: float, random_state=None) -> None:
        assert not self.added_noise, "Noise can only be added once."
        rs = random_state or np.random.RandomState()
        flip = rs.uniform(0, 1, len(self.counts)) < p
        self.counts = np.where(flip, np.where(self.counts > 0, 0, 1), self.counts)
        self.added_noise = p

    # -- estimation ---------------------------------------------------------
    def legions_expectation(self, cardinality: float) -> float:
        """Expected activated legionaries (cascading_legions.py:83-93)."""
        r, l = 0.0, 0
        for l in range(1, self.spec.l):
            r += self.spec.m * (1 - math.exp(-cardinality / (2 ** l * self.spec.m)))
        r += self.spec.m * (1 - math.exp(-cardinality / (2 ** l * self.spec.m)))
        return r

    def legionaries_count(self) -> int:
        return int(np.sum(self.counts > 0))

    def get_cardinality(self) -> float:
        return invert_monotonic(self.legions_expectation)(self.legionaries_count())

    def estimate(self) -> list[float]:
        return [self.get_cardinality()]

    def frequency_histogram(self) -> dict[int, float]:
        """Register-sampled frequency distribution (cascading_legions.py:126-142)."""
        effective = (self.unique != UNIQUE_EMPTY) & (self.unique != UNIQUE_COLLIDED)
        sample = self.counts[effective & (self.counts > 0)]
        if len(sample) == 0:
            return {}
        vals, cnts = np.unique(sample, return_counts=True)
        total = cnts.sum()
        return {int(v): float(c / total) for v, c in zip(vals, cnts)}

    def state_dict(self):
        return {"c": self.counts, "u": self.unique, "p": self.added_noise}

    def load_state(self, d):
        self.counts, self.unique = d["c"], d["u"]
        self.added_noise = float(d["p"])


def transition_probability(num_sketches: int, s: int, t: int, p: float) -> float:
    """P(position with s ones -> t ones | per-bit flip prob p)
    (cascading_legions.py:209-236)."""
    q = 1 - p
    result = 0.0
    for i in range(num_sketches // 2 + 1):
        flip_zeros = max(0, t - s) + i
        flip_ones = max(0, s - t) + i
        flips = flip_ones + flip_zeros
        calms = num_sketches - flips
        if flip_ones > s or flip_zeros > num_sketches - s:
            continue
        choices = math.comb(s, flip_ones) * math.comb(num_sketches - s, flip_zeros)
        if choices <= 0:
            continue
        result += choices * p ** flips * q ** calms
    return result


def correction_matrix(num_sketches: int, p: float) -> np.ndarray:
    t = np.array([[transition_probability(num_sketches, col, row, p)
                   for col in range(num_sketches + 1)]
                  for row in range(num_sketches + 1)])
    return np.linalg.inv(t)


class CascadingLegionsEstimator:
    """Golden-legion estimator for (possibly DP-noised) sketch lists
    (cascading_legions.py:157-279)."""

    def __init__(self, flip_probability: float | None = None):
        self.flip_probability = flip_probability

    @staticmethod
    def legion_as_vector(sketch_list, legion_index: int) -> np.ndarray:
        m = sketch_list[0].spec.m
        lo, hi = legion_index * m, (legion_index + 1) * m
        ones = sum((s.counts[lo:hi] > 0).astype(np.int64) for s in sketch_list)
        return np.bincount(ones, minlength=len(sketch_list) + 1)

    @classmethod
    def estimate_from_one_legion(cls, sketch_list, legion_index: int, p: float) -> float:
        c = correction_matrix(len(sketch_list), p)
        v = cls.legion_as_vector(sketch_list, legion_index)
        f = float(v.sum() - c[0, :].dot(v))
        n = sketch_list[0].spec.m
        if f > n:
            return 2 ** legion_index * n * 10
        return -math.log(1 - f / n) * n * (2 ** (legion_index + 1))

    def __call__(self, sketch_list) -> list[float]:
        if not sketch_list:
            return [0.0]
        p = self.flip_probability if self.flip_probability is not None \
            else sketch_list[0].added_noise
        noises = {s.added_noise for s in sketch_list}
        assert noises == {p}, f"inconsistent sketch noise: {noises} != {p}"
        l = sketch_list[0].spec.l
        n = sketch_list[0].spec.m
        e = None
        for i in range(l):
            e = self.estimate_from_one_legion(sketch_list, i, p)
            if e < n / 2 * 2 ** (i + 1):  # golden legion (cascading_legions.py:267-279)
                return [e]
        raise AssertionError(
            f"Not enough legions; cardinality appears greater than {e}.")


# ---------------------------------------------------------------------------
# Liquid Legions
# ---------------------------------------------------------------------------

@register_spec
@dataclasses.dataclass(frozen=True)
class LiquidLegionsSpec(SketchSpec):
    kind: ClassVar[str] = "liquid_legions"
    a: float = 10.0     # exponential rate
    m: int = 100_000    # number of legionaries
    seed: int = 1

    def __post_init__(self):
        assert self.a > 0, f"Parameter a must be positive. {self.a} is not."

    def new(self) -> "LiquidLegionsSketch":
        return LiquidLegionsSketch(self)


class LiquidLegionsSketch(Sketch):
    def __init__(self, spec: LiquidLegionsSpec):
        self.spec = spec
        self.counts = np.zeros(spec.m, dtype=np.int64)
        self.unique = np.zeros(spec.m, dtype=np.int64)
        self.added_noise = 0.0

    def _buckets(self, f: np.ndarray) -> np.ndarray:
        a = self.spec.a
        u = f.astype(np.float64) / 2.0**32
        x = 1 - np.log(np.exp(a) + u * (1 - np.exp(a))) / a  # liquid_legions.py:64-67
        return np.minimum((x * self.spec.m).astype(np.int64), self.spec.m - 1)

    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        f = _fingerprints(np.asarray(tokens), self.spec.seed)
        b = self._buckets(f)
        self.counts += np.bincount(b, minlength=self.spec.m).astype(np.int64)
        incoming = unique_key_batch(b, f + 1, self.spec.m)
        self.unique = unique_key_combine(self.unique, incoming)

    def merge_in(self, other: "LiquidLegionsSketch") -> None:
        assert self.spec == other.spec
        self.counts += other.counts
        self.unique = unique_key_combine(self.unique, other.unique)
        self.added_noise = max(self.added_noise, other.added_noise)

    def add_dp_noise(self, p: float, random_state=None) -> None:
        assert not self.added_noise, "Noise can only be added once."
        rs = random_state or np.random.RandomState()
        flip = rs.uniform(0, 1, self.spec.m) < p
        self.counts = np.where(flip, np.where(self.counts > 0, 0, 1), self.counts)
        self.added_noise = p

    # -- estimation (liquid_legions.py:102-147) -----------------------------
    def legions_expectation(self, t: float) -> float:
        """Expected FRACTION of activated legionaries at relative cardinality t."""
        if t == 0:
            return 0.0
        a = self.spec.a
        c = math.exp(a) - 1
        return 1 - (-expi_negative(-a * t / c)
                    + expi_negative(-a * math.exp(a) * t / c)) / a

    def get_cardinality_for_legionaries_count(self, count: float) -> float:
        p = max(min(count / self.spec.m, self.spec.m - 1), 0)
        rel = invert_monotonic(self.legions_expectation, epsilon=1e-7)(p)
        result = rel * self.spec.m
        assert result >= 0, "This should never happen."
        return result

    def legionaries_count(self) -> int:
        return int(np.sum(self.counts > 0))

    def get_cardinality(self) -> float:
        return self.get_cardinality_for_legionaries_count(self.legionaries_count())

    def estimate(self) -> list[float]:
        return [self.get_cardinality()]

    def frequency_histogram(self) -> dict[int, float]:
        effective = (self.unique != UNIQUE_EMPTY) & (self.unique != UNIQUE_COLLIDED)
        sample = self.counts[effective & (self.counts > 0)]
        if len(sample) == 0:
            return {}
        vals, cnts = np.unique(sample, return_counts=True)
        total = cnts.sum()
        return {int(v): float(c / total) for v, c in zip(vals, cnts)}

    def pdf(self, x: np.ndarray | float):
        a = self.spec.a
        return a * np.exp(-a * x) / (1 - np.exp(-a))

    def hit_probability(self, index, cardinality):
        """P(register hit) per Venn cardinality (liquid_legions.py:189-191)."""
        return 1 - np.exp(-self.pdf(index / self.spec.m) / self.spec.m
                          * np.asarray(cardinality, dtype=np.float64))

    def state_dict(self):
        return {"c": self.counts, "u": self.unique, "p": self.added_noise}

    def load_state(self, d):
        self.counts, self.unique = d["c"], d["u"]
        self.added_noise = float(d["p"])


class LiquidLegionsEstimator:
    """Whole-legion correction-matrix estimator (liquid_legions.py:205-267)."""

    def __init__(self, flip_probability: float | None = None):
        self.flip_probability = flip_probability

    @staticmethod
    def sublegion_as_vector(sketch_list, start: int, m: int) -> np.ndarray:
        ones = sum((s.counts[start:start + m] > 0).astype(np.int64)
                   for s in sketch_list)
        return np.bincount(ones, minlength=len(sketch_list) + 1)

    def __call__(self, sketch_list) -> list[float]:
        if not sketch_list:
            return [0.0]
        p = self.flip_probability if self.flip_probability is not None \
            else sketch_list[0].added_noise
        noises = {s.added_noise for s in sketch_list}
        assert noises == {p}, f"inconsistent sketch noise: {noises} != {p}"
        m = sketch_list[0].spec.m
        c = correction_matrix(len(sketch_list), p)
        v = self.sublegion_as_vector(sketch_list, 0, m)
        f = float(v.sum() - c[0, :].dot(v))
        f = max(0.0, min(m - 1, f))
        return [sketch_list[0].get_cardinality_for_legionaries_count(f)]


class VennEstimator:
    """Venn-component cardinalities for <= 2 sketches (liquid_legions.py:270-370)."""

    def __init__(self, sketch_list):
        self.sketch_list = sketch_list
        self.num_sketches = len(sketch_list)
        self.ps = [s.added_noise for s in sketch_list]
        self.sketch = sketch_list[0].spec.new()

    def observation_vector(self) -> np.ndarray:
        """Per-register combination number (vectorized observation_at_index)."""
        x = np.zeros(self.sketch.spec.m, dtype=np.int64)
        for i, s in enumerate(self.sketch_list):
            x += (1 << i) * (s.counts > 0)
        return x

    def sublegion_as_vector(self) -> np.ndarray:
        return np.bincount(self.observation_vector(),
                           minlength=2 ** self.num_sketches)

    def transition_matrix(self) -> np.ndarray:
        n = 2 ** self.num_sketches
        result = np.zeros((n, n))
        for row in range(n):
            for col in range(n):
                prob, s, t = 1.0, col, row
                for p in self.ps:
                    prob *= (1 - p) if s % 2 == t % 2 else p
                    s //= 2
                    t //= 2
                result[row, col] = prob
        return result

    def estimate_combinations(self) -> np.ndarray:
        c = np.linalg.inv(self.transition_matrix())
        return c.dot(self.sublegion_as_vector())

    def __call__(self) -> np.ndarray:
        f = self.estimate_combinations()
        card = self.sketch.get_cardinality_for_legionaries_count
        if self.num_sketches == 1:
            return np.array([0.0, card(f[1])])
        if self.num_sketches == 2:
            a = card(f[1] + f[3])
            b = card(f[2] + f[3])
            a_or_b = card(f[1] + f[2] + f[3])
            a_or_b = max(min(a + b, a_or_b), a, b)  # liquid_legions.py:358-361
            return np.array([0.0, a_or_b - b, a_or_b - a, a + b - a_or_b])
        raise NotImplementedError("Venn estimator supports <= 2 sketches")


class LiquidSampler:
    """Monte-Carlo posterior sampler of denoised register combinations
    (liquid_legions.py:373-557), vectorized over registers."""

    def __init__(self, sketch_list, random_state=None):
        assert 0 < len(sketch_list) < 3, "sampling of 1 or 2 sketches only"
        self.sketch_list = sketch_list
        self.num_sketches = len(sketch_list)
        self.rs = random_state or np.random.RandomState()
        self.flip_p = np.array([s.added_noise for s in sketch_list])
        self.venn = VennEstimator(sketch_list)
        self.venn_cardinality = self.venn()
        self.sketch = sketch_list[0].spec.new()
        n = 2 ** self.num_sketches
        t = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                prob, a, b = 1.0, i, j
                for p in self.flip_p:
                    prob *= (1 - p) if a % 2 == b % 2 else p
                    a //= 2
                    b //= 2
                t[i, j] = prob
        self.transition = t

    def _venn_priors(self) -> np.ndarray:
        """(m, 2^k) prior matrix of register combinations given cardinalities."""
        m = self.sketch.spec.m
        idx = np.arange(m)
        v = np.stack([self.sketch_list[0].hit_probability(idx, c)
                      for c in self.venn_cardinality], axis=1)  # (m, 2^k)
        if self.num_sketches == 1:
            return np.stack([1 - v[:, 1], v[:, 1]], axis=1)
        p1, p2, p3 = v[:, 1], v[:, 2], v[:, 3]
        return np.stack([
            (1 - p1) * (1 - p2) * (1 - p3),
            p1 * (1 - p2) * (1 - p3),
            (1 - p1) * p2 * (1 - p3),
            p1 * p2 * (1 - p3) + p3,
        ], axis=1)

    def posteriors(self) -> np.ndarray:
        priors = self._venn_priors()
        obs = self.venn.observation_vector()
        likelihood = self.transition[obs]  # (m, 2^k)
        prop = priors * likelihood
        total = prop.sum(axis=1, keepdims=True)
        total[total == 0] = 1.0
        return prop / total

    def sample(self):
        """Draw denoised sketches from the per-register posterior."""
        post = self.posteriors()
        cum = np.cumsum(post, axis=1)
        draws = self.rs.uniform(size=len(cum))
        combo = (cum < draws[:, None]).sum(axis=1)
        sketches = [self.sketch.spec.new() for _ in range(self.num_sketches)]
        for si in range(self.num_sketches):
            bit = (combo >> si) & 1
            sketches[si].counts = bit.astype(np.int64)
        return sketches


class LiquidSequentialEstimator:
    """Ordered sample-then-merge fold (liquid_legions.py:560-593) —
    driver-side only; order-dependent by construction."""

    def __init__(self, random_state=None):
        self.rs = random_state or np.random.RandomState()

    def sequential_merge(self, sketch_list):
        assert sketch_list, "I can only merge non-empty lists."
        if len(sketch_list) == 1:
            return LiquidSampler(sketch_list, self.rs).sample()[0]
        result = sketch_list[0].spec.new()
        first, second = LiquidSampler(sketch_list[:2], self.rs).sample()
        result.merge_in(first)
        result.merge_in(second)
        for sketch in sketch_list[2:]:
            _, clean = LiquidSampler([result, sketch], self.rs).sample()
            result.merge_in(clean)
        return result

    def __call__(self, sketch_list) -> list[float]:
        if not sketch_list:
            return [0.0]
        return [self.sequential_merge(sketch_list).get_cardinality()]
