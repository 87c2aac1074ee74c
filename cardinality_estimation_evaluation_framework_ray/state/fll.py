"""FreqLogLog++ — HLL++ extended with per-register (fingerprint, count).

Mirrors ``src/estimators/freq_log_log.py:31-321``: each register keeps
(leading-zeros rho, 32-bit fingerprint of the last rho-setting item, count of
that fingerprint); the estimator multiplies the HLL cardinality by the
normalized k+ distribution of register counts.

One deliberate deviation, documented: the reference's ``merge``
(freq_log_log.py:283-289) replaces a register only on strictly-greater rho
and ignores the equal-rho/different-fingerprint case, which makes it
order-dependent.  Our merge uses the total order on (rho, fingerprint) that
the reference's own ``add`` path implies (freq_log_log.py:191-196): keep the
lexicographic max pair, sum counts when the pair is identical.  This is
associative + commutative (a semilattice with a counter), which the
distributed merge tree requires, and agrees with the reference whenever rho
values differ.
"""

from __future__ import annotations

import dataclasses
import math
from typing import ClassVar

import numpy as np

from ..functions.hashing import bit_length_u64, hash64
from .base import Sketch, SketchSpec, register_spec
from .hll import _THRESHOLD, _alpha


@register_spec
@dataclasses.dataclass(frozen=True)
class FllSpec(SketchSpec):
    kind: ClassVar[str] = "fll"
    p: int = 14
    seed: int = 1
    max_freq: int = 15
    sparse: bool = True

    def __post_init__(self):
        if not (3 < self.p < 17):
            raise ValueError(f"FLL precision must be in (3,17), got {self.p}")

    @property
    def m(self) -> int:
        return 1 << self.p

    def new(self) -> "FllSketch":
        return FllSketch(self)


class FllSketch(Sketch):
    def __init__(self, spec: FllSpec):
        self.spec = spec
        m = spec.m
        self.rho = np.zeros(m, dtype=np.uint8)
        self.fp = np.zeros(m, dtype=np.uint32)
        self.cnt = np.zeros(m, dtype=np.int64)
        # sparse exact multiset path (dict -> parallel arrays)
        self.sparse_tokens: np.ndarray | None = (
            np.empty(0, dtype=np.int64) if spec.sparse else None)
        self.sparse_counts: np.ndarray | None = (
            np.empty(0, dtype=np.int64) if spec.sparse else None)

    # -- vectorized batch update -------------------------------------------
    def update_tokens(self, tokens: np.ndarray) -> None:
        if len(tokens) == 0:
            return
        tokens = np.asarray(tokens)
        p, q = self.spec.p, 64 - self.spec.p
        h = hash64(tokens, self.spec.seed)
        idx = (h >> np.uint64(q)).astype(np.int64)
        w = h & np.uint64((1 << q) - 1)
        rho = np.where(w == 0, q + 1, q - bit_length_u64(w) + 1).astype(np.int64)
        fp = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)  # freq_log_log.py:183
        # batch-combine per register: keep max (rho, fp) pair; count its hits
        pair = (rho << np.int64(32)) | fp
        order = np.lexsort((pair, idx))
        sidx, spair = idx[order], pair[order]
        # boundaries of register groups; within each, the max pair is the last
        # run — count its length
        grp_last = np.concatenate([sidx[1:] != sidx[:-1], [True]])
        last_pos = np.flatnonzero(grp_last)
        # run starts of the (idx, pair) runs
        run_start = np.concatenate([[True], (sidx[1:] != sidx[:-1]) | (spair[1:] != spair[:-1])])
        run_ids = np.cumsum(run_start) - 1
        run_lengths = np.bincount(run_ids)
        regs = sidx[last_pos]
        pairs = spair[last_pos]
        counts = run_lengths[run_ids[last_pos]]
        self._merge_registers(regs, (pairs >> np.int64(32)).astype(np.uint8),
                              (pairs & np.int64(0xFFFFFFFF)).astype(np.uint32),
                              counts.astype(np.int64))
        if self.sparse_tokens is not None:
            t, c = np.unique(tokens.astype(np.int64, copy=False), return_counts=True)
            self._sparse_combine(t, c)

    def _merge_registers(self, regs, rho, fp, cnt):
        """Combine incoming per-register (rho, fp, cnt) with state (see module
        docstring: lexicographic-max pair, counts sum on equality)."""
        cur_rho = self.rho[regs].astype(np.int64)
        cur_fp = self.fp[regs].astype(np.int64)
        cur_pair = (cur_rho << np.int64(32)) | cur_fp
        new_pair = (rho.astype(np.int64) << np.int64(32)) | fp.astype(np.int64)
        take_new = new_pair > cur_pair
        equal = new_pair == cur_pair
        self.rho[regs[take_new]] = rho[take_new]
        self.fp[regs[take_new]] = fp[take_new]
        self.cnt[regs[take_new]] = cnt[take_new]
        self.cnt[regs[equal]] += cnt[equal]

    def _sparse_combine(self, t, c):
        allt = np.concatenate([self.sparse_tokens, t])
        allc = np.concatenate([self.sparse_counts, c])
        uniq, inv = np.unique(allt, return_inverse=True)
        self.sparse_tokens = uniq
        self.sparse_counts = np.bincount(inv, weights=allc).astype(np.int64)
        if len(uniq) > 6 * self.spec.m:  # freq_log_log.py:173-175,297-299
            self.sparse_tokens = None
            self.sparse_counts = None

    def merge_in(self, other: "FllSketch") -> None:
        assert self.spec == other.spec
        regs = np.arange(self.spec.m)
        nz = other.cnt > 0
        self._merge_registers(regs[nz], other.rho[nz], other.fp[nz],
                              other.cnt[nz])
        if self.sparse_tokens is not None and other.sparse_tokens is not None:
            self._sparse_combine(other.sparse_tokens, other.sparse_counts)
        else:
            self.sparse_tokens = None
            self.sparse_counts = None

    # -- estimate (freq_log_log.py:210-266) --------------------------------
    def estimate_float(self) -> list[float]:
        maxf = self.spec.max_freq
        frequencies = np.zeros(maxf, dtype=np.float64)
        if self.sparse_tokens is not None:
            cardinality = float(len(self.sparse_tokens))
            if cardinality:
                clipped = np.minimum(self.sparse_counts, maxf)
                frequencies += np.bincount(clipped, minlength=maxf + 1)[1:]
        else:
            m = self.spec.m
            raw = _alpha(m) * m * m / np.sum(np.exp2(-self.rho.astype(np.float64)))
            zeros = int(np.sum(self.rho == 0))
            if zeros != 0:
                candidate = m * math.log(m / zeros)
            else:
                candidate = raw
            cardinality = candidate if candidate <= _THRESHOLD[self.spec.p] else raw
            clipped = np.minimum(self.cnt, maxf).astype(np.int64)
            frequencies += np.bincount(clipped, minlength=maxf + 1)[1:]
        total = frequencies.sum()
        if total == 0:
            return [0.0] * maxf
        freq_dist = frequencies / total
        # k+ transform: dist[0]=1; dist[i]=sum(dist[i:]) (freq_log_log.py:254-257)
        kplus = np.concatenate([[1.0], np.cumsum(freq_dist[::-1])[::-1][1:]])
        return list(cardinality * kplus)

    def estimate(self) -> list[float]:
        return [round(x) for x in self.estimate_float()]

    def state_dict(self):
        return {"r": self.rho, "f": self.fp, "c": self.cnt,
                "st": self.sparse_tokens, "sc": self.sparse_counts}

    def load_state(self, d):
        self.rho, self.fp, self.cnt = d["r"], d["f"], d["c"]
        self.sparse_tokens, self.sparse_counts = d["st"], d["sc"]
