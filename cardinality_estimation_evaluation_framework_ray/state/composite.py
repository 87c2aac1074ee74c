"""Composite estimators: independence-assumption union and meta-estimators.

Mirrors ``src/estimators/independent_set_estimator.py`` (pairwise
independence convolution over frequency histograms) and
``src/estimators/meta_estimators.py`` (sketch-of-sketch: estimate the number
of ACTIVE REGISTERS of an ADBF with a secondary sketch — here VectorOfCounts
— then feed a fake ADBF with that many leading ones to a FirstMoment
estimator).  Driver-side: inputs are the few final per-key sketches.
"""

from __future__ import annotations

import numpy as np

from .bloom import BloomSketch, BloomSpec, FirstMomentEstimator, _FloatView
from .voc import SequentialEstimator as VocSequentialEstimator, VocSpec


class IndependentSetEstimator:
    """Union histogram under the independence assumption
    (independent_set_estimator.py:28-110)."""

    def __init__(self, single_sketch_estimator, universe_size: int):
        self.single_sketch_estimator = single_sketch_estimator
        self.universe_size = universe_size

    def __call__(self, sketch_list) -> list[float]:
        if not sketch_list:
            return [0.0]
        a_hist: list[float] = [0.0]
        for sketch in sketch_list:
            ch = self.single_sketch_estimator([sketch])
            b_hist = [ch[i] - ch[i + 1] for i in range(len(ch) - 1)] + [ch[-1]]
            c_hist = list(a_hist) + [0.0] * (len(b_hist) + 1)
            for i in range(len(b_hist)):
                c_hist[i] += b_hist[i]
            for i in range(len(a_hist)):
                for j in range(len(b_hist)):
                    overlap = a_hist[i] * b_hist[j] / float(self.universe_size)
                    if overlap:
                        c_hist[i] -= overlap
                        c_hist[j] -= overlap
                        c_hist[i + j + 1] += overlap
            a_hist = c_hist
            assert sum(a_hist) <= self.universe_size, (
                "Constraint violation: sketch is larger than universe")
        while a_hist and a_hist[-1] == 0:
            a_hist.pop()
        return list(np.cumsum(a_hist[::-1])[::-1])


class MetaVectorOfCountsEstimator:
    """VoC-over-active-register-indices meta estimator
    (meta_estimators.py:23-179)."""

    def __init__(self, num_buckets: int, adbf_estimator: FirstMomentEstimator,
                 meta_sketch_noiser=None, clip: bool = False,
                 epsilon: float = float(np.log(3)), clip_threshold: float = 3,
                 meta_seed: int = 0):
        assert num_buckets > 0, "MetaVoCEstimator must have at least one bucket."
        self.num_buckets = num_buckets
        self.adbf_estimator = adbf_estimator
        self.meta_sketch_noiser = meta_sketch_noiser
        self.meta_sketch_estimator = VocSequentialEstimator(
            clip=clip, epsilon=epsilon, clip_threshold=clip_threshold)
        self.meta_seed = meta_seed

    def __call__(self, sketch_list) -> list[float]:
        if not sketch_list:
            return [0.0]
        spec: BloomSpec = sketch_list[0].spec
        meta_spec = VocSpec(num_buckets=self.num_buckets, seed=self.meta_seed)
        meta_sketches = []
        for sketch in sketch_list:
            assert isinstance(sketch, BloomSketch)
            meta = meta_spec.new()
            active = np.flatnonzero(sketch.registers)  # get_active_register_indices
            meta.update_tokens(active)  # indices are distinct -> one-shot ok
            if self.meta_sketch_noiser is not None:
                meta = self.meta_sketch_noiser(meta)
            meta_sketches.append(meta)
        num_active = int(self.meta_sketch_estimator(meta_sketches)[0])
        # fake ADBF: first n registers = 1 (meta_estimators.py:114-145)
        fake = np.zeros(spec.length, dtype=np.float64)
        fake[:min(max(0, num_active), spec.length)] = 1.0
        return [self.adbf_estimator([_FloatView(spec, fake)])]
