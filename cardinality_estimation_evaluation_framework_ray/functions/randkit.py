"""Sampling / RNG helpers for deterministic, partition-invariant generation.

``choice_fast`` mirrors the reference's Robert-Floyd O(m) sampling-without-
replacement speedup (reference ``src/common/random.py:18-70``,
``doc/choice_speedup.md``) — reimplemented from the published algorithm
(Bentley & Floyd, "Programming Pearls: a sample of brilliance", CACM 1987).
"""

from __future__ import annotations

import numpy as np


def choice_fast(n, m: int, random_state: np.random.RandomState | None = None) -> np.ndarray:
    """Sample m distinct integers from [0, n) in O(m) expected time.

    Like the reference (``src/common/random.py:18-70``), ``n`` may also be an
    array, in which case m distinct ELEMENTS of it are sampled."""
    if not isinstance(n, (int, np.integer)):
        arr = np.asarray(n)
        idx = choice_fast(len(arr), m, random_state)
        return arr[idx]
    n = int(n)
    m = int(m)
    if random_state is None:
        random_state = np.random.RandomState()
    if m > n:
        raise ValueError(f"cannot sample {m} distinct values from range of {n}")
    # Vectorized Robert-Floyd: draw candidates for positions n-m..n-1, resolve
    # collisions by inserting the position index itself.
    base = np.arange(n - m, n, dtype=np.int64)
    draws = (random_state.random_sample(m) * (base + 1)).astype(np.int64)
    chosen: set[int] = set()
    out = np.empty(m, dtype=np.int64)
    for i in range(m):
        t = int(draws[i])
        if t in chosen:
            t = int(base[i])
        chosen.add(t)
        out[i] = t
    return out


def block_rng(seed: int, *streams: int) -> np.random.Generator:
    """A PCG64 generator keyed on (seed, stream ids) — partition-stable."""
    return np.random.default_rng(np.random.SeedSequence((seed,) + tuple(int(s) & 0x7FFFFFFF for s in streams)))
