"""Segmented (per-document) reductions over concatenated value arrays.

The batch kernels in this engine flatten a batch's per-document values into
one contiguous array plus a ``lengths`` vector, then reduce per document.
The naive ``np.add.reduceat(values, starts)`` idiom breaks on zero-length
segments: ``reduceat`` rejects ``start == len(values)``, and clamping the
start indices (``np.minimum(starts, len - 1)``) silently SHIFTS the previous
segment's end — a trailing empty document drops the last non-empty
document's final value from its reduction.

``segment_sums`` is the robust replacement: it appends one zero sentinel row
so every start index (including ``len(values)`` for trailing empty segments)
is valid, then zeroes the spurious single-element results that ``reduceat``
produces for empty segments anywhere in the middle.  Values and dtype are
preserved exactly; empty segments reduce to exact zeros.
"""

from __future__ import annotations

import numpy as np


def segment_sums(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Sum ``values`` per consecutive segment of the given ``lengths``.

    ``values`` is 1-D ``(N,)`` or 2-D ``(N, L)`` with ``N == lengths.sum()``;
    returns ``(S,)`` / ``(S, L)`` with ``S == len(lengths)``.  Zero-length
    segments (anywhere, including trailing) yield exact zeros and never
    perturb a neighbour's boundary.
    """
    values = np.asarray(values)
    lengths = np.asarray(lengths, dtype=np.int64)
    n_seg = len(lengths)
    tail_shape = values.shape[1:]
    if n_seg == 0:
        return np.zeros((0,) + tail_shape, dtype=values.dtype)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    sentinel = np.zeros((1,) + tail_shape, dtype=values.dtype)
    padded = np.concatenate([values, sentinel], axis=0)
    with np.errstate(over="ignore"):
        sums = np.add.reduceat(padded, starts, axis=0)
    # reduceat returns padded[start] for segments with start_i == start_{i+1}
    # (empty segments followed by a non-empty one); zero them in place.
    sums[lengths == 0] = 0
    return sums
