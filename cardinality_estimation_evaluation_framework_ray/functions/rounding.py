"""SQL-compatible rounding for oracle-hashed float outputs.

``np.round`` rounds half-to-even (banker's); SQL ``ROUND`` (DuckDB,
ANSI) rounds half-away-from-zero.  The two agree everywhere EXCEPT when
the true value lands exactly on a .5 tie of the target decimal — which
genuinely happens for ratios of small integers (a word-set Jaccard of
13/128 = 0.1015625 is exactly representable and rounds to 0.101562 vs
0.101563; caught live by the sf0.1 oracle gate on
``fuzzy_decontaminate``).  Every stage that emits an
exact-integer-ratio column compared against a SQL oracle must round
with ``micro_round``, never ``np.round``.

Transcendental outputs (log/entropy/zscore products) cannot land on a
tie, so their ``np.round`` calls are equivalent — but new code should
use this helper uniformly.
"""

from __future__ import annotations

import numpy as np

__all__ = ["micro_round"]


def micro_round(v, decimals: int = 6):
    """Half-away-from-zero rounding (SQL ROUND tie semantics) with -0.0
    normalized.  Mirror the same ``round(x, decimals)`` literally in the
    oracle SQL expression."""
    q = 10.0 ** decimals
    return np.floor(np.abs(v) * q + 0.5) * np.sign(v) / q + 0.0
