"""Vectorized seeded 64-bit hashing and low-level bit/math kernels.

The reference hashes every id one at a time through
``farmhash.hash64withseed(str(x), seed)`` (reference
``src/common/hash_function.py:53-56``).  ``farmhash`` is not available here and
exact hash parity is not required (the reference's tests are statistical, not
register-exact), so we use a counter-based splitmix64-style hash: full 64-bit
avalanche, seedable, and — crucially — vectorized over whole Arrow token
arrays with NumPy.  Published construction: Steele, Lea & Flood, "Fast
Splittable Pseudorandom Number Generators" (OOPSLA 2014).
"""

from __future__ import annotations

import numpy as np

MAX_HASH = np.float64(2.0**64)  # reference MAX_HASH_VALUE analog (hash_function.py:19)

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_S30 = np.uint64(30)
_S27 = np.uint64(27)
_S31 = np.uint64(31)


def _mix(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer on a uint64 array (wraps mod 2^64)."""
    z = (z ^ (z >> _S30)) * _M1
    z = (z ^ (z >> _S27)) * _M2
    return z ^ (z >> _S31)


def seed_offset(seed: int) -> np.uint64:
    """Derive a well-mixed 64-bit stream offset from a small integer seed."""
    with np.errstate(over="ignore"):
        z = (np.uint64(seed & 0xFFFFFFFFFFFFFFFF) + _GOLDEN) * _M1
        return np.uint64(_mix(np.array([z], dtype=np.uint64))[0])


def hash64(values: np.ndarray, seed: int) -> np.ndarray:
    """Seeded 64-bit hash of an integer array -> uint64 array.

    hash(x, s) = mix(x * GOLDEN + offset(s)): the splitmix64 stream evaluated
    at counter x with stream constant derived from the seed.
    """
    with np.errstate(over="ignore"):
        x = np.asarray(values).astype(np.uint64, copy=False)
        return _mix(x * _GOLDEN + seed_offset(seed))


def hash64_2d(values: np.ndarray, seed: int, row: int) -> np.ndarray:
    """Independent hash stream per (seed, row) — for d-row sketches (count-min)."""
    return hash64(values, (seed * 0x1000193 + row * 0x9E3779B9) & 0x7FFFFFFFFFFFFFFF)


def uniform01(values: np.ndarray, seed: int) -> np.ndarray:
    """Map hashed values to float64 in [0, 1) (53-bit precision)."""
    h = hash64(values, seed)
    return (h >> np.uint64(11)).astype(np.float64) * (1.0 / 2.0**53)


def bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact bit length of each element of a uint64 array (0 for 0).

    frexp on the float64 cast gives the exponent = bit length, except when the
    cast rounds a >53-bit value UP across a power-of-2 boundary — corrected by
    comparing against 2^(e-1) in integer space.  ~6 vectorized ops total.
    """
    w = np.asarray(w, dtype=np.uint64)
    _, e = np.frexp(w.astype(np.float64))
    e = e.astype(np.int64)
    # rounding-up correction: if w < 2^(e-1) the exponent overshot by 1
    shift = np.clip(e - 1, 0, 63).astype(np.uint64)
    pow_lo = np.uint64(1) << shift
    over = (w < pow_lo) & (e > 0)
    return np.minimum(e - over, 64)  # values near 2^64 round up to e=65


def hash_strings(values, seed: int) -> np.ndarray:
    """Vectorized seeded 64-bit FNV-1a of a string sequence -> uint64 array.

    ONE deterministic code path, on purpose.  An earlier version used polars'
    row hash when importable with a pure-Python fallback; under host load
    (thread exhaustion while e.g. DuckDB saturates the cores) the polars
    import can fail INSIDE SOME Ray workers but not others, silently hashing
    the same word two different ways across the fleet and corrupting every
    hash-keyed aggregate downstream.  A fleet-wide hash must never have an
    environment-dependent fast path.

    Vectorized over the Arrow utf-8 byte buffer: one masked fold step per
    byte position (iterations = longest string in the batch), byte-exact
    with the scalar FNV-1a definition: acc = OFFSET ^ seed_off; per byte
    acc = (acc ^ b) * PRIME; finally _mix.
    """
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(
            [v if isinstance(v, str) else str(v) for v in values],
            type=pa.string())
    elif not pa.types.is_string(values.type):
        values = values.cast(pa.string())
    n = len(values)
    off = np.uint64(seed_offset(seed))
    acc = np.full(n, np.uint64(0xCBF29CE484222325) ^ off, dtype=np.uint64)
    if n == 0:
        return _mix(acc)
    offsets = np.frombuffer(values.buffers()[1], dtype=np.int32)[
        values.offset:values.offset + n + 1].astype(np.int64)
    data_buf = values.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None and len(data_buf) else np.empty(0, np.uint8))
    starts, lens = offsets[:-1], offsets[1:] - offsets[:-1]
    FNV = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max()) if n else 0):
            m = lens > j
            b = data[starts[m] + j].astype(np.uint64)
            acc[m] = (acc[m] ^ b) * FNV
    return _mix(acc)


def expi_negative(x: np.ndarray | float):
    """Exponential integral Ei(x) for x < 0 (equivalently -E1(-x)).

    Replaces ``scipy.special.expi`` (used by the reference's exponential-ADBF
    estimator, ``src/estimators/bloom_filters.py:413-414``), since scipy is not
    in this environment.  For t = -x > 0, Ei(x) = -E1(t):
      - t <= 1.2: power series  E1(t) = -gamma - ln t + sum (-1)^{k+1} t^k/(k*k!)
      - t  > 1.2: continued fraction E1(t) = e^{-t}/(t+1- 1/(t+3- 4/(t+5- ...)))
        (modified Lentz), which is stable where the alternating series cancels.
    Accurate to ~1e-12 relative over the range the estimators use.
    """
    scalar = np.isscalar(x)
    t = -np.atleast_1d(np.asarray(x, dtype=np.float64))
    if np.any(t < 0):
        raise ValueError("expi_negative requires x <= 0")
    out = np.zeros_like(t)
    small = (t > 0) & (t <= 1.2)
    if np.any(small):
        ts = t[small]
        term = np.array(ts, copy=True)  # k=1 term: t / (1*1!)
        acc = np.array(ts, copy=True)
        for k in range(2, 40):
            term = term * ts * (-(1.0 / k))
            acc += term / k
        out[small] = -(-np.euler_gamma - np.log(ts) + acc)
    big = t > 1.2
    if np.any(big):
        tb = t[big]
        # modified Lentz for E1(t) = e^{-t} * K where
        # K = 1/(t+1-) 1/(t+3-) 4/(t+5-) 9/(t+7-) ...   (a_n = -n^2, b_n = t+2n+1)
        tiny = 1e-300
        f = np.full_like(tb, tiny)
        c = np.full_like(tb, 1e300)
        d = np.zeros_like(tb)
        b = tb + 1.0
        d = 1.0 / b
        f = d
        for n in range(1, 200):
            a = -float(n) * float(n)
            b = tb + 2.0 * n + 1.0
            d = b + a * d
            d[np.abs(d) < tiny] = tiny
            d = 1.0 / d
            c = b + a / c
            c[np.abs(c) < tiny] = tiny
            delta = c * d
            f = f * delta
            if np.all(np.abs(delta - 1.0) < 1e-15):
                break
        out[big] = -np.exp(-tb) * f
    out[t == 0] = -np.inf
    return float(out[0]) if scalar else out


def invert_monotonic(f, lower=0.0, epsilon=1e-3):
    """Invert an increasing function by doubling + bisection.

    Same contract as the reference helper (bloom_filters.py:31-53): returns a
    callable y -> x with f(x) ~= y, searching x >= lower.
    """
    f0 = f(lower)

    def inversion(y):
        assert f0 <= y, f"inversion error: f({lower})={f0} > requested {y}"
        left, probe = lower, 1.0
        while f(probe) < y:
            left = probe
            probe *= 2
        right = probe
        mid = (right + left) / 2
        while right - left > epsilon:
            if f(mid) > y:
                right = mid
            else:
                left = mid
            mid = (right + left) / 2
        return mid

    return inversion
