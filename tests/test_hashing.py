import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.functions.hashing import (
    bit_length_u64,
    expi_negative,
    hash64,
    hash_strings,
    invert_monotonic,
    uniform01,
)


def test_hash64_deterministic_and_seed_sensitive():
    x = np.arange(1000, dtype=np.int64)
    a = hash64(x, 7)
    b = hash64(x, 7)
    c = hash64(x, 8)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.dtype == np.uint64


def test_hash64_uniformity():
    x = np.arange(200_000, dtype=np.int64)
    h = hash64(x, 3)
    # bucketized chi-square-ish sanity: 256 buckets, each ~781 +- 5 sigma
    counts = np.bincount((h >> np.uint64(56)).astype(np.int64), minlength=256)
    expected = len(x) / 256
    assert np.all(np.abs(counts - expected) < 6 * np.sqrt(expected))


def test_uniform01_range():
    u = uniform01(np.arange(10000), 1)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.02


def test_bit_length_exact():
    vals = np.array([0, 1, 2, 3, 4, 255, 256, 2**31, 2**52 - 1, 2**53, 2**53 + 1,
                     2**63, 2**64 - 1], dtype=np.uint64)
    expect = np.array([v.item().bit_length() for v in vals], dtype=np.int64)
    assert np.array_equal(bit_length_u64(vals), expect)


def test_expi_known_values():
    # E1(t) reference values (Abramowitz & Stegun tables); Ei(-t) = -E1(t)
    known = {
        0.5: 0.559773594776160,
        1.0: 0.219383934395520,
        2.0: 0.048900510708081,
        5.0: 0.001148295591275,
        10.0: 4.156968929685e-06,
    }
    for t, e1 in known.items():
        assert expi_negative(-t) == pytest.approx(-e1, rel=1e-9)
    # vectorized matches scalar, continuity across the 1.2 series/CF boundary
    xs = -np.linspace(0.1, 3.0, 50)
    v = expi_negative(xs)
    s = np.array([expi_negative(float(x)) for x in xs])
    assert np.allclose(v, s, rtol=1e-12)
    left, right = expi_negative(-1.1999999), expi_negative(-1.2000001)
    assert abs(left - right) < 1e-6


def test_hash_strings():
    a = hash_strings(["foo", "bar", "foo"], 1)
    assert a[0] == a[2] and a[0] != a[1]
    b = hash_strings(["foo", "bar", "foo"], 2)
    assert a[0] != b[0]


def test_invert_monotonic():
    f = lambda x: x * x
    inv = invert_monotonic(f, lower=0, epsilon=1e-9)
    assert inv(49.0) == pytest.approx(7.0, abs=1e-6)
