import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import FllSpec
from cardinality_estimation_evaluation_framework_ray.state.base import Sketch


def _fill(spec, tokens):
    s = spec.new()
    s.update_tokens(np.asarray(tokens, dtype=np.int64))
    return s


def test_sparse_exact_histogram():
    spec = FllSpec(p=10, seed=1, max_freq=5)
    # 100 tokens x1, 50 tokens x3
    toks = np.concatenate([np.arange(100), np.tile(np.arange(1000, 1050), 3)])
    s = _fill(spec, toks)
    est = s.estimate()
    assert est[0] == 150           # 1+ reach
    assert est[1] == 50            # 2+ reach
    assert est[2] == 50            # 3+
    assert est[3] == 0


def test_incremental_matches_single_shot():
    spec = FllSpec(p=8, seed=2, sparse=False)
    rs = np.random.RandomState(0)
    toks = rs.randint(0, 3000, size=30_000)
    whole = _fill(spec, toks)
    parts = spec.new()
    for chunk in np.array_split(toks, 11):
        parts.update_tokens(chunk)
    assert np.array_equal(whole.rho, parts.rho)
    assert np.array_equal(whole.fp, parts.fp)
    assert np.array_equal(whole.cnt, parts.cnt)


def test_merge_laws():
    spec = FllSpec(p=8, seed=3, sparse=False)
    rs = np.random.RandomState(1)
    parts = [rs.randint(0, 10_000, size=8000) for _ in range(3)]
    a, b, c = (_fill(spec, p) for p in parts)
    ab = _fill(spec, parts[0]); ab.merge_in(b)
    ba = _fill(spec, parts[1]); ba.merge_in(a)
    for attr in ("rho", "fp", "cnt"):
        assert np.array_equal(getattr(ab, attr), getattr(ba, attr))
    abc = _fill(spec, parts[0]); abc.merge_in(b); abc.merge_in(c)
    whole = _fill(spec, np.concatenate(parts))
    for attr in ("rho", "fp", "cnt"):
        assert np.array_equal(getattr(abc, attr), getattr(whole, attr))


def test_dense_frequency_estimate():
    # uniform frequency 2 -> 2+ reach ~ total reach, 3+ ~ 0
    spec = FllSpec(p=14, seed=4, sparse=False)
    n = 200_000
    toks = np.tile(np.arange(n), 2)
    s = _fill(spec, toks)
    est = s.estimate_float()
    assert abs(est[0] - n) / n < 0.05
    assert abs(est[1] - n) / n < 0.05   # everything has freq 2
    assert est[2] / n < 0.02            # 3+ nearly nothing


def test_serialization():
    spec = FllSpec(p=8, seed=5)
    s = _fill(spec, np.arange(500))
    back = Sketch.from_bytes(spec, s.to_bytes())
    assert back.estimate() == s.estimate()
