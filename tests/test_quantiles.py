import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import (
    KllSpec,
    TDigestSpec,
)
from cardinality_estimation_evaluation_framework_ray.state.base import Sketch


@pytest.mark.parametrize("make_spec", [lambda: KllSpec(k=200, seed=1),
                                       lambda: TDigestSpec(compression=100.0)])
def test_rank_error_bound(make_spec):
    spec = make_spec()
    rs = np.random.RandomState(0)
    data = rs.lognormal(3, 1.5, size=200_000)
    s = spec.new()
    for chunk in np.array_split(data, 20):
        s.update_tokens(chunk)
    sorted_data = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = s.quantile(q)
        true_rank = np.searchsorted(sorted_data, est) / len(data)
        assert abs(true_rank - q) < 0.02, f"q={q}: rank {true_rank}"


@pytest.mark.parametrize("make_spec", [lambda: KllSpec(k=200, seed=2),
                                       lambda: TDigestSpec(compression=100.0)])
def test_merge_preserves_accuracy(make_spec):
    spec = make_spec()
    rs = np.random.RandomState(1)
    data = rs.normal(100, 15, size=100_000)
    parts = np.array_split(data, 16)
    sketches = []
    for p in parts:
        s = spec.new()
        s.update_tokens(p)
        sketches.append(s)
    merged = sketches[0]
    for s in sketches[1:]:
        merged.merge_in(s)
    sorted_data = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true_rank = np.searchsorted(sorted_data, est) / len(data)
        assert abs(true_rank - q) < 0.03


def test_kll_small_is_exact():
    spec = KllSpec(k=200, seed=3)
    s = spec.new()
    s.update_tokens(np.arange(100))
    assert s.quantile(0.0) == 0
    assert abs(s.quantile(0.5) - 50) <= 1
    assert s.quantile(1.0) == 99
    assert s.rank(49.5) == pytest.approx(0.5, abs=0.01)


def test_tdigest_extremes_exact():
    spec = TDigestSpec(compression=50.0)
    s = spec.new()
    rs = np.random.RandomState(2)
    s.update_tokens(rs.uniform(0, 1000, 50_000))
    assert s.vmin <= s.quantile(0.001)
    assert s.quantile(0.999) <= s.vmax


@pytest.mark.parametrize("make_spec", [lambda: KllSpec(k=128, seed=4),
                                       lambda: TDigestSpec(compression=64.0)])
def test_serialization_roundtrip(make_spec):
    spec = make_spec()
    s = spec.new()
    s.update_tokens(np.random.RandomState(3).exponential(10, 10_000))
    back = Sketch.from_bytes(spec, s.to_bytes())
    for q in (0.1, 0.5, 0.9):
        assert back.quantile(q) == s.quantile(q)


def test_bounded_size():
    spec = KllSpec(k=200, seed=5)
    s = spec.new()
    for i in range(50):
        s.update_tokens(np.random.RandomState(i).uniform(0, 1, 20_000))
    assert s._size() < 3 * spec.k  # sketch stays compact
    td = TDigestSpec(compression=100.0).new()
    for i in range(50):
        td.update_tokens(np.random.RandomState(i).uniform(0, 1, 20_000))
    assert len(td.means) < 200


def test_quantiles_disc_ddsketch_mode_value_error_bound(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.relational import (
        quantiles_disc,
    )

    rs = np.random.RandomState(21)
    v = np.exp(rs.normal(3.0, 1.5, size=20_000))
    v[::97] = np.nan                      # nulls drop like SQL
    ds = ray.data.from_pandas(pd.DataFrame({"x": v}),
                              override_num_blocks=9)
    qs = np.array([0.1, 0.5, 0.9, 0.99])
    got = quantiles_disc(ds, "x", qs, mode="ddsketch")
    clean = np.sort(v[~np.isnan(v)])
    for q, est in zip(qs, got):
        true = clean[int(q * (len(clean) - 1))]
        assert abs(est - true) <= 0.01 * true

    with pytest.raises(ValueError, match="mode must be"):
        quantiles_disc(ds, "x", qs, mode="bogus")
