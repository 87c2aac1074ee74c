"""Registry-wide execution sweep (the reference's interoperability regime:
every catalog name must EXECUTE, not just construct —
``/root/reference/tests/interoperability_test.py:53-474``).

The full 540-name sweep takes ~2 min at 32 CPUs (and proportionally longer
in the 4-CPU test session), so it is marked slow and gated behind
GRAFT_FULL_SWEEP=1; its latest recorded artifact lives at
``docs/CATALOG_SWEEP.json`` (regenerate with ``python tools/catalog_sweep.py``).
The always-on test executes a deterministic cross-family sample each run.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.catalog_sweep import _run_names  # noqa: E402

OK = ("ok", "ok_saturated")


def _all_names():
    from cardinality_estimation_evaluation_framework_ray.pipelines.catalog import (
        generate_full_catalog,
    )

    return sorted(generate_full_catalog())


@pytest.mark.usefixtures("ray_session")
def test_catalog_sample_executes():
    """Deterministic cross-family sample: every 13th name of the sorted
    catalog (~42 names spanning all families) must execute."""
    names = _all_names()
    assert len(names) == 540
    sample = names[::13]
    out = _run_names(sample)
    bad = {k: v for k, v in out.items() if v not in OK}
    assert not bad, bad


def test_recorded_sweep_artifact_is_green():
    """The committed artifact must cover the current catalog and be clean."""
    import json

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "CATALOG_SWEEP.json")
    d = json.load(open(path))
    assert d["total"] == len(_all_names())
    assert d["failures"] == {}
    assert d["ok"] + d["ok_saturated"] == d["total"]
    # every accepted saturation must be a locally-noised union-estimator
    # name — the ONLY family whose NaN is the reference's documented
    # out-of-domain behavior (see the saturation pinning test below)
    for name, status in d["status_by_name"].items():
        if status == "ok_saturated":
            assert "union_estimator" in name and "local_dp_" in name, name
    # the catalog's names are exactly the artifact's names
    assert set(d["status_by_name"]) == set(_all_names())


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("GRAFT_FULL_SWEEP"),
                    reason="full 540-name sweep: set GRAFT_FULL_SWEEP=1")
@pytest.mark.usefixtures("ray_session")
def test_full_catalog_executes():
    from tools.catalog_sweep import run_sweep

    out = run_sweep()
    bad = {k: v for k, v in out.items() if v not in OK}
    assert len(out) == 540
    assert not bad, bad


def test_union_estimator_saturation_nan_is_reference_faithful():
    """Pin WHY the 3 ``ok_saturated`` catalog names return NaN: blip noise
    at eps~0.27 flips ~43% of the 5e6 uniform-BF registers; the surreal-
    denoised soft-union of >= 2 such arrays pushes the union bit-sum x
    OUTSIDE the uniform first-moment domain [0, m), where the reference
    returns NaN (bloom_filters.py:383-389 — the same saturation
    UnionEstimator rejects by erroring at :264-311).  Asserts the exact
    chain on the sweep's own scenario: (a) the un-noised estimate is
    finite, (b) the denoised-union bit sum violates the domain, (c) the
    estimate is NaN exactly then."""
    import dataclasses

    import numpy as np

    from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
        get_estimator_configs,
    )
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        TokensTableSpec,
    )
    from cardinality_estimation_evaluation_framework_ray.stages.build import (
        iter_key_tokens,
    )
    from cardinality_estimation_evaluation_framework_ray.state.bloom import (
        soft_union,
    )

    name = ("bloom_filter-5000000_hash1-union_estimator-"
            "local_dp_0.2747-no_global_dp")
    (cfg,) = get_estimator_configs([name])
    scenario = TokensTableSpec(num_sources=3, rows_per_source=60,
                               min_tok=8, max_tok=24, universe_size=10_000,
                               seed=13)
    spec = dataclasses.replace(
        cfg.spec, seed=int(np.random.RandomState(3).randint(2 ** 31 - 1)))
    sketches = []
    for _, toks in iter_key_tokens(scenario.make_table(), "source", "tokens"):
        sk = spec.new()
        sk.update_tokens(np.unique(toks) if cfg.dedup_input else toks)
        sketches.append(sk)

    def scalar(v):
        return float(np.asarray(v).ravel()[0])

    # (a) without noise the same estimator is finite
    clean = cfg.estimator._est
    no_noise = type(clean)("uniform")
    assert np.isfinite(scalar(no_noise(sketches)))

    # (b+c) with blip noise: denoised union bit-sum leaves [0, m) -> NaN
    noised = [cfg.sketch_noiser(s) for s in sketches]
    arrays = clean._denoiser([s.float_registers() for s in noised])
    m = float(spec.length)
    for k in (2, 3):
        x = float(np.sum(soft_union(arrays[:k])))
        est = scalar(clean(noised[:k]))
        if x >= m or x < 0:
            assert np.isnan(est), (k, x, m, est)
        else:
            assert np.isfinite(est), (k, x, m, est)
    # the sweep observed NaN for the 2- and 3-way unions: the domain must
    # actually be violated for at least one of them
    x3 = float(np.sum(soft_union(arrays)))
    assert x3 >= m or x3 < 0, f"saturation premise broken: x={x3}, m={m}"
