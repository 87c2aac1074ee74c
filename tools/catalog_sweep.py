"""Full-catalog execution sweep: run EVERY named estimator config through
one tiny scenario, mirroring the reference's registry-wide interoperability
sweep (``/root/reference/tests/interoperability_test.py:53-474`` runs every
(scenario x estimator) cell end-to-end).

A name that constructs but mis-wires its noiser/denoiser/estimator only
fails at execution time — this sweep is the execution check the name-
coverage tests can't provide.  Names are sharded into Ray tasks so the
whole catalog (540 names) finishes in minutes.

Usage: python tools/catalog_sweep.py [out.json]   (default docs/CATALOG_SWEEP.json)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _run_names(names: list[str], num_sources: int = 3) -> dict[str, str]:
    """Execute each named config over one tiny scenario; name -> status."""
    from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
        get_estimator_configs,
    )
    from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
        Simulator,
    )
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        TokensTableSpec,
    )

    scenario = TokensTableSpec(num_sources=num_sources, rows_per_source=60,
                               min_tok=8, max_tok=24, universe_size=10_000,
                               seed=13)
    # warm this worker's malloc arena at the largest register size the
    # catalog uses (5e6): on lazily-faulted-memory hosts the FIRST big-array
    # op in a process pays per-4KB faults (10-45x slowdown; see
    # functions/memtune.py) — after this, arena pages recycle
    w = np.ones(5_000_000, dtype=np.float64)
    for _ in range(3):
        w = 1.0 - (1.0 - w) * (1.0 - w)
    del w
    out: dict[str, str] = {}
    for name in names:
        try:
            (cfg,) = get_estimator_configs([name])
            sim = Simulator(num_runs=1, scenario=scenario, config=cfg,
                            sketch_random_state=np.random.RandomState(3),
                            engine="local")
            df, _ = sim.run_all_and_aggregate()
            # Locally-DP'd configs may legitimately estimate NaN on a tiny
            # scenario: blip noise flips a constant fraction of the 5e6
            # registers, and the surreal-denoised soft-union of >= 2 arrays
            # can push the union bit-sum x outside the estimator's domain
            # [0, m) — the reference's uniform first-moment method returns
            # NaN exactly there (bloom_filters.py:383-389, the saturation
            # rule UnionEstimator enforces by erroring at :264-311).  That
            # is SATURATION, faithful to the reference; a NaN from a
            # config with NO local noise in play is a mis-wired estimator
            # and stays a failure.  The precise mechanism is pinned by
            # tests/test_catalog_sweep.py::
            # test_union_estimator_saturation_nan_is_reference_faithful.
            noised = getattr(cfg, "sketch_noiser", None) is not None
            if len(df) != num_sources:
                out[name] = f"bad_output: {len(df)} rows"
            elif not np.isfinite(df["estimated_cardinality_1"]).all():
                out[name] = ("ok_saturated" if noised
                             else "bad_output: non-finite estimate")
            else:
                out[name] = "ok"
        except Exception as e:  # noqa: BLE001 — the sweep records, not raises
            out[name] = f"error: {type(e).__name__}: {e}"
    return out


def run_sweep(num_shards: int | None = None) -> dict[str, str]:
    """Shard the full catalog across Ray tasks; returns name -> status.

    Shards are ROUND-ROBIN over the sorted name list so the expensive
    families (5e6-register uniform BFs, stratified ADBFs) spread across
    tasks instead of clustering in one."""
    import ray

    from cardinality_estimation_evaluation_framework_ray.pipelines.catalog import (
        generate_full_catalog,
    )

    names = sorted(generate_full_catalog())
    if num_shards is None:
        num_shards = max(4, int(ray.cluster_resources().get("CPU", 8)))
    num_shards = min(num_shards, len(names))
    chunks = [names[i::num_shards] for i in range(num_shards)]
    task = ray.remote(num_cpus=1)(_run_names)
    results: dict[str, str] = {}
    for part in ray.get([task.remote(c) for c in chunks]):
        results.update(part)
    return results


def main() -> int:
    import ray

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "docs", "CATALOG_SWEEP.json")
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    results = run_sweep()
    ray.shutdown()
    n_ok = sum(1 for v in results.values() if v == "ok")
    n_sat = sum(1 for v in results.values() if v == "ok_saturated")
    n_exec = n_ok + n_sat
    payload = {
        "total": len(results),
        "ok": n_ok,
        "ok_saturated": n_sat,
        "executing": n_exec,
        "failures": {k: v for k, v in sorted(results.items())
                     if v not in ("ok", "ok_saturated")},
        "status_by_name": dict(sorted(results.items())),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"total": len(results), "ok": n_ok,
                      "ok_saturated": n_sat, "out": out_path}))
    return 0 if n_exec == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
