"""Stage-level profile of the headline multi-sketch build (task plan).

Runs the SAME pipeline as bench.py's build_multi (same specs, same cached
corpus, task plan so Dataset.stats() sees every operator) and prints the
Ray Data stats report — the evidence loop for "wall time dominated by
useful compute": per-operator wall, UDF time, blocks, exchanged bytes.

Usage: RAY_GRAFT_CPUS=32 python tools/profile_headline.py [> docs/PROFILE.txt]
(set GRAFT_SF_DIR to pick the corpus tier; default sf0.1)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from bench import ensure_tokens_table
    from cardinality_estimation_evaluation_framework_ray.stages.build import (
        build_sketch_states,
    )
    from cardinality_estimation_evaluation_framework_ray.state import (
        BloomSpec,
        CountMinSpec,
        HllSpec,
        KllSpec,
    )

    specs = {
        "hll": HllSpec(p=14, seed=42, sparse=False),
        "cm": CountMinSpec(depth=4, width=8192, seed=42),
        "kll": KllSpec(k=200, seed=42),
        "exp_adbf": BloomSpec(length=100_000, distribution="exp",
                              decay_rate=10.0, seed=42),
    }
    tokens_dir = ensure_tokens_table()
    ds = ray.data.read_parquet(tokens_dir, columns=["tokens", "source"],
                               override_num_blocks=32)
    states = build_sketch_states(ds, specs).materialize()
    print(states.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
