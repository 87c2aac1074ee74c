"""Compare several sketches on one scenario (reference
``examples/basic_comparison.py:61-170`` shape, over the Ray-Data engine).

  python examples/basic_comparison.py --num-runs 2 --universe-size 100000
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-runs", type=int, default=2)
    parser.add_argument("--universe-size", type=int, default=100_000)
    parser.add_argument("--num-sources", type=int, default=5)
    parser.add_argument("--rows-per-source", type=int, default=300)
    parser.add_argument("--num-cpus", type=int, default=8)
    args = parser.parse_args()

    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cardinality_estimation_evaluation_framework_ray.pipelines.configs import (
        get_estimator_configs,
    )
    from cardinality_estimation_evaluation_framework_ray.pipelines.simulator import (
        Simulator,
    )
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        TokensTableSpec,
    )

    scenario = TokensTableSpec(num_sources=args.num_sources,
                               rows_per_source=args.rows_per_source,
                               min_tok=16, max_tok=128,
                               universe_size=args.universe_size, seed=42)
    for cfg in get_estimator_configs():
        sim = Simulator(num_runs=args.num_runs, scenario=scenario, config=cfg,
                        sketch_random_state=np.random.RandomState(7))
        _, df_agg = sim.run_all_and_aggregate()
        print(f"\n=== {cfg.name} ===")
        print(df_agg[[("relative_error_1", "mean"),
                      ("relative_error_1", "std")]].to_string())
    ray.shutdown()


if __name__ == "__main__":
    main()
