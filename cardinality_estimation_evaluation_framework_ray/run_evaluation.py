"""CLI entry point: run a named evaluation sweep (the reference's
``wfa-run-evaluation`` console script, ``src/evaluations/run_evaluation.py:
36-167``, re-expressed over the Ray-Data engine).

Usage:
  python -m cardinality_estimation_evaluation_framework_ray.run_evaluation \
      --evaluation smoke_test --out /tmp/eval_out \
      --estimators hll-p14,exp_bloom_filter-1e5_10-first_moment_exp \
      --num-runs 3 --num-cpus 8

Owns its Ray session (guarded init; library code never calls ray.init).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--evaluation", default="smoke_test")
    parser.add_argument("--estimators", default=None,
                        help="comma-separated names; default: all registered")
    parser.add_argument("--num-runs", type=int, default=3)
    parser.add_argument("--out", required=True)
    parser.add_argument("--run-name", default="run")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--num-cpus", type=int, default=8)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--parallel-cells", action="store_true",
                        help="one Ray task per (estimator, scenario) cell "
                             "with the local simulator engine (small-scenario "
                             "sweeps); default: sequential cells, each a "
                             "distributed Ray Data pipeline")
    parser.add_argument("--analyze", action="store_true",
                        help="also write the analyzer report")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.configs import (
        get_estimator_configs,
        get_evaluation_config,
        get_frequency_estimator_configs,
    )
    from .pipelines.evaluator import Evaluator
    from .pipelines.report import generate_report

    try:
        ev_cfg = get_evaluation_config(args.evaluation, num_runs=args.num_runs)
    except KeyError as e:
        raise SystemExit(str(e))
    if args.estimators:
        est_cfgs = get_estimator_configs(args.estimators.split(","),
                                         seed=args.seed)
    elif "frequency" in args.evaluation:
        est_cfgs = get_frequency_estimator_configs(seed=args.seed)
    else:
        est_cfgs = get_estimator_configs(None, seed=args.seed)

    ev = Evaluator(ev_cfg, est_cfgs, args.out, run_name=args.run_name,
                   global_seed=args.seed, overwrite=args.overwrite,
                   parallel_cells=args.parallel_cells)
    summary = ev.run()
    print(summary.to_string(index=False) if len(summary) else
          "all cells already complete (resume)")

    if args.analyze:
        import os

        report = generate_report(
            os.path.join(args.out, args.run_name, ev_cfg.name),
            os.path.join(args.out, args.run_name, "analysis"))
        print(f"report: {report}")

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
