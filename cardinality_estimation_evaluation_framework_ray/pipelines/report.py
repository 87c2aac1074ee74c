"""Report generator: summary tables from evaluator + analyzer output.

Mirrors ``src/evaluations/report_generator.py:34-357`` in spirit: one
self-contained HTML (plus markdown) report with the num-estimable-sets
table, per-cell aggregate stats and run times.  Plots (seaborn boxplots in
the reference, ``src/common/plotting.py:21-67``) are emitted only when
matplotlib is importable — it is not part of this container, so the report
falls back to tables, behind an import-try as the environment contract
requires.
"""

from __future__ import annotations

import html
import os

import pandas as pd

from .analyzer import analyze, read_evaluation_results
from .evaluator import RUN_TIME_FILE


def _maybe_boxplot(df: pd.DataFrame, out_png: str) -> str | None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(12, 6))
    df.boxplot(column="relative_error_1", by=["sketch_estimator", "num_sets"],
               ax=ax, rot=90)
    fig.savefig(out_png)
    plt.close(fig)
    return out_png


def _run_times(eval_dir: str) -> pd.DataFrame:
    rows = []
    for estimator in sorted(os.listdir(eval_dir)):
        p = os.path.join(eval_dir, estimator, RUN_TIME_FILE)
        if os.path.isfile(p):
            rows.append({"sketch_estimator": estimator,
                         "running_time_s": float(open(p).read().strip())})
    return pd.DataFrame(rows)


def generate_report(eval_dir: str, out_dir: str,
                    error_margin: float = 0.05,
                    proportion_of_runs: float = 0.95) -> str:
    """Write report.md + report.html (+ boxplot.png when plotting exists).

    Returns the path of the markdown report.
    """
    os.makedirs(out_dir, exist_ok=True)
    estimable = analyze(eval_dir, error_margin, proportion_of_runs,
                        out_csv=os.path.join(out_dir, "num_estimable_sets.csv"))
    raw = read_evaluation_results(eval_dir)
    times = _run_times(eval_dir)

    sections: list[tuple[str, pd.DataFrame]] = [
        (f"Number of estimable sets (|rel err| < {error_margin} for "
         f">= {proportion_of_runs:.0%} of runs; frequency: shuffle distance)",
         estimable),
    ]
    if not raw.empty:
        agg = (raw.groupby(["sketch_estimator", "scenario", "num_sets"])
               .agg(mean_rel_err=("relative_error_1", "mean"),
                    std_rel_err=("relative_error_1", "std"))
               .reset_index())
        sections.append(("Relative error by (estimator, scenario, num_sets)", agg))
    if not times.empty:
        sections.append(("Evaluation run times", times))

    plot = _maybe_boxplot(raw, os.path.join(out_dir, "boxplot.png")) \
        if not raw.empty else None

    md_lines = ["# Evaluation report", ""]
    html_parts = ["<html><head><meta charset='utf-8'>"
                  "<title>Evaluation report</title></head><body>"
                  "<h1>Evaluation report</h1>"]
    def md_table(df: pd.DataFrame) -> str:
        # hand-rolled (pandas.to_markdown needs tabulate, absent here)
        cols = list(df.columns)
        lines = ["| " + " | ".join(str(c) for c in cols) + " |",
                 "|" + "|".join("---" for _ in cols) + "|"]
        for _, row in df.iterrows():
            lines.append("| " + " | ".join(
                f"{v:.4f}" if isinstance(v, float) else str(v)
                for v in row) + " |")
        return "\n".join(lines)

    for title, df in sections:
        md_lines += [f"## {title}", "", md_table(df), ""]
        html_parts += [f"<h2>{html.escape(title)}</h2>",
                       df.to_html(index=False)]
    if plot:
        md_lines += ["![boxplot](boxplot.png)", ""]
        html_parts += ["<img src='boxplot.png'/>"]
    else:
        md_lines += ["_Plots skipped: matplotlib not available in this "
                     "environment._", ""]
    html_parts += ["</body></html>"]

    md_path = os.path.join(out_dir, "report.md")
    with open(md_path, "w") as f:
        f.write("\n".join(md_lines))
    with open(os.path.join(out_dir, "report.html"), "w") as f:
        f.write("".join(html_parts))
    return md_path
