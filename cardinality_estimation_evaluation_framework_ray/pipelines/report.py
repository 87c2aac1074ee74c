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


def _svg_boxplot(df: pd.DataFrame, out_svg: str,
                 value_col: str = "relative_error_1") -> str | None:
    """Dependency-free SVG boxplot of ``value_col`` by
    (sketch_estimator, num_sets) — the report's plot path when matplotlib is
    absent (mirrors src/common/plotting.py:21-44's boxplot semantics:
    quartile box, median line, 1.5-IQR whiskers)."""
    import numpy as np

    groups = []
    for (est, ns), g in df.groupby(["sketch_estimator", "num_sets"]):
        v = g[value_col].dropna().to_numpy()
        if not len(v):
            continue
        q1, med, q3 = np.percentile(v, [25, 50, 75])
        iqr = q3 - q1
        lo = float(v[v >= q1 - 1.5 * iqr].min())
        hi = float(v[v <= q3 + 1.5 * iqr].max())
        groups.append((f"{est[:28]}/{ns}", q1, med, q3, lo, hi))
    if not groups:
        return None
    bw, pad_l, pad_b, pad_t, height = 28, 60, 150, 20, 300
    width = pad_l + bw * len(groups) + 20
    vmin = min(g[4] for g in groups)
    vmax = max(g[5] for g in groups)
    vmin, vmax = min(vmin, 0.0), max(vmax, 0.0)
    span = (vmax - vmin) or 1.0

    def y(v: float) -> float:
        return pad_t + (vmax - v) / span * (height - pad_t - 40)

    parts = [f"<svg xmlns='http://www.w3.org/2000/svg' "
             f"width='{width}' height='{height + pad_b}' "
             f"font-family='monospace' font-size='9'>"]
    # zero line + y ticks
    parts.append(f"<line x1='{pad_l}' y1='{y(0):.1f}' x2='{width - 10}' "
                 f"y2='{y(0):.1f}' stroke='#999' stroke-dasharray='3,3'/>")
    for tv in (vmin, 0.0, vmax):
        parts.append(f"<text x='2' y='{y(tv) + 3:.1f}'>{tv:+.2f}</text>")
    for i, (label, q1, med, q3, lo, hi) in enumerate(groups):
        cx = pad_l + i * bw + bw // 2
        x0, x1 = cx - 9, cx + 9
        parts += [
            f"<line x1='{cx}' y1='{y(lo):.1f}' x2='{cx}' y2='{y(q1):.1f}' stroke='#334'/>",
            f"<line x1='{cx}' y1='{y(q3):.1f}' x2='{cx}' y2='{y(hi):.1f}' stroke='#334'/>",
            f"<rect x='{x0}' y='{y(q3):.1f}' width='{x1 - x0}' "
            f"height='{max(y(q1) - y(q3), 0.5):.1f}' fill='#9cf' stroke='#334'/>",
            f"<line x1='{x0}' y1='{y(med):.1f}' x2='{x1}' y2='{y(med):.1f}' "
            f"stroke='#c33' stroke-width='1.5'/>",
            f"<text x='{cx}' y='{height - 30}' "
            f"transform='rotate(90 {cx} {height - 30})'>{html.escape(label)}</text>",
        ]
    parts.append("</svg>")
    with open(out_svg, "w") as f:
        f.write("".join(parts))
    return out_svg


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
    # frequency sections (reference FrequencyEstimatorEvaluationAnalyzer,
    # analyzer.py:292-526): only when the run carries frequency levels
    if "estimated_cardinality_2" in raw.columns and "shuffle_distance" in raw.columns:
        from .analyzer import (
            convert_raw_to_long,
            frequency_criterion,
            per_frequency_cardinality,
        )

        crit = frequency_criterion(raw)
        sections.append(
            ("Frequency criterion: proportion of runs within 0.2 shuffle "
             "distance (meets = >= 80%)", crit))
        per_freq = per_frequency_cardinality(convert_raw_to_long(raw))
        freq_dist = (per_freq.groupby(["sketch_estimator", "scenario",
                                       "cardinality_source",
                                       "frequency_level"])
                     ["per_level_cardinality"].mean().reset_index()
                     .rename(columns={"per_level_cardinality":
                                      "mean_cardinality"}))
        sections.append(
            ("Mean per-frequency-level cardinality (estimated vs true)",
             freq_dist))
    if not times.empty:
        sections.append(("Evaluation run times", times))

    plot = _maybe_boxplot(raw, os.path.join(out_dir, "boxplot.png")) \
        if not raw.empty else None
    if plot is None and not raw.empty:
        # matplotlib-free environments get a hand-rolled SVG boxplot
        plot = _svg_boxplot(raw, os.path.join(out_dir, "boxplot.svg"))

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
        fname = os.path.basename(plot)
        md_lines += [f"![boxplot]({fname})", ""]
        html_parts += [f"<img src='{fname}'/>"]
    else:
        md_lines += ["_Plots skipped: no runs to plot._", ""]
    html_parts += ["</body></html>"]

    md_path = os.path.join(out_dir, "report.md")
    with open(md_path, "w") as f:
        f.write("\n".join(md_lines))
    with open(os.path.join(out_dir, "report.html"), "w") as f:
        f.write("".join(html_parts))
    return md_path
