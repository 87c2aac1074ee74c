"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline on sf0.001; ``queries()`` exposes one
callable per implemented operator/pipeline (SURVEY.md §2); ``oracle_sql()``
gives DuckDB-equivalent SQL for every SQL-expressible query (same column
names).  Sketch estimates that are inherently approximate are rows-only
(no oracle entry) and are bound-checked in tests/ instead — EXCEPT where a
sketch is provably exact at test scale (HLL sparse mode below the 6m
threshold, exact-multiset oracle sketch), where we do claim the hash match.

Ray is initialised by the driver before import; nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Tokenizer contract shared with the SQL oracle (stages/text.py):
# lowercase, split [^a-z0-9]+, drop empties.
_TOKS_CTE = (
    "WITH toks AS (SELECT doc_id, source, unnest(list_filter("
    "regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok "
    "FROM documents)"
)


def _read(sf_dir: str, table: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet")


def _tokens_ds(sf_dir: str):
    from cardinality_estimation_evaluation_framework_ray.stages.text import (
        tokenize_documents,
    )

    return tokenize_documents(_read(sf_dir, "documents"))


def _synthetic_tokens(sf_dir: str):
    """Deterministic synthetic tokens table (north-rule input shape) sized by sf."""
    from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
        TokensTableSpec,
        tokens_dataset,
    )

    rows = 5000 if "0.1" in sf_dir.rstrip("/")[-4:] else 1000
    spec = TokensTableSpec(num_sources=10, rows_per_source=rows, min_tok=16,
                           max_tok=256, universe_size=200_000, seed=42)
    return spec, tokens_dataset(spec)


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: tokenize sf0.001 documents -> multi-sketch reach report."""
    from cardinality_estimation_evaluation_framework_ray.pipelines.reach import (
        reach_report,
    )
    from cardinality_estimation_evaluation_framework_ray.state import (
        ExactMultiSetSpec,
        HllSpec,
    )

    ds = _tokens_ds("/root/testdata/sf0.001")
    specs = {"hll": HllSpec(p=11, seed=7), "exact": ExactMultiSetSpec()}
    return reach_report(ds, specs)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_reach_hll_words(sf_dir: str):
    """Per-source + union distinct words via HLL (sparse-exact at this scale)."""
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.pipelines.reach import (
        reach_report,
    )
    from cardinality_estimation_evaluation_framework_ray.state import HllSpec

    df = reach_report(_tokens_ds(sf_dir), {"hll": HllSpec(p=14, seed=7)})
    return pd.DataFrame({
        "source": df["source"],
        "distinct_words": df["est_hll"].astype("int64"),
    })


def _q_token_stats(sf_dir: str):
    """Per-source doc/token totals over the tokenized table (exact)."""
    from ray.data.aggregate import Count, Sum

    ds = _tokens_ds(sf_dir)
    out = ds.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tok", alias_name="total_tokens"),
    )
    df = out.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["total_tokens"] = df["total_tokens"].astype("int64")
    return df


def _q_word_freq_histogram(sf_dir: str):
    """Global k+ word-frequency histogram (LosslessEstimator semantics)."""
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.stages.build import (
        build_sketch_states,
        collect_states,
        union_across_keys,
    )
    from cardinality_estimation_evaluation_framework_ray.state import (
        ExactMultiSetSpec,
    )

    specs = {"exact": ExactMultiSetSpec()}
    states = build_sketch_states(_tokens_ds(sf_dir), specs)
    union = union_across_keys(collect_states(states, specs), specs)["exact"]
    hist = union.estimate()
    return pd.DataFrame({
        "freq_level": list(range(1, len(hist) + 1)),
        "k_plus_count": [int(h) for h in hist],
    })


def _q_lineitem_agg(sf_dir: str):
    """Relational layer: grouped aggregate (the analyzer's df_agg shape)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "lineitem").select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def add_revenue(t):
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(1.0, t.column("l_discount")))
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(add_revenue, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="n_rows"),
        )
    )
    df = out.to_pandas()
    df["n_rows"] = df["n_rows"].astype("int64")
    # round the large accumulations: distributed summation order differs from
    # the oracle's by a few ulps; 2dp is the comparison contract
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_revenue"] = df["sum_revenue"].round(2)
    df["avg_disc"] = df["avg_disc"].round(6)
    return df


def _q_hll_synthetic(sf_dir: str):
    """Rows-only: HLL++ p=14 over the synthetic north-rule tokens table."""
    from cardinality_estimation_evaluation_framework_ray.pipelines.reach import (
        reach_report,
    )
    from cardinality_estimation_evaluation_framework_ray.state import HllSpec

    _, ds = _synthetic_tokens(sf_dir)
    return reach_report(ds, {"hll": HllSpec(p=14, seed=42, sparse=False)})


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "reach_hll_words": _q_reach_hll_words,
        "token_stats": _q_token_stats,
        "word_freq_histogram": _q_word_freq_histogram,
        "lineitem_agg": _q_lineitem_agg,
        "hll_synthetic": _q_hll_synthetic,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "reach_hll_words": f"""
            {_TOKS_CTE}
            SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS distinct_words
            FROM toks GROUP BY source
            UNION ALL
            SELECT '__union__' AS source,
                   CAST(count(DISTINCT tok) AS BIGINT) AS distinct_words
            FROM toks
        """,
        "token_stats": f"""
            {_TOKS_CTE}
            SELECT d.source, CAST(d.n AS BIGINT) AS n_docs,
                   CAST(coalesce(t.nt, 0) AS BIGINT) AS total_tokens
            FROM (SELECT source, count(*) AS n FROM documents GROUP BY source) d
            LEFT JOIN (SELECT source, count(*) AS nt FROM toks GROUP BY source) t
            USING (source)
        """,
        "word_freq_histogram": f"""
            {_TOKS_CTE}, wf AS (
              SELECT tok, count(*) AS f FROM toks GROUP BY tok),
            levels AS (
              SELECT unnest(generate_series(1, (SELECT max(f) FROM wf))) AS f)
            SELECT CAST(l.f AS BIGINT) AS freq_level,
                   CAST((SELECT count(*) FROM wf WHERE wf.f >= l.f) AS BIGINT)
                       AS k_plus_count
            FROM levels l
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
                   round(avg(l_discount), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
    }
