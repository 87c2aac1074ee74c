"""Local replica of the driver's correctness gate.

Runs every queries() entry at a given sf_dir and, where oracle_sql() has a
matching entry, compares row count, sorted schema, and order-insensitive
value hash against DuckDB over the same parquet tables.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(obj, ray.data.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.sha1(norm(df).to_csv(index=False).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = norm(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(mine)} rows, cols={list(mine.columns)})")
            continue
        ref = norm(con.sql(oracles[name]).df())
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if list(mine.columns) != list(ref.columns):
            problems.append(f"cols {list(mine.columns)} != {list(ref.columns)}")
        elif value_hash(mine) != value_hash(ref):
            problems.append("value hash mismatch")
            if mine.shape == ref.shape:
                diff = (mine != ref)
                if diff.values.any():
                    r, c = np.argwhere(diff.values)[0]
                    problems.append(
                        f"first diff at row {r} col {mine.columns[c]}: "
                        f"{mine.iloc[r, c]!r} vs {ref.iloc[r, c]!r}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"MATCH {name}: {len(mine)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
