"""Local replica of the driver's Spark-vs-DuckDB correctness check.

Compares each queries() result against its oracle_sql() on the same parquet:
row count, column-name set, and order-insensitive value equality (columns
sorted by name, rows sorted by all columns — the driver hashes; we diff so
failures are debuggable).
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf.reset_index(drop=True)


def compare(name: str, spark_df, oracle_sql: str, con) -> list[str]:
    """Returns a list of problems (empty = parity)."""
    problems = []
    a = normalize(spark_df.toPandas())
    b = normalize(con.execute(oracle_sql).fetchdf())
    if len(a) != len(b):
        problems.append(f"{name}: row count {len(a)} vs oracle {len(b)}")
    if list(a.columns) != list(b.columns):
        problems.append(f"{name}: columns {list(a.columns)} vs {list(b.columns)}")
        return problems
    if problems:
        return problems
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64")
            bv = bv.astype("float64")
            neq = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            try:
                neq = ~((av == bv) | (av.isna() & bv.isna()))
            except Exception:
                neq = av.astype(str) != bv.astype(str)
        if neq.any():
            i = int(neq.idxmax())
            problems.append(
                f"{name}.{col}: {int(neq.sum())} mismatches, first at row {i}: "
                f"spark={a[col].iloc[i]!r} oracle={b[col].iloc[i]!r}"
            )
    return problems
