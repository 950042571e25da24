"""Simulates the grading driver's correctness gate: run each
``__spark_entry__.queries()`` entry and its DuckDB ``oracle_sql()`` twin on
the same parquet tables, compare row count + column names + order-insensitive
values (exact after canonicalization)."""

from __future__ import annotations

import math

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact repr — engines must agree bit-for-bit after our rounding
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_rows(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    out = []
    for row in df_pandas[cols].itertuples(index=False):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return out


def compare_query(spark, con, fn, sql, sf_dir: str):
    """Returns (ok, message)."""
    import pandas as pd

    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(sql).df()
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    if not problems:
        a, b = canon_rows(spark_pdf), canon_rows(oracle_pdf)
        if a != b:
            diff_a = [r for r in a if r not in set(b)][:3]
            diff_b = [r for r in b if r not in set(a)][:3]
            problems.append(
                f"values differ; spark-only={diff_a} oracle-only={diff_b}"
            )
    return (not problems, "; ".join(problems))
