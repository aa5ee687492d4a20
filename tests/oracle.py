"""Local replica of the driver's Spark-vs-DuckDB comparison so parity
breaks surface in pytest before the round gate (BASELINE.md: row-count
+ schema + order-insensitive value hash)."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(value):
    if isinstance(value, bool):
        return value
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # exact-match convention: engines must produce identical doubles
        return value
    return value


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = [tuple(r) for r in duck.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")

    # order-insensitive: sort columns by name, then sort rows
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(tuple(_canon(r[i]) for i in s_idx) for r in spark_rows)
    d_sorted = sorted(tuple(_canon(r[i]) for i in d_idx) for r in duck_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            problems.append(f"row {i}: spark={a!r} duck={b!r}")
            if len(problems) > 5:
                break
    return problems
