"""Table catalog over the driver-generated parquet test tables.

The reference infers schema at runtime from each source (CSV header,
DBI statement metadata, JSON keys — dbitool.pl:1802-1811, 1355-1361,
2228-2242); here the parquet footer is the schema authority and
Catalyst propagates it. One loader per table keeps nanosecond-timestamp
normalization (events.ts) in a single place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# Tables small enough to broadcast at ANY scale factor: region (5 rows)
# and nation (25 rows) are constant-size regardless of SF. Everything
# else (customer/supplier/part/orders/lineitem) scales linearly, so
# explicit broadcast hints are wrong at the 100 TB design point —
# those joins rely on AQE's size-based dynamic broadcast instead.
# All broadcast decisions route through maybe_broadcast().
BROADCASTABLE = {"region", "nation"}


def maybe_broadcast(table: str, df: DataFrame) -> DataFrame:
    """Broadcast-hint `df` only if `table` is constant-size
    (BROADCASTABLE). For scale-dependent tables the plan is left
    unhinted so AQE's runtime size estimate decides — an explicit hint
    would disable Spark's fallback and OOM executors at 100x."""
    return F.broadcast(df) if table in BROADCASTABLE else df


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """events.parquet stores INT64 TIMESTAMP(NANOS), which Spark rejects
    unless spark.sql.legacy.parquet.nanosAsLong=true. It is a runtime
    SQL conf, so set it defensively even on externally-created sessions
    (the correctness driver passes its own SparkSession)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf in some deployments; then it must be preset


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one test table. `events` always gains a derived `ts_ts`
    TIMESTAMP column regardless of how the parquet encodes `ts`:
    int64 nanoseconds (TIMESTAMP(NANOS) read via nanosAsLong) or a
    native timestamp[us]/timestamp_ntz. Downstream plans use `ts_ts`
    (or unix_micros(ts_ts)) and never touch the raw encoding."""
    if table == "events":
        _ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if table == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # Integer `div`, not `/`: bigint / int is double division and
            # epoch-nanos (~1.7e18) exceed the 53-bit double mantissa, so
            # float division can be off by ±1 us.
            df = df.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt is not None:
            # timestamp or timestamp_ntz; with the session tz pinned to
            # UTC the cast is wall-clock-preserving, matching DuckDB's
            # naive read of the same parquet column.
            df = df.withColumn("ts_ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries can
    name them exactly as the DuckDB oracle does."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
