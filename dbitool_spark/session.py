"""SparkSession factory with engine-wide configuration.

The reference tool configures its runtime with three CLI knobs
(--streamsize / --errorsize / --memorylimit, dbitool.pl:38-40); the
Spark analogue is session-level configuration: shuffle partitioning,
AQE, and Arrow. One place, applied consistently, so every entry point
(tests, bench, driver) observes identical semantics — notably UTC
timestamps (for oracle comparison) and nanosecond-parquet handling
(events.ts is parquet TIMESTAMP(NANOS), which Spark otherwise rejects).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized for the target deployment, overridable via env for local runs.
# On a real cluster, shuffle partitions should be ~2-3x total cores; AQE
# coalesces the excess at runtime, so erring high is safe.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(app_name: str = "dbitool_spark", cpus: str | None = None) -> SparkSession:
    """Create (or reuse) the engine SparkSession.

    Configs and rationale:
    - AQE on: runtime re-planning (partition coalescing, skew-join
      splitting, dynamic broadcast) is the first line of defense at
      100 TB where static estimates are wrong.
    - shuffle.partitions ~ cores locally; a real deployment overrides
      via spark-defaults. AQE coalesce makes the exact value forgiving.
    - UTC session timezone: required for value-identical comparison
      against the DuckDB oracle (naive-UTC timestamps).
    - nanosAsLong: /root/testdata events.parquet stores TIMESTAMP(NANOS)
      which Spark rejects by default; read as int64 nanos and convert
      explicitly (see catalog.load_events).
    - Arrow on: vectorized pandas UDF / toPandas paths.
    """
    cpus = cpus or _DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # Respect an externally-provided master (e.g. the driver's session).
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return builder.master(master).getOrCreate()


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
