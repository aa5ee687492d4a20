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
    # Respect an externally-provided session (e.g. the driver's), but
    # apply the runtime SQL confs it may lack — a non-UTC session would
    # silently break timestamp/date_format oracle parity, and the nanos
    # conf is required to read events.parquet at all.
    active = SparkSession.getActiveSession()
    if active is not None:
        _apply_runtime_confs(active)
        return active
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
    session = builder.master(master).getOrCreate()
    _apply_runtime_confs(session)
    return session


def _apply_runtime_confs(spark: SparkSession) -> None:
    """Set the runtime-settable SQL confs the engine's semantics depend
    on. Safe on any session (these are not static confs); failures are
    tolerated per-conf so a locked-down deployment degrades loudly at
    read time rather than here."""
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
