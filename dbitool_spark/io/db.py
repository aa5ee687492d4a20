"""Database connectors: SQL pushdown read + batched insert
(reference mysqlselect/sqliteselect scripts/dbitool.pl:1318-1599,
sqliteinsert :1601-1755, cassandraselect :1461-1532).

The reference's contract: the SQL executes inside the source database
(full pushdown; `query=` literal or `table=T` => SELECT * FROM T) and
rows stream out; inserts go through an async statement queue
(sthqueuesize=1024).

Spark-native mapping:
- with a JDBC driver jar on the classpath, `read_sql`/`write_sql`
  delegate to spark.read/write.jdbc — pushdown, partitioned reads,
  parallel writes, exactly the reference semantics at scale;
- for SQLite (no JDBC jar in this environment), the same API runs on
  Python's sqlite3: reads are DISTRIBUTED via mapInPandas — each task
  opens the database file and fetches its own partition predicate
  slice (the standard partitionColumn/numPartitions JDBC pattern),
  Arrow-batched back to the JVM; unpartitioned reads are a bounded
  driver-side path with the reference's memorylimit-style guard.
- writes batch through executemany with batch size 1024 (the
  reference's sthqueuesize); SQLite is single-writer, so partitions
  stream through the driver via toLocalIterator — constant memory,
  serialized commits. A real warehouse target takes the JDBC branch.
- Cassandra needs the spark-cassandra-connector package; the API
  raises with instructions rather than pretending (stub contract).
"""

from __future__ import annotations

import sqlite3
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DEFAULT_BATCH = 1024  # reference sthqueuesize, scripts/dbitool.pl:1619
DEFAULT_MEMORY_LIMIT = 100_000  # reference --memorylimit


def _query_or_table(query: str | None, table: str | None) -> str:
    if (query is None) == (table is None):
        raise ValueError("specify exactly one of query= or table=")
    return query if query is not None else f"SELECT * FROM {table}"


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    *,
    query: str | None = None,
    table: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    memory_limit: int = DEFAULT_MEMORY_LIMIT,
) -> DataFrame:
    """SQL pushdown read from a SQLite file.

    With partition_column (numeric), the read is distributed: each
    task executes the query restricted to its hash slice of the
    column (`abs(col) % N = i`) — the JDBC partitioned-read pattern
    without a JDBC driver. Without it, a bounded driver-side fetch
    guarded by memory_limit."""
    sql = _query_or_table(query, table)
    if partition_column is None:
        with sqlite3.connect(db_path) as con:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchmany(memory_limit + 1)
            if len(rows) > memory_limit:
                raise MemoryError(
                    f"unpartitioned sqlite read exceeds {memory_limit} rows; "
                    "pass partition_column for a distributed read"
                )
        pdf = pd.DataFrame(rows, columns=cols)
        return spark.createDataFrame(pdf)

    # distributed: derive the schema from an empty slice, then fan out
    with sqlite3.connect(db_path) as con:
        cur = con.execute(f"SELECT * FROM ({sql}) WHERE 1=0")
        cols = [d[0] for d in cur.description]
    n = num_partitions

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for part in pdf["id"]:
                # NULL partition keys match no modulo slice; fold them into
                # partition 0 (the JDBC partitioned-read convention) so no
                # row is silently dropped.
                pred = f"abs({partition_column}) % {n} = {int(part)}"
                if int(part) == 0:
                    pred = f"({pred} OR {partition_column} IS NULL)"
                con = sqlite3.connect(db_path)
                try:
                    cur = con.execute(f"SELECT * FROM ({sql}) WHERE {pred}")
                    while True:
                        rows = cur.fetchmany(DEFAULT_BATCH * 16)
                        if not rows:
                            break
                        yield pd.DataFrame(rows, columns=cols)
                finally:
                    con.close()

    parts = spark.range(n)
    probe = read_sqlite(
        spark, db_path, query=f"SELECT * FROM ({sql}) LIMIT 100", memory_limit=200
    )
    schema = probe.schema
    return parts.mapInPandas(fetch, schema=schema)


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    *,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH,
) -> int:
    """Batched insert into SQLite. Rows stream through the driver via
    toLocalIterator (constant memory); executemany commits every
    batch_size rows — the reference's statement-queue depth. Returns
    rows written. mode='overwrite' drops and recreates the table from
    the DataFrame schema (all columns as their closest SQLite type)."""
    type_map = {
        "bigint": "INTEGER", "int": "INTEGER", "smallint": "INTEGER",
        "tinyint": "INTEGER", "double": "REAL", "float": "REAL",
        "string": "TEXT", "boolean": "INTEGER",
    }
    cols = df.columns
    with sqlite3.connect(db_path) as con:
        if mode == "overwrite":
            con.execute(f"DROP TABLE IF EXISTS {table}")
        decls = ", ".join(
            f"{c} {type_map.get(t, 'TEXT')}" for c, t in df.dtypes
        )
        con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({decls})")
        placeholders = ", ".join("?" for _ in cols)
        insert = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})"
        batch, written = [], 0
        for row in df.toLocalIterator():
            batch.append(tuple(row))
            if len(batch) >= batch_size:
                con.executemany(insert, batch)
                written += len(batch)
                batch = []
        if batch:
            con.executemany(insert, batch)
            written += len(batch)
        con.commit()
    return written


def query_from_stream(df: DataFrame, *, max_lines: int = 10_000) -> str:
    """The reference's third signature (scripts/dbitool.pl:1442-1457):
    the SQL text itself arrives on an upstream raw stream; drain it
    and concatenate the lines into the query string. SQL text is tiny
    by nature — the collect is bounded and guarded."""
    if len(df.columns) != 1:
        raise ValueError("query stream must be a single raw text column")
    rows = df.limit(max_lines + 1).collect()
    if len(rows) > max_lines:
        raise MemoryError(f"query stream exceeded {max_lines} lines — not SQL text?")
    return "\n".join(r[0] for r in rows)


def _quiet_derby(spark: SparkSession, url: str) -> None:
    """Embedded Derby writes derby.log into the JVM's CWD unless told
    otherwise; route it to /tmp BEFORE the engine's first boot (the
    property is read once at boot — a later set is a harmless no-op)."""
    if url.startswith("jdbc:derby:"):
        spark._jvm.java.lang.System.setProperty(
            "derby.stream.error.file", "/tmp/dbitool_derby.log"
        )


def read_jdbc(
    spark: SparkSession,
    url: str,
    *,
    query: str | None = None,
    table: str | None = None,
    **options: str,
) -> DataFrame:
    """JDBC pushdown read (mysqlselect semantics): requires the
    driver jar on the Spark classpath. query XOR table, exactly like
    the reference's argument contract."""
    if (query is None) == (table is None):
        raise ValueError("specify exactly one of query= or table=")
    _quiet_derby(spark, url)
    reader = spark.read.format("jdbc").option("url", url)
    reader = reader.option("query", query) if query else reader.option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, *, mode: str = "append", **options: str
) -> None:
    _quiet_derby(df.sparkSession, url)
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def read_cassandra(
    spark: SparkSession,
    keyspace: str,
    table: str | None = None,
    *,
    query: str | None = None,
    host: str | None = None,
    port: int | None = None,
    consistency: str | None = None,
    **options: str,
) -> DataFrame:
    """cassandraselect equivalent (reference arg contract
    scripts/dbitool.pl:1461-1532: host/keyspace/table/consistency).
    Issues the real DataSource V2 read through the public
    spark-cassandra-connector format — partition-per-token-range scan
    with predicate/column pushdown, the scale-correct path on a live
    cluster. The connector reads TABLES (filters belong on the
    DataFrame, where they push down to CQL); the reference's raw-CQL
    query= form has no DataFrame-API equivalent, so it raises with
    that guidance. The connector package (com.datastax.spark:
    spark-cassandra-connector_2.13) is not in this environment —
    without it the load fails naturally at plan time, and the except
    re-raises with the exact --packages recipe instead of a raw
    ClassNotFoundException."""
    if query is not None:
        raise ValueError(
            "the Cassandra DataFrame connector reads tables, not raw CQL: "
            "pass table= and express the predicate as .filter(...) — the "
            "connector pushes it down to CQL token-range scans"
        )
    if table is None:
        raise ValueError("table not specified")
    reader = spark.read.format("org.apache.spark.sql.cassandra").options(
        keyspace=keyspace, table=table
    )
    if host is not None:
        reader = reader.option("spark.cassandra.connection.host", host)
    if port is not None:
        reader = reader.option("spark.cassandra.connection.port", str(port))
    if consistency is not None:
        reader = reader.option("spark.cassandra.input.consistency.level", consistency)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:
        # rewrap ONLY the missing-package failure modes with the
        # --packages recipe; everything else (wrong table, auth,
        # unreachable cluster on a working install) propagates with
        # its real diagnosis
        msg = str(exc)
        if any(
            marker in msg
            for marker in (
                "ClassNotFoundException",
                "DATA_SOURCE_NOT_FOUND",
                "Failed to find data source",
                "Failed to find the data source",
            )
        ):
            raise RuntimeError(
                "Cassandra read failed — the spark-cassandra-connector "
                "package is required on the classpath: start the session "
                "with --packages "
                "com.datastax.spark:spark-cassandra-connector_2.13:3.5.1 "
                "and set spark.cassandra.connection.host to a contact "
                f"point. Underlying error: {type(exc).__name__}: {exc}"
            ) from exc
        raise


def write_cassandra(
    df: DataFrame,
    keyspace: str,
    table: str,
    *,
    host: str | None = None,
    port: int | None = None,
    consistency: str | None = None,
    mode: str = "append",
    **options: str,
) -> None:
    """cassandrainsert (reference TODO:42): the connector-format write
    — executor-parallel, token-aware batched mutations on a live
    cluster, the same env-gate contract as read_cassandra (fails
    naturally with the --packages recipe when the jar is absent)."""
    writer = df.write.format("org.apache.spark.sql.cassandra").options(
        keyspace=keyspace, table=table
    )
    if host is not None:
        writer = writer.option("spark.cassandra.connection.host", host)
    if port is not None:
        writer = writer.option("spark.cassandra.connection.port", str(port))
    if consistency is not None:
        writer = writer.option("spark.cassandra.output.consistency.level", consistency)
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.mode(mode).save()
    except Exception as exc:
        msg = str(exc)
        if any(
            marker in msg
            for marker in (
                "ClassNotFoundException",
                "DATA_SOURCE_NOT_FOUND",
                "Failed to find data source",
                "Failed to find the data source",
            )
        ):
            raise RuntimeError(
                "Cassandra write failed — the spark-cassandra-connector "
                "package is required on the classpath: start the session "
                "with --packages "
                "com.datastax.spark:spark-cassandra-connector_2.13:3.5.1 "
                "and set spark.cassandra.connection.host to a contact "
                f"point. Underlying error: {type(exc).__name__}: {exc}"
            ) from exc
        raise
