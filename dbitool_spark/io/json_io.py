"""JSON source/sink pair (reference jsonread scripts/dbitool.pl:2188-2259,
jsonwrite :2261-2313, ndjsonread :2315-2377, ndjsonwrite :2379-2436).

NDJSON is Spark's native JSON mode and fully streaming/distributed.
Single-document JSON (one array of objects) is a pipeline breaker in
the reference ("in memory" modules, memorylimit guard at
scripts/dbitool.pl:40,777-778) and in Spark (multiLine=True parses a
whole file per task); both read and write paths here keep an explicit
row bound that mirrors the reference's memorylimit semantics.

Schema note (SURVEY.md 1.3): the reference derives columns from the
first object's keys with nondeterministic order; Spark sorts JSON
field names -- canonical, better-defined behavior, documented
divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbitool_spark.io import _atomic

DEFAULT_MEMORY_LIMIT = 100_000  # rows; reference --memorylimit default


def read_ndjson(
    spark: SparkSession,
    path: str,
    *,
    schema: str | None = None,
    permissive_corrupt_col: str | None = None,
) -> DataFrame:
    """One JSON object per line; streaming-friendly, scales to any
    size (the reference's own POD recommends NDJSON over JSON for
    exactly this reason, scripts/dbitool.pl:2954-2964)."""
    reader = spark.read
    if permissive_corrupt_col:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", permissive_corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_ndjson(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = None,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    writer = (df.coalesce(1) if single_file else df).write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def parse_ndjson_lines(df: DataFrame, *, schema: str | None = None) -> DataFrame:
    """Parse a raw single-column line stream as NDJSON (the raw->row
    boundary when ndjsonread consumes an upstream raw stream).

    schema GIVEN: fully JVM-side via F.from_json on the value column —
    no Python worker in the plan, scales to any raw stream. Blank and
    whitespace-only lines are skipped, matching spark.read.json (they
    would otherwise become phantom all-null rows). schema ABSENT:
    spark.read.json over an RDD hop so Spark can infer the schema
    (inference requires a data pass anyway); that path is for BOUNDED
    raw streams (stdin) — schema large corpora explicitly."""
    if len(df.columns) != 1:
        raise ValueError(f"parse_ndjson_lines expects one raw column, got {df.columns}")
    spark = df.sparkSession
    if schema is not None:
        from pyspark.sql import functions as F

        raw_col = df.columns[0]
        # rlike, not trim: F.trim strips only ASCII spaces, so a
        # tab-only or CR-only line (every blank line of a CRLF
        # stream) would still become a phantom all-null row
        return (
            df.filter(~F.col(raw_col).rlike(r"^\s*$"))
            .select(F.from_json(F.col(raw_col), schema).alias("_r"))
            .select("_r.*")
        )
    lines = df.rdd.map(lambda r: r[0])
    return spark.read.json(lines)


def read_json(
    spark: SparkSession,
    path: str,
    *,
    schema: str | None = None,
    memory_limit: int | None = None,
) -> DataFrame:
    """Whole-document JSON array of objects. multiLine=True makes each
    FILE one parse unit -- a genuine single-task cost the optimizer
    cannot split, so this is for bounded edges only (same contract as
    the reference's in-memory jsonread). memory_limit enforces that
    contract the way the reference's --memorylimit aborts an
    over-budget in-memory module (scripts/dbitool.pl:40, :777-778):
    when set, a bounded probe fails loudly past the cap instead of
    letting a giant single-doc file monopolize one task. None skips
    the probe (one extra small job) for trusted inputs."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if memory_limit is not None:
        n = df.limit(memory_limit + 1).count()
        if n > memory_limit:
            raise MemoryError(
                f"read_json is a bounded edge: >{memory_limit} rows "
                "(use read_ndjson for large corpora)"
            )
    return df


def write_json(
    df: DataFrame,
    path: str,
    *,
    pretty: bool = False,
    memory_limit: int = DEFAULT_MEMORY_LIMIT,
    memory_limit_bytes: int = 256 * 1024 * 1024,
) -> None:
    """Single-document JSON array sink -- inherently driver-side
    (one document has one writer). memory_limit guards the output
    size exactly as the reference guards its in-memory modules, so
    at most memory_limit rows ever reach the driver — fetch them in
    ONE limit(memory_limit+1) job (the write_spreadsheet bounded-edge
    pattern) rather than toLocalIterator's one-sequential-job-per-
    partition waves, which cost seconds of pure scheduling on many-
    partition inputs. JSON encoding stays JVM-side via toJSON(). For
    unbounded data use write_ndjson. Writes one file at `path`.

    CAVEAT: the guard is ROW-count-based, so memory_limit rows of
    very wide documents can still hold gigabytes driver-side at once
    (the old toLocalIterator path streamed with constant memory but
    paid a job per partition). memory_limit_bytes rejects an encoded
    document larger than the cap — an OUTPUT-size contract, checked
    after the one-job fetch, NOT a driver-memory bound (the rows are
    already on the driver when it runs; only the row cap limits peak
    memory). Size memory_limit for your row width, or use
    write_ndjson. Both limits raise MemoryError."""
    sep = ",\n  " if pretty else ","
    rows = df.limit(memory_limit + 1).toJSON().collect()
    if len(rows) > memory_limit:
        raise MemoryError(
            f"write_json is a bounded edge: >{memory_limit} rows "
            "(reference memorylimit semantics); use write_ndjson"
        )
    # encoded-BYTE length, not unicode chars: a non-ASCII document is
    # up to 4x its character count on disk and the limit says "bytes"
    if sum(len(r.encode("utf-8")) for r in rows) > memory_limit_bytes:
        raise MemoryError(
            f"write_json is a bounded edge: encoded document exceeds "
            f"{memory_limit_bytes} bytes (wide rows — lower memory_limit "
            "or use write_ndjson)"
        )
    head, tail = ("[\n  ", "\n]") if pretty else ("[", "]")
    # shared tmp+rename helper: no partial document on failure
    _atomic.write_text(path, head + sep.join(rows) + tail)
