"""Raw-line text source/sink + stdin (reference fileread
scripts/dbitool.pl:892-954, filewrite :1078-1121, stdin :956-992).

The reference's `raw` stream type — untyped lines in a single column —
maps to Spark's `DataFrame[value: string]`. Gzip is transparent on
read (Spark auto-decodes .gz by extension) and a write option on the
sink, mirroring the reference's gzip/gunzip modules
(scripts/dbitool.pl:1176-1316) as codec properties rather than
pipeline operators.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession

RAW_COL = "value"  # Spark's text column; the reference calls it col1


def read_text(
    spark: SparkSession,
    path: str | list[str],
    *,
    wholetext: bool = False,
    with_file: bool = False,
) -> DataFrame:
    """Line-per-row text source. `.gz` inputs decompress transparently.
    wholetext=True reads each file as a single row (blob mode).

    Multi-file containers (reference TODO:53-56): `path` may be a
    directory, a glob (including brace alternation — which is why a
    string is passed through VERBATIM, never comma-split: '{a,b}'
    globs and literal commas in filenames must survive), or an
    explicit list of paths — Spark plans one scan over all matches,
    split-parallel. with_file=True adds a `file` provenance column
    (input_file_name()), the one-DataFrame answer to the TODO's
    dynamically-allocated stream-per-file: group or partition by
    `file` downstream to recover per-file streams."""
    from pyspark.sql import functions as F

    paths = path if isinstance(path, str) else list(path)
    df = spark.read.text(paths, wholetext=wholetext)
    if with_file:
        df = df.select(F.input_file_name().alias("file"), RAW_COL)
    return df


def write_text(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = None,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Raw sink: one line per row of the single string column.
    compression="gzip" reproduces the reference's gzip module as a
    sink property. single_file=True coalesces to one partition for
    byte-exact small outputs (bounded edges only — at scale leave it
    False and let each task write its own part file)."""
    if len(df.columns) != 1:
        raise ValueError(f"write_text expects a single string column, got {df.columns}")
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def write_stdout(
    df: DataFrame, *, stream=None, eol: str = "\n", max_rows: int = 1_000_000
) -> int:
    """stdout/stderr sink (reference scripts/dbitool.pl:994-1076):
    stream rows to a text fd. Driver-side by nature — rows flow
    through toLocalIterator in executor-batch increments (constant
    driver memory), capped by max_rows as the sanity guard. Pass
    stream=sys.stderr for the stderr variant. Returns rows written."""
    out = stream if stream is not None else sys.stdout
    n = 0
    for row in df.toLocalIterator():
        if n >= max_rows:
            raise MemoryError(f"stdout sink exceeded max_rows={max_rows}")
        out.write(("\t".join("" if v is None else str(v) for v in row)) + eol)
        n += 1
    return n


def read_stdin(spark: SparkSession, *, max_lines: int = 1_000_000) -> DataFrame:
    """Driver-side stdin ingestion (bounded; the reference's stdin
    module is the one unbounded source it has, scripts/dbitool.pl:956-992
    — the streaming analogue lives in dbitool_spark.streaming).
    Reads at most max_lines to honor the reference's memorylimit-style
    guard on driver memory."""
    lines = []
    for i, line in enumerate(sys.stdin):
        if i >= max_lines:
            raise MemoryError(f"stdin exceeded max_lines={max_lines}")
        lines.append((line.rstrip("\n"),))
    return spark.createDataFrame(lines, schema=f"{RAW_COL} string")
