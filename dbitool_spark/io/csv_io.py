"""CSV source/sink (reference csvread scripts/dbitool.pl:1757-1822,
csvwrite :1824-1892).

Option surface preserved: sep / quote / escape / header. The
reference's default is quote="" escape="" (no quoting at all), which
makes values containing the separator ambiguous on re-read -- a
documented limitation of the reference's unquoted wire; its own
TestRow fixture produces such rows. Spark expresses "no quoting" as
an empty quote option; our default keeps proper quoting on so
round-trips are lossless. Schema follows the reference's
stringly-typed wire (SURVEY.md 1.3): all columns StringType unless
the caller opts into inference or passes an explicit schema.

Header semantics on the schema'd RAW-LINE path (parse_csv_lines with
schema=): header=True drops every line whose parsed values equal the
schema's field names (with no extra trailing fields). This differs
from spark.read.csv's positional "skip the first line per file" in
two documented ways, both consequences of parsing an UNORDERED
distributed line stream where "first" is not a plan-expressible
concept:
- a header whose text does NOT match the schema's field names is not
  recognized as a header (it would otherwise survive as a cast-to-
  null phantom row) — parse_csv_lines probes the stream's first line
  at plan-build time and WARNS on such a mismatch (a warning, not an
  error: limit(1) on a multi-part stream is partition-order
  dependent, so a data line there can be legitimate; bounded action,
  skipped for streaming inputs, where the caller owns header
  hygiene);
- a genuine DATA row whose values coincide with the field names drops
  anywhere in the stream, not just at line 1 (an all-string schema
  makes this reachable; typed schemas make such a row unparseable as
  data anyway). Callers with such data should pass header=False and
  strip the header upstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Schemas (field-name tuples) whose header-mismatch warning already
# fired this process — the probe warns once per schema, not per call
# (ADVICE r11).
_WARNED_HEADER_SCHEMAS: set[tuple[str, ...]] = set()


def _probe_enabled(probe_header: bool | None) -> bool:
    """Resolve the header-probe switch: an explicit kwarg wins; the
    default follows SPARK_GRAFT_CSV_HEADER_PROBE (unset/1 = on,
    0 = off for slow or remote sources where an eager plan-build
    limit(1) job is unwelcome)."""
    if probe_header is not None:
        return probe_header
    return os.environ.get("SPARK_GRAFT_CSV_HEADER_PROBE", "1") != "0"


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = True,
    schema: str | None = None,
    infer: bool = False,
    permissive_corrupt_col: str | None = None,
) -> DataFrame:
    """CSV scan. Default is the reference's contract: header row
    provides column names, every column lands as string (no implicit
    typing). infer=True opts into Spark schema inference; an explicit
    `schema` wins over both. permissive_corrupt_col routes malformed
    lines into a named column instead of failing (the error-stream
    model, see dbitool_spark.obs)."""
    reader = (
        spark.read.option("sep", sep)
        .option("quote", quote)  # empty string disables quoting
        .option("escape", escape)
        .option("header", header)
    )
    if permissive_corrupt_col:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", permissive_corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def parse_csv_lines(
    df: DataFrame,
    *,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = True,
    schema: str | None = None,
    probe_header: bool | None = None,
) -> DataFrame:
    """Parse a raw single-column line stream as CSV — the reference's
    raw->row boundary when csvread consumes an upstream raw stream
    (e.g. `stdin csvread`, scripts/dbitool.pl:3273-3276).

    Two plans, both distributed:
    - schema GIVEN: fully JVM-side via F.from_csv on the value column
      — stays inside whole-stage codegen, no Python worker, scales to
      any raw stream. ONE univocity parse per line (all-string probe
      struct, then string->type casts — the module's stringly-typed
      wire makes the casts equivalent to typed CSV conversion).
      header=True drops lines whose PARSED values equal the schema's
      field names with NO extra trailing fields (so '"k","name"' and
      'k,name' both drop, while a data line 'k,name,more' survives —
      the distributed generalization: a multi-part raw stream carries
      one header per original file; a stream whose header text
      differs from the schema's field names is the caller's mismatch
      to resolve). Blank and whitespace-only lines are skipped,
      matching spark.read.csv (univocity treats them as empty).
    - schema ABSENT (header-name/type inference): the line dataset
      feeds spark.read.csv via an RDD hop. Inference itself requires
      a pass over the data, so this path is for BOUNDED raw streams
      (stdin, streamed SQL text); point large corpora at the
      schema'd path or read_csv on files."""
    if len(df.columns) != 1:
        raise ValueError(f"parse_csv_lines expects one raw column, got {df.columns}")
    spark = df.sparkSession
    raw_col = df.columns[0]
    if schema is not None:
        from functools import reduce

        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        target = StructType.fromDDL(schema)
        fields = target.fieldNames()
        opts = {"sep": sep, "quote": quote, "escape": escape}
        # spark.read.csv skips blank AND whitespace-only lines (CRLF
        # streams leave '\r'); from_csv would turn each into a
        # phantom all-null row — mirror the reader
        lines = df.filter(~F.col(raw_col).rlike(r"^\s*$"))
        # one parse: all-string probe struct with a sentinel EXTRA
        # column so a data line carrying fields beyond the schema is
        # distinguishable from a true header line
        extra = "_x"
        while extra in fields:
            extra += "_"
        probe = ", ".join(
            [f"`{f}` string" for f in fields] + [f"`{extra}` string"]
        )
        parsed = lines.select(
            F.from_csv(F.col(raw_col), probe, opts).alias("_r")
        ).select("_r.*")
        if header and not df.isStreaming and _probe_enabled(probe_header):
            # ADVICE r10: a header whose text differs from the schema
            # field names is NOT recognized by the value-equality drop
            # rule and would silently survive as a cast-to-null
            # phantom row. Probe the stream's first non-blank line
            # (bounded: limit(1) short-circuits the scan; skipped for
            # streaming inputs where no such action exists) and warn
            # loudly on a mismatch. A warning, not an error: limit(1)
            # on a multi-part stream is partition-order dependent, so
            # a data line here can be legitimate. ADVICE r11: the
            # probe is an eager job at plan-build time, so it is
            # opt-out-able per call (probe_header=False) or per
            # process (SPARK_GRAFT_CSV_HEADER_PROBE=0) for slow or
            # remote sources, and the warning fires once per schema
            # per process, not once per call.
            first = parsed.limit(1).collect()
            if (
                first
                and list(first[0]) != list(fields) + [None]
                and tuple(fields) not in _WARNED_HEADER_SCHEMAS
            ):
                import warnings

                _WARNED_HEADER_SCHEMAS.add(tuple(fields))
                warnings.warn(
                    "parse_csv_lines(header=True, schema=...): the stream's "
                    f"first line parsed to {list(first[0])[:-1]!r}, not the "
                    f"schema field names {list(fields)!r}. A real header with "
                    "different column names will NOT be dropped and survives "
                    "as a cast-to-null row — rename the schema fields to "
                    "match the file header, or pass header=False and strip "
                    "the header upstream. (On a multi-partition stream the "
                    "probed line is partition-order dependent, so this can "
                    "be a false alarm; warned once per schema. Disable with "
                    "probe_header=False or SPARK_GRAFT_CSV_HEADER_PROBE=0.)",
                    stacklevel=2,
                )
        if header:
            # compare PARSED string values, not raw bytes: a quoted
            # header ('"k","name"') drops like 'k,name'; eqNullSafe
            # keeps short lines (null tail) from silently dropping;
            # the extra-column null test keeps 'k,name,REALDATA'
            is_hdr = reduce(
                lambda a, b: a & b,
                [F.col(f).eqNullSafe(F.lit(f)) for f in fields],
            ) & F.col(extra).isNull()
            parsed = parsed.filter(~is_hdr)
        return parsed.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in target.fields
            ]
        )
    lines = df.rdd.map(lambda r: r[0])
    reader = (
        spark.read.option("sep", sep)
        .option("quote", quote)
        .option("escape", escape)
        .option("header", header)
    )
    return reader.csv(lines)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = True,
    compression: str | None = None,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """CSV sink. header=True emits the column-name line at the top of
    every part file (Spark's native per-file header -- the distributed
    generalization of the reference's single header line).
    quote="" suppresses quoting entirely (reference default,
    lossy for values containing the separator)."""
    out = df.coalesce(1) if single_file else df
    writer = (
        out.write.mode(mode)
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", escape)
        .option("header", header)
        # Spark's writer trims value whitespace by default; the
        # reference preserves bytes, so fidelity wins (found by the
        # hypothesis round-trip property)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)
