"""Fixed-width source/sink (reference fixedwidthread
scripts/dbitool.pl:1894-1973, fixedwidthwrite :1975-2041).

No native Spark reader exists; the scan is `text` + per-column
substring projections -- pure Catalyst expressions, fully codegen'd
and distributed (SURVEY.md 4.3 item 3). Reference semantics kept:
- read: split by widths, optional whitespace trim, header row names
  the columns (or col1..colN when header=0);
- write: left-justified space padding, values hard-truncated at the
  column width (reference format(), :2032-2039), optional header.

Header handling on read uses the CSV reader with an impossible
separator: Spark then consumes the first line of EVERY file as the
header natively and in parallel -- no driver-side first-line peek,
and the header line itself becomes the column-name source, exactly
like the reference's prepoutcolname (:1935-1952).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SEP_SENTINEL = "\x01"  # never appears in fixed-width text


def _slice(col: Column, start: int, width: int, trim: bool) -> Column:
    piece = F.substring(col, start, width)
    return F.trim(piece) if trim else piece


def read_fixedwidth(
    spark: SparkSession,
    path: str,
    widths: list[int],
    *,
    header: bool = True,
    trim: bool = True,
    colnames: list[str] | None = None,
) -> DataFrame:
    """Fixed-width scan. Column names come from (in precedence order)
    `colnames`, the header line, or col1..colN."""
    if not widths:
        raise ValueError("widths must be non-empty (reference: 'width not specified')")
    if header:
        raw = spark.read.option("header", True).option("sep", _SEP_SENTINEL).csv(path)
        header_line = raw.columns[0]
        line = F.col(raw.columns[0])
        if colnames is None:
            colnames = _split_fixed(header_line, widths, trim=True)
    else:
        raw = spark.read.text(path)
        line = F.col("value")
        if colnames is None:
            colnames = [f"col{i + 1}" for i in range(len(widths))]
    cols, pos = [], 1
    for name, w in zip(colnames, widths):
        cols.append(_slice(line, pos, w, trim).alias(name))
        pos += w
    return raw.select(*cols)


def _split_fixed(s: str, widths: list[int], trim: bool) -> list[str]:
    out, p = [], 0
    for w in widths:
        piece = s[p : p + w]
        out.append(piece.strip() if trim else piece)
        p += w
    return out


def write_fixedwidth(
    df: DataFrame,
    path: str,
    widths: list[int],
    *,
    header: bool = True,
    compression: str | None = None,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Fixed-width sink: pad-right then truncate each value at its
    width (reference truncation semantics, :2036), concat, write as
    text. header=True prepends the (same-formatted) column-name line
    per part file, matching the CSV sink's per-file convention."""
    if len(df.columns) != len(widths):
        raise ValueError(
            f"number of widths ({len(widths)}) differs from number of columns ({len(df.columns)})"
        )
    pieces = [
        F.rpad(F.substring(F.col(c).cast("string"), 1, w), w, " ")
        for c, w in zip(df.columns, widths)
    ]
    lines = df.select(F.concat(*pieces).alias("value"))
    single_file = single_file or header
    out = lines.coalesce(1) if single_file else lines
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)
    if header:
        # header=True implies the bounded single-file path; prepend the
        # (same-formatted, width-truncated) column-name line directly —
        # cheaper than unioning a 1-row DataFrame through the job
        _prepend_header(path, df.columns, widths, compression)


def _prepend_header(path: str, cols: list[str], widths: list[int], compression: str | None) -> None:
    import glob as _glob
    import gzip as _gzip
    import os as _os

    header_text = "".join(f"{c[:w]:<{w}}" for c, w in zip(cols, widths))
    suffix = "*.txt.gz" if compression == "gzip" else "*.txt"
    parts = sorted(_glob.glob(_os.path.join(path, suffix)))
    if not parts:
        raise FileNotFoundError(f"no part file under {path}")
    part = parts[0]
    opener = _gzip.open if compression == "gzip" else open
    with opener(part, "rt") as fh:
        body = fh.read()
    with opener(part, "wt") as fh:
        fh.write(header_text + "\n" + body)
    # the local Hadoop FS keeps .crc sidecars; the rewrite invalidates
    # them, so drop them or every subsequent read fails checksum
    for crc in _glob.glob(_os.path.join(path, ".*.crc")):
        _os.remove(crc)
