"""Spreadsheet source/sink (reference spreadsheetread
scripts/dbitool.pl:2696-2784, spreadsheetwrite :2786-2870).

The reference goes through Spreadsheet::Read / Spreadsheet::WriteExcel
fully in memory, with an (x, y) top-left offset and an optional header
row; it also accepts CSV as a "sheet" format. Mapping:

- .xlsx goes through the engine's own stdlib SpreadsheetML codec
  (io/xlsx_codec.py — ECMA-376 subset, no Excel engine needed),
  bounded/driver-side exactly like the reference buffers whole sheets;
- legacy binary .xls goes through the engine's own stdlib BIFF8 codec
  (io/xls_codec.py — [MS-CFB] container + [MS-XLS] record subset),
  same bounded contract;
- .csv "sheets" use the engine's own distributed CSV path, honoring
  the same x/y offset semantics driver-side only when offsets are
  used (offsets imply a bounded, positional read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dbitool_spark.io import csv_io, xls_codec, xlsx_codec

DEFAULT_MEMORY_LIMIT = 100_000


def _grid_to_df(
    spark: SparkSession,
    grid: list[list[str]],
    *,
    header: bool,
    x: int,
) -> DataFrame:
    grid = [row[x:] for row in grid]
    if not grid or not grid[0]:
        raise ValueError("spreadsheet sheet is empty after x/y offsets")
    if header:
        cols, body = list(grid[0]), grid[1:]
    else:
        cols, body = [f"col{i + 1}" for i in range(len(grid[0]))], grid
    return spark.createDataFrame([tuple(r) for r in body], schema=cols)


def read_spreadsheet(
    spark: SparkSession,
    fname: str,
    *,
    sheet: str | int = 0,
    header: bool = True,
    x: int = 0,
    y: int = 0,
    memory_limit: int = DEFAULT_MEMORY_LIMIT,
) -> DataFrame:
    """Read a spreadsheet (.xlsx via the stdlib codec; .csv natively).
    x/y offset the top-left cell like the reference's x=/y= args."""
    ext = os.path.splitext(fname)[1].lower()
    if ext == ".csv":
        if x == 0 and y == 0:
            return csv_io.read_csv(spark, fname, header=header)
        import pandas as pd

        pdf = pd.read_csv(
            fname,
            skiprows=y,
            header=0 if header else None,
            nrows=memory_limit + 1,
        )
        if len(pdf) > memory_limit:
            raise MemoryError(f"read_spreadsheet is a bounded edge: >{memory_limit} rows")
        pdf = pdf.iloc[:, x:]
        if not header:
            pdf.columns = [f"col{i + 1}" for i in range(len(pdf.columns))]
        return spark.createDataFrame(pdf.astype(str))
    if ext in (".xlsx", ".xls"):
        # bounded edge: read one row past the cap and fail loudly, matching
        # write_spreadsheet's contract — never silently drop tail rows
        cap = memory_limit + y + (1 if header else 0)
        reader = xlsx_codec.read_xlsx if ext == ".xlsx" else xls_codec.read_xls
        grid = reader(fname, sheet=sheet, max_rows=cap + 1)
        if len(grid) > cap:
            raise MemoryError(f"read_spreadsheet is a bounded edge: >{memory_limit} rows")
        return _grid_to_df(spark, grid[y:], header=header, x=x)
    raise ValueError(
        f"read_spreadsheet supports .csv, .xlsx and .xls, got {ext!r}"
    )


def write_spreadsheet(
    df: DataFrame,
    fname: str,
    *,
    sheet: str = "Sheet1",
    header: bool = True,
    x: int = 0,
    y: int = 0,
    memory_limit: int = DEFAULT_MEMORY_LIMIT,
) -> None:
    """Write a bounded sheet. .csv writes through the distributed CSV
    sink (single file); .xlsx through the stdlib codec at the (x, y)
    offset (reference spreadsheetwrite x=/y= semantics,
    scripts/dbitool.pl:2825-2832)."""
    ext = os.path.splitext(fname)[1].lower()
    if ext == ".csv":
        csv_io.write_csv(df, fname, header=header, single_file=True)
        return
    if ext not in (".xlsx", ".xls"):
        raise ValueError(f"write_spreadsheet supports .csv, .xlsx and .xls, got {ext!r}")
    # bounded edge: whole-sheet formats are in-memory by nature — the
    # reference enforces the same contract via --memorylimit
    rows = df.limit(memory_limit + 1).collect()
    if len(rows) > memory_limit:
        raise MemoryError(f"write_spreadsheet is a bounded edge: >{memory_limit} rows")
    out: list[tuple] = [tuple(df.columns)] if header else []
    out += [tuple(r) for r in rows]
    if ext == ".xls":
        xls_codec.write_xls(fname, out, sheet=sheet, x=x, y=y)
    else:
        xlsx_codec.write_xlsx(fname, out, sheet=sheet, x=x, y=y)
