"""Spreadsheet source/sink (reference spreadsheetread
scripts/dbitool.pl:2696-2784, spreadsheetwrite :2786-2870).

The reference goes through Spreadsheet::Read / Spreadsheet::WriteExcel
fully in memory, with an (x, y) top-left offset and an optional header
row; it also accepts CSV as a "sheet" format. Mapping:

- xlsx paths go through pandas.read_excel / DataFrame.to_excel
  (Arrow-bridged, bounded) — import-gated because no Excel engine
  ships in this environment (openpyxl/xlrd absent): the functions
  raise ImportError with instructions instead of pretending;
- csv "sheets" use the engine's own distributed CSV path, honoring
  the same x/y offset semantics driver-side only when offsets are
  used (offsets imply a bounded, positional read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dbitool_spark.io import csv_io

DEFAULT_MEMORY_LIMIT = 100_000


def _excel_engine_available() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


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
    """Read a spreadsheet (xlsx/xls via pandas when an engine is
    installed; .csv natively). x/y offset the top-left cell like the
    reference's x=/y= args."""
    ext = os.path.splitext(fname)[1].lower()
    if ext == ".csv":
        if x == 0 and y == 0:
            return csv_io.read_csv(spark, fname, header=header)
        import pandas as pd

        pdf = pd.read_csv(
            fname,
            skiprows=y,
            header=0 if header else None,
            nrows=memory_limit,
        )
        pdf = pdf.iloc[:, x:]
        if not header:
            pdf.columns = [f"col{i + 1}" for i in range(len(pdf.columns))]
        return spark.createDataFrame(pdf.astype(str))
    if not _excel_engine_available():
        raise ImportError(
            "reading xlsx/xls requires an Excel engine (openpyxl); none is "
            "installed in this environment. CSV sheets work natively."
        )
    import pandas as pd

    pdf = pd.read_excel(
        fname,
        sheet_name=sheet,
        skiprows=y,
        header=0 if header else None,
        nrows=memory_limit,
    )
    pdf = pdf.iloc[:, x:]
    if not header:
        pdf.columns = [f"col{i + 1}" for i in range(len(pdf.columns))]
    return spark.createDataFrame(pdf.astype(str))


def write_spreadsheet(
    df: DataFrame,
    fname: str,
    *,
    sheet: str = "Sheet1",
    header: bool = True,
    memory_limit: int = DEFAULT_MEMORY_LIMIT,
) -> None:
    """Write a bounded sheet. .csv writes through the distributed CSV
    sink (single file); xlsx needs an Excel engine."""
    ext = os.path.splitext(fname)[1].lower()
    if ext == ".csv":
        csv_io.write_csv(df, fname, header=header, single_file=True)
        return
    if not _excel_engine_available():
        raise ImportError(
            "writing xlsx requires an Excel engine (openpyxl); none is "
            "installed in this environment. CSV sheets work natively."
        )
    rows = df.limit(memory_limit + 1).toPandas()
    if len(rows) > memory_limit:
        raise MemoryError(f"write_spreadsheet is a bounded edge: >{memory_limit} rows")
    rows.to_excel(fname, sheet_name=sheet, header=header, index=False)
