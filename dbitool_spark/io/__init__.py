"""Format sources and sinks (SURVEY.md §2.1/§2.2).

Each module maps one reference format pair onto Spark's native
readers/writers, preserving the reference's option surface
(sep/quote/escape/header/eol, widths/trim, multiline-JSON bounds)
while letting Catalyst own scan pushdown, partitioning, and codecs.
"""

from dbitool_spark.io.csv_io import read_csv, write_csv
from dbitool_spark.io.fixedwidth import read_fixedwidth, write_fixedwidth
from dbitool_spark.io.json_io import (
    read_json,
    read_ndjson,
    write_json,
    write_ndjson,
)
from dbitool_spark.io.text_io import read_stdin, read_text, write_text

__all__ = [
    "read_csv",
    "write_csv",
    "read_fixedwidth",
    "write_fixedwidth",
    "read_json",
    "read_ndjson",
    "write_json",
    "write_ndjson",
    "read_stdin",
    "read_text",
    "write_text",
]
