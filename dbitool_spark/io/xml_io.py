"""XML source/sink (reference xmlread scripts/dbitool.pl:2043-2122,
xmlwrite :2124-2186) on Spark 4's native XML data source.

The reference buffers the whole document and extracts `root`/`row`
nodes in memory; Spark's XML source streams rowTag elements per file
split — strictly more scalable, same row model. The reference's
hand-rolled escaper only covers & < > (with a `&emp;` typo bug at
:2180); the native source escapes correctly — documented divergence,
implementing the intent rather than the bug (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str = "row",
    schema: str | None = None,
) -> DataFrame:
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    *,
    root_tag: str = "root",
    row_tag: str = "row",
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .format("xml")
        .option("rootTag", root_tag)
        .option("rowTag", row_tag)
        .save(path)
    )
