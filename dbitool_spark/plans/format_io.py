"""Oracle-checked format round-trip queries (SURVEY.md §2.1/§2.2).

Each query writes a test table through one of the engine's format
sinks into a scratch directory, reads it back through the matching
source, and returns the round-tripped rows. The DuckDB oracle is the
straight SELECT over the original parquet — so a green row proves the
sink+source pair preserves values exactly, not merely that it runs
(the r1 lesson: no vacuous greens).

Typed columns cross the text formats explicitly: doubles survive via
Spark's round-trippable repr; timestamps are emitted as formatted
strings in the RESULT (never raw) so engine timezone handling can't
skew the comparison.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbitool_spark import catalog
from dbitool_spark.io import bson_io, csv_io, db, fixedwidth, json_io, xml_io
from dbitool_spark.ops.column import project


def _scratch(name: str) -> str:
    return tempfile.mkdtemp(prefix=f"dbitool_fmt_{name}_")


def csv_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV (quoted, gzip) → back with explicit schema.
    Exercises sep/quote/escape/header plus the gzip codec path."""
    cust = catalog.load(spark, sf_dir, "customer")
    path = os.path.join(_scratch("csv"), "customer.csv")
    csv_io.write_csv(cust, path, sep="|", compression="gzip")
    back = csv_io.read_csv(
        spark,
        path,
        sep="|",
        schema="c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    return project(back, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])


CSV_ROUNDTRIP_CUSTOMER_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
"""


def ndjson_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → NDJSON → back. Timestamps ride as ISO strings in JSON;
    the result formats them to yyyy-MM-dd for engine-neutral hashing."""
    orders = catalog.load(spark, sf_dir, "orders")
    path = os.path.join(_scratch("ndjson"), "orders.ndjson")
    json_io.write_ndjson(orders, path)
    back = json_io.read_ndjson(
        spark,
        path,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
        "o_orderpriority",
    )


NDJSON_ROUNDTRIP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
       o_orderpriority
FROM orders
"""


def json_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region (constant 5 rows) through the bounded single-document
    JSON edge — the reference's in-memory jsonread/jsonwrite pair."""
    region = catalog.load(spark, sf_dir, "region")
    path = os.path.join(_scratch("json"), "region.json")
    json_io.write_json(region, path)
    back = json_io.read_json(spark, path, schema="r_regionkey int, r_name string")
    return project(back, ["r_regionkey", "r_name"])


JSON_ROUNDTRIP_REGION_SQL = "SELECT r_regionkey, r_name FROM region"


def fixedwidth_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → fixed-width text → back (substring scan), values cast
    to their original types. Widths sized so nothing truncates."""
    nation = catalog.load(spark, sf_dir, "nation")
    path = os.path.join(_scratch("fw"), "nation.fw")
    fixedwidth.write_fixedwidth(nation, path, [12, 20, 12])
    back = fixedwidth.read_fixedwidth(spark, path, [12, 20, 12])
    return back.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


FIXEDWIDTH_ROUNDTRIP_NATION_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


def csv_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents (free text with punctuation) → quoted CSV → back:
    the quoting/escape stress test on real content."""
    docs = catalog.load(spark, sf_dir, "documents")
    path = os.path.join(_scratch("docs"), "documents.csv")
    csv_io.write_csv(docs, path)
    back = csv_io.read_csv(
        spark,
        path,
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return project(back, ["doc_id", "text", "lang", "source", "n_chars"])


CSV_ROUNDTRIP_DOCUMENTS_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents"


def xml_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → XML (native Spark 4 source) → back with explicit
    schema (the XML reader would otherwise re-infer types)."""
    supp = catalog.load(spark, sf_dir, "supplier")
    path = os.path.join(_scratch("xml"), "supplier.xml")
    xml_io.write_xml(supp, path, root_tag="suppliers", row_tag="supplier")
    back = xml_io.read_xml(
        spark,
        path,
        row_tag="supplier",
        schema="s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    return project(back, ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])


XML_ROUNDTRIP_SUPPLIER_SQL = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


def sqlite_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → SQLite batched insert → distributed partitioned read
    (sqliteselect/sqliteinsert semantics: pushdown query slices per
    task, statement batches of 1024 on the write)."""
    part = catalog.load(spark, sf_dir, "part")
    dbf = os.path.join(_scratch("sqlite"), "t.db")
    db.write_sqlite(part, dbf, "part", mode="overwrite")
    back = db.read_sqlite(
        spark, dbf, table="part", partition_column="p_partkey", num_partitions=4
    )
    return back.select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        F.col("p_size").cast("int").alias("p_size"),
        "p_retailprice",
    )


SQLITE_ROUNDTRIP_PART_SQL = (
    "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part"
)


def bson_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region through the bounded single-document BSON edge
    (self-contained spec codec; reference {a:[rows]} wire shape)."""
    region = catalog.load(spark, sf_dir, "region")
    path = os.path.join(_scratch("bson"), "region.bson")
    bson_io.write_bson(region, path)
    back = bson_io.read_bson(spark, path, schema="r_regionkey int, r_name string")
    return project(back, ["r_regionkey", "r_name"])


BSON_ROUNDTRIP_REGION_SQL = "SELECT r_regionkey, r_name FROM region"


def quarantine_corrupt_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-channel semantics end to end: documents written as
    NDJSON plus two injected malformed lines, read back PERMISSIVE —
    good rows and quarantined rows must split exactly (the reference's
    error stream, tolerate-then-abort guarded by errorsize)."""
    from dbitool_spark.obs import check_errorsize, split_quarantine

    docs = catalog.load(spark, sf_dir, "documents")
    d = _scratch("quarantine")
    path = os.path.join(d, "docs.ndjson")
    json_io.write_ndjson(docs, path, single_file=True)
    part = [f for f in os.listdir(path) if f.endswith(".json")][0]
    with open(os.path.join(path, part), "a") as fh:
        fh.write('{"doc_id": broken\nnot json at all\n')
    for crc in os.listdir(path):
        if crc.endswith(".crc"):
            os.remove(os.path.join(path, crc))
    parsed = json_io.read_ndjson(
        spark,
        path,
        schema="doc_id bigint, text string, lang string, source string, "
        "n_chars bigint, _corrupt_record string",
        permissive_corrupt_col="_corrupt_record",
    )
    good, bad = split_quarantine(parsed)
    n_bad = check_errorsize(bad, errorsize=10)  # below threshold: no abort
    return good.agg(F.count(F.lit(1)).alias("n_good")).withColumn(
        "n_bad", F.lit(n_bad).cast("long")
    )


QUARANTINE_CORRUPT_NDJSON_SQL = """
SELECT COUNT(*) AS n_good, CAST(2 AS BIGINT) AS n_bad FROM documents
"""


def xlsx_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation through the own-spec SpreadsheetML codec (stdlib zip +
    XML; reference spreadsheetread/write scripts/dbitool.pl:2696-2870)
    at a non-trivial (x=1, y=2) offset. A bounded edge — the sheet is
    buffered driver-side exactly like the reference's in-memory
    spreadsheet modules; nation is a constant-size dimension."""
    from dbitool_spark.io import spreadsheet_io

    nation = catalog.load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = os.path.join(_scratch("xlsx"), "nation.xlsx")
    spreadsheet_io.write_spreadsheet(nation, path, sheet="nation", x=1, y=2)
    back = spreadsheet_io.read_spreadsheet(spark, path, sheet="nation", x=1, y=2)
    return back.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
    )


XLSX_ROUNDTRIP_NATION_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


def quarantine_corrupt_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV-side error channel: customer written as CSV plus injected
    malformed lines (wrong arity), read back PERMISSIVE with a typed
    schema — rows that fail the schema land in the quarantine column,
    good rows count exactly (reference error stream + errorsize,
    scripts/dbitool.pl:234-243, over the csvread module)."""
    from dbitool_spark.obs import check_errorsize, split_quarantine

    cust = catalog.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    d = _scratch("quarantine_csv")
    path = os.path.join(d, "cust.csv")
    csv_io.write_csv(cust, path, single_file=True)
    part = [f for f in os.listdir(path) if f.endswith(".csv")][0]
    with open(os.path.join(path, part), "a") as fh:
        # arity-violating rows: PERMISSIVE null-extends short rows but
        # a non-numeric key with a typed bigint column quarantines
        fh.write("not_a_number,garbage,xx\nalso bad,,\n")
    for crc in os.listdir(path):
        if crc.endswith(".crc"):
            os.remove(os.path.join(path, crc))
    parsed = csv_io.read_csv(
        spark,
        path,
        schema="c_custkey bigint, c_name string, c_acctbal double, _corrupt_record string",
        permissive_corrupt_col="_corrupt_record",
    )
    good, bad = split_quarantine(parsed)
    n_bad = check_errorsize(bad, errorsize=10)  # below threshold: no abort
    return good.agg(F.count(F.lit(1)).alias("n_good")).withColumn(
        "n_bad", F.lit(n_bad).cast("long")
    )


QUARANTINE_CORRUPT_CSV_SQL = """
SELECT COUNT(*) AS n_good, CAST(2 AS BIGINT) AS n_bad FROM customer
"""
