"""XML / BSON / SQLite / spreadsheet connector tests (bounded-edge and
distributed paths)."""

from __future__ import annotations

import os
import shutil
import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F

from dbitool_spark import testrow
from dbitool_spark.io import bson_io, db, spreadsheet_io, xml_io
from dbitool_spark.ops.column import project


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbitool_conn_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


N = 100


def test_xml_roundtrip(spark, tmpdir):
    df = testrow.dataframe(spark, N)
    path = os.path.join(tmpdir, "t.xml")
    xml_io.write_xml(df, path, root_tag="rows", row_tag="r")
    back = xml_io.read_xml(
        spark, path, row_tag="r",
        schema=", ".join(f"{c} string" for c in testrow.HEADER),
    )
    rows = project(back, list(testrow.HEADER)).collect()
    assert len(rows) == N
    for r in sorted(rows, key=lambda r: int(r[0])):
        testrow.check(tuple(r))


def test_bson_codec_known_vector():
    # {"x": "y"} per bsonspec.org: doclen=14, 0x02 string element
    assert bson_io._enc_doc({"x": "y"}) == (
        b"\x0e\x00\x00\x00" b"\x02x\x00" b"\x02\x00\x00\x00y\x00" b"\x00"
    )
    doc, _ = bson_io._dec_doc(bson_io._enc_doc({"x": "y"}))
    assert doc == {"x": "y"}


def test_bson_codec_types_roundtrip():
    doc = {
        "s": "text",
        "i32": 42,
        "i64": 2**40,
        "neg": -7,
        "d": 3.5,
        "b": True,
        "n": None,
        "nested": {"k": "v"},
        "arr": [1, "two", 3.0],
    }
    out, _ = bson_io._dec_doc(bson_io._enc_doc(doc))
    assert out == doc


def test_bson_roundtrip_spark(spark, tmpdir):
    df = testrow.dataframe(spark, N)
    path = os.path.join(tmpdir, "t.bson")
    bson_io.write_bson(df, path)
    back = bson_io.read_bson(
        spark, path, schema=", ".join(f"{c} string" for c in testrow.HEADER)
    )
    rows = project(back, list(testrow.HEADER)).collect()
    assert len(rows) == N
    for r in rows:
        testrow.check(tuple(r))


def test_bson_memory_limit(spark, tmpdir):
    df = testrow.dataframe(spark, 20)
    with pytest.raises(MemoryError):
        bson_io.write_bson(df, os.path.join(tmpdir, "t.bson"), memory_limit=5)


def test_sqlite_write_then_bounded_read(spark, tmpdir):
    path = os.path.join(tmpdir, "t.db")
    df = spark.createDataFrame(
        [(i, f"name{i}", i * 1.5) for i in range(50)], "id bigint, name string, score double"
    )
    written = db.write_sqlite(df, path, "t", mode="overwrite", batch_size=16)
    assert written == 50
    with sqlite3.connect(path) as con:  # really landed in sqlite
        assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 50
    back = db.read_sqlite(spark, path, table="t")
    assert back.count() == 50
    assert {r.name for r in back.filter(F.col("id") < 3).collect()} == {"name0", "name1", "name2"}


def test_sqlite_query_pushdown(spark, tmpdir):
    path = os.path.join(tmpdir, "t.db")
    df = spark.createDataFrame([(i, i % 5) for i in range(100)], "id bigint, grp bigint")
    db.write_sqlite(df, path, "t", mode="overwrite")
    agg = db.read_sqlite(
        spark, path, query="SELECT grp, COUNT(*) AS n FROM t GROUP BY grp"
    )
    assert {(r.grp, r.n) for r in agg.collect()} == {(g, 20) for g in range(5)}


def test_sqlite_partitioned_distributed_read(spark, tmpdir):
    path = os.path.join(tmpdir, "t.db")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(500)], "id bigint, v string")
    db.write_sqlite(df, path, "t", mode="overwrite")
    back = db.read_sqlite(spark, path, table="t", partition_column="id", num_partitions=4)
    assert back.count() == 500
    assert back.rdd.getNumPartitions() >= 1
    assert db.read_sqlite(spark, path, table="t", partition_column="id").distinct().count() == 500


def test_sqlite_partitioned_read_null_keys(spark, tmpdir):
    """Rows whose partition key is NULL match no modulo slice; they
    must fold into partition 0 (the JDBC partitioned-read convention)
    instead of being silently dropped."""
    path = os.path.join(tmpdir, "t.db")
    with sqlite3.connect(path) as con:
        con.execute("CREATE TABLE t (id INTEGER, v TEXT)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)", [(i, f"v{i}") for i in range(40)]
        )
        con.executemany(
            "INSERT INTO t VALUES (NULL, ?)", [(f"null{i}",) for i in range(7)]
        )
    back = db.read_sqlite(
        spark, path, table="t", partition_column="id", num_partitions=4
    )
    vals = [r.v for r in back.select("v").collect()]
    assert len(vals) == 47  # nothing dropped
    assert len(set(vals)) == 47  # nothing double-read
    assert {f"null{i}" for i in range(7)} <= set(vals)


def test_sqlite_memory_guard(spark, tmpdir):
    path = os.path.join(tmpdir, "t.db")
    df = spark.createDataFrame([(i,) for i in range(100)], "id bigint")
    db.write_sqlite(df, path, "t")
    with pytest.raises(MemoryError, match="partition_column"):
        db.read_sqlite(spark, path, table="t", memory_limit=10)


def test_sqlite_arg_contract(spark, tmpdir):
    with pytest.raises(ValueError, match="exactly one"):
        db.read_sqlite(spark, "x.db")
    with pytest.raises(ValueError, match="exactly one"):
        db.read_sqlite(spark, "x.db", query="SELECT 1", table="t")


def test_cassandra_real_read_env_blocked(spark):
    """read_cassandra issues the REAL connector-format load and fails
    naturally when the package is absent — the failure must name the
    exact --packages recipe, not a raw ClassNotFoundException."""
    with pytest.raises(RuntimeError, match="spark-cassandra-connector"):
        db.read_cassandra(spark, "ks", "events", host="127.0.0.1")


def test_cassandra_arg_contract(spark):
    with pytest.raises(ValueError, match="table not specified"):
        db.read_cassandra(spark, "ks")
    with pytest.raises(ValueError, match="reads tables, not raw CQL"):
        db.read_cassandra(spark, "ks", query="SELECT * FROM ks.t")


def test_spreadsheet_csv_sheet_roundtrip(spark, tmpdir):
    df = testrow.dataframe(spark, 30)
    path = os.path.join(tmpdir, "sheet.csv")
    spreadsheet_io.write_spreadsheet(df, path)
    back = spreadsheet_io.read_spreadsheet(spark, path)
    rows = project(back, list(testrow.HEADER)).collect()
    assert len(rows) == 30
    for r in rows:
        testrow.check(tuple(r))


def test_xlsx_roundtrip_exact_values(spark, tmpdir):
    """Own-spec SpreadsheetML codec: write the TestRow fixture, read
    it back, byte-exact check every value (reference spreadsheetread/
    write buffer whole sheets; same bounded contract here)."""
    df = testrow.dataframe(spark, 30)
    path = os.path.join(tmpdir, "t.xlsx")
    spreadsheet_io.write_spreadsheet(df, path)
    back = spreadsheet_io.read_spreadsheet(spark, path)
    assert back.columns == list(testrow.HEADER)
    rows = project(back, list(testrow.HEADER)).collect()
    assert len(rows) == 30
    for r in sorted(rows, key=lambda r: int(r[0])):
        testrow.check(tuple(r))


def test_xlsx_offsets_and_sheet_name(spark, tmpdir):
    """x/y offsets shift the block on write AND skip on read
    (reference x=/y= args, scripts/dbitool.pl:2749-2767, :2825-2832);
    sheet selection works by name and by index."""
    df = testrow.dataframe(spark, 5)
    path = os.path.join(tmpdir, "o.xlsx")
    spreadsheet_io.write_spreadsheet(df, path, sheet="data", x=2, y=3)
    back = spreadsheet_io.read_spreadsheet(spark, path, sheet="data", x=2, y=3)
    assert back.columns == list(testrow.HEADER)
    assert back.count() == 5
    by_index = spreadsheet_io.read_spreadsheet(spark, path, sheet=0, x=2, y=3)
    assert by_index.count() == 5
    with pytest.raises(ValueError, match="not found"):
        spreadsheet_io.read_spreadsheet(spark, path, sheet="nope")


def test_xlsx_reader_handles_shared_strings(spark, tmpdir):
    """Files from Excel/openpyxl use a sharedStrings table instead of
    inline strings — build one by hand (public ECMA-376 layout) and
    confirm the reader resolves t="s" references and sparse cells."""
    import zipfile

    from dbitool_spark.io import xlsx_codec

    path = os.path.join(tmpdir, "shared.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        # sparse row: C2 present, A2/B2 absent -> padded with ""
        '<row r="2"><c r="C2" t="s"><v>0</v></c><c r="D2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        f'<sst xmlns="{ns}" count="2" uniqueCount="2">'
        "<si><t>hello</t></si><si><r><t>wor</t></r><r><t>ld</t></r></si></sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", xlsx_codec._CONTENT_TYPES)
        z.writestr("_rels/.rels", xlsx_codec._ROOT_RELS)
        z.writestr("xl/workbook.xml", xlsx_codec._workbook_xml("S"))
        z.writestr("xl/_rels/workbook.xml.rels", xlsx_codec._WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)
    grid = xlsx_codec.read_xlsx(path)
    assert grid == [["hello", "world", "", ""], ["", "", "hello", "42"]]


def test_xlsx_col_letters_roundtrip():
    from dbitool_spark.io import xlsx_codec

    for i in (0, 1, 25, 26, 27, 51, 52, 701, 702, 16383):
        assert xlsx_codec.ref_to_col(xlsx_codec.col_letters(i) + "7") == i


def test_sqlite_query_from_stream(spark, tmpdir):
    """Reference entry point 3: the SQL text arrives on an upstream
    raw stream (scripts/dbitool.pl:1442-1457)."""
    from dbitool_spark.pipeline import Pipeline

    path = os.path.join(tmpdir, "t.db")
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "id bigint, grp bigint")
    db.write_sqlite(df, path, "t", mode="overwrite")
    sql_file = os.path.join(tmpdir, "q.sql")
    with open(sql_file, "w") as fh:
        fh.write("SELECT grp, COUNT(*) AS n\nFROM t GROUP BY grp\n")
    p = Pipeline(spark)
    p.add(f"fileread:in={sql_file}:out=sqltext")
    p.add(f"sqliteselect:fname={path}", **{"in": "sqltext", "out": "rows"})
    got = {(r.grp, r.n) for r in p.stream("rows").collect()}
    assert got == {(0, 10), (1, 10), (2, 10)}


def test_xlsx_codec_hostile_values_roundtrip(tmpdir):
    """Codec-level property: XML metacharacters, unicode, leading/
    trailing whitespace and embedded newlines survive byte-exact
    (xml:space=preserve on every inline string)."""
    from dbitool_spark.io import xlsx_codec

    rows = [
        ("a<b&c>d", '"quoted"', "'apos'"),
        ("  leading", "trailing  ", " both "),
        ("line1\nline2", "tab\there", "ünïcødé — 中文"),
        ("]]>", "<![CDATA[x]]>", "&amp;&lt;"),
        ("", "empty-left", ""),
    ]
    path = os.path.join(tmpdir, "hostile.xlsx")
    xlsx_codec.write_xlsx(path, rows)
    got = xlsx_codec.read_xlsx(path)
    assert got == [list(r) for r in rows]


def test_xlsx_pipeline_module_path(spark, tmpdir):
    """spreadsheetwrite/spreadsheetread as pipeline modules end to
    end (reference CLI surface, scripts/dbitool.pl:2696-2870)."""
    from dbitool_spark.pipeline import Pipeline

    src = os.path.join(tmpdir, "in.csv")
    from dbitool_spark.io import csv_io

    csv_io.write_csv(testrow.dataframe(spark, 8), src, single_file=True)
    out = os.path.join(tmpdir, "out.xlsx")
    p = Pipeline(spark)
    p.add(f"csvread:in={src}")
    p.add(f"spreadsheetwrite:out={out}:sheet=t:y=1")
    p.run()
    back = spreadsheet_io.read_spreadsheet(spark, out, sheet="t", y=1)
    rows = project(back, list(testrow.HEADER)).collect()
    assert len(rows) == 8
    for r in sorted(rows, key=lambda r: int(r[0])):
        testrow.check(tuple(r))


def test_cassandraselect_module_contract(spark):
    """cassandraselect is a registered module with the reference's arg
    surface; the read is real and fails naturally on the missing
    connector package (environment-gated, not stubbed)."""
    from dbitool_spark.pipeline import MODULES, Pipeline

    assert "cassandraselect" in MODULES
    p = Pipeline(spark)
    p.add("cassandraselect:keyspace=ks:table=t")
    with pytest.raises(RuntimeError, match="spark-cassandra-connector"):
        p.run()
    p2 = Pipeline(spark)
    with pytest.raises(ValueError, match="keyspace"):
        p2.add("cassandraselect:table=t")
        p2.run()


def test_xlsx_sheet_name_with_quotes_roundtrip(tmpdir):
    """A sheet name containing double quotes must produce a parseable
    workbook (name attribute is quoteattr-escaped, not just escape())."""
    from dbitool_spark.io import xlsx_codec

    path = os.path.join(tmpdir, "q.xlsx")
    xlsx_codec.write_xlsx(path, [("a", "b"), ("1", "2")], sheet='my "quoted" & <sheet>')
    assert xlsx_codec.read_xlsx(path) == [["a", "b"], ["1", "2"]]


def test_spreadsheet_read_bounded_edge_raises(spark, tmpdir):
    """read_spreadsheet mirrors write_spreadsheet's bounded-edge
    contract: past memory_limit it raises MemoryError instead of
    silently truncating (reference --memorylimit, scripts/dbitool.pl:40)."""
    import pytest as _pytest

    from dbitool_spark.io import spreadsheet_io, xlsx_codec

    path = os.path.join(tmpdir, "big.xlsx")
    rows = [("v",)] * 12
    xlsx_codec.write_xlsx(path, [("c1",)] + rows)
    with _pytest.raises(MemoryError):
        spreadsheet_io.read_spreadsheet(spark, path, memory_limit=5)
    # exactly at the cap: fine
    df = spreadsheet_io.read_spreadsheet(spark, path, memory_limit=12)
    assert df.count() == 12


def test_xls_roundtrip_exact_values(spark, tmpdir):
    """Own-spec BIFF8 codec (io/xls_codec.py): write the TestRow
    fixture as legacy .xls, read it back, byte-exact check every value
    (reference handles .xls via Spreadsheet::Read,
    scripts/dbitool.pl:2696-2784 — same bounded whole-sheet contract)."""
    df = testrow.dataframe(spark, 30)
    path = os.path.join(tmpdir, "t.xls")
    spreadsheet_io.write_spreadsheet(df, path)
    back = spreadsheet_io.read_spreadsheet(spark, path)
    assert back.columns == list(testrow.HEADER)
    rows = project(back, list(testrow.HEADER)).collect()
    assert len(rows) == 30
    for r in sorted(rows, key=lambda r: int(r[0])):
        testrow.check(tuple(r))


def test_xls_offsets_and_sheet_name(spark, tmpdir):
    """x/y offsets and sheet selection parity with the xlsx path
    (reference x=/y= args, scripts/dbitool.pl:2749-2767, :2825-2832)."""
    df = testrow.dataframe(spark, 5)
    path = os.path.join(tmpdir, "o.xls")
    spreadsheet_io.write_spreadsheet(df, path, sheet="data", x=2, y=3)
    back = spreadsheet_io.read_spreadsheet(spark, path, sheet="data", x=2, y=3)
    assert back.columns == list(testrow.HEADER)
    assert back.count() == 5
    by_index = spreadsheet_io.read_spreadsheet(spark, path, sheet=0, x=2, y=3)
    assert by_index.count() == 5
    with pytest.raises(ValueError, match="not found"):
        spreadsheet_io.read_spreadsheet(spark, path, sheet="nope")


def test_xls_codec_hostile_values_roundtrip(tmpdir):
    """Codec-level: unicode beyond latin-1 forces the UTF-16 wide-string
    branch; embedded newlines, quotes and empty cells survive; numeric
    cells format Excel-'General'-style (integral doubles drop .0)."""
    from dbitool_spark.io import xls_codec

    rows = [
        ("plain", 'quo"ted', "apos'trophe"),
        ("ünïcødé — 中文", "line1\nline2", "tab\there"),
        ("", "empty-left", ""),
        (42, 3.25, -7),
    ]
    path = os.path.join(tmpdir, "hostile.xls")
    xls_codec.write_xls(path, rows)
    got = xls_codec.read_xls(path)
    assert got == [
        ["plain", 'quo"ted', "apos'trophe"],
        ["ünïcødé — 中文", "line1\nline2", "tab\there"],
        ["", "empty-left", ""],
        ["42", "3.25", "-7"],
    ]


def test_xls_reader_handles_rk_mulrk_label(tmpdir):
    """Real-world .xls files use RK / MULRK / inline-LABEL records our
    writer never emits — hand-build a sheet with them ([MS-XLS]
    2.4.220, 2.4.175, 2.4.148) and confirm the reader decodes both RK
    forms (integer and x100) and MULRK runs."""
    import struct

    from dbitool_spark.io import xls_codec

    def rk_int(v):
        return ((v & 0x3FFFFFFF) << 2) | 0x02

    def rk_x100_int(v):
        return ((v & 0x3FFFFFFF) << 2) | 0x03

    def rk_float(v):
        (bits,) = struct.unpack("<Q", struct.pack("<d", v))
        return (bits >> 32) & 0xFFFFFFFC

    globals_parts = [
        xls_codec._rec(0x0809, struct.pack("<HHHHIHH", 0x0600, 0x0005, 0, 0, 0, 0, 0)),
        xls_codec._rec(0x0085, struct.pack("<IH", 0, 0) + bytes([1, 0]) + b"S"),
        xls_codec._rec(0x000A, b""),
    ]
    gbytes = b"".join(globals_parts)
    bs_off = len(globals_parts[0]) + 4
    gbytes = gbytes[:bs_off] + struct.pack("<I", len(gbytes)) + gbytes[bs_off + 4 :]

    sheet = b"".join(
        [
            xls_codec._rec(0x0809, struct.pack("<HHHHIHH", 0x0600, 0x0010, 0, 0, 0, 0, 0)),
            # RK integer 7 at A1, RK x100 integer 325 (=3.25) at B1
            xls_codec._rec(0x027E, struct.pack("<HHHI", 0, 0, 0, rk_int(7))),
            xls_codec._rec(0x027E, struct.pack("<HHHI", 0, 1, 0, rk_x100_int(325))),
            # RK float 1.5 at C1
            xls_codec._rec(0x027E, struct.pack("<HHHI", 0, 2, 0, rk_float(1.5))),
            # MULRK row 2: cols 0..2 = 10, 20, 30
            xls_codec._rec(
                0x00BD,
                struct.pack("<HH", 1, 0)
                + b"".join(struct.pack("<HI", 0, rk_int(v)) for v in (10, 20, 30))
                + struct.pack("<H", 2),
            ),
            # inline LABEL at A3
            xls_codec._rec(
                0x0204, struct.pack("<HHH", 2, 0, 0) + struct.pack("<HB", 5, 0) + b"hello"
            ),
            xls_codec._rec(0x000A, b""),
        ]
    )
    path = os.path.join(tmpdir, "rk.xls")
    with open(path, "wb") as fh:
        fh.write(xls_codec._cfb_write("Workbook", gbytes + sheet))
    grid = xls_codec.read_xls(path)
    assert grid == [["7", "3.25", "1.5"], ["10", "20", "30"], ["hello", "", ""]]


def test_xls_large_stream_regular_sectors(tmpdir):
    """Workbooks over the 4096B CFB mini-cutoff chain regular 512B
    sectors, and a big SST splits across CONTINUE records at string
    boundaries — both paths in one file."""
    from dbitool_spark.io import xls_codec

    rows = [(f"string-{i:05d}-" + "x" * 40, i, float(i) + 0.5) for i in range(400)]
    path = os.path.join(tmpdir, "big.xls")
    xls_codec.write_xls(path, rows)
    assert os.path.getsize(path) > 4096
    got = xls_codec.read_xls(path)
    assert len(got) == 400
    assert got[399] == [f"string-00399-" + "x" * 40, "399", "399.5"]


def test_xls_bounded_edges(spark, tmpdir):
    """Same --memorylimit contract as every other whole-document edge:
    read fails loudly past the cap instead of silently truncating."""
    df = testrow.dataframe(spark, 12)
    path = os.path.join(tmpdir, "cap.xls")
    spreadsheet_io.write_spreadsheet(df, path)
    with pytest.raises(MemoryError, match="bounded edge"):
        spreadsheet_io.read_spreadsheet(spark, path, memory_limit=5)


def test_jdbc_executed_roundtrip_derby(spark, tmpdir):
    """The mysqlselect/jdbcselect code path EXECUTED, not just
    arg-mapped: embedded Derby ships inside the Spark distribution, so
    the real spark.read.format('jdbc') machinery runs — write, ranged
    partitioned read, query-form read, and JDBC-side predicate
    pushdown (PushedFilters on the scan)."""
    import contextlib
    import io as _io

    from dbitool_spark.plans import format_io

    url = f"jdbc:derby:{os.path.join(tmpdir, 'db')};create=true"
    df = spark.createDataFrame(
        [(i, f"name-{i}", float(i) * 1.5) for i in range(100)],
        "id bigint, name string, score double",
    )
    db.write_jdbc(
        df, url, "t", mode="overwrite", driver=format_io.DERBY_DRIVER,
        createTableColumnTypes="name VARCHAR(32)",
    )
    back = db.read_jdbc(
        spark, url, table="t", driver=format_io.DERBY_DRIVER,
        partitionColumn="id", numPartitions="4", lowerBound="0", upperBound="100",
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert sorted((r.id, r.name, r.score) for r in back.collect())[7] == (7, "name-7", 10.5)
    # query form (Derby folds unquoted identifiers to upper case;
    # Spark-written columns are quoted lower case)
    q = db.read_jdbc(
        spark, url, driver=format_io.DERBY_DRIVER,
        query='SELECT COUNT(*) AS \"n\" FROM t WHERE \"id\" < 50',
    )
    assert q.collect()[0].n == 50
    # predicate pushdown reaches the external engine
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter("score > 100.0").explain("formatted")
    pushed = [l for l in buf.getvalue().splitlines() if "PushedFilters" in l]
    assert any("GreaterThan(score,100.0)" in l for l in pushed), pushed


def test_jdbcselect_pipeline_query_from_stream(spark, tmpdir):
    """jdbcselect as a pipeline module with the SQL text arriving on an
    upstream raw stream (reference third signature,
    scripts/dbitool.pl:1442-1457) — against a real JDBC engine."""
    from dbitool_spark.pipeline import Pipeline
    from dbitool_spark.plans import format_io

    url = f"jdbc:derby:{os.path.join(tmpdir, 'db2')};create=true"
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(50)], "id bigint, grp bigint"
    )
    db.write_jdbc(df, url, "t", mode="overwrite", driver=format_io.DERBY_DRIVER)
    sql_file = os.path.join(tmpdir, "q.sql")
    with open(sql_file, "w") as fh:
        fh.write('SELECT "grp", COUNT(*) AS "n"\nFROM t GROUP BY "grp"\n')
    p = Pipeline(spark)
    p.add(f"fileread:in={sql_file}:out=sqltext")
    # the URL contains ':' — pass it through the dict/kwargs spec form
    # (the CLI colon syntax is for simple values, reference :93-103)
    p.add(
        "jdbcselect",
        url=url,
        driver=format_io.DERBY_DRIVER,
        **{"in": "sqltext", "out": "rows"},
    )
    got = {(r.grp, r.n) for r in p.stream("rows").collect()}
    assert got == {(g, 10) for g in range(5)}


def test_xls_codec_hardening(tmpdir):
    """Regression pins for the r8 review findings: ragged-row column
    cap, unicode sheet names, rich-text LABEL offsets, corrupt-SST
    raise instead of hang, non-finite number formatting."""
    import struct

    from dbitool_spark.io import xls_codec

    # ragged rows: a LATER row over 256 cols must be rejected
    with pytest.raises(MemoryError, match="256 columns"):
        xls_codec.write_xls(
            os.path.join(tmpdir, "wide.xls"), [(1,), tuple(range(300))]
        )

    # non-latin1 sheet name round-trips by exact name
    p = os.path.join(tmpdir, "uni.xls")
    xls_codec.write_xls(p, [("a", "b")], sheet="データ")
    assert xls_codec.read_xls(p, sheet="データ") == [["a", "b"]]

    # rich-text inline LABEL: cRun sits between grbit and chars
    globals_parts = [
        xls_codec._rec(0x0809, struct.pack("<HHHHIHH", 0x0600, 0x0005, 0, 0, 0, 0, 0)),
        xls_codec._rec(0x0085, struct.pack("<IH", 0, 0) + bytes([1, 0]) + b"S"),
        xls_codec._rec(0x000A, b""),
    ]
    g = b"".join(globals_parts)
    off = len(globals_parts[0]) + 4
    g = g[:off] + struct.pack("<I", len(g)) + g[off + 4 :]
    sheet = b"".join(
        [
            xls_codec._rec(0x0809, struct.pack("<HHHHIHH", 0x0600, 0x0010, 0, 0, 0, 0, 0)),
            xls_codec._rec(
                0x0204,
                struct.pack("<HHH", 0, 0, 0)
                + struct.pack("<HB", 2, 0x08)  # cch=2, rich flag
                + struct.pack("<H", 1)  # cRun=1
                + b"ok"
                + b"\x00\x00\x00\x00",  # one 4-byte run descriptor
            ),
            xls_codec._rec(0x000A, b""),
        ]
    )
    rich = os.path.join(tmpdir, "rich.xls")
    with open(rich, "wb") as fh:
        fh.write(xls_codec._cfb_write("Workbook", g + sheet))
    assert xls_codec.read_xls(rich) == [["ok"]]

    # corrupt SST (odd trailing byte mid-wide-char) raises, not hangs
    bad_sst = struct.pack("<ii", 1, 1) + struct.pack("<HB", 2, 0x01) + b"\x41"
    with pytest.raises(ValueError, match="corrupt SST"):
        xls_codec._parse_sst(struct.pack("<ii", 1, 1) + bad_sst[8:], [])

    # inf/nan numbers surface as text instead of crashing
    assert xls_codec._fmt_number(float("inf")) == "inf"
    assert xls_codec._fmt_number(float("nan")) == "nan"
