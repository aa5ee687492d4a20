"""Reference TODO-scope modules (TODO:31-59): zip archives,
multi-file containers, TCP client modules, the external-process
filter, the eval expression module, and the DB-flavor JDBC/Cassandra
modules. Each test pins the Spark-first shape documented in the
module docstrings."""

from __future__ import annotations

import os
import socket
import threading
import zipfile

import pytest
from pyspark.sql import functions as F

from dbitool_spark.io import archive_io, net_io, text_io
from dbitool_spark.ops.process import exec_pipe


# --- zip archives (TODO:48-51) ----------------------------------------


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_zip_roundtrip_single_member(spark, tmp_path):
    lines = [f"row-{i}|{i * i}" for i in range(200)]
    zp = str(tmp_path / "one.zip")
    n = archive_io.write_zip(_lines_df(spark, lines), zp, member="data.csv")
    assert n == 200
    back = archive_io.read_zip(spark, zp)
    got = [r.value for r in back.orderBy("value").collect()]
    assert got == sorted(lines)
    provs = back.select("archive", "member").distinct().collect()
    assert len(provs) == 1 and provs[0].member == "data.csv"


def test_zip_multi_member_and_glob(spark, tmp_path):
    zp = str(tmp_path / "multi.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("a/part-0.csv", "1,x\n2,y\n")
        zf.writestr("a/part-1.csv", "3,z\n")
        zf.writestr("README.txt", "not data\n")
    all_rows = archive_io.read_zip(spark, zp)
    assert all_rows.count() == 4
    csv_only = archive_io.read_zip(spark, zp, member_glob="a/*.csv")
    assert csv_only.count() == 3
    assert set(
        r.member for r in csv_only.select("member").distinct().collect()
    ) == {"a/part-0.csv", "a/part-1.csv"}


def test_zip_directory_of_archives(spark, tmp_path):
    # TODO:53-56's multi-file container: a directory of zips scans as
    # one DataFrame, archive-per-task, provenance recovers the files
    for i in range(3):
        with zipfile.ZipFile(str(tmp_path / f"arc{i}.zip"), "w") as zf:
            zf.writestr("m.txt", f"from-{i}\n")
    (tmp_path / "ignored.bin").write_bytes(b"\x00")
    df = archive_io.read_zip(spark, str(tmp_path))
    rows = df.collect()
    assert sorted(r.value for r in rows) == ["from-0", "from-1", "from-2"]
    assert len({r.archive for r in rows}) == 3


def test_zip_binary_mode(spark, tmp_path):
    zp = str(tmp_path / "bin.zip")
    payload = bytes(range(256))
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("blob.bin", payload)
    row = archive_io.read_zip(spark, zp, binary=True).collect()[0]
    assert bytes(row.content) == payload and row.member == "blob.bin"


def test_zip_member_limit_guard(spark, tmp_path):
    zp = str(tmp_path / "fat.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("fat.txt", "x" * 10_000)
    with pytest.raises(Exception, match="member_limit"):
        archive_io.read_zip(spark, zp, member_limit=1_000).collect()


def test_write_zip_max_rows_guard(spark, tmp_path):
    with pytest.raises(MemoryError, match="max_rows"):
        archive_io.write_zip(
            _lines_df(spark, [str(i) for i in range(50)]),
            str(tmp_path / "over.zip"),
            max_rows=10,
        )


def test_write_zip_guard_failure_is_atomic(spark, tmp_path):
    """A mid-write guard failure must not leave a truncated archive at
    the final path (io._atomic tmp+replace discipline), and a prior
    good archive must survive a failed overwrite untouched."""
    zp = str(tmp_path / "out.zip")
    archive_io.write_zip(_lines_df(spark, ["a", "b"]), zp)
    before = open(zp, "rb").read()
    with pytest.raises(MemoryError, match="max_rows"):
        archive_io.write_zip(
            _lines_df(spark, [str(i) for i in range(50)]), zp, max_rows=10
        )
    assert open(zp, "rb").read() == before  # old archive intact
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []

    fresh = str(tmp_path / "never.zip")
    with pytest.raises(MemoryError, match="max_rows"):
        archive_io.write_zip(
            _lines_df(spark, [str(i) for i in range(50)]), fresh, max_rows=10
        )
    assert not os.path.exists(fresh)  # nothing truncated left behind


def test_zipread_pipeline_csv_chain(spark, tmp_path):
    """zipread -> raw->row CSV parse, the zipped-CSV chain the TODO
    sketches, through the pipeline module surface."""
    from dbitool_spark.io import csv_io
    from dbitool_spark.pipeline import MODULES, Pipeline

    zp = str(tmp_path / "nation.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("n.csv", "1,alpha\n2,beta\n3,gamma\n")
    p = Pipeline(spark)
    raw = MODULES["zipread"](p, [], {"in": zp, "drop_provenance": 1})
    parsed = csv_io.parse_csv_lines(raw, schema="k int, name string", header=False)
    assert [(r.k, r.name) for r in parsed.orderBy("k").collect()] == [
        (1, "alpha"), (2, "beta"), (3, "gamma"),
    ]


# --- multi-file / directory sources (TODO:53-56) -----------------------


def test_read_text_multi_and_provenance(spark, tmp_path):
    fa, fb = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    with open(fa, "w") as f:
        f.write("a1\na2\n")
    with open(fb, "w") as f:
        f.write("b1\n")
    # explicit path list + provenance column
    df = text_io.read_text(spark, [fa, fb], with_file=True)
    rows = df.collect()
    assert sorted(r.value for r in rows) == ["a1", "a2", "b1"]
    by_file = {
        os.path.basename(r.file.replace("file://", "")): r.value for r in rows
    }
    assert by_file["b.txt"] == "b1"
    # directory form scans every file beneath
    assert text_io.read_text(spark, str(tmp_path)).count() == 3
    # the fileread module's multi=1 opts into comma-splitting
    from dbitool_spark.pipeline import MODULES, Pipeline

    p = Pipeline(spark)
    got = MODULES["fileread"](p, [], {"in": f"{fa} , {fb}", "multi": 1})
    assert got.count() == 3


def test_read_text_brace_glob_not_comma_split(spark, tmp_path):
    """A string path passes through verbatim: '{a,b}' brace globs
    (and literal commas in names) must NOT be comma-split."""
    for sub in ("2023", "2024", "2025"):
        d = tmp_path / sub
        d.mkdir()
        (d / "log.txt").write_text(f"{sub}-line\n")
    df = text_io.read_text(spark, str(tmp_path / "{2023,2024}" / "log.txt"))
    assert sorted(r.value for r in df.collect()) == ["2023-line", "2024-line"]


# --- TCP client modules (TODO:58-59) -----------------------------------


class _Collector:
    """Accepts any number of connections, collects all lines."""

    def __init__(self):
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.lines: list[str] = []
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        self.srv.settimeout(0.2)
        workers = []
        while not self._stop:
            try:
                conn, _ = self.srv.accept()
            except TimeoutError:
                continue
            t = threading.Thread(target=self._drain, args=(conn,), daemon=True)
            t.start()
            workers.append(t)
        for t in workers:
            t.join(5)

    def _drain(self, conn):
        buf = b""
        with conn:
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
        with self._lock:
            self.lines.extend(buf.decode().splitlines())

    def close(self):
        self._stop = True
        self._thread.join(5)
        self.srv.close()


def test_write_tcp_distributed(spark):
    lines = [f"line-{i}" for i in range(100)]
    coll = _Collector()
    try:
        net_io.write_tcp(
            _lines_df(spark, lines).repartition(4), "127.0.0.1", coll.port
        )
        coll._stop = True
        coll._thread.join(10)
        assert sorted(coll.lines) == sorted(lines)
    finally:
        coll.close()


def test_write_tcp_single_conn(spark):
    coll = _Collector()
    try:
        net_io.write_tcp(
            _lines_df(spark, ["a", "b", "c"]), "127.0.0.1", coll.port,
            single_conn=True,
        )
        coll._stop = True
        coll._thread.join(10)
        assert sorted(coll.lines) == ["a", "b", "c"]
    finally:
        coll.close()


def test_read_tcp_bounded(spark):
    payload = [f"r{i}" for i in range(50)]

    def _serve(srv):
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(payload) + "\n").encode())

    srv = socket.create_server(("127.0.0.1", 0))
    t = threading.Thread(target=_serve, args=(srv,), daemon=True)
    t.start()
    try:
        df = net_io.read_tcp(spark, "127.0.0.1", srv.getsockname()[1])
        assert [r.value for r in df.collect()] == payload
    finally:
        t.join(5)
        srv.close()


def test_read_tcp_max_rows_guard(spark):
    def _serve(srv):
        conn, _ = srv.accept()
        with conn:
            conn.sendall(b"a\nb\nc\nd\n")

    srv = socket.create_server(("127.0.0.1", 0))
    t = threading.Thread(target=_serve, args=(srv,), daemon=True)
    t.start()
    try:
        with pytest.raises(MemoryError, match="max_rows"):
            net_io.read_tcp(spark, "127.0.0.1", srv.getsockname()[1], max_rows=2)
    finally:
        t.join(5)
        srv.close()


# --- external-process filter (TODO:31-32) ------------------------------


def test_exec_pipe_tr_uppercase(spark):
    lines = [f"mixed Case {i}" for i in range(300)]
    df = _lines_df(spark, lines).repartition(4)
    got = sorted(
        r.value for r in exec_pipe(df, ["tr", "a-z", "A-Z"]).collect()
    )
    want = sorted(
        r.up for r in df.select(F.upper("value").alias("up")).collect()
    )
    assert got == want


def test_exec_pipe_grep_filter(spark):
    df = _lines_df(spark, [f"keep-{i}" if i % 3 == 0 else f"drop-{i}" for i in range(90)])
    got = exec_pipe(df.repartition(3), ["grep", "^keep"], ok_codes=(0, 1)).collect()
    assert len(got) == 30 and all(r.value.startswith("keep-") for r in got)


def test_exec_pipe_failure_raises(spark):
    df = _lines_df(spark, ["x"])
    with pytest.raises(Exception, match="exited"):
        exec_pipe(df, ["sh", "-c", "exit 3"]).collect()


def test_exec_pipe_no_shell_injection(spark):
    # hostile row content is payload, never command line: the command
    # runs without a shell, so this "line" cannot spawn anything
    df = _lines_df(spark, ["$(touch /tmp/pwned_exec_pipe); `id`"])
    out = exec_pipe(df, ["cat"]).collect()
    assert out[0].value == "$(touch /tmp/pwned_exec_pipe); `id`"
    assert not os.path.exists("/tmp/pwned_exec_pipe")


# --- eval expression module (TODO:34) ----------------------------------


def test_eval_module_selectexpr(spark):
    from dbitool_spark.pipeline import MODULES, Pipeline

    p = Pipeline(spark)
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, price double")
    out = MODULES["eval"](p, [df], {"expr": "price * 0.9 AS discounted"})
    assert out.columns == ["k", "price", "discounted"]
    assert [r.discounted for r in out.orderBy("k").collect()] == [9.0, 18.0]
    only = MODULES["eval"](p, [df], {"expr": ["k + 100 AS k2"], "keep": 0})
    assert only.columns == ["k2"]


# --- DB flavor modules (TODO:40-46) -------------------------------------


def test_mysql_mssql_url_assembly(spark, monkeypatch):
    from dbitool_spark import pipeline as P

    captured = {}

    def fake_write(df, url, table, mode="append", **opts):
        captured["write"] = (url, table, mode, opts)

    def fake_read(spark_, url, query=None, table=None, **opts):
        captured["read"] = (url, query, table, opts)
        return spark.range(1)

    monkeypatch.setattr(P.db, "write_jdbc", fake_write)
    monkeypatch.setattr(P.db, "read_jdbc", fake_read)
    p = P.Pipeline(spark)
    df = spark.range(3)

    P.MODULES["mysqlinsert"](
        p, [df], {"db": "shop", "table": "t", "user": "u", "pw": "s"}
    )
    url, table, mode, opts = captured["write"]
    assert url == "jdbc:mysql://localhost:3306/shop" and table == "t"
    assert opts == {"user": "u", "password": "s"}

    P.MODULES["mssqlinsert"](
        p, [df], {"db": "shop", "host": "h1", "port": 14330, "table": "t2"}
    )
    url, table, mode, opts = captured["write"]
    assert url == "jdbc:sqlserver://h1:14330;databaseName=shop"

    P.MODULES["mssqlselect"](p, [], {"db": "shop", "query": "SELECT 1 AS x"})
    url, query, table, opts = captured["read"]
    assert url.startswith("jdbc:sqlserver://localhost:1433;") and query == "SELECT 1 AS x"

    with pytest.raises(ValueError, match="table not specified"):
        P.MODULES["mysqlinsert"](p, [df], {"db": "shop"})
    with pytest.raises(ValueError, match="db"):
        P.MODULES["mssqlselect"](p, [], {"query": "SELECT 1"})


def test_cassandrainsert_env_gate(spark):
    """Without the connector package the write must fail with the
    --packages recipe (same contract as cassandraselect), proving the
    real format write is attempted."""
    from dbitool_spark.io import db as iodb

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(RuntimeError, match="--packages"):
        iodb.write_cassandra(df, "ks", "tbl", host="127.0.0.1")


# --- streaming socket source (TODO:58-59, unbounded input) --------------


def test_stream_socket_source(spark):
    """The engine-native TCP tail: a throwaway server feeds lines, the
    socket-source stream drains into a memory sink."""
    import time
    import uuid

    from dbitool_spark import streaming

    payload = [f"s{i}" for i in range(20)]
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def _serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(payload) + "\n").encode())
            time.sleep(2.0)  # keep open so the source reads everything

    t = threading.Thread(target=_serve, daemon=True)
    t.start()
    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = (
        streaming.stream_socket(spark, "127.0.0.1", port)
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table(name).count() >= len(payload):
                break
            time.sleep(0.25)
        got = [r.value for r in spark.table(name).collect()]
        assert sorted(got) == sorted(payload)
    finally:
        q.stop()
        t.join(5)
        srv.close()
        spark.catalog.dropTempView(name)


# --- join / lookup stream modules (TODO:61-72) ---------------------------


def test_join_module(spark):
    from dbitool_spark.pipeline import MODULES, Pipeline

    p = Pipeline(spark)
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, 10), (3, 30), (4, 40)], "k int, w int")
    out = MODULES["join"](p, [left, right], {"key": "k"})
    assert sorted((r.k, r.v, r.w) for r in out.collect()) == [(1, "a", 10), (3, "c", 30)]
    anti = MODULES["join"](p, [left, right], {"key": "k", "how": "left_anti"})
    assert [r.k for r in anti.collect()] == [2]
    with pytest.raises(ValueError, match="two input"):
        MODULES["join"](p, [left], {"key": "k"})


def test_lookup_module_broadcast(spark):
    """Lookup = broadcast-hash left join: enrichment keeps unmatched
    rows (NULLs), the hint shows in the physical plan, and select=
    prunes the lookup side."""
    import contextlib
    import io

    from dbitool_spark.pipeline import MODULES, Pipeline

    p = Pipeline(spark)
    main = spark.createDataFrame([(1,), (2,), (9,)], "k int")
    lut = spark.createDataFrame(
        [(1, "one", "x"), (2, "two", "y")], "k int, name string, junk string"
    )
    out = MODULES["lookup"](p, [main, lut], {"key": "k", "select": "name"})
    assert out.columns == ["k", "name"]
    rows = {r.k: r.name for r in out.collect()}
    assert rows == {1: "one", 2: "two", 9: None}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_zip_roundtrip_preserves_unicode_linebreak_chars(spark, tmp_path):
    """U+2028/U+0085 INSIDE a line must survive the zip text hop (the
    \\n-exact splitting contract — str.splitlines would cut the row in
    two and break the format-chain oracle)."""
    lines = ["plain", "has\u2028inside", "nel\u0085char", "tab\x0bvt"]
    zp = str(tmp_path / "uni.zip")
    archive_io.write_zip(_lines_df(spark, lines), zp)
    got = sorted(r.value for r in archive_io.read_zip(spark, zp).collect())
    assert got == sorted(lines)


def test_exec_pipe_preserves_unicode_linebreak_chars(spark):
    lines = ["a\u2028b", "c\u0085d"]
    got = sorted(r.value for r in exec_pipe(_lines_df(spark, lines), ["cat"]).collect())
    assert got == sorted(lines)


def test_lookup_select_naming_key_is_deduped(spark):
    from dbitool_spark.pipeline import MODULES, Pipeline

    p = Pipeline(spark)
    main = spark.createDataFrame([(1,)], "k int")
    lut = spark.createDataFrame([(1, "one")], "k int, name string")
    out = MODULES["lookup"](p, [main, lut], {"key": "k", "select": "k,name"})
    assert out.columns == ["k", "name"] and out.collect()[0].name == "one"


def test_write_bucketed_append_mode_preserved(spark, tmp_path):
    """mode='append' must NOT drop the existing table (the overwrite
    idempotence cleanup is gated on mode)."""
    from dbitool_spark.ops import scale

    df1 = spark.createDataFrame([(1, "a")], "k int, v string")
    df2 = spark.createDataFrame([(2, "b")], "k int, v string")
    scale.write_bucketed(df1, "bkt_append_test", "k", n_buckets=2)
    scale.write_bucketed(df2, "bkt_append_test", "k", n_buckets=2, mode="append")
    assert spark.table("bkt_append_test").count() == 2
    spark.sql("DROP TABLE IF EXISTS bkt_append_test")


def test_tar_roundtrip_and_compressed(spark, tmp_path):
    """read_tar: plain tar with multiple members, a .tar.gz of the
    same content (mode='r:*' auto-detect), member_glob pruning, and
    binary mode."""
    import gzip
    import tarfile

    def make_tar(path, compress=None):
        mode = "w:gz" if compress else "w"
        with tarfile.open(path, mode) as tf:
            for name, body in [
                ("data/a.txt", b"x1\nx2\n"),
                ("data/b.txt", b"y1\n"),
                ("notes.md", b"skip me\n"),
            ]:
                import io as _io

                info = tarfile.TarInfo(name)
                info.size = len(body)
                tf.addfile(info, _io.BytesIO(body))

    tp = str(tmp_path / "plain.tar")
    make_tar(tp)
    df = archive_io.read_tar(spark, tp)
    assert sorted(r.value for r in df.collect()) == ["skip me", "x1", "x2", "y1"]
    only = archive_io.read_tar(spark, tp, member_glob="data/*.txt")
    assert sorted(r.value for r in only.collect()) == ["x1", "x2", "y1"]

    tgz = str(tmp_path / "packed.tar.gz")
    make_tar(tgz, compress=True)
    assert archive_io.read_tar(spark, tgz).count() == 4

    blob = archive_io.read_tar(spark, tp, binary=True, member_glob="data/b.txt")
    row = blob.collect()[0]
    assert bytes(row.content) == b"y1\n" and row.member == "data/b.txt"


def test_tar_member_limit_and_nontar_skip(spark, tmp_path):
    import io as _io
    import tarfile

    tp = str(tmp_path / "fat.tar")
    with tarfile.open(tp, "w") as tf:
        info = tarfile.TarInfo("fat.bin")
        body = b"z" * 5000
        info.size = len(body)
        tf.addfile(info, _io.BytesIO(body))
    with pytest.raises(Exception, match="member_limit"):
        archive_io.read_tar(spark, tp, member_limit=100).collect()
    # directory scan skips non-tar files instead of crashing
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01")
    assert archive_io.read_tar(spark, str(tmp_path), member_limit=10000).count() == 1


def test_tarread_pipeline_module(spark, tmp_path):
    import io as _io
    import tarfile

    from dbitool_spark.pipeline import MODULES, Pipeline

    tp = str(tmp_path / "m.tar")
    with tarfile.open(tp, "w") as tf:
        info = tarfile.TarInfo("rows.csv")
        body = b"7,seven\n8,eight\n"
        info.size = len(body)
        tf.addfile(info, _io.BytesIO(body))
    p = Pipeline(spark)
    raw = MODULES["tarread"](p, [], {"in": tp, "drop_provenance": 1})
    from dbitool_spark.io import csv_io

    parsed = csv_io.parse_csv_lines(raw, schema="k int, name string", header=False)
    assert [(r.k, r.name) for r in parsed.orderBy("k").collect()] == [
        (7, "seven"), (8, "eight"),
    ]


def test_withfile_provenance_on_row_sources(spark, tmp_path):
    """withfile=1 adds the input_file_name provenance column on the
    csv/ndjson/parquet scan modules too (TODO:53-56 across the file
    sources, not just fileread)."""
    from dbitool_spark.pipeline import MODULES, Pipeline

    p = Pipeline(spark)
    for sub, body in [("p1", "1,a\n"), ("p2", "2,b\n")]:
        d = tmp_path / sub
        d.mkdir()
        (d / "x.csv").write_text(body)
    got = MODULES["csvread"](
        p, [], {"in": str(tmp_path / "*" / "x.csv"),
                 "schema": "k int, v string", "header": 0, "withfile": 1}
    )
    assert got.columns[0] == "file"
    rows = got.collect()
    assert len(rows) == 2 and all("x.csv" in r.file for r in rows)
    files = {os.path.basename(os.path.dirname(r.file)) for r in rows}
    assert files == {"p1", "p2"}

    pq = str(tmp_path / "t.parquet")
    spark.range(3).write.parquet(pq)
    out = MODULES["parquetread"](p, [], {"in": pq, "withfile": 1})
    assert out.columns[0] == "file" and out.count() == 3


def test_withfile_with_quarantine_keeps_real_paths(spark, tmp_path):
    """withfile + quarantine=1: provenance must be captured at the
    SCAN (before the quarantine checkpoint boundary), so file values
    are real paths, not empty strings."""
    from dbitool_spark.pipeline import MODULES, Pipeline

    f = tmp_path / "q.csv"
    f.write_text("1,a\nBADROW\n2,b\n")
    p = Pipeline(spark)
    got = MODULES["csvread"](
        p, [],
        {"in": str(f), "schema": "k int, v string", "header": 0,
         "quarantine": 1, "withfile": 1},
    )
    rows = got.collect()
    assert len(rows) == 2
    assert all(r.file and "q.csv" in r.file for r in rows)


def test_withfile_shadow_and_raw_branch_raise(spark):
    from dbitool_spark.pipeline import MODULES, Pipeline, _with_file

    p = Pipeline(spark)
    df = spark.createDataFrame([("x", 1)], "file string, v int")
    with pytest.raises(ValueError, match="shadow"):
        _with_file(df, {"withfile": 1})
    raw = spark.createDataFrame([("1,a",)], "value string")
    with pytest.raises(ValueError, match="file-read path"):
        MODULES["csvread"](p, [raw], {"withfile": 1})
    with pytest.raises(ValueError, match="file-read path"):
        MODULES["ndjsonread"](p, [raw], {"withfile": 1})


def test_tar_hardlink_and_symlink_members(spark, tmp_path):
    """Dedup'd tars store identical files as links; read_tar must
    materialize their content like tar extraction would."""
    import io as _io
    import tarfile

    tp = str(tmp_path / "links.tar")
    body = b"shared\n"
    with tarfile.open(tp, "w") as tf:
        info = tarfile.TarInfo("orig.txt")
        info.size = len(body)
        tf.addfile(info, _io.BytesIO(body))
        ln = tarfile.TarInfo("hard.txt")
        ln.type = tarfile.LNKTYPE
        ln.linkname = "orig.txt"
        tf.addfile(ln)
        sym = tarfile.TarInfo("sym.txt")
        sym.type = tarfile.SYMTYPE
        sym.linkname = "orig.txt"
        tf.addfile(sym)
        broken = tarfile.TarInfo("broken.txt")
        broken.type = tarfile.SYMTYPE
        broken.linkname = "no/such/target"
        tf.addfile(broken)
    rows = archive_io.read_tar(spark, tp).collect()
    by_member = {}
    for r in rows:
        by_member.setdefault(r.member, []).append(r.value)
    assert by_member.get("orig.txt") == ["shared"]
    assert by_member.get("hard.txt") == ["shared"]
    assert by_member.get("sym.txt") == ["shared"]
    assert "broken.txt" not in by_member  # outside-target link skipped


# --- archive codec properties -----------------------------------------

import string as _string

from hypothesis import HealthCheck as _HC
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_zip_lines = _st.lists(
    _st.text(
        alphabet=_string.ascii_letters + _string.digits + " ,;|\t{}[]()\u00e9\u2028",
        max_size=40,
    ),
    min_size=0,
    max_size=30,
)


@_given(lines=_zip_lines)
@_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
def test_zip_roundtrip_property(spark, tmp_path_factory, lines):
    """write_zip -> read_zip is lossless for arbitrary text rows
    (unicode incl. U+2028, tabs, quotes) modulo row order."""
    import tempfile

    d = tempfile.mkdtemp(prefix="zip_prop_")
    zp = os.path.join(d, "p.zip")
    archive_io.write_zip(_lines_df(spark, list(lines)), zp)
    got = sorted(r.value for r in archive_io.read_zip(spark, zp).collect())
    assert got == sorted(lines)


@_given(
    members=_st.dictionaries(
        _st.text(alphabet=_string.ascii_lowercase, min_size=1, max_size=8).map(
            lambda s: s + ".txt"
        ),
        _st.binary(max_size=200),
        min_size=1,
        max_size=5,
    )
)
@_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
def test_tar_binary_roundtrip_property(spark, members):
    """Arbitrary binary members survive a tar write -> read_tar
    round-trip byte-exactly (binary mode has no line semantics)."""
    import io as _io
    import tarfile
    import tempfile

    d = tempfile.mkdtemp(prefix="tar_prop_")
    tp = os.path.join(d, "p.tar")
    with tarfile.open(tp, "w") as tf:
        for name, body in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, _io.BytesIO(body))
    rows = archive_io.read_tar(spark, tp, binary=True).collect()
    got = {r.member: bytes(r.content) for r in rows}
    assert got == members


# --- email sink (TODO:28-29) ------------------------------------------

from dbitool_spark.io import chart_io, email_io


def test_email_compose_write_parse_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a,b", 'quo"te', 3), ("line\nbreak", "naïve", -1)],
        "x string, y string, n int",
    )
    msg = email_io.compose_email(
        sender="eng@localhost",
        to=["a@localhost", "b@localhost"],
        subject="summary: naïve ✓",
        body=email_io.summary_body(
            stats={"rows": 2, "longer_module_name": 7},
            log_lines=["[csvread] 2 rows"],
        ),
        attachments=[("result.csv", email_io.df_to_csv_text(df))],
    )
    path = str(tmp_path / "out.eml")
    email_io.write_eml(msg, path)
    back = email_io.parse_eml(path)
    assert back["Subject"] == "summary: naïve ✓"
    assert back["To"] == "a@localhost, b@localhost"
    body = back.get_body(("plain",)).get_content()
    assert "longer_module_name  7" in body and "[csvread] 2 rows" in body
    rows = email_io.attachment_rows(back, "result.csv")
    # hostile values (commas, quotes, newlines, unicode) survive MIME
    assert rows == [
        {"x": "a,b", "y": 'quo"te', "n": "3"},
        {"x": "line\nbreak", "y": "naïve", "n": "-1"},
    ]


def test_email_attachment_is_bounded_edge(spark):
    df = spark.range(50).selectExpr("CAST(id AS STRING) AS v")
    with pytest.raises(MemoryError, match="bounded edge"):
        email_io.df_to_csv_text(df, max_rows=10)


class _FakeSmtpServer(threading.Thread):
    """Minimal RFC-5321 responder: accepts one message, records the
    DATA payload, so smtplib delivery is proven without any external
    service."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.payload = b""

    def run(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 fake ESMTP\r\n")
        in_data = False
        data = []
        while True:
            line = f.readline()
            if not line:
                break
            if in_data:
                if line.rstrip(b"\r\n") == b".":
                    in_data = False
                    self.payload = b"".join(data)
                    conn.sendall(b"250 OK queued\r\n")
                else:
                    data.append(line)
                continue
            verb = line.split(b" ")[0].split(b":")[0].strip().upper()
            if verb in (b"EHLO", b"HELO"):
                conn.sendall(b"250 fake\r\n")
            elif verb == b"DATA":
                in_data = True
                conn.sendall(b"354 go\r\n")
            elif verb == b"QUIT":
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()
        self.sock.close()


def test_email_smtp_send_loopback():
    srv = _FakeSmtpServer()
    srv.start()
    msg = email_io.compose_email(
        sender="eng@localhost",
        to="ops@localhost",
        subject="delivered",
        body="hello over the wire",
    )
    email_io.send_smtp(msg, host="127.0.0.1", port=srv.port, timeout=5)
    srv.join(timeout=5)
    assert b"hello over the wire" in srv.payload
    assert b"Subject: delivered" in srv.payload


def test_emailwrite_pipeline_module(spark, tmp_path):
    from dbitool_spark.obs import EngineLog
    from dbitool_spark.pipeline import Pipeline

    path = str(tmp_path / "p.eml")
    p = Pipeline(spark, log=EngineLog(level=2))
    p.add_source_df("s", spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    p.add("emailwrite", **{"in": "s", "out": path, "count": 1, "subject": "run done"})
    p.run()
    back = email_io.parse_eml(path)
    assert back["Subject"] == "run done"
    rows = email_io.attachment_rows(back, "result.csv")
    assert [r["v"] for r in rows] == ["a", "b"]
    assert "rows  2" in back.get_body(("plain",)).get_content()


# --- chart sink (TODO:77-78) ------------------------------------------


def test_bar_chart_geometry_and_roundtrip():
    rows = [("alpha", 10), ("be<ta>&", 40.0), ('ga"mma', 25.5)]
    svg = chart_io.bar_chart_svg(rows, title="t&t")
    bars = chart_io.parse_svg_bars(svg)
    assert [(k, v) for k, v, _ in bars] == [(k, float(v)) for k, v in rows]
    # geometry contract: height = value/max * plot_h, 2dp
    plot_h = 400 - 80
    for (_, v, h) in bars:
        assert abs(h - round(v / 40.0 * plot_h, 2)) < 0.011
    # hostile labels are escaped, document stays well-formed XML
    import xml.etree.ElementTree as ET

    ET.fromstring(svg)


def test_bar_chart_zero_and_empty():
    svg = chart_io.bar_chart_svg([("a", 0), ("b", 0)])
    assert all(h == 0.0 for _, _, h in chart_io.parse_svg_bars(svg))
    with pytest.raises(ValueError):
        chart_io.bar_chart_svg([])


def test_line_chart_svg_scaling():
    svg = chart_io.line_chart_svg([(0, 0), (10, 5), (5, 10)])
    assert "polyline" in svg
    # degenerate single point pins to plot center
    svg1 = chart_io.line_chart_svg([(3, 7)])
    assert "320.00,200.00" in svg1


def test_gnuplot_script_roundtrip():
    rows = [('quo"ted', 3.25), ("plain", 7)]
    gp = chart_io.gnuplot_script(rows, title="T")
    got = chart_io.parse_gnuplot_datablock(gp)
    assert got == [('quo"ted', 3.25), ("plain", 7.0)]
    assert "plot $data using 2:xticlabels(1) with boxes" in gp


def test_dot_graph_escaping():
    dot = chart_io.dot_graph([('a"x', "b\\y", 2)], name="g")
    assert '"a\\"x" -> "b\\\\y" [label="2"];' in dot


def test_chartwrite_pipeline_module(spark, tmp_path):
    from dbitool_spark.pipeline import Pipeline

    out = str(tmp_path / "c.svg")
    p = Pipeline(spark)
    p.add_source_df(
        "agg", spark.createDataFrame([("x", 4), ("y", 9)], "label string, n int")
    )
    p.add("chartwrite", **{"in": "agg", "x": "label", "y": "n", "out": out})
    p.run()
    with open(out, encoding="utf-8") as fh:
        bars = chart_io.parse_svg_bars(fh.read())
    assert [(k, v) for k, v, _ in bars] == [("x", 4.0), ("y", 9.0)]

    dout = str(tmp_path / "g.dot")
    p2 = Pipeline(spark)
    p2.add_source_df(
        "e", spark.createDataFrame([("u", "v", 1.5)], "src string, dst string, w double")
    )
    p2.add(
        "chartwrite",
        **{"in": "e", "x": "src", "y": "dst", "weight": "w",
           "format": "dot", "out": dout},
    )
    p2.run()
    with open(dout, encoding="utf-8") as fh:
        assert '"u" -> "v" [label="1.5"];' in fh.read()


def test_chartwrite_line_rejects_non_numeric_x(spark, tmp_path):
    """type=line needs a numeric x scale; a string label must fail
    with the module's descriptive error naming the column and value,
    not a bare float() ValueError."""
    from dbitool_spark.pipeline import Pipeline

    p = Pipeline(spark)
    p.add_source_df(
        "agg", spark.createDataFrame([("east", 4), ("west", 9)], "label string, n int")
    )
    p.add(
        "chartwrite",
        **{"in": "agg", "x": "label", "y": "n", "type": "line",
           "out": str(tmp_path / "l.svg")},
    )
    with pytest.raises(ValueError, match="chartwrite.*numeric x.*'label'"):
        p.run()


def test_atomic_write_never_exposes_partial(tmp_path):
    """_atomic.write_text/bytes: readers see the old document or the
    complete new one, never a partial; failed writes leave the target
    untouched and no tmp litter."""
    import threading

    from dbitool_spark.io import _atomic

    target = str(tmp_path / "doc.json")
    _atomic.write_text(target, "old")

    # concurrent same-process writers to the same path: per-call-unique
    # O_EXCL tmp names mean no thread can open, truncate, or delete
    # another's in-flight file. Docs have DIFFERENT lengths (a partial
    # overwrite cannot masquerade as a complete one) and writer
    # exceptions are collected, not swallowed by threading's excepthook.
    docs = [f"writer-{i}," * (50 + 7 * i) for i in range(8)]
    errors: list[BaseException] = []

    def w(d):
        try:
            _atomic.write_text(target, d)
        except BaseException as e:  # noqa: BLE001 — test must see it
            errors.append(e)

    threads = [threading.Thread(target=w, args=(d,)) for d in docs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    with open(target, encoding="utf-8") as fh:
        assert fh.read() in docs

    # a writer that raises mid-write leaves the target intact
    _atomic.write_text(target, "stable")
    import pytest as _pytest
    with _pytest.raises(TypeError):
        _atomic.write_text(target, object())  # not str: write() raises
    with open(target, encoding="utf-8") as fh:
        assert fh.read() == "stable"
    assert not [p for p in tmp_path.iterdir() if p.name.endswith(".tmp")]

    # bytes variant round-trips binary exactly
    blob = bytes(range(256))
    bt = str(tmp_path / "blob.bin")
    _atomic.write_bytes(bt, blob)
    with open(bt, "rb") as fh:
        assert fh.read() == blob


def test_orc_module_roundtrip(spark, tmp_path):
    """orcread/orcwrite (r12): Spark's second native columnar format
    as first-class pipeline modules — typed rows round-trip exactly,
    withfile provenance works on the scan, and the pair composes in
    a CLI spec like any other sink/source."""
    from dbitool_spark.pipeline import MODULES, Pipeline

    p = Pipeline(spark)
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "k bigint, s string, v double"
    )
    path = str(tmp_path / "t.orc")
    MODULES["orcwrite"](p, [df], {"out": path})
    back = MODULES["orcread"](p, [], {"in": path})
    assert {(r.k, r.s, r.v) for r in back.collect()} == {
        (1, "a", 1.5), (2, "b", -2.25),
    }
    withf = MODULES["orcread"](p, [], {"in": path, "withfile": 1})
    assert withf.columns[0] == "file"
    assert all(r.file for r in withf.collect())

    # CLI composition: orc -> csv in one pipeline spec
    out_csv = str(tmp_path / "o.csv")
    Pipeline(spark).add(f"orcread:in={path}").add(
        f"csvwrite:out={out_csv}:header=0"
    ).run()
    import glob

    text = "".join(open(f).read() for f in glob.glob(out_csv + "/part-*"))
    assert "1,a,1.5" in text and "2,b,-2.25" in text


def test_avro_env_blocked_recipe_pinned(spark, tmp_path):
    """Avro is Spark's EXTERNAL built-in module (no jar in this
    container): the failure mode is pinned here with the --packages
    recipe, the cassandra-connector precedent. If the environment
    ever gains org.apache.spark:spark-avro_2.13, this test documents
    exactly what to flip."""
    import pytest
    from pyspark.errors import AnalysisException

    df = spark.range(3)
    with pytest.raises(AnalysisException, match="avro"):
        df.write.format("avro").save(str(tmp_path / "a.avro"))
    # recipe: spark-submit --packages org.apache.spark:spark-avro_2.13:<spark version>
