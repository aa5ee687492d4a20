"""Pipeline builder + module registry: spec -> wired DataFrame DAG.

The reference's identity is its CLI pipeline language
(`dbitool mod:arg=val:... mod2:...`): modules are wired by named
streams, a missing `in` defaults to the previous module's `out`, a
missing `out` gets a generated name, and one stream may fan out to
many readers (reference parse/setup scripts/dbitool.pl:66-155,
:671-680; fan-out :454-459; `@file` shortcut :93-103).

This module reproduces that WHAT on Spark's execution model:

- a **module** is a registered builder function
  `(ctx, inputs, args) -> DataFrame | None` (None for sinks);
- a **stream** is a named edge in a lazy DataFrame DAG -- no buffers,
  no scheduler: Catalyst/AQE own execution (SURVEY.md 3.1);
- **fan-out** = one DataFrame consumed by N downstream modules; the
  builder counts readers during wiring and `.persist()`s any stream
  with >1 so the upstream computes once (the reference copies rows
  into per-reader buffers; persist is the Spark-native equivalent);
- **schema negotiation** is Catalyst analysis -- free;
- sinks execute at `run()` (actions), sources/transform are lazy.

Spec forms accepted: CLI-style strings ("csvread:in=/f.csv:sep=,"),
dicts ({"module": "csvread", "in": "/f.csv", "sep": ","}), and the
`@filename` shortcut that instantiates fileread/filewrite by
position, mirroring the reference.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbitool_spark.io import (
    archive_io,
    bson_io,
    csv_io,
    db,
    fixedwidth,
    json_io,
    net_io,
    spreadsheet_io,
    text_io,
    xml_io,
)
from dbitool_spark.ops.column import project

ModuleFn = Callable[["Pipeline", list[DataFrame], dict[str, Any]], DataFrame | None]

MODULES: dict[str, ModuleFn] = {}


def register_module(name: str) -> Callable[[ModuleFn], ModuleFn]:
    def deco(fn: ModuleFn) -> ModuleFn:
        MODULES[name] = fn
        return fn

    return deco


def _is_floatable(v: object) -> bool:
    try:
        float(v)  # type: ignore[arg-type]
        return True
    except (TypeError, ValueError):
        return False


def _flag(args: dict, key: str, default: bool = True) -> bool:
    v = args.get(key, default)
    return v in (True, 1, "1", "true")


_SHORTCUT_RE = re.compile(r"^(?:[A-Za-z_]\w*)?@")


def _is_shortcut(value: str) -> bool:
    """True when an in=/out= value is an @shortcut: a leading '@'
    (reference regex ^\\@, scripts/dbitool.pl:93) or the named form
    `name@path` where name is an identifier (the same grammar
    _parse_cli requires positionally). A path whose text before '@'
    is NOT an identifier (/tmp/b@2x.ndjson, ./data@v2.csv) is a
    literal path and must pass through verbatim; an empty path after
    the '@' still reaches the malformed-shortcut error downstream."""
    return bool(_SHORTCUT_RE.match(value))


def _with_file(df: DataFrame, a: dict) -> DataFrame:
    """withfile=1 provenance on the file-scan sources (TODO:53-56's
    stream-per-file, as a column): prepend input_file_name() so
    downstream grouping recovers per-file streams.

    Must run directly over the SCAN (before any checkpoint boundary —
    input_file_name() is empty once the file-scan task context is
    gone, which is why the quarantine split happens after this)."""
    if _flag(a, "withfile", False):
        if "file" in df.columns:
            raise ValueError(
                "withfile=1 would shadow an existing 'file' column; "
                "rename it upstream or drop the flag"
            )
        return df.select(F.input_file_name().alias("file"), "*")
    return df


def _widths(args: dict) -> list[int]:
    w = args.get("width", "")
    if isinstance(w, (list, tuple)):
        return [int(x) for x in w]
    if not w:
        raise ValueError("width not specified")
    return [int(x) for x in str(w).split(",")]


# --- sources (file path in `in`, like the reference's fileread in=FILENAME) ---


@register_module("fileread")
def _fileread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    # multi=1 opts into comma-splitting `in` into a path list; it is
    # NOT the default because globs use braces ('{2023,2024}/*.log')
    # and filenames may contain literal commas
    path = a["in"]
    if _flag(a, "multi", False) and isinstance(path, str):
        path = [s.strip() for s in path.split(",") if s.strip()]
    return text_io.read_text(
        p.spark,
        path,
        wholetext=_flag(a, "wholetext", False),
        with_file=_flag(a, "withfile", False),
    )


@register_module("csvread")
def _csvread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    if ins:
        if _flag(a, "quarantine", False):
            raise ValueError(
                "quarantine=1 is only supported on the file-read path; "
                "the raw-stream parse branch has no PERMISSIVE corrupt "
                "capture (split the stream with obs.split_quarantine "
                "after an explicit from_csv instead)"
            )
        if _flag(a, "withfile", False):
            raise ValueError(
                "withfile=1 is only supported on the file-read path; "
                "a raw upstream stream has no file-scan provenance "
                "(put withfile on the upstream fileread instead)"
            )
        # raw->row boundary: parse an upstream raw line stream
        # (reference `stdin csvread`, scripts/dbitool.pl:3273-3276)
        return csv_io.parse_csv_lines(
            ins[0],
            sep=a.get("sep", ","),
            quote=a.get("quote", '"'),
            escape=a.get("escape", "\\"),
            header=_flag(a, "header"),
            schema=a.get("schema"),
        )
    df = csv_io.read_csv(
        p.spark,
        a["in"],
        sep=a.get("sep", ","),
        quote=a.get("quote", '"'),
        escape=a.get("escape", "\\"),
        header=_flag(a, "header"),
        schema=p._quarantine_schema(a),
        infer=_flag(a, "infer", False),
        permissive_corrupt_col="_corrupt_record" if _flag(a, "quarantine", False) else None,
    )
    return p._apply_quarantine(_with_file(df, a), a, "csvread")


@register_module("ndjsonread")
def _ndjsonread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    if ins:
        if _flag(a, "quarantine", False):
            raise ValueError(
                "quarantine=1 is only supported on the file-read path; "
                "the raw-stream parse branch has no PERMISSIVE corrupt "
                "capture (split the stream with obs.split_quarantine "
                "after an explicit from_json instead)"
            )
        if _flag(a, "withfile", False):
            raise ValueError(
                "withfile=1 is only supported on the file-read path; "
                "a raw upstream stream has no file-scan provenance "
                "(put withfile on the upstream fileread instead)"
            )
        return json_io.parse_ndjson_lines(ins[0], schema=a.get("schema"))
    df = json_io.read_ndjson(
        p.spark,
        a["in"],
        schema=p._quarantine_schema(a),
        permissive_corrupt_col="_corrupt_record" if _flag(a, "quarantine", False) else None,
    )
    return p._apply_quarantine(_with_file(df, a), a, "ndjsonread")


@register_module("jsonread")
def _jsonread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return json_io.read_json(
        p.spark,
        a["in"],
        schema=a.get("schema"),
        memory_limit=int(a.get("memory_limit", p.memorylimit)),
    )


@register_module("fixedwidthread")
def _fixedwidthread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return fixedwidth.read_fixedwidth(
        p.spark, a["in"], _widths(a), header=_flag(a, "header"), trim=_flag(a, "trim")
    )


@register_module("parquetread")
def _parquetread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return _with_file(p.spark.read.parquet(a["in"]), a)


@register_module("orcread")
def _orcread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    # ORC is Spark-native (the second columnar format next to
    # parquet): same pushdown/pruning behavior, no extra jars. Avro
    # by contrast is the external spark-avro module — env-gated like
    # the cassandra connector (recipe pinned in tests/test_pipeline).
    return _with_file(p.spark.read.orc(a["in"]), a)


@register_module("xmlread")
def _xmlread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return xml_io.read_xml(
        p.spark, a["in"], row_tag=a.get("row", "row"), schema=a.get("schema")
    )


@register_module("bsonread")
def _bsonread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return bson_io.read_bson(
        p.spark,
        a["in"],
        schema=a.get("schema"),
        memory_limit=int(a.get("memory_limit", p.memorylimit)),
    )


@register_module("sqliteselect")
def _sqliteselect(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    query = a.get("query")
    if ins and query is None and a.get("table") is None:
        # reference entry point 3 (scripts/dbitool.pl:1442-1457): the
        # SQL text arrives on the input stream
        query = db.query_from_stream(ins[0])
    return db.read_sqlite(
        p.spark,
        a["fname"],
        query=query,
        table=a.get("table"),
        partition_column=a.get("partition_column"),
    )


@register_module("spreadsheetread")
def _spreadsheetread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Reference spreadsheetread (scripts/dbitool.pl:2696-2784): sheet
    selector + (x, y) top-left offset + optional header row."""
    sheet = a.get("sheet", 0)
    return spreadsheet_io.read_spreadsheet(
        p.spark,
        a["in"],
        sheet=int(sheet) if str(sheet).isdigit() else sheet,
        header=_flag(a, "header"),
        x=int(a.get("x", 0)),
        y=int(a.get("y", 0)),
        memory_limit=int(a.get("memory_limit", p.memorylimit)),
    )


_JDBC_PASSTHROUGH_EXCLUDE = {"url", "query", "table", "in", "out", "mode"}
_FLAVOR_EXCLUDE = _JDBC_PASSTHROUGH_EXCLUDE | {"host", "port", "db", "user", "pw"}


def _flavored_jdbc_url(a: dict, flavor: str) -> str:
    """URL assembly shared by the mysql/mssql select AND insert
    modules (one place for the host/port/db contract)."""
    if "db" not in a:
        raise ValueError("database (db) not specified")
    host = a.get("host", "localhost")
    if flavor == "mysql":
        return f"jdbc:mysql://{host}:{int(a.get('port', 3306))}/{a['db']}"
    # SQL Server: semicolon properties, not a path component
    return (
        f"jdbc:sqlserver://{host}:{int(a.get('port', 1433))};"
        f"databaseName={a['db']}"
    )


def _flavor_opts(a: dict) -> dict:
    opts = {k: v for k, v in a.items() if k not in _FLAVOR_EXCLUDE}
    if "user" in a:
        opts["user"] = a["user"]
    if "pw" in a:
        opts["password"] = a["pw"]
    return opts


@register_module("jdbcselect")
def _jdbcselect(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Generic JDBC pushdown source (reference dbitoolmoddbdread,
    scripts/dbitool.pl:1318-1385): query XOR table XOR query-from-
    stream; extra args pass through as JDBC options (partitionColumn,
    numPartitions, fetchsize, ...)."""
    query = a.get("query")
    if ins and query is None and a.get("table") is None:
        query = db.query_from_stream(ins[0])
    opts = {k: v for k, v in a.items() if k not in _JDBC_PASSTHROUGH_EXCLUDE}
    return db.read_jdbc(p.spark, a["url"], query=query, table=a.get("table"), **opts)


@register_module("cassandraselect")
def _cassandraselect(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Reference cassandraselect (scripts/dbitool.pl:1461-1532): the
    host/keyspace/consistency/query/table argument surface, validated
    here; io.db.read_cassandra issues the real connector-format load,
    which fails naturally (with the --packages recipe) when the
    spark-cassandra-connector jar is absent, as in this environment."""
    if "keyspace" not in a:
        raise ValueError("keyspace not specified")
    if ins and a.get("query") is None and a.get("table") is None:
        # the other db selects consume query-from-stream here; the
        # Cassandra DataFrame connector reads TABLES only, so the mode
        # is impossible — say so instead of accepting the stream in
        # validation and then failing with a misleading "table not
        # specified" (review finding: the stream's SQL was silently
        # ignored)
        raise ValueError(
            "cassandraselect cannot take its CQL from an input stream: "
            "the DataFrame connector reads tables, not raw CQL — pass "
            "table= and express predicates as filters (they push down "
            "to CQL token-range scans)"
        )
    if a.get("query") is None and a.get("table") is None:
        raise ValueError("query nor table specified")
    return db.read_cassandra(
        p.spark,
        host=a.get("host", "localhost"),
        keyspace=a["keyspace"],
        table=a.get("table"),
        query=a.get("query"),
        consistency=a.get("consistency", "ONE"),
    )


@register_module("mysqlselect")
def _mysqlselect(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Reference mysqlselect (scripts/dbitool.pl:1387-1459): the same
    host/port/db/user/pw argument surface, mapped onto a jdbc:mysql://
    URL (needs the MySQL Connector/J jar on the classpath). The shared
    JDBC execution path underneath — write, ranged partitioned read,
    query form, query-from-stream, engine-side pushdown — is EXECUTED
    against embedded Derby (in every Spark distribution) by the
    jdbc_roundtrip_part driver entry and tests/test_connectors.py;
    only the MySQL URL itself is env-gated."""
    query = a.get("query")
    if ins and query is None and a.get("table") is None:
        query = db.query_from_stream(ins[0])
    if query is None and a.get("table") is None:
        raise ValueError("query nor table nor input stream specified")
    return db.read_jdbc(
        p.spark, _flavored_jdbc_url(a, "mysql"),
        query=query, table=a.get("table"), **_flavor_opts(a),
    )


@register_module("ndb")
def _ndb(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame | None:
    """Reference dbitoolmod_ndb (scripts/dbitool.pl:2561-2694), all
    three wiring modes: with an input stream the batch upserts into
    the keyed table (last-write-wins per key) and — when an output
    stream is wired — rows pass through unchanged (:2676-2684); with
    no input stream the table replays as a source (:2642-2665). The
    upsert is a write action, so it only fires on run(), not on
    stream() wiring."""
    from dbitool_spark.ndb import NdbTable

    table = NdbTable(
        p.spark, a["fname"], a["key"], n_buckets=int(a.get("n_buckets", 32))
    )
    if ins:
        if p._with_sinks:
            table.upsert(ins[0], order_by=a.get("order_by"))
        return ins[0]
    return table.replay()


# --- transforms ---


@register_module("column")
def _column(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return project(ins[0], a["clist"])


@register_module("filter")
def _filter(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return ins[0].filter(a["expr"])


@register_module("union")
def _union(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Stream concat (reference TODO:74-75 intended scope)."""
    out = ins[0]
    for other in ins[1:]:
        out = out.unionByName(other, allowMissingColumns=_flag(a, "allow_missing", False))
    return out


def _key_list(a: dict) -> list[str]:
    key = a["key"]
    return [k.strip() for k in key.split(",")] if isinstance(key, str) else list(key)


@register_module("join")
def _join(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Two-stream join module (reference TODO:67-72: "join modules
    that join two streams … hash in memory / external queries / tree
    structure"). All three of the TODO's index structures collapse
    into ONE declarative operator here: Catalyst picks broadcast-hash
    (the in-memory hash), sort-merge (the tree/sorted index), or
    shuffled-hash from size estimates and AQE runtime stats — choosing
    the physical strategy by hand is exactly what a Spark-first design
    must NOT do. how= passes any Spark join type (inner/left/right/
    full/semi/anti)."""
    if len(ins) < 2:
        raise ValueError("join needs two input streams")
    return ins[0].join(ins[1], _key_list(a), a.get("how", "inner"))


@register_module("lookup")
def _lookup(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Lookup/enrichment module (reference TODO:61-65: "lookup modules
    that use a second stream to lookup values from the main one - hash
    in memory"). The reference's in-memory hash IS a broadcast hash
    join — the lookup side is small by contract (it must fit in one
    process's memory in the reference design), so the explicit
    broadcast hint reproduces that contract distributed: every
    executor gets the hash table, the main stream never shuffles.
    broadcast=0 drops the hint for lookup tables that outgrew the
    contract (Catalyst then sizes the strategy itself). select= prunes
    the lookup side to key + named columns; rows with no match keep
    NULLs (left join), matching lookup-enrichment semantics rather
    than filtering inner-join semantics."""
    from pyspark.sql import functions as F

    if len(ins) < 2:
        raise ValueError("lookup needs two input streams (main, lookup)")
    keys = _key_list(a)
    right = ins[1]
    sel = a.get("select")
    if sel:
        cols = [c.strip() for c in sel.split(",")] if isinstance(sel, str) else list(sel)
        # keys are always carried; naming one in select= must not
        # duplicate it (a duplicate column breaks the join resolution)
        cols = [c for c in cols if c not in keys]
        right = right.select(*keys, *cols)
    if _flag(a, "broadcast", True):
        right = F.broadcast(right)
    return ins[0].join(right, keys, "left")


@register_module("concat")
def _concat(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Positional column concat (reference TODO:74-76: "a concat
    module to concatenate columns from different streams ... a join
    without any expression") — the row-wise zip of two or more
    streams, paste(1) for tables.

    A distributed DataFrame has no stable row order, so the keyless
    zip the TODO sketches is made deterministic by REQUIRING a total
    order per input: `order=` (comma list of columns, applied to every
    input) or `order1=`/`order2=`/... per input, unique-key contract
    per ops.scale.with_position. Each side gets a scalable global
    position (range partition + per-partition row_number + cumulative
    offsets — no single-partition sort), and the sides equi-join on
    it: shuffle on a dense synthetic key, skew-free by construction.
    how=inner (default) truncates to the shortest stream; how=full
    NULL-pads to the longest. Duplicate column names take an _<input
    index> suffix; the output keeps `pos` so the zip is auditable."""
    if len(ins) < 2:
        raise ValueError("concat needs at least two input streams")
    from dbitool_spark.ops import scale as _scale

    how = a.get("how", "inner")
    if how not in ("inner", "full"):
        raise ValueError(f"concat how= must be inner|full, got {how!r}")
    sides = []
    seen: set[str] = set()
    for i, df in enumerate(ins):
        spec = a.get(f"order{i + 1}", a.get("order"))
        if not spec:
            raise ValueError(
                f"concat: input {i + 1} needs order{i + 1}= (or a shared "
                "order=) — a distributed stream has no row order to zip by"
            )
        cols = [c.strip() for c in spec.split(",")] if isinstance(spec, str) else list(spec)
        side = _scale.with_position(df, cols)
        own = set(df.columns)
        for c in df.columns:
            if c in seen:
                # collision-checked suffix: start at the input index,
                # keep incrementing past names an earlier input OR
                # THIS input already carries literally (input 1 with
                # 'v_2', or input 2 itself = [id, v, v_2]) — an
                # unchecked f"{c}_{i+1}" would emit two identical
                # columns, and withColumnRenamed on the duplicate
                # later renames BOTH, failing ambiguously downstream
                k = i + 1
                new = f"{c}_{k}"
                while new in seen or new in own:
                    k += 1
                    new = f"{c}_{k}"
                side = side.withColumnRenamed(c, new)
                seen.add(new)
            else:
                seen.add(c)
        sides.append(side)
    out = sides[0]
    for side in sides[1:]:
        out = out.join(side, "pos", "full" if how == "full" else "inner")
    return out.select("pos", *[c for c in out.columns if c != "pos"])


@register_module("gzip")
def _gzip(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Codec module (reference scripts/dbitool.pl:1176-1242). In Spark,
    compression is a property of the file sink, not a stream transform,
    so this module tags its output stream: the downstream file sink
    picks up `compression=gzip` automatically, making the reference's
    `csvwrite | gzip | @file` chain express verbatim (the builder does
    the tagging in _build; an explicit compression= on the sink still
    wins). Rows pass through unchanged."""
    return ins[0]


@register_module("gunzip")
def _gunzip(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Codec compatibility shim: Spark file sources auto-decompress
    .gz inputs by extension, so decode is free at the source and this
    module is pass-through (reference scripts/dbitool.pl:1244-1316)."""
    return ins[0]


@register_module("stdin")
def _stdin(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    return text_io.read_stdin(
        p.spark, max_lines=int(a.get("max_lines", p.memorylimit))
    )


@register_module("zipread")
def _zipread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Zip archive source (reference TODO:48-49): distributed
    binaryFile scan + per-task member extraction; (archive, member)
    provenance columns are the Spark answer to TODO:53-56's
    stream-per-file fan-out. drop_provenance=1 yields a plain raw
    stream for the raw->row parse boundaries."""
    df = archive_io.read_zip(
        p.spark,
        a["in"],
        member_glob=a.get("member"),
        binary=_flag(a, "binary", False),
        member_limit=int(a.get("member_limit", 256 * 1024 * 1024)),
        encoding=a.get("encoding", "utf-8"),
    )
    if _flag(a, "drop_provenance", False):
        df = df.drop("archive", "member")
    return df


@register_module("tarread")
def _tarread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Tar container source (reference TODO:53-56's "zip, tar, etc.");
    auto-detects gzip/bz2/xz tarballs."""
    df = archive_io.read_tar(
        p.spark,
        a["in"],
        member_glob=a.get("member"),
        binary=_flag(a, "binary", False),
        member_limit=int(a.get("member_limit", 256 * 1024 * 1024)),
        encoding=a.get("encoding", "utf-8"),
    )
    if _flag(a, "drop_provenance", False):
        df = df.drop("archive", "member")
    return df


@register_module("tcpread")
def _tcpread(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Bounded TCP client source (reference TODO:58-59); unbounded
    feeds belong on streaming.stream_socket."""
    return net_io.read_tcp(
        p.spark,
        a.get("host", "localhost"),
        int(a["port"]),
        max_rows=int(a.get("max_rows", p.memorylimit)),
        timeout=float(a.get("timeout", 30.0)),
    )


@register_module("exec")
def _exec(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """External-program filter (reference TODO:31-32): the raw stream
    pipes through `cmd` batch-wise inside each executor task."""
    from dbitool_spark.ops.process import exec_pipe

    ok = a.get("ok_codes", (0,))
    if isinstance(ok, str):
        ok = tuple(int(x) for x in ok.split(","))
    return exec_pipe(
        ins[0], a["cmd"], timeout=float(a.get("timeout", 300.0)), ok_codes=tuple(ok)
    )


@register_module("eval")
def _eval(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Row-expression module — the Spark-first analogue of the
    reference's perl-eval TODO:34: instead of arbitrary interpreted
    code per row (the slow path AND an injection surface), expressions
    are Spark SQL strings compiled by Catalyst into codegen'd column
    ops. expr= takes one expression or a list (each may alias:
    "price * 0.9 AS discounted"); keep=0 drops the input columns."""
    exprs = a["expr"]
    if isinstance(exprs, str):
        exprs = [exprs]
    base = [] if not _flag(a, "keep", True) else ["*"]
    return ins[0].selectExpr(*base, *exprs)


# --- sinks (file path in `out`, like filewrite out=FILENAME) ---


@register_module("filewrite")
def _filewrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    text_io.write_text(
        ins[0],
        a["out"],
        compression=a.get("compression"),
        single_file=_flag(a, "single_file", False),
    )


@register_module("csvwrite")
def _csvwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    csv_io.write_csv(
        ins[0],
        a["out"],
        sep=a.get("sep", ","),
        quote=a.get("quote", '"'),
        escape=a.get("escape", "\\"),
        header=_flag(a, "header"),
        compression=a.get("compression"),
        single_file=_flag(a, "single_file", False),
    )


@register_module("ndjsonwrite")
def _ndjsonwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    json_io.write_ndjson(
        ins[0],
        a["out"],
        compression=a.get("compression"),
        single_file=_flag(a, "single_file", False),
    )


@register_module("jsonwrite")
def _jsonwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    json_io.write_json(
        ins[0],
        a["out"],
        pretty=_flag(a, "pretty", False),
        memory_limit=int(a.get("memory_limit", p.memorylimit)),
    )


@register_module("fixedwidthwrite")
def _fixedwidthwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    fixedwidth.write_fixedwidth(
        ins[0], a["out"], _widths(a), header=_flag(a, "header"),
        compression=a.get("compression"),
        single_file=_flag(a, "single_file", False),
    )


@register_module("parquetwrite")
def _parquetwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    ins[0].write.mode(a.get("mode", "overwrite")).parquet(a["out"])


@register_module("orcwrite")
def _orcwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    ins[0].write.mode(a.get("mode", "overwrite")).orc(a["out"])


@register_module("xmlwrite")
def _xmlwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    xml_io.write_xml(
        ins[0],
        a["out"],
        root_tag=a.get("root", "root"),
        row_tag=a.get("row", "row"),
        single_file=_flag(a, "single_file", False),
    )


@register_module("bsonwrite")
def _bsonwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    bson_io.write_bson(
        ins[0], a["out"], memory_limit=int(a.get("memory_limit", p.memorylimit))
    )


@register_module("sqliteinsert")
def _sqliteinsert(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    db.write_sqlite(
        ins[0], a["fname"], a["table"], mode=a.get("mode", "append")
    )


@register_module("spreadsheetwrite")
def _spreadsheetwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Reference spreadsheetwrite (scripts/dbitool.pl:2786-2870):
    sheet name, optional header, (x, y) top-left offset."""
    spreadsheet_io.write_spreadsheet(
        ins[0],
        a["out"],
        sheet=a.get("sheet", "Sheet1"),
        header=_flag(a, "header"),
        x=int(a.get("x", 0)),
        y=int(a.get("y", 0)),
        memory_limit=int(a.get("memory_limit", p.memorylimit)),
    )


@register_module("jdbcinsert")
def _jdbcinsert(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Generic JDBC batched-insert sink (reference dbitoolmoddbdwrite,
    scripts/dbitool.pl:1601-1694); extra args pass through as JDBC
    options (batchsize, isolationLevel, ...)."""
    opts = {k: v for k, v in a.items() if k not in _JDBC_PASSTHROUGH_EXCLUDE}
    db.write_jdbc(ins[0], a["url"], a["table"], mode=a.get("mode", "append"), **opts)


@register_module("zipwrite")
def _zipwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Single-file zip sink (reference TODO:50-51): bounded driver
    edge, memorylimit-guarded like jsonwrite."""
    archive_io.write_zip(
        ins[0],
        a["out"],
        member=a.get("member", "data.txt"),
        max_rows=int(a.get("max_rows", p.memorylimit)),
    )


@register_module("tcpwrite")
def _tcpwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """TCP client sink (reference TODO:58-59): one connection per
    partition inside the executors; single_conn=1 funnels through one
    driver-side socket."""
    net_io.write_tcp(
        ins[0],
        a.get("host", "localhost"),
        int(a["port"]),
        single_conn=_flag(a, "single_conn", False),
        timeout=float(a.get("timeout", 30.0)),
    )


@register_module("mysqlinsert")
def _mysqlinsert(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Reference TODO:40 (mysqlinsert): the mysqlselect arg surface on
    the shared JDBC write path (executor-parallel batched inserts —
    EXECUTED against embedded Derby by jdbc_roundtrip_part; only the
    MySQL URL itself is env-gated, like mysqlselect)."""
    if "table" not in a:
        raise ValueError("table not specified")
    db.write_jdbc(
        ins[0], _flavored_jdbc_url(a, "mysql"), a["table"],
        mode=a.get("mode", "append"), **_flavor_opts(a),
    )


@register_module("mssqlselect")
def _mssqlselect(p: "Pipeline", ins: list[DataFrame], a: dict) -> DataFrame:
    """Reference TODO:44 (mssqlselect): SQL Server URL assembly over
    the shared JDBC read path (query XOR table, query-from-stream)."""
    query = a.get("query")
    if ins and query is None and a.get("table") is None:
        query = db.query_from_stream(ins[0])
    if query is None and a.get("table") is None:
        raise ValueError("query nor table nor input stream specified")
    return db.read_jdbc(
        p.spark, _flavored_jdbc_url(a, "mssql"),
        query=query, table=a.get("table"), **_flavor_opts(a),
    )


@register_module("mssqlinsert")
def _mssqlinsert(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Reference TODO:44 (mssqlinsert): SQL Server flavor of the
    shared JDBC write path."""
    if "table" not in a:
        raise ValueError("table not specified")
    db.write_jdbc(
        ins[0], _flavored_jdbc_url(a, "mssql"), a["table"],
        mode=a.get("mode", "append"), **_flavor_opts(a),
    )


@register_module("cassandrainsert")
def _cassandrainsert(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Reference TODO:42 (cassandrainsert): connector-format write,
    same env-gate contract as cassandraselect."""
    if "keyspace" not in a:
        raise ValueError("keyspace not specified")
    if "table" not in a:
        raise ValueError("table not specified")
    extra = {
        k: v
        for k, v in a.items()
        if k not in {"keyspace", "table", "host", "port", "consistency",
                     "in", "out", "mode"}
    }
    db.write_cassandra(
        ins[0],
        a["keyspace"],
        a["table"],
        host=a.get("host"),
        port=int(a["port"]) if "port" in a else None,
        consistency=a.get("consistency"),
        mode=a.get("mode", "append"),
        **extra,
    )


@register_module("stdout")
def _stdout(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    text_io.write_stdout(ins[0], max_rows=int(a.get("max_rows", p.memorylimit)))


@register_module("stderr")
def _stderr(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    import sys

    text_io.write_stdout(
        ins[0], stream=sys.stderr, max_rows=int(a.get("max_rows", p.memorylimit))
    )


@register_module("emailwrite")
def _emailwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Email sink (reference TODO:28-29). Composes the process-summary
    message — EngineLog lines plus an optional exact row count — with
    a memorylimit-bounded CSV sample of the input stream attached,
    then writes it as .eml (out=) and/or delivers it over SMTP
    (server=/port=). count=1 opts into the exact-count action (one
    extra pass; the default summary costs zero passes — see
    io/email_io.py scale note)."""
    from dbitool_spark.io import email_io

    # pure dict inspection — fail a misconfigured sink BEFORE the
    # bounded attachment fetch / count() actions run cluster work
    if "out" not in a and "server" not in a:
        raise ValueError("emailwrite needs out= (.eml path) and/or server=")
    attachments = []
    if ins:
        attachments.append((
            a.get("attach", "result.csv"),
            email_io.df_to_csv_text(
                ins[0], max_rows=int(a.get("max_rows", p.memorylimit))
            ),
        ))
    stats: dict[str, int] = {}
    if ins and _flag(a, "count", False):
        stats["rows"] = ins[0].count()
    log_lines = (
        [f"{ts} [{mod}] {msg}" for ts, mod, msg, _lvl in p.log.rows]
        if p.log is not None
        else []
    )
    body = a.get("body") or email_io.summary_body(
        stats=stats or None, log_lines=log_lines or None
    )
    msg = email_io.compose_email(
        sender=a.get("sender", "dbitool@localhost"),
        to=a.get("to", "user@localhost"),
        subject=a.get("subject", "dbitool_spark process summary"),
        body=body,
        attachments=attachments,
    )
    if "out" in a:
        email_io.write_eml(msg, a["out"])
    if "server" in a:
        email_io.send_smtp(
            msg, host=a["server"], port=int(a.get("port", 25))
        )


@register_module("chartwrite")
def _chartwrite(p: "Pipeline", ins: list[DataFrame], a: dict) -> None:
    """Chart sink (reference TODO:77-78): x=/y= name the label and
    value columns; format= picks the backend (svg with type=bar|line,
    gnuplot script, graphviz dot). For format=dot the x=/y= columns
    are the edge endpoints and weight= names the edge-weight column
    (defaults to y=). Bounded driver edge, memorylimit-guarded."""
    from dbitool_spark.io import chart_io

    fmt = a.get("format", "svg")
    kind = a.get("type", "bar")
    if fmt not in ("svg", "gnuplot", "dot"):
        raise ValueError(
            f"chartwrite: unknown format {fmt!r} (svg|gnuplot|dot)"
        )
    if fmt == "svg" and kind not in ("bar", "line"):
        raise ValueError(f"chartwrite: unknown type {kind!r} (bar|line)")
    max_rows = int(a.get("max_rows", p.memorylimit))
    title = a.get("title", "dbitool chart")
    if fmt == "dot":
        rows = chart_io.bounded_rows(
            ins[0], [a["x"], a["y"], a.get("weight", a["y"])],
            max_rows=max_rows,
        )
        text = chart_io.dot_graph(
            [(str(r[0]), str(r[1]), float(r[2])) for r in rows], name=title
        )
    else:
        rows = chart_io.chart_rows(ins[0], a["x"], a["y"], max_rows=max_rows)
        if fmt == "gnuplot":
            text = chart_io.gnuplot_script(rows, title=title)
        elif kind == "line":
            # a line chart's x axis is a numeric scale, not categories;
            # validate up front so a string label fails with the
            # module's descriptive error, not a bare float() ValueError
            try:
                pts = [(float(x), v) for x, v in rows]
            except (TypeError, ValueError) as exc:
                # sentinel default: a stateful/exotic __float__ can fail
                # float() yet pass _is_floatable, and a bare
                # StopIteration must not escape the handler
                bad = next(
                    (
                        x for x, _ in rows
                        if not isinstance(x, (int, float))
                        and not _is_floatable(x)
                    ),
                    None,
                )
                if bad is None:
                    raise ValueError(
                        f"chartwrite: type=line needs a numeric x column, "
                        f"but x={a['x']!r} failed numeric conversion: {exc}"
                    ) from exc
                raise ValueError(
                    f"chartwrite: type=line needs a numeric x column, but "
                    f"x={a['x']!r} has non-numeric value {bad!r} — use "
                    "type=bar for categorical labels"
                ) from None
            text = chart_io.line_chart_svg(pts, title=title)
        else:
            text = chart_io.bar_chart_svg(rows, title=title)
    chart_io.write_chart(text, a["out"])


_SOURCES = {
    "fileread", "csvread", "ndjsonread", "jsonread", "fixedwidthread",
    "parquetread", "orcread", "xmlread", "bsonread", "sqliteselect", "stdin",
    "spreadsheetread", "jdbcselect", "mysqlselect", "cassandraselect",
    "zipread", "tarread", "tcpread", "mssqlselect",
}
_STREAMABLE_SOURCES = {
    "sqliteselect", "jdbcselect", "mysqlselect", "cassandraselect", "mssqlselect",
}
# format readers that can also parse an upstream RAW line stream (the
# reference's raw->row boundary, e.g. `stdin csvread`): their in= is a
# stream when it names one, a path otherwise; missing in= default-wires
# to the previous module's out
_RAW_CONSUMING_SOURCES = {"csvread", "ndjsonread"}
_SINKS = {
    "filewrite", "csvwrite", "ndjsonwrite", "jsonwrite", "fixedwidthwrite",
    "parquetwrite", "orcwrite", "xmlwrite", "bsonwrite", "sqliteinsert",
    "stdout", "stderr",
    "spreadsheetwrite", "jdbcinsert", "zipwrite", "tcpwrite", "mysqlinsert",
    "mssqlinsert", "cassandrainsert", "emailwrite", "chartwrite",
}
# modules that are source OR sink OR passthrough depending on wiring
# (the reference's ndb: in+out = passthrough upsert, in only = sink,
# out only = replay source)
_DUAL_MODULES = {"ndb"}
# sinks whose writers accept a compression= codec option (the targets a
# gzip module upstream can tag)
_COMPRESSIBLE_SINKS = {"filewrite", "csvwrite", "ndjsonwrite", "fixedwidthwrite"}


@dataclass
class _ModuleSpec:
    name: str
    args: dict[str, Any]
    in_streams: list[str] = field(default_factory=list)
    out_stream: str | None = None


class Pipeline:
    """Declarative pipeline: add modules, then run().

    >>> p = Pipeline(spark)
    >>> p.add("csvread:in=/data/x.csv:sep=|:out=raw")
    >>> p.add("column", clist="a,b", out="slim")
    >>> p.add("ndjsonwrite", out_path="/data/x.ndjson")
    >>> p.run()

    Streams: each module's missing `in` is wired to the previous
    module's out stream; a missing `out` gets streamN. `stream(name)`
    exposes any edge as a DataFrame for ad-hoc use.
    """

    def __init__(
        self,
        spark: SparkSession,
        log=None,
        *,
        errorsize: int = 3,
        memorylimit: int = 100_000,
        streamsize: int = 1024,
    ):
        """`log`: optional dbitool_spark.obs.EngineLog. Level >= 1
        records the module tree (reference printtree,
        scripts/dbitool.pl:174-184); level >= 2 adds per-sink row
        counts via plan Observations (reference per-module stats,
        :595-623) — counted inline with the sink action, no extra
        pass.

        Engine tuning knobs (reference scripts/dbitool.pl:38-40),
        used as module-arg defaults — an explicit per-module arg
        always wins:
        - errorsize: tolerate-N-then-abort quarantine threshold;
        - memorylimit: row cap on bounded driver-side edges
          (single-doc JSON/BSON/xlsx, stdout, stdin);
        - streamsize: batch Spark has no per-iteration row cap
          (partitioning subsumes it); kept for the streaming
          pipeline's maxFilesPerTrigger mapping and CLI compat."""
        self.spark = spark
        self.log = log
        self.errorsize = errorsize
        self.memorylimit = memorylimit
        self.streamsize = streamsize
        self._specs: list[_ModuleSpec] = []
        self._streams: dict[str, DataFrame] = {}
        self._injected: dict[str, DataFrame] = {}
        self._shortcuts: dict[str, str] = {}  # named @shortcut -> path
        self._counter = 0
        self._observations: dict[str, object] = {}
        self._with_sinks = False
        self._persisted: list[tuple[str, DataFrame]] = []

    def add_source_df(self, name: str, df: DataFrame) -> "Pipeline":
        """Register an in-memory DataFrame as a named source stream —
        the embedding half of reference TODO:36-38 ("a DBItool class
        where other programs could … instantiate modules and control
        the whole process"): host programs hand Spark frames straight
        into the pipeline language instead of round-tripping through a
        file. The frame stays host-owned: the pipeline neither
        persists it (cache it before injecting if several modules
        read it) nor unpersists it at end-of-run."""
        self._injected[name] = df
        return self

    @staticmethod
    def _quarantine_schema(a: dict) -> str | None:
        """quarantine=1 sources need an explicit schema carrying the
        corrupt column (Spark only materializes _corrupt_record when
        it is in the schema); append it if the user's schema lacks it,
        and fail fast if no schema was given at all."""
        if not _flag(a, "quarantine", False):
            return a.get("schema")
        schema = a.get("schema")
        if schema is None:
            raise ValueError(
                "quarantine=1 requires an explicit schema= (PERMISSIVE "
                "corrupt-record capture needs a declared schema)"
            )
        # exact field-name check, not substring: a user column named
        # e.g. 'my_corrupt_record2' must not suppress the append (it
        # would silently neuter quarantine=1). DDL field names are the
        # first token of each comma-separated "name type" pair.
        fields = {
            part.strip().split()[0].strip("`").lower()
            for part in schema.split(",")
            if part.strip()
        }
        if "_corrupt_record" not in fields:
            schema = schema.rstrip() + ", _corrupt_record string"
        return schema

    def _apply_quarantine(self, df: DataFrame, a: dict, mod: str) -> DataFrame:
        """quarantine=1 sources: split malformed rows into the error
        stream and enforce the pipeline's errorsize threshold
        (reference tolerate-N-then-abort, scripts/dbitool.pl:234-243).
        Gated on the REQUEST, not column presence: a user who declares
        their own _corrupt_record column without quarantine=1 keeps it
        untouched (Spark's default corrupt-column name would otherwise
        make us silently drop rows the user asked to see)."""
        if not _flag(a, "quarantine", False):
            return df
        if "_corrupt_record" not in df.columns:
            # _quarantine_schema should have appended it; a missing
            # column here means the source dropped it — fail loudly
            # rather than let quarantine=1 silently become a no-op.
            raise ValueError(
                f"{mod}: quarantine=1 but the read produced no "
                "_corrupt_record column (source did not honor the schema)"
            )
        from dbitool_spark.obs import check_errorsize, split_quarantine

        errorsize = int(a.get("errorsize", self.errorsize))
        if errorsize < 1:
            # the reference validates 1..256 outright ("invalid
            # errorsize (1 .. 256)", scripts/dbitool.pl:56); 0 would
            # abort a perfectly clean read under the >= threshold
            # (review finding). The upper bound is the reference's
            # in-memory error-buffer size and does not apply here
            # (the quarantine is a DataFrame, not an array).
            raise ValueError(
                f"{mod}: invalid errorsize {errorsize} (must be >= 1; "
                "reference range 1..256, scripts/dbitool.pl:56)"
            )
        good, bad = split_quarantine(df)
        check_errorsize(bad, errorsize=errorsize, log=self.log, mod=mod)
        return good

    # -- spec assembly --------------------------------------------------

    def add(self, spec: str | dict[str, Any], **kwargs: Any) -> "Pipeline":
        if isinstance(spec, str):
            mod = self._parse_cli(spec)
        else:
            spec = dict(spec)
            mod = _ModuleSpec(spec.pop("module"), spec)
        mod.args.update(kwargs)
        if mod.name not in MODULES:
            raise ValueError(f"unknown module {mod.name!r}; known: {sorted(MODULES)}")
        pre, post = self._expand_arg_shortcuts(mod)
        for extra in pre:
            self._wire(extra)
            self._specs.append(extra)
        self._wire(mod)
        self._specs.append(mod)
        for extra in post:
            self._wire(extra)
            self._specs.append(extra)
        return self

    def _expand_arg_shortcuts(self, mod: _ModuleSpec) -> list[_ModuleSpec]:
        """Inline filename shortcuts (reference FILENAME SHORTCUTS,
        scripts/dbitool.pl:3207-3230 and :91-103): `in=@path` expands
        to a fileread feeding this module, `out=@path` to a filewrite
        consuming it. The NAMED form `in=name@path` — the reference's
        own unimplemented TODO:15-22 ("it would be nice to implement a
        named shortcut like name@file ... allow another module to read
        from the same file using the stream name"; "I tried to
        implement this but it's tricky") — additionally binds the
        synthesized stream to `name`, so any later module says
        `in=name` and the builder's reader-counted persist makes the
        file scan run ONCE for all of them. Repeating `name@path` with
        the SAME path is idempotent reuse; a different path is an
        error. file* modules cannot take the shortcut (reference :94
        dies identically).

        OUT-side semantics (returns (pre, post)): on a SINK the @
        simply strips — this engine's sinks write their out= path
        directly (fused, Spark-side), so the reference's POD
        equivalence example `csvread:in=@a.csv ndjsonwrite:out=@b.ndjson`
        (scripts/dbitool.pl:3214-3217) runs verbatim either way, and
        the NAMED form raises (a fused sink has no output stream to
        bind). On a TRANSFORM/source/dual, out=@path synthesizes the
        reference's separate filewrite AFTER the module (review
        finding: the literal '@path' previously became a dead stream
        name — run() succeeded and no file ever appeared); the named
        form out=name@path additionally binds the stream so later
        modules read it by name."""
        pre: list[_ModuleSpec] = []
        post: list[_ModuleSpec] = []
        out = mod.args.get("out")
        if isinstance(out, str) and _is_shortcut(out):
            name, _, path = out.partition("@")
            if mod.name in _SINKS:
                if name:
                    raise ValueError(
                        f"out={out!r}: a named shortcut cannot bind a sink's "
                        "output (sinks write their path directly); name the "
                        "TRANSFORM's out= stream instead"
                    )
                mod.args["out"] = path
            elif mod.name.startswith("file"):
                raise ValueError(
                    "cannot shortcut filename in fileread or filewrite "
                    "modules (reference scripts/dbitool.pl:94)"
                )
            else:
                if not path:
                    raise ValueError(f"malformed @shortcut {out!r}: empty path")
                if not name:
                    self._counter += 1
                    name = f"stream{self._counter}"
                elif name in self._injected or any(
                    m.out_stream == name for m in self._specs
                ):
                    raise ValueError(
                        f"shortcut name {name!r} collides with an existing stream"
                    )
                mod.args["out"] = name
                post.append(_ModuleSpec("filewrite", {"in": name, "out": path}))
        raw = mod.args.get("in")
        if not isinstance(raw, str) or "@" not in raw:
            return pre, post
        new_parts = []
        for part in (s.strip() for s in raw.split(",")):
            if not _is_shortcut(part):
                # a path whose text before '@' is NOT an identifier
                # (in=./data@v2.csv, out=/tmp/b@2x.ndjson) is a literal
                # path — the reference only expands a LEADING '@'
                # (regex ^\@, dbitool.pl:93) and _parse_cli's named
                # form requires an identifier prefix. NOTE a bare
                # relative name like data@v2.csv IS the named-shortcut
                # grammar (stream 'data' reading 'v2.csv'); prefix it
                # with ./ to force the literal-path reading.
                new_parts.append(part)
                continue
            if mod.name.startswith("file"):
                raise ValueError(
                    "cannot shortcut filename in fileread or filewrite "
                    "modules (reference scripts/dbitool.pl:94)"
                )
            if (
                mod.name in _SOURCES
                and mod.name not in _RAW_CONSUMING_SOURCES
                and mod.name not in _STREAMABLE_SOURCES
            ):
                raise ValueError(
                    f"{mod.name} reads its in= path directly; the @shortcut "
                    "only applies to stream-consuming modules"
                )
            name, _, path = part.partition("@")
            if not path:
                raise ValueError(f"malformed @shortcut {part!r}: empty path")
            if (
                name
                and name not in self._shortcuts
                and os.path.exists(part)
            ):
                # ADVICE r10: a bare relative filename like
                # data@v2.csv satisfies the named-shortcut grammar
                # (stream 'data' reading 'v2.csv') AND may name a real
                # file. The shortcut reading wins (documented above),
                # but silently rebinding an existing file to a stream
                # is the footgun — warn with the ./ escape hatch.
                # ADVICE r11: the existence check runs against the
                # PYTHON process cwd, which can differ from the JVM
                # cwd Spark resolves relative reads against, so this
                # is best-effort (stated in the text); idempotent
                # re-registration of an already-bound shortcut is
                # excluded above so the warning fires once per name.
                import warnings

                warnings.warn(
                    f"in={part!r} parses as named shortcut (stream "
                    f"{name!r} reading {path!r}) but a file named "
                    f"{part!r} also exists in the driver process cwd "
                    "(best-effort check: Spark resolves relative reads "
                    "against the JVM cwd, which may differ); prefix it "
                    "with ./ to read that file literally",
                    stacklevel=3,
                )
            if name and name in self._shortcuts:
                if self._shortcuts[name] != path:
                    raise ValueError(
                        f"named shortcut {name!r} already reads "
                        f"{self._shortcuts[name]!r}, not {path!r}"
                    )
                new_parts.append(name)  # idempotent reuse
                continue
            if not name:
                self._counter += 1
                name = f"stream{self._counter}"
            elif name in self._injected or any(
                m.out_stream == name for m in self._specs
            ):
                raise ValueError(
                    f"shortcut name {name!r} collides with an existing stream"
                )
            pre.append(_ModuleSpec("fileread", {"in": path, "out": name}))
            self._shortcuts[name] = path
            new_parts.append(name)
        mod.args["in"] = ",".join(new_parts)
        return pre, post

    def _parse_cli(self, text: str) -> _ModuleSpec:
        """`name:arg=val:arg=val`, `@filename` (fileread/filewrite by
        position, reference :93-103), or the named positional form
        `name@filename` (TODO:15-22): fileread:out=name in source
        position, filewrite:in=name in sink position — the stream
        `name` is then addressable by every later module."""
        if text.startswith("@"):
            name = "fileread" if not self._specs or self._specs[-1].name in _SINKS else "filewrite"
            key = "in" if name == "fileread" else "out"
            return _ModuleSpec(name, {key: text[1:]})
        shortcut = re.match(r"^([A-Za-z_]\w*)@([^:=]+)$", text)
        if shortcut:
            sname, path = shortcut.group(1), shortcut.group(2)
            source_pos = not self._specs or self._specs[-1].name in _SINKS
            if source_pos:
                # same guards as the inline form: a positional
                # declaration must not rebind an existing shortcut nor
                # shadow an existing/injected stream (re-declaring is
                # an error here — positionally there is nothing to
                # idempotently reuse; read the stream by name instead)
                if sname in self._shortcuts:
                    raise ValueError(
                        f"named shortcut {sname!r} already reads "
                        f"{self._shortcuts[sname]!r}; use in={sname} to reuse it"
                    )
                if sname in self._injected or any(
                    m.out_stream == sname for m in self._specs
                ):
                    raise ValueError(
                        f"shortcut name {sname!r} collides with an existing stream"
                    )
                self._shortcuts[sname] = path
                return _ModuleSpec("fileread", {"in": path, "out": sname})
            return _ModuleSpec("filewrite", {"in": sname, "out": path})
        parts = text.split(":")
        args: dict[str, Any] = {}
        last_key: str | None = None
        for i, token in enumerate(parts[1:], start=1):
            k, eq, v = token.partition("=")
            if not eq or not re.match(r"^[A-Za-z_]\w*$", k):
                # values legitimately contain ':' (every JDBC url =
                # jdbc:derby:/path, hdfs:// and s3:// in= paths, URLs
                # with ?user=x params): a token that is not `ident=...`
                # re-joins the previous argument's value — the grammar
                # has no bare flags, so the reading is unambiguous
                # (review finding: such values were inexpressible in
                # the CLI string form)
                if last_key is not None:
                    # the same rule also absorbs a typo'd argument
                    # missing its '=' (csvread:...:heade), which would
                    # otherwise surface later as a confusing
                    # wrong-path failure — warn ONLY when the token is
                    # a TRAILING bare identifier (a scheme hop like
                    # 'derby' in jdbc:derby:/path is always followed
                    # by more tokens; URL/path fragments carry '/',
                    # '?', '.', '=' and stay silent) (review finding)
                    if i == len(parts) - 1 and re.match(
                        r"^[A-Za-z_]\w*$", token
                    ):
                        import warnings

                        warnings.warn(
                            f"token {token!r} in {text!r} looks like an "
                            f"argument name missing its '='; re-joined "
                            f"into {last_key}={args[last_key]!r}:"
                            f"{token!r}",
                            stacklevel=2,
                        )
                    args[last_key] = f"{args[last_key]}:{token}"
                    continue
                raise ValueError(f"malformed argument {token!r} in {text!r}")
            args[k] = v
            last_key = k
        return _ModuleSpec(parts[0], args)

    def _wire(self, mod: _ModuleSpec) -> None:
        """Reference argument convention (scripts/dbitool.pl:671-680):
        sources take in=PATH out=STREAM; sinks take in=STREAM out=PATH;
        transforms take in=STREAM out=STREAM. A missing input stream
        defaults to the previous module's output; a missing output
        stream gets a generated streamN name."""
        args = mod.args
        if mod.name in _DUAL_MODULES:
            # the reference's ndb decides its mode from the streams the
            # user names — INSIDE the grammar where a missing in=
            # defaults to the previous module's out (dbitool.pl:671-680).
            # Only in SOURCE POSITION (chain start, or right after a
            # module that produces no stream) is there nothing to
            # default to: that is the replay-source mode. A mid-chain
            # ndb with no in= previously became a silent replay source
            # and DROPPED the upstream rows (review finding).
            declared_in = args.pop("in", None)
            if declared_in:
                mod.in_streams = [s.strip() for s in str(declared_in).split(",")]
            else:
                source_pos = (
                    not self._specs or self._specs[-1].out_stream is None
                )
                prev_out = next(
                    (m.out_stream for m in reversed(self._specs) if m.out_stream),
                    None,
                )
                mod.in_streams = (
                    [] if source_pos or prev_out is None else [prev_out]
                )
            declared_out = args.pop("out", None)
            if declared_out:
                mod.out_stream = str(declared_out)
            elif not mod.in_streams:
                self._counter += 1
                mod.out_stream = f"stream{self._counter}"
            else:
                mod.out_stream = None
            return
        if mod.name in _SOURCES:
            # sources take no input stream — except db sources, whose
            # path rides in fname= and whose in= may name a stream
            # carrying the SQL text (reference query-from-stream), and
            # raw-consuming format readers, whose in= may name a raw
            # line stream instead of a path
            declared = None
            if mod.name in _STREAMABLE_SOURCES:
                declared = args.pop("in", None)
            elif mod.name in _RAW_CONSUMING_SOURCES:
                # injected streams (add_source_df) are first-class
                # everywhere else — a raw reader must recognize them
                # too, not treat the name as a file path (review
                # finding)
                known = {m.out_stream for m in self._specs if m.out_stream} | set(
                    self._injected
                )
                given = args.get("in")
                if given is not None and str(given) in known:
                    declared = args.pop("in")
                elif given is None:
                    declared = next(
                        (m.out_stream for m in reversed(self._specs) if m.out_stream),
                        None,
                    )
                    if declared is None:
                        raise ValueError(
                            f"module {mod.name} has no input: pass in=PATH or "
                            "wire it after a raw stream"
                        )
            mod.in_streams = [s.strip() for s in str(declared).split(",")] if declared else []
        else:
            declared = args.pop("in", None)
            if declared:
                mod.in_streams = [s.strip() for s in str(declared).split(",")]
            else:
                prev_out = next(
                    (m.out_stream for m in reversed(self._specs) if m.out_stream), None
                )
                if prev_out is None:
                    raise ValueError(f"module {mod.name} has no input stream to wire")
                mod.in_streams = [prev_out]
        if mod.name in _SINKS:
            mod.out_stream = None
        else:
            # for sources `in` is the path and `out` names the stream;
            # for transforms both are streams — either way out= pops
            declared_out = args.pop("out", None)
            if declared_out:
                mod.out_stream = str(declared_out)
            else:
                self._counter += 1
                mod.out_stream = f"stream{self._counter}"

    # -- build & run ----------------------------------------------------

    def _build(self, with_sinks: bool) -> None:
        # count readers per stream to decide persist (fan-out)
        reads: dict[str, int] = {}
        for m in self._specs:
            for s in m.in_streams:
                reads[s] = reads.get(s, 0) + 1
        self._streams = dict(self._injected)
        self._observations = {}
        self._with_sinks = with_sinks
        # release the PREVIOUS build's fan-out caches before re-
        # persisting: stream() calls and failed runs otherwise strand
        # their entries forever (review finding — Spark never drops
        # cached plans on Python GC)
        for _name, _df in getattr(self, "_persisted", []) or []:
            try:
                _df.unpersist()
            except Exception:
                pass
        self._persisted = []
        codecs: dict[str, str] = {}  # stream name -> pending sink compression
        for m in self._specs:
            sink_like = m.name in _SINKS or (
                m.name in _DUAL_MODULES and m.out_stream is None
            )
            if sink_like and not with_sinks:
                continue
            try:
                inputs = [self._streams[s] for s in m.in_streams]
            except KeyError as e:
                raise ValueError(f"module {m.name}: unknown stream {e}") from e
            if self.log is not None:
                self.log.log(
                    "pipeline",
                    f"{m.name} in={','.join(m.in_streams) or '-'} out={m.out_stream or '-'}",
                    1,
                )
            if (
                m.name in _SINKS
                and self.log is not None
                and self.log.level >= 2
                and inputs
            ):
                from dbitool_spark.obs import observed

                # key includes a per-build ordinal: two same-named sinks
                # reading one stream must not overwrite each other's
                # Observation (review finding — one sink's rows= line
                # silently vanished from the level-2 audit)
                obs_key = f"{m.name}@{m.in_streams[0]}"
                if obs_key in self._observations:
                    obs_key = f"{obs_key}#{len(self._observations)}"
                wrapped, obs = observed(inputs[0], obs_key)
                inputs = [wrapped] + inputs[1:]
                self._observations[obs_key] = obs
            args = dict(m.args)
            pending = next(
                (codecs[s] for s in m.in_streams if s in codecs), None
            )
            if pending is not None:
                # a gzip module upstream tagged this edge: the sink does
                # the actual compression (reference csvwrite|gzip|@file)
                if m.name in _COMPRESSIBLE_SINKS:
                    args.setdefault("compression", pending)
                elif m.name in _SINKS:
                    raise ValueError(
                        f"sink {m.name} cannot compress; gzip upstream of it "
                        f"is unsupported (use filewrite/csvwrite/ndjsonwrite/"
                        f"fixedwidthwrite)"
                    )
            out = MODULES[m.name](self, inputs, args)
            if m.name == "gzip" and m.out_stream is not None:
                codecs[m.out_stream] = "gzip"
            elif pending is not None and m.out_stream is not None:
                # pass-through transforms propagate the pending codec
                codecs[m.out_stream] = pending
            if m.out_stream is not None:
                if out is None:
                    raise ValueError(f"module {m.name} produced no output for stream {m.out_stream}")
                if reads.get(m.out_stream, 0) > 1:
                    out = out.persist()
                    self._persisted.append((m.out_stream, out))
                self._streams[m.out_stream] = out

    def stream(self, name: str) -> DataFrame:
        """Wire the DAG (sources + transforms only; sink writes do NOT
        fire) and return one edge as a lazy DataFrame."""
        self._build(with_sinks=False)
        if name not in self._streams:
            raise ValueError(f"unknown stream {name!r}; have {sorted(self._streams)}")
        return self._streams[name]

    def run(self) -> None:
        """Build the DAG and execute every sink write (the actions)."""
        try:
            self._build(with_sinks=True)
            if self.log is not None:
                for name, obs in self._observations.items():
                    try:
                        self.log.log("pipeline", f"{name} rows={obs.get['rows']}", 2)
                    except Exception as e:  # sink ran no action over this input
                        self.log.log(
                            "pipeline", f"{name} rows=unavailable ({e})", 2
                        )
        finally:
            # unpersist exactly the frames THIS build persisted for
            # fan-out, so repeated run() calls don't accumulate storage
            # — in a finally so a sink failure mid-build releases them
            # too (review finding). Injected frames are host-owned
            # (add_source_df) and any cache the host put on them is
            # never touched here.
            for name, df in self._persisted:
                try:
                    df.unpersist()
                except Exception as e:
                    # a failed release is an observability event, not a
                    # crash: the leaked cache should be visible in the
                    # log stream
                    if self.log is not None:
                        self.log.log("pipeline", f"unpersist {name} failed: {e}", 2)
            self._persisted = []
