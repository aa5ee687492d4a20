"""Pipeline builder semantics: CLI-style specs, implicit stream
wiring, fan-out, @file shortcuts (reference parse/setup
scripts/dbitool.pl:66-155, :671-680, :454-459)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from dbitool_spark import testrow
from dbitool_spark.io import read_csv, read_ndjson
from dbitool_spark.pipeline import Pipeline


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbitool_pipe_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def csv_path(spark, tmpdir):
    from dbitool_spark.io import write_csv

    path = os.path.join(tmpdir, "in.csv")
    # single file: raw-line copies (@shortcut test) must see exactly
    # one header line, not one per part file
    write_csv(testrow.dataframe(spark, 50), path, single_file=True)
    return path


def test_cli_spec_chain(spark, tmpdir, csv_path):
    out = os.path.join(tmpdir, "out.ndjson")
    p = Pipeline(spark)
    p.add(f"csvread:in={csv_path}")
    p.add("column:clist=row,hex,string")
    p.add(f"ndjsonwrite:out={out}")
    p.run()
    back = read_ndjson(spark, out)
    assert sorted(back.columns) == ["hex", "row", "string"]
    assert back.count() == 50


def test_named_streams_and_fanout(spark, tmpdir, csv_path):
    """One source stream feeding two sinks — the reference's multicast
    (each reader gets the full row set)."""
    out_a = os.path.join(tmpdir, "a.csv")
    out_b = os.path.join(tmpdir, "b.ndjson")
    p = Pipeline(spark)
    p.add(f"csvread:in={csv_path}:out=rows")
    p.add("column", **{"in": "rows", "clist": "row,string", "out": "slim"})
    p.add(f"csvwrite:in=slim:out={out_a}")
    p.add(f"ndjsonwrite:in=rows:out={out_b}")
    p.run()
    assert read_csv(spark, out_a).count() == 50
    assert read_ndjson(spark, out_b).count() == 50


def test_stream_access_is_lazy_no_sink_side_effects(spark, tmpdir, csv_path):
    out = os.path.join(tmpdir, "never.csv")
    p = Pipeline(spark)
    p.add(f"csvread:in={csv_path}:out=rows")
    p.add(f"csvwrite:in=rows:out={out}")
    df = p.stream("rows")
    assert df.count() == 50
    assert not os.path.exists(out), "stream() must not fire sink writes"


def test_file_shortcut(spark, tmpdir, csv_path):
    """@filename expands to fileread/filewrite by position
    (reference scripts/dbitool.pl:93-103)."""
    out = os.path.join(tmpdir, "copy.txt")
    p = Pipeline(spark)
    p.add(f"@{csv_path}")
    p.add(f"filewrite:out={out}:single_file=1")
    p.run()
    assert read_csv(spark, out).count() == 50  # byte-preserved lines


def test_union_module(spark, tmpdir, csv_path):
    p = Pipeline(spark)
    p.add(f"csvread:in={csv_path}:out=a")
    p.add(f"csvread:in={csv_path}:out=b")
    p.add("union", **{"in": "a,b", "out": "both"})
    assert p.stream("both").count() == 100


def test_unknown_module_and_stream_errors(spark):
    p = Pipeline(spark)
    with pytest.raises(ValueError, match="unknown module"):
        p.add("nosuchmod:in=x")
    p2 = Pipeline(spark)
    with pytest.raises(ValueError, match="no input stream"):
        p2.add("column:clist=a")


def test_pipeline_observability(spark, tmpdir, csv_path):
    """Module tree + per-sink row counts land in the engine log
    (reference printtree + per-module stats)."""
    from dbitool_spark.obs import EngineLog

    log = EngineLog(level=2)
    out = os.path.join(tmpdir, "obs.ndjson")
    p = Pipeline(spark, log=log)
    p.add(f"csvread:in={csv_path}:out=rows")
    p.add("column:clist=row,string", **{"in": "rows", "out": "slim"})
    p.add(f"ndjsonwrite:in=slim:out={out}")
    p.run()
    msgs = [r[2] for r in log.rows]
    assert any(m.startswith("csvread in=-") for m in msgs)
    assert any(m.startswith("column in=rows out=slim") for m in msgs)
    assert any("ndjsonwrite@slim rows=50" in m for m in msgs)
    # the log itself is a queryable DataFrame
    assert log.log_df(spark).count() == len(log.rows)
