"""Events analytics + Structured Streaming analogue tests. The
streaming tests assert batch-equivalence: the same windowed plan over
the same rows must produce the batch answer after an availableNow
drain."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbitool_spark import catalog, streaming
from dbitool_spark.io import json_io
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbitool_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sessionization_gap_semantics(spark):
    """Hand-built timeline: gaps over 30min split sessions."""
    from dbitool_spark.plans.events_ops import user_sessions  # noqa: F401 (shape)

    minute = 60 * 1_000_000
    rows = [
        (1, 1, 0 * minute),
        (1, 2, 10 * minute),   # same session (10m gap)
        (1, 3, 50 * minute),   # new session (40m gap)
        (2, 4, 0 * minute),    # user 2: single session
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts_us bigint")
    # reuse the plan body via a temp view + the same logic inline
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = 30 * minute
    marked = df.withColumn(
        "new_session",
        F.when((F.col("ts_us") - F.lag("ts_us").over(w)) > gap, 1).otherwise(
            F.when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0)
        ),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    got = {
        (r.user_id, r.session_id): r.n
        for r in sessions.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_streaming_windowed_counts_match_batch(spark, tmpdir):
    """NDJSON events drained through a windowed streaming plan ==
    the same aggregation computed in batch."""
    ev = catalog.load(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", F.col("ts_ts").alias("ts")
    )
    src = os.path.join(tmpdir, "src")
    json_io.write_ndjson(ev, src)

    schema = "event_id bigint, event_type string, ts timestamp"
    stream = streaming.stream_ndjson(spark, src, schema)
    windowed = streaming.windowed_counts(
        stream, "ts", window="1 hour", watermark="0 seconds", group_cols=["event_type"]
    )
    name = "win_counts_test"
    # complete mode: append would hold back the final (still-open)
    # window, since the watermark only reaches the max event time
    q = streaming.drain_to_memory(windowed, name, output_mode="complete")
    assert not q.isActive

    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.table(name).collect()
    }
    batch = {
        (r.win, r.event_type): r.n
        for r in spark.read.schema(schema).json(src)
        .groupBy(F.date_trunc("hour", "ts").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch
    assert sum(got.values()) == ev.count()


def test_streaming_backpressure_option(spark, tmpdir):
    ev = catalog.load(spark, SF_SMOKE, "events").select("event_id")
    src = os.path.join(tmpdir, "src")
    json_io.write_ndjson(ev, src)
    stream = streaming.stream_ndjson(
        spark, src, "event_id bigint", max_files_per_trigger=1
    )
    assert stream.isStreaming


def test_drain_to_parquet_checkpointed(spark, tmpdir):
    ev = catalog.load(spark, SF_SMOKE, "events").select("event_id", "event_type")
    src = os.path.join(tmpdir, "src")
    json_io.write_ndjson(ev, src)
    out = os.path.join(tmpdir, "out")
    ckpt = os.path.join(tmpdir, "ckpt")
    stream = streaming.stream_ndjson(spark, src, "event_id bigint, event_type string")
    streaming.drain_to_parquet(stream, out, ckpt)
    assert spark.read.parquet(out).count() == ev.count()
    # second drain with the same checkpoint is a no-op (exactly-once)
    stream2 = streaming.stream_ndjson(spark, src, "event_id bigint, event_type string")
    streaming.drain_to_parquet(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == ev.count()


def test_stream_sessionization_matches_batch(spark, tmpdir):
    """session_window sessionization drained availableNow must equal
    the batch lag+cumsum plan (plans.events_ops.user_sessions):
    identical per-user session counts and event totals."""
    from dbitool_spark.plans.events_ops import user_sessions

    ev = catalog.load(spark, SF_SMOKE, "events").select(
        "user_id", F.col("ts_ts").alias("ts")
    )
    src = os.path.join(tmpdir, "src")
    json_io.write_ndjson(ev, src)

    stream = streaming.stream_ndjson(spark, src, "user_id bigint, ts timestamp")
    sessions = streaming.stream_user_sessions(stream, "ts", "user_id")
    # complete mode: the watermark stops at max event time, so append
    # would hold back every user's final (still-open) session
    q = streaming.drain_to_memory(sessions, "sess_test", output_mode="complete")
    assert not q.isActive

    got = {
        (r.user_id,): (r.n_sessions, r.n_events)
        for r in spark.table("sess_test")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    batch = {
        (r.user_id,): (r.n_sessions, r.n_events)
        for r in user_sessions(spark, SF_SMOKE).collect()
    }
    assert got == batch


def test_stream_dedup_state_timeout_reemits(spark, tmpdir):
    """ProcessingTimeTimeout expiry must reclaim per-key state (the
    bounded-memory contract) and restore re-emit-after-expiry: a key
    seen again after its dedup scope expired emits again.

    Runs under ONE continuous processing-time trigger — the operator's
    deployment shape: timers only fire on later triggers, and an
    availableNow drain never self-terminates with a pending
    processing-time timer (stream_dedup_first_wins docstring)."""
    import json
    import time

    src = os.path.join(tmpdir, "src")
    os.makedirs(src)
    out = os.path.join(tmpdir, "out")
    ckpt = os.path.join(tmpdir, "ckpt")

    def write_batch(name, rows):
        with open(os.path.join(src, name), "w") as fh:
            for uid, eid in rows:
                fh.write(json.dumps({"user_id": uid, "event_id": eid}) + "\n")

    def wait_rows(n, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n:
                    return
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows")

    stream = streaming.stream_ndjson(spark, src, "user_id bigint, event_id bigint")
    deduped = streaming.stream_dedup_first_wins(
        stream, ["user_id"], state_timeout_ms=500
    )
    q = streaming.start_parquet_stream(deduped, out, ckpt)
    try:
        write_batch("b1.json", [(1, 100), (1, 101)])
        wait_rows(1)  # user 1 emits once; state armed with 500ms timer
        time.sleep(2.0)  # empty triggers run past the timer -> state removed
        write_batch("b2.json", [(2, 200)])
        wait_rows(2)  # user 2 emits (and proves post-expiry batches flow)
        write_batch("b3.json", [(1, 300)])
        wait_rows(3)  # user 1 re-emits: its dedup scope expired
    finally:
        q.stop()

    got = spark.read.parquet(out)
    assert got.filter(F.col("user_id") == 1).count() == 2
    assert got.count() == 3


def test_stream_dedup_first_wins(spark, tmpdir):
    """Stateful streaming dedup: duplicated keys across the input emit
    exactly once (applyInPandasWithState custom operator)."""
    ev = catalog.load(spark, SF_SMOKE, "events").select("user_id", "event_id")
    src = os.path.join(tmpdir, "src")
    # write twice into the same dir -> every user appears in >=2 files
    json_io.write_ndjson(ev, src)
    json_io.write_ndjson(ev.limit(200), os.path.join(src, "again"))
    stream = streaming.stream_ndjson(spark, src + "/*", "user_id bigint, event_id bigint")
    deduped = streaming.stream_dedup_first_wins(stream, ["user_id"])
    q = streaming.drain_to_memory(deduped, "dedup_test", output_mode="append")
    assert not q.isActive
    out = spark.table("dedup_test")
    n_users = ev.select("user_id").distinct().count()
    assert out.count() == n_users
    assert out.select("user_id").distinct().count() == n_users
