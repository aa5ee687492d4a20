"""Oracle-checked queries for the keyed-state layer (ndb).

The query proves BOTH upsert rules at once: rows from a later upsert
batch beat earlier batches regardless of their payload ordering
(generation precedence), and within one batch the explicit order
column wins. The oracle expresses the same resolution as a single
window: rank by (batch, order...) descending.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbitool_spark import catalog
from dbitool_spark.ndb import NdbTable


def ndb_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events split into two upsert batches by event_id parity (odd
    second), keyed by user_id, ordered within batch by (ts_us,
    event_id). Replay must yield, per user: the max-(ts,event_id) odd
    event if any odd event exists, else the max even event."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros(F.col("ts_ts")).alias("ts_us")
    )
    path = os.path.join(tempfile.mkdtemp(prefix="dbitool_ndb_"), "events_kv")
    table = NdbTable(spark, path, key="user_id", n_buckets=8)
    table.upsert(ev.filter(F.col("event_id") % 2 == 0), order_by=["ts_us", "event_id"])
    table.upsert(ev.filter(F.col("event_id") % 2 == 1), order_by=["ts_us", "event_id"])
    return table.replay().select("user_id", "event_id", "event_type", "ts_us").orderBy("user_id")


NDB_UPSERT_REPLAY_SQL = """
SELECT user_id, event_id, event_type, ts_us FROM (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY (event_id % 2) DESC, epoch_us(ts) DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""
