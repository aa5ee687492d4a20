#!/usr/bin/env python
"""Job-count evidence for the r17 ndb probe-job folds (verdict item 7):
count Spark jobs per NdbTable.upsert / merge_upsert via job groups.
Run once on the r16 code (git stash) and once on the r17 code.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbitool_spark import catalog  # noqa: E402
from dbitool_spark.ndb import NdbTable  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dbitool_spark-ndb-jobs")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

ev = catalog.load(spark, sf_dir, "events").select(
    "user_id", "event_id", "event_type",
    F.unix_micros(F.col("ts_ts")).alias("ts_us"),
)

base = tempfile.mkdtemp(prefix="ndb_jobs_")


def count_jobs(tag, fn):
    sc.setJobGroup(tag, tag)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup(tag)
    print(f"{tag}: {len(ids)} jobs")


# (a) plain upsert, files_per_bucket=1 (ndb_time_travel shape)
t1 = NdbTable(spark, os.path.join(base, "t1"), key="user_id", n_buckets=8)
count_jobs("upsert_fpb1_first", lambda: t1.upsert(
    ev.filter(F.col("event_id") % 2 == 0), order_by=["ts_us", "event_id"]))
count_jobs("upsert_fpb1_second", lambda: t1.upsert(
    ev.filter(F.col("event_id") % 2 == 1), order_by=["ts_us", "event_id"]))

# (b) plain upsert, files_per_bucket=4 (ndb_range_pruned shape)
t2 = NdbTable(spark, os.path.join(base, "t2"), key="user_id", n_buckets=8,
              files_per_bucket=4)
count_jobs("upsert_fpb4_first", lambda: t2.upsert(ev, order_by=["ts_us", "event_id"]))
markers = (
    ev.filter((F.col("user_id") >= 100) & (F.col("user_id") < 130))
    .select("user_id").distinct()
    .select("user_id", F.lit(-1).cast("long").alias("event_id"),
            F.lit("touched").alias("event_type"), F.lit(0).cast("long").alias("ts_us"))
)
count_jobs("upsert_fpb4_second", lambda: t2.upsert(markers, order_by=["ts_us", "event_id"]))

# (c) merge_upsert (streaming_rollup shape)
t3 = NdbTable(spark, os.path.join(base, "t3"), key="rollup_key", n_buckets=8)
partial = (
    ev.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    .groupBy(F.date_format(F.date_trunc("hour", F.col("ts")),
                           "yyyy-MM-dd HH:mm:ss").alias("hour"), "event_type")
    .agg(F.count(F.lit(1)).alias("n"))
    .withColumn("rollup_key", F.concat_ws("|", "hour", "event_type"))
)
count_jobs("merge_upsert_first", lambda: t3.merge_upsert(
    partial, combine={"n": "sum"}))
count_jobs("merge_upsert_second", lambda: t3.merge_upsert(
    partial, combine={"n": "sum"}))

shutil.rmtree(base, ignore_errors=True)
