#!/usr/bin/env python
"""Phase-level timing of NdbTable.upsert inside the ndb replay entries
(r16 verdict item 7: is the touched-bucket distinct-collect worth a
job-fold?). Wraps the phases with timers via monkeypatching, then runs
the three registered ndb entries and prints per-phase totals.

Phases per upsert:
- prune_job: batch.select(bucket).distinct().collect()
- split_files: _split_touched_files (files_per_bucket>1 driver pass)
- write_job: the merged/resolved parquet write
- manifest: _write_manifest (driver-side footer stats)
- commit: _commit_version + pointer flip + gc
"""
from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from dbitool_spark import ndb  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dbitool_spark-ndb-probe")
spark.sparkContext.setLogLevel("ERROR")

acc: dict[str, list[float]] = defaultdict(list)

# --- instrument phases ---------------------------------------------
_orig_split = ndb.NdbTable._split_touched_files
_orig_manifest = ndb.NdbTable._write_manifest
_orig_commit = ndb.NdbTable._commit_version


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        acc[name].append(time.perf_counter() - t0)
        return out
    return wrap


ndb.NdbTable._split_touched_files = timed("split_files", _orig_split)
ndb.NdbTable._write_manifest = timed("manifest", _orig_manifest)
ndb.NdbTable._commit_version = timed("commit", _orig_commit)

# instrument the prune collect + write by wrapping DataFrame methods is
# messy; instead wrap upsert around a copy that times sub-spans via
# sparkContext job-group timestamps. Simpler: time the collect via a
# patched DataFrame.collect inside upsert scope.
_orig_upsert = ndb.NdbTable.upsert


def upsert_timed(self, df, **kw):
    from pyspark.sql import DataFrame

    _orig_collect = DataFrame.collect
    _orig_save = None

    def coll(dfself):
        t0 = time.perf_counter()
        out = _orig_collect(dfself)
        acc["prune_collect"].append(time.perf_counter() - t0)
        return out

    DataFrame.collect = coll
    t0 = time.perf_counter()
    try:
        out = _orig_upsert(self, df, **kw)
    finally:
        DataFrame.collect = _orig_collect
    acc["upsert_total"].append(time.perf_counter() - t0)
    return out


ndb.NdbTable.upsert = upsert_timed

# --- run the entries -------------------------------------------------
from dbitool_spark.plans import state_ops  # noqa: E402

for name, fn in [
    ("ndb_time_travel_replay", state_ops.ndb_time_travel_replay),
    ("ndb_range_pruned_replay", state_ops.ndb_range_pruned_replay),
    ("streaming_rollup_ndb_events", state_ops.streaming_rollup_ndb_events),
    ("ndb_replay_lookup_composite", state_ops.ndb_replay_lookup_composite),
]:
    acc.clear()
    fn(spark, sf_dir).count()  # warm-up
    acc.clear()
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    total = time.perf_counter() - t0
    print(f"\n=== {name}: {total:.3f}s")
    for k, v in sorted(acc.items()):
        print(f"  {k}: n={len(v)} sum={sum(v):.3f}s {['%.3f' % x for x in v]}")
