#!/usr/bin/env python
"""Isolated per-entry measurement (r16 optimization round).

For each named registry entry: one warm-up, then N timed runs of the
bench action (count(), the driver-comparable number) and N timed runs
against the noop sink (guide §1.4 — computes every column, isolates
computation from both the sink and count()'s column pruning). Prints
one line per entry: median_count, median_noop, samples.

Usage: python plans/r16/measure_entries.py entry [entry ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), RUNS (default 5)
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from dbitool_spark.plans import registry  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
runs = int(os.environ.get("RUNS", "5"))
spark = get_session("dbitool_spark-measure")
spark.sparkContext.setLogLevel("ERROR")

qs = registry.queries()
for name in sys.argv[1:]:
    fn = qs[name]
    spark.sparkContext.setJobDescription(f"measure:{name}")
    fn(spark, sf_dir).count()  # warm-up
    counts, noops = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        counts.append(time.perf_counter() - t0)
        gc.collect()
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        noops.append(time.perf_counter() - t0)
        gc.collect()
    print(
        f"{name}: count={statistics.median(counts):.3f}s "
        f"noop={statistics.median(noops):.3f}s "
        f"counts={[round(x, 2) for x in sorted(counts)]} "
        f"noops={[round(x, 2) for x in sorted(noops)]}",
        flush=True,
    )
    spark.sparkContext.setJobDescription(None)
