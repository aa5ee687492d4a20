#!/usr/bin/env python
"""r16 verdict item 4: contention sanity-check of the r16 parallel
shapes. The driver's loaded r16 run showed decontaminate 8.1x,
streaming_hourly 4.4x, dedup_representatives 2.3x vs the exclusive
record — but so did untouched pagerank (3.9x), so it smelled like pure
load. This probe decides it: each rebalanced/threaded shape runs A/B
against its original (un-rebalanced / sequential) construction, first
idle, then under a synthetic 16-process CPU hog — if the optimized
shapes degrade SUPER-linearly vs their originals, they need bounding.

Usage: python plans/r17/probe_contention.py
"""
from __future__ import annotations

import multiprocessing
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbitool_spark import catalog  # noqa: E402
from dbitool_spark.plans import llm_ops, pipeline_ops, state_ops  # noqa: E402
from dbitool_spark.plans import events_ops  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
runs = int(os.environ.get("RUNS", "3"))
N_HOGS = int(os.environ.get("HOGS", "16"))
spark = get_session("dbitool_spark-contention")
spark.sparkContext.setLogLevel("ERROR")


def _hog():
    x = 1.0
    while True:
        x = x * 1.0000001 + 1e-9


# --- arms -------------------------------------------------------------
def decon_rebalanced():
    return pipeline_ops.decontaminate_documents(spark, sf_dir)


def decon_original():
    # the pre-r16 shape: no rebalance before the gram kernels
    from dbitool_spark.ops import scale as _scale

    orig = _scale.rebalance_to_parallelism
    _scale.rebalance_to_parallelism = lambda df, key: df
    try:
        return pipeline_ops.decontaminate_documents(spark, sf_dir)
    finally:
        _scale.rebalance_to_parallelism = orig


def hourly_parallel():
    return state_ops.streaming_hourly_composite(spark, sf_dir)


def hourly_sequential():
    null_sum = F.lit(None).cast("double").alias("sum_value")
    batch = events_ops.events_hourly_stats(spark, sf_dir).select(
        F.lit("batch").alias("variant"), "hour", "event_type", "n", "sum_value"
    )
    complete = state_ops.streaming_hourly_stats_events(spark, sf_dir).select(
        F.lit("complete").alias("variant"), "hour", "event_type", "n", null_sum
    )
    append = state_ops.streaming_hourly_append_events(spark, sf_dir).select(
        F.lit("append").alias("variant"), "hour", "event_type", "n", null_sum
    )
    return batch.unionAll(complete).unionAll(append).orderBy(
        "variant", "hour", "event_type"
    )


def dedup_reps_rebalanced():
    return llm_ops.dedup_representatives_documents(spark, sf_dir)


def dedup_reps_original():
    from dbitool_spark.ops import scale as _scale

    orig = _scale.rebalance_to_parallelism
    _scale.rebalance_to_parallelism = lambda df, key: df
    try:
        return llm_ops.dedup_representatives_documents(spark, sf_dir)
    finally:
        _scale.rebalance_to_parallelism = orig


ARMS = [
    ("decon_orig", decon_original),
    ("decon_reb", decon_rebalanced),
    ("hourly_seq", hourly_sequential),
    ("hourly_par", hourly_parallel),
    ("reps_orig", dedup_reps_original),
    ("reps_reb", dedup_reps_rebalanced),
]


def measure(tag):
    print(f"--- {tag} (loadavg {os.getloadavg()[0]:.1f})")
    out = {}
    for name, fn in ARMS:
        fn().count()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().count()
            samples.append(time.perf_counter() - t0)
        out[name] = statistics.median(samples)
        print(f"  {name}: {out[name]:.3f}s {['%.2f' % x for x in samples]}")
    return out


idle = measure("idle")

hogs = [multiprocessing.Process(target=_hog, daemon=True) for _ in range(N_HOGS)]
for h in hogs:
    h.start()
time.sleep(2)
try:
    loaded = measure(f"loaded ({N_HOGS} hogs)")
finally:
    for h in hogs:
        h.terminate()

print("\n=== degradation (loaded/idle) ===")
for name in idle:
    print(f"  {name}: {loaded[name] / idle[name]:.2f}x "
          f"({idle[name]:.2f}s -> {loaded[name]:.2f}s)")
for pair in (("decon_orig", "decon_reb"), ("hourly_seq", "hourly_par"),
             ("reps_orig", "reps_reb")):
    a, b = pair
    print(f"  relative {b} vs {a}: idle {idle[b]/idle[a]:.2f} "
          f"loaded {loaded[b]/loaded[a]:.2f}")
