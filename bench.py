#!/usr/bin/env python
"""Per-query benchmark harness (driver contract, BASELINE.md).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], takes the median of
N timed runs after a warm-up, and prints exactly ONE JSON line:

    {"metric": "total_median_query_sec", "value": <sum of medians>,
     "unit": "sec", "queries": {"q1_...": sec, ...}, "sf": 0.1}

Timing counts the full job: plan + execution to a count() action
(count, not collect, so driver-side row transfer doesn't dominate at
bench scale — correctness of values is the oracle gate's job, and
count() still executes the complete plan including sorts' upstream).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from dbitool_spark.plans import registry
    from dbitool_spark.session import get_session

    spark = get_session("dbitool_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # derive sf from the directory name (sf0.1 -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    timings: dict[str, float] = {}
    for name, fn in registry.queries().items():
        # warm-up run: JIT, parquet footer cache, AQE stats
        fn(spark, sf_dir).count()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    result = {
        "metric": "total_median_query_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
