#!/usr/bin/env python
"""Capture .explain('formatted') for every registered query into
plans/r17/<query>_<suffix>.txt (suffix: before/after, argv[1]).

Uses the bench's lazy variants where they exist so checkpoint-backed
entries hash their REAL optimized plan (the bench fingerprint-pass
convention); entries whose registered callable is eager by
construction (drains/ndb replays execute at plan-build time) still
produce a useful scan-level plan of the returned frame.

Run:  python plans/r17/capture_plans.py before [only_these ...]
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "plans", "r17")

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

sys.path.insert(0, REPO)
import bench  # noqa: E402  (for _lazy_plan_variants)
from dbitool_spark.ops.cache import release_persists  # noqa: E402
from dbitool_spark.plans import registry  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dbitool_spark-plan-capture")
spark.sparkContext.setLogLevel("ERROR")

lazy = bench._lazy_plan_variants()
t_all = time.time()
for name, fn in registry.queries().items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        spark.catalog.clearCache()
        df = lazy.get(name, fn)(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        release_persists(df)
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: {time.time()-t0:.1f}s", file=sys.stderr)
    except Exception as exc:  # capture is advisory; never abort the sweep
        print(f"FAIL {name}: {exc}", file=sys.stderr)
print(f"total {time.time()-t_all:.1f}s", file=sys.stderr)
