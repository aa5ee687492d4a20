#!/usr/bin/env python
"""r16 verdict item 6: can the minhash signature kernel move from 64
independent xxhash64(shingle, j) string hashes to the
Kirsch-Mitzenmacher double-hash family h_j = h1 + j*h2 (2 string
hashes + 64 long mult-adds) WITHOUT changing any declared output?

Gate (the verdict's): the banded candidate pairs after exact-Jaccard
verification must be IDENTICAL to the current kernel's at sf0.001,
sf0.01 and sf0.1 (the oracle is brute-force exact Jaccard, so the
current kernel has recall 1.0 on these corpora by record — the new
kernel must keep every one of those pairs), plus a real speedup.

Usage: python plans/r17/probe_minhash_km.py [time|equal|all]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbitool_spark import catalog  # noqa: E402
from dbitool_spark.ops import dedup, scale  # noqa: E402
from dbitool_spark.ops.cache import materialize_release, attach_persists  # noqa: E402
from dbitool_spark.plans.llm_ops import _perturbed_corpus  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

spark = get_session("dbitool_spark-km-probe")
spark.sparkContext.setLogLevel("ERROR")
mode = sys.argv[1] if len(sys.argv) > 1 else "all"
runs = int(os.environ.get("RUNS", "5"))


def km_signatures(sh, n_hashes=64):
    """Hash-the-hash variant of dedup.minhash_signatures: the string
    shingle is xxhash64'd ONCE to a long, and the 64 seeded hashes run
    over that 8-byte long instead of re-hashing the string per seed.
    (The literal Kirsch-Mitzenmacher h1 + j*h2 is out: ANSI mode —
    Spark 4's default — raises on long overflow, and try_add's NULLs
    would corrupt the min.)"""
    exploded = sh.select("id", F.explode("sh").alias("shingle")).select(
        "id", F.xxhash64(F.col("shingle")).alias("w")
    )
    return exploded.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("w"), F.lit(j))).alias(f"h{j}")
            for j in range(n_hashes)
        ]
    )


def km_near_dup_pairs(df, id_col, text_col, *, shingle_k=3, threshold=0.7):
    """minhash_near_dup_pairs with the KM signature kernel swapped in
    (everything else verbatim)."""
    n_hashes, bands = 64, 16
    rows = n_hashes // bands
    sh = df.select(
        F.col(id_col).alias("id"),
        dedup.shingles(F.col(text_col), shingle_k).alias("sh"),
    ).persist()
    sig = km_signatures(sh, n_hashes)
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bh"),
    ).persist()
    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return materialize_release(verified.select("id_a", "id_b", "jaccard"), sh, banded)


if mode in ("equal", "all"):
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        docs = catalog.load(spark, d, "documents")
        corpus = _perturbed_corpus(docs)
        old = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dedup.minhash_near_dup_pairs(
                corpus, "doc_id", "text", shingle_k=3, threshold=0.7
            ).collect()
        }
        new = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in km_near_dup_pairs(corpus, "doc_id", "text").collect()
        }
        print(
            f"{sf}: old_pairs={len(old)} new_pairs={len(new)} "
            f"equal={old == new} only_old={len(old - new)} only_new={len(new - old)}"
        )

if mode in ("time", "all"):
    d = "/root/testdata/sf0.1"
    docs = catalog.load(spark, d, "documents")
    corpus = scale.rebalance_to_parallelism(
        _perturbed_corpus(docs), "doc_id"
    )
    sh = corpus.select(
        F.col("doc_id").alias("id"), dedup.shingles(F.col("text"), 3).alias("sh")
    ).persist()
    sh.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, fn in [
        ("sig_old", lambda: dedup.minhash_signatures(sh)),
        ("sig_km", lambda: km_signatures(sh)),
    ]:
        noop(fn())  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            noop(fn())
            samples.append(time.perf_counter() - t0)
        print(f"{name}: median={statistics.median(samples):.3f}s "
              f"{['%.2f' % x for x in samples]}")
    sh.unpersist()

    # end-to-end entry-shaped A/B (pairs construction only)
    for name, fn in [
        ("pairs_old", lambda: dedup.minhash_near_dup_pairs(
            corpus, "doc_id", "text", shingle_k=3, threshold=0.7)),
        ("pairs_km", lambda: km_near_dup_pairs(corpus, "doc_id", "text")),
    ]:
        fn().count()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().count()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: median={statistics.median(samples):.3f}s "
              f"{['%.2f' % x for x in samples]}")
