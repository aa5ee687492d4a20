#!/usr/bin/env python
"""Same-session A/B of the r16 optimization rewrites against the
pre-optimization constructions (which survive as the standalone
operator functions / inline shapes). Interleaved runs (ABAB...) so
host drift hits both arms equally; medians of N per arm."""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbitool_spark import catalog  # noqa: E402
from dbitool_spark.ops import dedup, scale  # noqa: E402
from dbitool_spark.plans import llm_ops, pipeline_ops, state_ops  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
runs = int(os.environ.get("RUNS", "5"))
only = set(sys.argv[1:])
spark = get_session("dbitool_spark-ab")
spark.sparkContext.setLogLevel("ERROR")


def old_ngram_variants():
    base = llm_ops.ngram_jaccard_documents(spark, sf_dir).select(
        F.lit("exact").alias("variant"), "id_a", "id_b", "jaccard"
    )
    guarded = llm_ops.ngram_jaccard_skewguard_documents(spark, sf_dir).select(
        F.lit("skewguard").alias("variant"), "id_a", "id_b", "jaccard"
    )
    return base.unionByName(guarded)


def new_ngram_variants():
    return llm_ops.ngram_jaccard_variants_documents(spark, sf_dir)


def old_hourly():
    from dbitool_spark.plans import events_ops

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


def new_hourly():
    return state_ops.streaming_hourly_composite(spark, sf_dir)


def old_bloom():
    docs = catalog.load(spark, sf_dir, "documents")
    bench = pipeline_ops.bench_gram_set(docs)
    bloom = scale.bloom_build(
        bench, "gram", m_bits=pipeline_ops._BLOOM_M_BITS, k=pipeline_ops._BLOOM_K
    )
    bloom_df = spark.createDataFrame([(bloom,)], "bloom array<bigint>")
    grams = docs.select(
        "doc_id",
        F.explode(
            dedup.shingles(F.col("text"), pipeline_ops.DECONTAM_NGRAM)
        ).alias("gram"),
    )
    flagged = (
        grams.crossJoin(F.broadcast(bloom_df))
        .filter(
            scale.bloom_contains_expr(
                "gram", "bloom", pipeline_ops._BLOOM_M_BITS, pipeline_ops._BLOOM_K
            )
        )
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exact = grams.join(bench, "gram").select("doc_id").distinct()
    return exact.join(flagged, "doc_id", "left").agg(
        F.when(F.count(F.lit(1)) == 0, F.lit(1.0))
        .otherwise((F.count("__hit") / F.count(F.lit(1))).cast("double"))
        .alias("recall"),
        F.count(F.lit(1)).alias("n_exact"),
    )


def new_bloom():
    return pipeline_ops.bloom_decontaminate_documents(spark, sf_dir)


def old_kmeans_audit():
    # pre-optimization assign (window argmin) applied to the audit's
    # kmeans leg shape: emulate by calling the OLD construction inline
    from pyspark.sql.window import Window

    emb = catalog.load(spark, sf_dir, "embeddings")
    vec = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")).persist()
    seeds = vec.orderBy("vec_id").limit(8).collect()
    dim = len(seeds[0].v)
    cents = [(i, list(r.v)) for i, r in enumerate(seeds)]
    sq_dist = F.aggregate(
        F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cid")

    def assign(cdf):
        return (
            vec.crossJoin(cdf)
            .withColumn("d", sq_dist)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "d", "v")
        )

    schema = "cid int, c array<double>"
    for _ in range(2):
        a = assign(spark.createDataFrame(cents, schema))
        upd = (
            a.select("cid", F.posexplode("v").alias("idx", "x"))
            .groupBy("cid", "idx")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid = {}
        for r in upd:
            by_cid.setdefault(r.cid, {})[r.idx] = r.m
        cents = [
            (cid, [by_cid[cid][p] for p in range(dim)] if cid in by_cid else old)
            for cid, old in cents
        ]
    final = assign(spark.createDataFrame(cents, schema))
    out = (
        final.groupBy(F.col("cid").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.round(F.sum("d"), 4).alias("inertia_r"))
        .orderBy("cluster_id")
    )
    from dbitool_spark.ops.cache import materialize_release

    return materialize_release(out, vec)


def new_kmeans_audit():
    return llm_ops.kmeans_embeddings(spark, sf_dir)


CASES = {
    "ngram_variants": (old_ngram_variants, new_ngram_variants),
    "hourly_composite": (old_hourly, new_hourly),
    "bloom_decontaminate": (old_bloom, new_bloom),
    "kmeans_leg": (old_kmeans_audit, new_kmeans_audit),
}

for name, (old, new) in CASES.items():
    if only and name not in only:
        continue
    old().count()
    new().count()  # warm both arms
    ot, nt = [], []
    for _ in range(runs):
        t0 = time.perf_counter(); old().count(); ot.append(time.perf_counter() - t0)
        gc.collect()
        t0 = time.perf_counter(); new().count(); nt.append(time.perf_counter() - t0)
        gc.collect()
    om, nm = statistics.median(ot), statistics.median(nt)
    print(
        f"{name}: old={om:.3f}s new={nm:.3f}s ratio={nm/om:.3f} "
        f"old={[round(x,2) for x in sorted(ot)]} new={[round(x,2) for x in sorted(nt)]}",
        flush=True,
    )
