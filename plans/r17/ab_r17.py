#!/usr/bin/env python
"""Same-session interleaved A/B for the r17 optimization changes.
Old constructions are inlined from the r16 HEAD (git 6757ae0); runs
interleave ABAB so host drift hits both arms. Medians of N per arm.

Usage: python plans/r17/ab_r17.py [pair ...]   (default: all pairs)
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbitool_spark import catalog, streaming  # noqa: E402
from dbitool_spark.io import json_io  # noqa: E402
from dbitool_spark.ndb import NdbTable  # noqa: E402
from dbitool_spark.ops import dedup, scale  # noqa: E402
from dbitool_spark.ops.cache import materialize_release  # noqa: E402
from dbitool_spark.plans import llm_ops, state_ops  # noqa: E402
from dbitool_spark.plans.llm_ops import _perturbed_corpus  # noqa: E402
from dbitool_spark.plans.state_ops import _scratch_dir  # noqa: E402
from dbitool_spark.session import get_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
runs = int(os.environ.get("RUNS", "5"))
only = set(sys.argv[1:])
spark = get_session("dbitool_spark-ab17")
spark.sparkContext.setLogLevel("ERROR")


# --- simhash_recall_planted: r16 shape = rebalanced subset ------------
def simhash_old():
    docs = catalog.load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    corpus = scale.rebalance_to_parallelism(_perturbed_corpus(docs), "doc_id")
    sig = dedup.simhash_signatures(corpus, "doc_id", "text").persist()
    a = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sig.select(
        (F.col("id") - llm_ops._PERTURB_OFFSET).alias("id_a"),
        F.col("sig").alias("sig_b"),
    )
    truth = (
        a.join(b, "id_a")
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= 3)
        .select("id_a", (F.col("id_a") + llm_ops._PERTURB_OFFSET).alias("id_b"))
    )
    cands = dedup.simhash_band_candidates(sig).select(
        "id_a", "id_b", F.lit(1).alias("__hit")
    )
    result = truth.join(cands, ["id_a", "id_b"], "left").agg(
        (F.count("__hit") / F.count(F.lit(1))).cast("double").alias("recall")
    )
    return materialize_release(result, sig)


def simhash_new():
    return llm_ops.simhash_recall_planted(spark, sf_dir)


# --- streaming_lsh_near_dup: r16 shape = sequential drain then parity -
def slsh_old():
    docs = catalog.load(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    corpus = _perturbed_corpus(docs)
    scratch = _scratch_dir("streaming_lsh_near_dup", sf_dir)
    src = os.path.join(scratch, "ndjson")
    json_io.write_ndjson(corpus.coalesce(4), src)
    stream = streaming.stream_ndjson(
        spark, src, "doc_id long, text string", max_files_per_trigger=2
    )
    index = NdbTable(
        spark, os.path.join(scratch, "lsh_index"), key="bucket", n_buckets=8
    )
    flags_dir = os.path.join(scratch, "flags")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        streaming.stream_near_dup_lsh(
            stream, "doc_id", "text",
            index=index, flags_dir=flags_dir,
            checkpoint=os.path.join(scratch, "ckpt"),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    def _mismatches(a, b, alias):
        return F.sum(
            F.when(
                F.col(a).isNull() | F.col(b).isNull() | (F.col(a) != F.col(b)), 1
            ).otherwise(0)
        ).cast("long").alias(alias)

    final = index.replay()
    buckets = dedup.lsh_bucket_rows(
        scale.rebalance_to_parallelism(corpus, "doc_id"), "doc_id", "text"
    ).persist()
    minima = buckets.groupBy("bucket").agg(F.min("id").alias("bmin"))
    index_check = minima.join(final, "bucket", "full_outer").agg(
        _mismatches("owner", "bmin", "index_mismatches")
    )
    post = dedup.lsh_flags_from_buckets(buckets, final).withColumnRenamed(
        "is_dup", "dup_s"
    )
    batch_flags = dedup.lsh_flags_from_buckets(
        buckets, minima.withColumnRenamed("bmin", "owner")
    )
    flag_check = post.join(batch_flags, "id", "full_outer").agg(
        _mismatches("dup_s", "is_dup", "flag_mismatches")
    )
    streamed_rows = (
        spark.read.parquet(flags_dir)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return materialize_release(
        streamed_rows.crossJoin(index_check).crossJoin(flag_check), buckets
    )


def slsh_new():
    return state_ops.streaming_lsh_near_dup_documents(spark, sf_dir)


PAIRS = {
    "simhash": (simhash_old, simhash_new),
    "slsh": (slsh_old, slsh_new),
}


def main():
    for name, (old, new) in PAIRS.items():
        if only and name not in only:
            continue
        # warm-up both arms
        old().count()
        new().count()
        olds, news = [], []
        for _ in range(runs):
            gc.collect()
            t0 = time.perf_counter(); old().count(); olds.append(time.perf_counter() - t0)
            gc.collect()
            t0 = time.perf_counter(); new().count(); news.append(time.perf_counter() - t0)
        mo, mn = statistics.median(olds), statistics.median(news)
        print(
            f"{name}: old={mo:.3f}s new={mn:.3f}s ratio={mn / mo:.3f} "
            f"(old {['%.2f' % x for x in olds]} new {['%.2f' % x for x in news]})"
        )


if __name__ == "__main__":
    main()
