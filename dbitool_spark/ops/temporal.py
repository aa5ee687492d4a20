"""Temporal join operators: as-of (point-in-time) and range joins.

Spark has no native as-of join (pandas' merge_asof is driver-bound;
Flink/kdb ship it natively). The reference has no joins at all
(TODO:67-72), so like the relational pack this realizes intended
scope Spark-first — with the distributed formulation, not a port of
the single-node algorithm.

Scale shapes (100 TB design point):
- asof_join is the union+window construction: tag both sides, union
  (cheap, no fan-out), ONE shuffle on the key, and a per-key ordered
  window where last_value(..., ignorenulls) carries the most recent
  right-side values forward onto left rows. No range cross-product,
  no per-row probe; skewed keys behave exactly like any window-by-key
  (salt upstream if one key dominates).
- range_join buckets the time axis so an interval join becomes an
  equi-join on the bucket (plus the exact predicate as a residual
  filter) — the standard trick that keeps Spark off the
  BroadcastNestedLoopJoin path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    *,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the `value_cols` of
    the LATEST right row with the same `key` and right_ts <= left_ts
    (inclusive; nulls when no such row). Timestamps are integer
    columns (epoch micros by convention); ties on right_ts resolve to
    the greatest `value_cols[0]` so results are deterministic.

    `tolerance` (same unit as the ts columns) additionally nulls out
    matches older than left_ts - tolerance — pandas merge_asof
    semantics.

    Union+window: right rows sort before left rows at equal
    timestamps (so an exactly-simultaneous right row is visible), and
    last_value(ignorenulls) carries right values forward. One shuffle
    on the key; both window passes reuse that partitioning.
    """
    lcols = left.columns
    tag_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    tag_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    # right ties: make the row with the greatest value_cols[0] the one
    # last_value sees (deterministic tie-break)
    order_tail = [F.col(f"__r_{value_cols[0]}").asc_nulls_first()]
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tag_l.unionByName(tag_r).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True)
        .over(w)
        .alias("__asof_t"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = F.col("__asof_t") >= F.col("__t") - F.lit(tolerance)
        out = out.select(
            *lcols,
            *[
                F.when(fresh, F.col(f"__asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    else:
        out = out.select(
            *lcols, *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols]
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    *,
    bucket: int,
    key: str | None = None,
) -> DataFrame:
    """Interval containment join: left rows paired with every right
    row whose [right_lo, right_hi] interval contains left_point
    (optionally also matching on an equi `key`). All bound columns are
    integers in the same unit.

    Naive `lo <= p AND p <= hi` forces BroadcastNestedLoopJoin (a
    cross product). Bucketizing the time axis turns it into an
    equi-join: each interval explodes to its covered buckets
    (intervals are assumed >> shorter than the data span — bounded
    fan-out ~ interval_len/bucket + 1), the point maps to one bucket,
    and the exact predicate remains as a post-join filter. Shuffle on
    (bucket[, key]); AQE handles hot buckets."""
    p, lo, hi = F.col(left_point), F.col(right_lo), F.col(right_hi)
    lb = left.withColumn("__b", F.floor(p / bucket))
    rb = right.withColumn(
        "__b", F.explode(F.sequence(F.floor(lo / bucket), F.floor(hi / bucket)))
    )
    on = ["__b", key] if key else ["__b"]
    return (
        lb.join(rb, on)
        .filter((lo <= p) & (p <= hi))
        .drop("__b")
    )
