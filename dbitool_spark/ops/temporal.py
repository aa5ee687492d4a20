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

# Internal working columns injected by the join constructions. A left
# input already carrying one of these (e.g. a prior asof_join's output
# re-joined, or a column literally named __t) would silently corrupt
# the result, so both operators assert absence up front — the same
# defensive convention the pipeline uses for its reserved stream names.
_ASOF_RESERVED = ("__k", "__t", "__side", "__asof")
_RANGE_RESERVED = ("__b",)


def _check_reserved(
    reserved: tuple[str, ...], *frames: DataFrame, prefixes: tuple[str, ...] = ()
) -> None:
    for df in frames:
        clash = [
            c
            for c in df.columns
            if c in reserved or any(c.startswith(p) for p in prefixes)
        ]
        if clash:
            raise ValueError(
                f"input columns {clash} collide with reserved temporal-join "
                f"names {sorted(reserved + tuple(p + '*' for p in prefixes))}; "
                "rename them first"
            )


def _floordiv(col_name: str, divisor: int) -> Column:
    """Exact integer floor-division of a (possibly negative) integer
    column. `F.floor(col / divisor)` routes through DOUBLE division,
    which loses integer precision beyond 2^53 — epoch NANOS (~1.7e18)
    would land points in adjacent buckets and the bucketized equi-join
    would silently drop true matches. `div` truncates toward zero, so
    subtract the (always non-negative) pmod first to make it exact
    floor for any sign."""
    if divisor <= 0:
        raise ValueError(f"bucket must be a positive integer, got {divisor}")
    return F.expr(f"(`{col_name}` - pmod(`{col_name}`, {divisor})) div {divisor}")


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
    last(ignorenulls) over a single STRUCT of the whole right row
    carries it forward — the struct is non-null exactly for right
    rows, so every carried field (values AND timestamp) comes from
    the same latest right row even when individual value columns are
    NULL (pandas merge_asof semantics; carrying each value column
    separately would resurrect older non-null values and then validate
    them against the newer row's timestamp under `tolerance`).
    One shuffle on the key; both window passes reuse that partitioning.
    """
    _check_reserved(_ASOF_RESERVED, left, right, prefixes=("__r_",))
    lcols = left.columns
    out_clash = [c for c in value_cols if f"asof_{c}" in lcols]
    if out_clash:
        raise ValueError(
            f"left already has asof_-prefixed outputs for {out_clash}; "
            "rename them before re-joining"
        )
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
    # the whole right row as one nullable struct: null on left rows,
    # so last(ignorenulls) picks the latest RIGHT row atomically
    rrow = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__t").alias("t"),
            *[F.col(f"__r_{c}").alias(c) for c in value_cols],
        ),
    )
    # right ties on __t: order by the struct itself — field order puts
    # t first (equal within the tie), then value_cols in declaration
    # order, so the row with the greatest values is the one last() sees
    # (deterministic tie-break, now consistent across ALL carried cols)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), rrow.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tag_l.unionByName(tag_r).select(
        "*", F.last(rrow, ignorenulls=True).over(w).alias("__asof")
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = F.col("__asof.t") >= F.col("__t") - F.lit(tolerance)
        out = out.select(
            *lcols,
            *[
                F.when(fresh, F.col(f"__asof.{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    else:
        out = out.select(
            *lcols, *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in value_cols]
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
    broadcast_right: bool = False,
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
    (bucket[, key]); AQE handles hot buckets.

    Bucket ids use EXACT integer floor-division (pmod + `div`), not
    F.floor(col / bucket): the latter is DOUBLE division, which above
    2^53 (epoch nanos ~1.7e18) can round a point into the adjacent
    bucket and silently drop truly-matching pairs — false negatives
    the residual filter cannot recover.

    `broadcast_right` hints the (exploded) interval side for
    broadcast. When the interval table is a small derived aggregate —
    e.g. busy hours: bounded by distinct (key, hour), orders of
    magnitude below the point stream — this removes the point-side
    shuffle entirely: the plan becomes a BroadcastHashJoin over the
    scan instead of exchanging the full stream on (bucket, key). Leave
    False when the interval side is scale-dependent; AQE then decides
    from runtime sizes."""
    _check_reserved(_RANGE_RESERVED, left, right)
    p, lo, hi = F.col(left_point), F.col(right_lo), F.col(right_hi)
    lb = left.withColumn("__b", _floordiv(left_point, bucket))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(_floordiv(right_lo, bucket), _floordiv(right_hi, bucket))
        ),
    )
    if broadcast_right:
        rb = F.broadcast(rb)
    on = ["__b", key] if key else ["__b"]
    return (
        lb.join(rb, on)
        .filter((lo <= p) & (p <= hi))
        .drop("__b")
    )
