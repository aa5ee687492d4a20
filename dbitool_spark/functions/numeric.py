"""Cross-engine-deterministic numeric helpers.

Floating-point SUM is order-dependent: Spark combines partition-local
sums in shuffle order, DuckDB in its own order, so double aggregates
differ in the last ulps between engines and break exact value-hash
comparison. Convention used by every query in this engine:

- cast measures to DECIMAL before aggregating (exact, associative,
  order-independent),
- do arithmetic in decimal,
- cast the final aggregate back to DOUBLE (the nearest double of the
  same exact decimal is bit-identical in any engine).

Precision choices keep Spark's widening rules (p1+p2+1 on multiply)
and DuckDB's (p1+p2) both under the 38-digit ceiling even after a
3-way product and a SUM promotion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # prices, balances (single values < 10^10)
RATE = "decimal(6,4)"  # discounts, tax rates in [0, 99.9999]


def money(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(MONEY)


def rate(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(RATE)


def dsum(c: Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum, emitted as double.

    The sum is narrowed to DECIMAL(18,scale) before the double cast:
    wide decimals (e.g. scale-10 products) convert to double through
    different internal paths in Spark (BigDecimal.doubleValue) vs
    DuckDB (int128 / 10^s), which can differ by 1 ulp. A DECIMAL(18,2)
    numerator is < 2^53, so value/10^s is a single correctly-rounded
    operation in both engines — bit-identical."""
    return F.sum(c).cast(f"decimal(18,{scale})").cast("double").alias(alias)


def davg(c: Column, alias: str, scale: int = 4) -> Column:
    """Order-independent average: exact (narrowed) decimal sum cast to
    double, divided by the exact count (decimal AVG division scale
    rules differ across engines; double-division of exact parts does
    not)."""
    return (F.sum(c).cast(f"decimal(18,{scale})").cast("double") / F.count(c)).alias(alias)
