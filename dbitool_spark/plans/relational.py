"""Relational analytics queries over the test star schema.

The reference shipped zero relational operators — joins, filters,
aggregations, windows, sorts were all future work (reference
TODO:61-78; SURVEY.md §2.5) — so this module realizes that intended
scope Spark-first. Each function is a (spark, sf_dir) -> DataFrame
callable registered in __spark_entry__.queries() with a DuckDB oracle.

Scale notes (100 TB design point):
- only constant-size dims (region/nation) get explicit broadcast
  hints, via catalog.maybe_broadcast; every scale-dependent side is
  left unhinted so AQE's runtime size estimate picks broadcast vs
  shuffle — an explicit hint on customer/part/supplier would OOM
  executors at 100x.
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key once;
  groupBy keys are chosen to reuse that partitioning where possible.
- filters precede joins so parquet scan pushdown prunes early
  (verify with .explain(): PushedFilters on the scan node).
- numeric convention: see functions.numeric (decimal-exact aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbitool_spark import catalog
from dbitool_spark.functions.numeric import davg, dsum, money, rate


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scanwide agg on lineitem with computed measures.
    Single shuffle (groupBy on 2 low-cardinality keys); partial
    aggregation map-side makes the shuffle tiny at any scale."""
    li = catalog.load(spark, sf_dir, "lineitem")
    qty = money("l_quantity")
    price = money("l_extendedprice")
    disc = rate("l_discount")
    tax = rate("l_tax")
    disc_price = price * (F.lit(1).cast("decimal(6,4)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(6,4)") + tax)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty, "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(qty, "avg_qty"),
            davg(price, "avg_price"),
            davg(disc, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_charge,
       CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,2))), 4) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 4) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(CAST(round(SUM(CAST(l_discount AS DECIMAL(6,4))), 4) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, agg, deterministic top-10.
    customer is filtered before the join (segment predicate pushed to
    scan) and projected to the single join column; no explicit
    broadcast hint — customer scales with SF, so AQE decides broadcast
    vs shuffle from the filtered size at runtime. orders⋈lineitem
    shuffles on orderkey once and the subsequent
    groupBy(l_orderkey, ...) reuses that hash partitioning — no second
    shuffle of the fact data."""
    cust = (
        catalog.load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = catalog.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. Constant-size dims (nation,
    region) are broadcast-hinted via catalog.maybe_broadcast; customer
    and supplier scale with SF, so those joins are left to AQE (they
    shuffle on their keys at 100 TB, broadcast at small SF — the
    runtime size estimate picks). The c_nationkey = s_nationkey
    condition makes it a genuine multi-predicate join."""
    region = catalog.maybe_broadcast("region", catalog.load(spark, sf_dir, "region"))
    nation = catalog.maybe_broadcast("nation", catalog.load(spark, sf_dir, "nation"))
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = catalog.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = catalog.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = catalog.load(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT r_name, n_name,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name
"""


def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-k: 3 highest-revenue parts per brand.
    The lineitem agg shrinks to one row per partkey before joining
    part; part scales with SF (~2B rows at 100 TB) so no broadcast
    hint — both sides are partkey-keyed and AQE picks the strategy.
    The window partitions by brand (low cardinality — AQE handles any
    skew)."""
    part = catalog.load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    li = catalog.load(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    per_part = (
        li.groupBy("l_partkey")
        .agg(dsum(revenue, "revenue"))
        .join(part, F.col("l_partkey") == part.p_partkey)
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_name", "revenue", "rank")
        .orderBy("p_brand", "rank")
    )


TOP_PARTS_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand, p_name, revenue, rank FROM (
  SELECT p_brand, p_name, revenue,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS rank
  FROM per_part JOIN part ON l_partkey = p_partkey
) WHERE rank <= 3
ORDER BY p_brand, rank
"""


def customer_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation variety: count distinct, conditional agg, min/max.
    Per-segment distinct nation count is exact (COUNT DISTINCT
    shuffles once on the group key)."""
    cust = catalog.load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            dsum(money("c_acctbal"), "sum_acctbal"),
            davg(money("c_acctbal"), "avg_acctbal"),
            F.min(money("c_acctbal")).cast("double").alias("min_acctbal"),
            F.max(money("c_acctbal")).cast("double").alias("max_acctbal"),
            F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        )
        .orderBy("c_mktsegment")
    )


CUSTOMER_SEGMENT_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_acctbal,
       CAST(CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 4) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_acctbal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_acctbal,
       COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets over (returnflag, linestatus); NULL group
    markers replaced with 'ALL' so the hash comparison is well-defined
    across engines."""
    li = catalog.load(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


REVENUE_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join with a genuinely non-empty difference set: customers
    that placed no order on/after 2001-01-01 (order dates in the test
    data run 1995-01 .. 2001-08, so both sides of the split are
    populated at every SF). The anti side is filtered + projected to
    the single key column before the join; both sides shuffle on
    custkey — the anti-join is a plain shuffled hash join at scale,
    never a driver-side key collection. Oracle uses NOT EXISTS (not
    NOT IN) so NULL keys can't silently flip semantics vs left_anti."""
    cust = catalog.load(spark, sf_dir, "customer")
    recent = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_inactive"),
            dsum(money("c_acctbal"), "sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


CUSTOMERS_WITHOUT_RECENT_ORDERS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_inactive,
       CAST(CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join from orders to lineitem with a
    date-window filter — semi-join avoids materializing the (huge)
    match multiplicity. Date windows sit inside the generated data's
    ranges (orders 1995-01..2001-08, shipdates 1995-01..2001-11) so
    the result is non-empty at every SF — a real correctness check,
    not a 0-rows-vs-0-rows tautology."""
    orders = catalog.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp_ntz")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side filter + global agg — the query
    whose entire cost is how much the parquet scan prunes. All three
    predicates push to the scan (PushedFilters on shipdate bounds and
    quantity; discount compares raw doubles, identical literals in
    both engines). No shuffle beyond the single-row final agg."""
    li = catalog.load(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * rate("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(revenue, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.05 AS DOUBLE)
  AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional trade volume between two nations
    by ship year. Scale shape: the nation dims are FILTERED to the two
    names BEFORE touching any fact table, so the (broadcast) nation
    joins against supplier/customer act as semi-join pruners — only
    suppliers/customers of the two nations (~2/25 of each) survive
    into the fact joins, and the big lineitem⋈orders orderkey shuffle
    carries only pre-pruned rows (~12× fewer than filtering the pair
    AFTER all four joins, the r4 plan). The residual pair|rpair filter
    then only drops the two same-nation combinations."""
    n1 = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        ),
    )
    n2 = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        ),
    )
    supp = (
        catalog.load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(n1, F.col("s_nationkey") == n1.s_nkey)
    )
    cust = (
        catalog.load(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(n2, F.col("c_nationkey") == n2.c_nkey)
    )
    orders = catalog.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = catalog.load(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)  # prunes lineitem first
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)  # prunes the order side
        .filter(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


NATION_TRADE_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    items in one quarter. Filters precede joins (returnflag and the
    order-date window push to the scans); nation broadcasts; the
    orders⋈lineitem shuffle on orderkey carries only the filtered
    quarter. Deterministic top-k: ties broken by custkey."""
    cust = catalog.load(spark, sf_dir, "customer")
    nation = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
    )
    orders = catalog.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = catalog.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue, "lost_revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


RETURNED_ITEM_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS lost_revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one ship month.
    lineitem is filtered to the month BEFORE the part join (scan
    pushdown), then one join on partkey; the share is a conditional
    aggregate — numerator and denominator in a single pass, no second
    scan. Division happens double/double on decimal-exact parts (the
    davg convention) so both engines round identically."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = catalog.load(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast("decimal(19,6)")))
        .cast("decimal(18,2)").cast("double").alias("promo_rev"),
        F.sum(revenue).cast("decimal(18,2)").cast("double").alias("total_rev"),
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_share_pct"),
    )


PROMO_REVENUE_SQL = """
WITH agg AS (
  SELECT
    CAST(CAST(round(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
          ELSE CAST(0 AS DECIMAL(19,6)) END), 2) AS DECIMAL(18,2)) AS DOUBLE) AS promo_rev,
    CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
)
SELECT promo_rev, total_rev,
       CAST(100.0 AS DOUBLE) * promo_rev / total_rev AS promo_share_pct
FROM agg
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed a total-quantity
    threshold. The HAVING runs on the lineitem aggregate BEFORE any
    join (groupBy orderkey -> filter), so only qualifying orderkeys —
    a tiny set — reach the orders/customer joins; AQE broadcasts that
    side. Deterministic top-50 by (total_qty desc, o_orderkey)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(money("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 170)
    )
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            money("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


LARGE_VOLUME_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
       total_qty
FROM (
  SELECT l_orderkey,
         CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 170
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


def brand_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of (brand, size-range,
    quantity-range) brackets across the lineitem⋈part join. The OR
    tree references both sides, so Catalyst can push only the
    per-side residuals (quantity/size IsNotNull + range hull) — the
    interesting planner case this query exists to pin. One join on
    partkey, conditional bracket labeling, grouped totals."""
    li = catalog.load(spark, sf_dir, "lineitem")
    part = catalog.load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(20, 30)
    )
    bracket = (
        F.when(b1, F.lit("bracket_1")).when(b2, F.lit("bracket_2")).when(b3, F.lit("bracket_3"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(b1 | b2 | b3)
        .groupBy(bracket.alias("bracket"))
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("bracket")
    )


BRAND_BRACKET_SQL = """
SELECT CASE
         WHEN p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11 THEN 'bracket_1'
         WHEN p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20 THEN 'bracket_2'
         ELSE 'bracket_3' END AS bracket,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
GROUP BY 1
ORDER BY bracket
"""


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of revenue
    delivered into one customer region, by ship year. Region/nation
    broadcast (constant-size); the share is a conditional aggregate
    over the already-joined rows — numerator and denominator in one
    pass, division double/double on decimal-exact parts."""
    region = catalog.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation_c = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation")
        .join(
            catalog.maybe_broadcast("region", region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nkey")),
    )
    nation_s = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        ),
    )
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = catalog.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = catalog.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = catalog.load(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", revenue).otherwise(
        F.lit(0).cast("decimal(19,6)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation_c, cust.c_nationkey == F.col("c_nkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation_s, supp.s_nationkey == F.col("s_nkey"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(target).cast("decimal(18,2)").cast("double").alias("nation_rev"),
            F.sum(revenue).cast("decimal(18,2)").cast("double").alias("total_rev"),
        )
        .select(
            "l_year",
            "nation_rev",
            "total_rev",
            (F.col("nation_rev") / F.col("total_rev")).alias("market_share"),
        )
        .orderBy("l_year")
    )


NATION_MARKET_SHARE_SQL = """
WITH asia_cust AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
base AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) AS rev,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN asia_cust ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
)
SELECT l_year,
       CAST(CAST(round(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE CAST(0 AS DECIMAL(19,6)) END), 2) AS DECIMAL(18,2)) AS DOUBLE) AS nation_rev,
       CAST(CAST(round(SUM(rev), 2) AS DECIMAL(18,2)) AS DOUBLE) AS total_rev,
       CAST(CAST(round(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE CAST(0 AS DECIMAL(19,6)) END), 2) AS DECIMAL(18,2)) AS DOUBLE)
         / CAST(CAST(round(SUM(rev), 2) AS DECIMAL(18,2)) AS DOUBLE) AS market_share
FROM base
GROUP BY l_year
ORDER BY l_year
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of order counts per customer
    (how many customers placed k orders), including the zero bucket
    via a LEFT join. The non-urgent filter makes the outer join
    non-trivial (it must run BEFORE the join, on the orders scan, and
    NULL-extend rather than drop filtered-out customers). Two
    aggregations: per-customer count (shuffle on custkey), then the
    tiny distribution aggregate."""
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
             WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


DORMANT_CUTOFF = "1999-01-01"


def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no RECENT orders (none on/after DORMANT_CUTOFF — the synthetic
    corpus gives every customer at least one lifetime order, so the
    pure no-orders predicate is vacuous at every SF; the dated variant
    keeps Q22's plan shape non-trivial). The scalar average is a 1-row
    aggregate cross-joined in (broadcast, no shuffle of the customer
    side); the dormancy predicate is a LEFT ANTI join on custkey
    against the date-filtered orders scan (the filter reaches the
    parquet scan, so the anti join's build side shrinks before any
    shuffle). Balance arithmetic follows the decimal-exact convention
    so the threshold comparison and the sum hash identically
    cross-engine."""
    cust = catalog.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", money("c_acctbal").alias("bal")
    )
    avg_bal = cust.filter(F.col("bal") > 0).agg(
        davg(F.col("bal"), "avg_bal", scale=2)
    )
    orders = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(avg_bal)
        .filter(F.col("bal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("bal"), "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


DORMANT_RICH_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer
),
avg_bal AS (
  SELECT CAST(CAST(round(SUM(bal), 2) AS DECIMAL(18,2)) AS DOUBLE) / COUNT(bal) AS avg_bal
  FROM cust WHERE bal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(CAST(round(SUM(bal), 2) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
FROM cust, avg_bal
WHERE bal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '{DORMANT_CUTOFF}')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def supplier_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the schema ships no partsupp table, so
    profit is discounted revenue rather than revenue - supplycost):
    revenue by supplier nation x ship year for parts whose name
    carries a marker substring. 3-way join: lineitem ⋈ part (filter
    pushed to the part scan, AQE-sized join) ⋈ supplier ⋈ nation
    (broadcast — constant-size dim via maybe_broadcast)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    part = (
        catalog.load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    supp = catalog.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
    )
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(revenue, "profit"))
        .orderBy("nation", F.desc("l_year"))
    )


SUPPLIER_NATION_PROFIT_SQL = """
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, l_year DESC
"""


def priority_by_shipyear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no shipmode/commitdate columns, so
    the bucketing key is the ship year): high- vs low-priority order
    line counts per year — the dual conditional aggregate over one
    fact-fact join, computed in a single pass (both CASE sums share
    the shuffle)."""
    li = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_year")
    )


PRIORITY_BY_SHIPYEAR_SQL = """
SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY year(l_shipdate)
ORDER BY l_year
"""


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: suppliers whose 1996 revenue equals the
    maximum (ALL ties kept — the view + scalar-max semantics),
    realized as an unpartitioned max window over the per-supplier
    aggregate. The window input is |suppliers| rows (already reduced),
    so the single-partition window is a deliberate bounded step on an
    aggregate, not a global sort of the fact table."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    revenue = money("l_extendedprice") * (F.lit(1).cast("decimal(6,4)") - rate("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(dsum(revenue, "total_revenue"))
    w = Window.partitionBy()
    best = per_supp.withColumn("max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    supp = catalog.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(supp, best.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_REVENUE_SUPPLIERS_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitem rows
    of one brand whose quantity is below 50% of that part's average
    quantity. The correlated scalar subquery decorrelates into a
    per-part average aggregate joined back to the fact rows (the
    standard Catalyst rewrite, made explicit): the avg side is
    |parts| rows post-agg, so AQE broadcasts it; the division by 7
    follows Q17's final form. Threshold compare uses the exact
    decimal sum / exact count in BOTH engines."""
    part = (
        catalog.load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = catalog.load(spark, sf_dir, "lineitem").select(
        "l_partkey", money("l_quantity").alias("qty"), money("l_extendedprice").alias("price")
    )
    branded = li.join(part, li.l_partkey == part.p_partkey)
    avg_qty = branded.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum("qty").cast("decimal(18,2)").alias("sum_qty"),
        F.count("qty").alias("n_qty"),
    )
    out = (
        branded.join(avg_qty, branded.l_partkey == F.col("a_partkey"))
        .filter(
            F.col("qty").cast("double")
            < F.lit(0.5) * (F.col("sum_qty").cast("double") / F.col("n_qty"))
        )
        .agg(dsum(F.col("price"), "total_price"))
        .select((F.col("total_price") / F.lit(7.0)).alias("avg_yearly"))
    )
    return out


SMALL_QUANTITY_REVENUE_SQL = """
WITH branded AS (
  SELECT l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
),
avg_qty AS (
  SELECT l_partkey AS a_partkey,
         CAST(CAST(round(SUM(qty), 2) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
         COUNT(qty) AS n_qty
  FROM branded GROUP BY l_partkey
)
SELECT CAST(CAST(round(SUM(price), 2) AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly
FROM branded JOIN avg_qty ON l_partkey = a_partkey
WHERE CAST(qty AS DOUBLE) < 0.5 * (sum_qty / n_qty)
"""


# ===================== partsupp fixture + the five blocked TPC-H shapes
#
# The shipped testdata has no partsupp table, so TPC-H Q2/Q11/Q16/Q20
# (and Q21's receipt/commit dates) were data-blocked through r7. The
# fixture below derives a deterministic partsupp from part × supplier —
# TestRow-style procedural seeding (FIXTURES.md §C): 4 suppliers per
# part at (p_partkey*7 + i*3) mod |supplier| (the 4 keys are distinct
# whenever |supplier| > 9 and not divisible by 3 — true at every
# shipped SF: 10/100/1000), availqty and supplycost from independent
# LCG-ish mixes. Both engines compute the SAME rows from the same
# parquet inputs (the oracle repeats the derivation as a CTE), so every
# query below remains an exact value-hash check. supplycost is carried
# as integer CENTS end-to-end — sums and comparisons stay in exact
# bigint arithmetic; division by 100.0 happens once at emission (a
# single correctly-rounded IEEE op, bit-identical cross-engine).

_PS_PER_PART = 4

PARTSUPP_FIXTURE_SQL = """
WITH s_cnt AS (SELECT COUNT(*) AS c FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + i.i * 3) % s_cnt.c AS ps_suppkey,
         (p_partkey * 13 + ((p_partkey * 7 + i.i * 3) % s_cnt.c) * 7) % 9999 + 1 AS ps_availqty,
         (p_partkey * 29 + ((p_partkey * 7 + i.i * 3) % s_cnt.c) * 23) % 90000 + 10000 AS ps_cost_cents
  FROM part CROSS JOIN s_cnt CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp fixture as a DataFrame: part × a 1-row supplier
    count (AQE broadcasts the scalar side — no shuffle of part) ×
    exploded i in 0..3. Columns: ps_partkey bigint, ps_suppkey bigint,
    ps_availqty bigint, ps_cost_cents bigint. Scales linearly with
    part (4 rows per part) at any SF; generation is pure projection —
    no shuffle, no driver edge."""
    part = catalog.load(spark, sf_dir, "part").select("p_partkey")
    s_cnt = (
        catalog.load(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("_s_cnt"))
    )
    sk = (F.col("p_partkey") * 7 + F.col("i") * 3) % F.col("_s_cnt")
    return (
        part.crossJoin(s_cnt)
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(_PS_PER_PART)])).alias("i"),
            "_s_cnt",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            sk.cast("bigint").alias("ps_suppkey"),
            ((F.col("p_partkey") * 13 + sk * 7) % 9999 + 1).cast("bigint").alias("ps_availqty"),
            ((F.col("p_partkey") * 29 + sk * 23) % 90000 + 10000).cast("bigint").alias("ps_cost_cents"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated-subquery pattern: for EUROPE
    suppliers of ECONOMY parts, keep only the supplier(s) offering the
    region-wide MINIMUM supplycost for that part. Spark-first
    decorrelation: build the regional partsupp once (supplier ⋈
    nation/region broadcast dims), derive min cost per part with one
    groupBy, join back on (partkey, cost) — the standard rewrite of
    TPC-H's correlated MIN subquery; the fixture side never runs
    twice. Deterministic total order (acctbal DESC, then unique
    (partkey, suppkey)) before the LIMIT so the top-100 is
    hash-stable."""
    ps = _partsupp(spark, sf_dir)
    part = (
        catalog.load(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_brand")
    )
    supp = catalog.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    nation = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        ),
    )
    region = catalog.maybe_broadcast(
        "region",
        catalog.load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey"),
    )
    # regional supplier offers: partsupp restricted to EUROPE suppliers
    euro_supp = supp.join(nation, supp.s_nationkey == nation.n_nationkey).join(
        region, F.col("n_regionkey") == F.col("r_regionkey")
    )
    offers = ps.join(euro_supp, ps.ps_suppkey == euro_supp.s_suppkey)
    min_cost = offers.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_cost_cents").alias("m_cents")
    )
    return (
        offers.join(
            min_cost,
            (offers.ps_partkey == F.col("m_partkey"))
            & (offers.ps_cost_cents == F.col("m_cents")),
        )
        .join(part, offers.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.col("ps_cost_cents") / F.lit(100.0)).alias("ps_supplycost"),
            "ps_suppkey",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "ps_suppkey")
        .limit(100)
    )


Q2_SQL = PARTSUPP_FIXTURE_SQL + """
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       ps_cost_cents / 100.0 AS ps_supplycost,
       ps_suppkey
FROM partsupp
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN part ON ps_partkey = p_partkey
WHERE r_name = 'EUROPE'
  AND p_type = 'ECONOMY' AND p_size <= 25
  AND ps_cost_cents = (
    SELECT MIN(ps2.ps_cost_cents)
    FROM partsupp ps2
    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
LIMIT 100
"""


Q11_NATION = "NATION_9"  # the largest supplier nation in the fixture data
Q11_FRACTION_DEN = 1000  # HAVING value > total/1000 (TPC-H's fixed-fraction form)


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — groupwise HAVING against a scalar subquery
    over the SAME aggregation input: per-part stock value (cost × qty)
    for one nation's suppliers, kept only when above 1/1000 of that
    nation's total. Arithmetic stays in exact bigint cents throughout
    (value*1000 > total, not value > total*1e-3); the national total
    is a 1-row aggregate cross-joined in (AQE broadcast). Like TPC-H's
    fixed FRACTION, selectivity tightens as SF grows."""
    ps = _partsupp(spark, sf_dir)
    supp = catalog.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q11_NATION)
        .select("n_nationkey"),
    )
    national = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == F.col("n_nationkey"))
        .select("ps_partkey", (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"))
    )
    per_part = national.groupBy("ps_partkey").agg(F.sum("v").alias("value_cents"))
    total = national.agg(F.sum("v").alias("total_cents"))
    return (
        per_part.crossJoin(total)
        .filter(F.col("value_cents") * Q11_FRACTION_DEN > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("value_cents") / F.lit(100.0)).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


Q11_SQL = PARTSUPP_FIXTURE_SQL + f"""
, national AS (
  SELECT ps_partkey, ps_cost_cents * ps_availqty AS v
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
)
SELECT ps_partkey, SUM(v) / 100.0 AS stock_value
FROM national
GROUP BY ps_partkey
HAVING SUM(v) * {Q11_FRACTION_DEN} > (SELECT SUM(v) FROM national)
ORDER BY stock_value DESC, ps_partkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — COUNT(DISTINCT) over an excluded-category
    join: how many distinct suppliers offer each surviving (brand,
    type, size) combination. The brand/size exclusions push to the
    part scan; the distinct count shuffles once on the (already
    joined) group keys. (TPC-H's supplier-complaint NOT IN is dropped
    — the schema ships no s_comment column.)"""
    ps = _partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    part = (
        catalog.load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = PARTSUPP_FIXTURE_SQL + """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


Q20_NATION = "NATION_9"
Q20_YEAR = 1996


def q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — nested semi-joins with a correlated aggregate:
    suppliers (in one nation) holding excess stock of 'small' parts,
    where excess means ps_availqty > half the quantity they shipped of
    that part in one year. Decorrelation: the per-(part, supplier)
    shipped quantity is ONE groupBy over the year-filtered lineitem
    scan, inner-joined to partsupp (TPC-H's NULL-subquery rows drop out
    exactly like the inner join drops them); the availqty comparison
    runs in exact decimal (qty sums are integer-valued doubles — exact
    in DECIMAL(18,2) both engines). Part-name and supplier filters are
    semi-joins, nation is a broadcast dim."""
    ps = _partsupp(spark, sf_dir)
    small_parts = (
        catalog.load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q20_YEAR}-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(f"{Q20_YEAR + 1}-01-01").cast("timestamp_ntz"))
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("sh_partkey"), F.col("l_suppkey").alias("sh_suppkey")
    ).agg(F.sum(money("l_quantity")).alias("sh_qty"))
    excess = (
        ps.join(small_parts, ps.ps_partkey == small_parts.p_partkey, "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == F.col("sh_partkey")) & (ps.ps_suppkey == F.col("sh_suppkey")),
        )
        .filter(
            (F.col("ps_availqty") * 2).cast("decimal(18,2)") > F.col("sh_qty") * 1
        )
        .select("ps_suppkey")
        .distinct()
    )
    supp = catalog.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q20_NATION)
        .select("n_nationkey"),
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(nation, supp.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )


Q20_SQL = PARTSUPP_FIXTURE_SQL + f"""
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND CAST(ps_availqty * 2 AS DECIMAL(18,2)) > (
        SELECT SUM(CAST(l_quantity AS DECIMAL(12,2)))
        FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '{Q20_YEAR + 1}-01-01 00:00:00'
      )
  )
ORDER BY s_name, s_suppkey
"""


Q21_NATION = "NATION_9"


def _late_cond(ok, ln):
    """Derived lateness predicate: the testdata ships no
    l_receiptdate/l_commitdate, so Q21's 'received after committed'
    uses deterministic day offsets derived from the line identity —
    receipt_days = (orderkey*5 + linenumber*11) % 45 vs commit_days =
    (orderkey*3 + linenumber*7) % 30. Same derivation in the oracle;
    the multi-EXISTS shape (the point of Q21) is untouched."""
    return (ok * 5 + ln * 11) % 45 > (ok * 3 + ln * 7) % 30


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the multi-EXISTS / NOT-EXISTS pattern: count,
    per supplier in one nation, the finished orders where THIS
    supplier's line was late, at least one OTHER supplier contributed
    a line (EXISTS → left-semi on a non-equal pair condition), and no
    OTHER supplier was late (NOT EXISTS → left-anti). Both side
    queries are self-joins of the projected lineitem scan on
    l_orderkey; the anti join's build side is pre-filtered to late
    lines only."""
    li = catalog.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        _late_cond(F.col("l_orderkey"), F.col("l_linenumber")).alias("late"),
    )
    l1 = li.filter(F.col("late"))
    orders = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("e_orderkey"), F.col("l_suppkey").alias("e_suppkey"))
    l3 = (
        li.filter(F.col("late"))
        .select(F.col("l_orderkey").alias("a_orderkey"), F.col("l_suppkey").alias("a_suppkey"))
    )
    waiting = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("e_orderkey"))
            & (F.col("l_suppkey") != F.col("e_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("a_orderkey"))
            & (F.col("l_suppkey") != F.col("a_suppkey")),
            "left_anti",
        )
    )
    supp = catalog.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = catalog.maybe_broadcast(
        "nation",
        catalog.load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q21_NATION)
        .select("n_nationkey"),
    )
    return (
        waiting.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(nation, supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         (l_orderkey * 5 + l_linenumber * 11) % 45
           > (l_orderkey * 3 + l_linenumber * 7) % 30 AS late
  FROM lineitem
)
SELECT s_name, COUNT(*) AS numwait
FROM li l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.late
  AND o_orderstatus = 'F'
  AND n_name = '{Q21_NATION}'
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def bucketed_orders_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join made driver-visible — the third leg of
    the ops/scale.py family (salted_agg and salted_join have
    skewed_user_rollup_events / skewed_segment_join_events; this
    covers write_bucketed + bucketed_join). orders and customer are
    persisted ONCE as 16-bucket managed tables on the customer key
    (the amortized shuffle), then joined and aggregated ON THE BUCKET
    KEY — the whole join + groupBy pipeline runs with ZERO Exchange
    on either fact path (bucketed scan -> sort -> SortMergeJoin ->
    partial+final agg reuse the bucket partitioning). At 100 TB this
    is the shape for a dimension repeatedly joined by many queries:
    pay the shuffle at ingest, never again.

    The oracle is the plain join + GROUP BY: a hash match proves the
    bucketed physical path is result-identical to the logical plan.
    Table names carry the SF so sf0.01 and sf0.1 runs never collide;
    overwrite mode makes re-runs idempotent."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    t_orders, t_cust = f"bkt_orders_{tag}", f"bkt_customer_{tag}"

    from dbitool_spark.ops import scale

    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_custkey", money("o_totalprice").alias("price")
    )
    cust = catalog.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    scale.write_bucketed(orders, t_orders, "o_custkey", n_buckets=16)
    scale.write_bucketed(cust, t_cust, "o_custkey", n_buckets=16)

    joined = scale.bucketed_join(spark, t_orders, t_cust, "o_custkey")
    return (
        joined.groupBy("o_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("price"), "sum_totalprice"),
        )
        .withColumnRenamed("o_custkey", "c_custkey")
        .orderBy("c_custkey")
    )


BUCKETED_ORDERS_CUSTOMER_SQL = """
SELECT o.o_custkey AS c_custkey, c.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
         AS sum_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
ORDER BY 1
"""
