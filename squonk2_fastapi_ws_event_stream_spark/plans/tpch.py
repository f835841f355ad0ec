"""TPC-H-style relational plans over the driver's test tables.

The reference has no relational algebra (SURVEY §2.11) — these queries
exercise the Spark-native surface that replaces it: scans with pushdown,
projections, hash/broadcast joins, aggregation, windows, set ops, subqueries,
rollup, top-k, range joins and as-of joins.

Scale notes per query are inline; the common rules:
- FIXED-SIZE dims (region 5 rows, nation 25) carry broadcast hints;
  SF-scaled tables (customer/supplier/part) join hint-free — AQE
  broadcasts them at runtime while they fit (a hint is never
  size-checked and job-fatal past the 8 GB broadcast cap),
- aggregates are decimal-summed (exact + map-side combinable; see
  functions/numeric.py),
- every ORDER BY used under a LIMIT has a unique tie-break key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum, dsum2
from ..tables import table


def _d(ts_col: str) -> F.Column:
    return F.date_format(F.col(ts_col), "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): scan + filter + hash aggregate.
# Scale: fully map-side-combinable; shuffle carries ≤ |flag × status| rows.
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum2("l_quantity").alias("sum_qty"),
            dsum2("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity", "decimal(18,2)").alias("avg_qty"),
            davg("l_extendedprice", "decimal(18,2)").alias("avg_price"),
            davg("l_discount", "decimal(18,6)").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_base_price,
  ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,10))) AS DOUBLE), 4) AS sum_disc_price,
  ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,10))) AS DOUBLE), 4) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — top customers by order revenue: join + agg + deterministic top-k.
# Scale: nation/region broadcast; top-k is sort+limit (TakeOrderedAndProject
# = per-partition partial top-k merged on the driver), NOT a global
# row_number window — an unpartitioned window would funnel every
# per-customer aggregate through one task at 100x. rank is attached by a
# window over the already-limited 15-row result, where a single partition
# is the point.
# ---------------------------------------------------------------------------
def q02_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    rev = orders.groupBy("o_custkey").agg(
        dsum2("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders")
    )
    order_cols = [F.col("revenue").desc(), F.col("c_custkey").asc()]
    top = (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "n_orders")
        .orderBy(*order_cols)
        .limit(15)
    )
    w = Window.orderBy(*order_cols)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "c_custkey", "c_name", "n_name", "revenue", "n_orders"
    )


ORACLE_Q02 = """
WITH rev AS (
  SELECT o_custkey,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC) AS INTEGER) AS rank,
       c_custkey, c_name, n_name, revenue, n_orders
FROM rev
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 15
"""


# ---------------------------------------------------------------------------
# q03 — shipping priority (TPC-H Q3): 3-way join + agg + top-k.
# Scale: filters push to all three scans; join keys are the natural
# distribution keys so AQE handles skew; LIMIT runs on the reduced agg.
# ---------------------------------------------------------------------------
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", _d("o_orderdate").alias("o_orderdate"), "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_Q03 = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,10))) AS DOUBLE), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q04 — order priority count (TPC-H Q4): EXISTS subquery as a LEFT SEMI join.
# Scale: semi join shuffles only the join keys; no row multiplication.
# ---------------------------------------------------------------------------
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q04 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q05 — regional supplier revenue (TPC-H Q5): 6-way join.
# Scale: region/nation broadcast-hinted (fixed size); customer/supplier
# join hint-free (they scale with SF — AQE broadcasts while they fit);
# orders⋈lineitem is the one unavoidable big shuffle.
# ---------------------------------------------------------------------------
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


ORACLE_Q05 = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,10))) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q06 — forecast revenue change (TPC-H Q6): pure scan-filter-agg, no joins.
# Scale: everything pushes to the parquet scan; the plan is one codegen stage.
# ---------------------------------------------------------------------------
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q06 = """
SELECT
  ROUND(CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,10))) AS DOUBLE), 4) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q07 — rollup: region → nation revenue hierarchy (GROUPING SETS family).
# Scale: rollup = one shuffle, partial aggregation at every level.
# ---------------------------------------------------------------------------
def q07_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(dsum2("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
        )
    )


ORACLE_Q07 = """
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# q08 — window functions: per-customer order history (row_number, lag,
# running sum). Scale: one shuffle on the partition key; frames are
# streaming-evaluable (no full-partition buffering).
# ---------------------------------------------------------------------------
def q08_order_history_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _d("o_orderdate").alias("order_date"),
        F.row_number().over(w).alias("order_seq"),
        F.lag(price_dec, 1).over(w).cast("double").alias("prev_price"),
        F.sum(price_dec).over(wsum).cast("double").alias("running_total"),
    )


ORACLE_Q08 = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq,
       CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_price,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
         AS running_total
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# ---------------------------------------------------------------------------
# q09 — set operations: nations with customers vs nations with suppliers.
# Scale: INTERSECT/EXCEPT over small distinct sets after early reduction.
# ---------------------------------------------------------------------------
def q09_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    cust_nations = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name").distinct()
    supp_nations = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_name").distinct()
    both = cust_nations.intersect(supp_nations).withColumn("tag", F.lit("BOTH"))
    cust_only = cust_nations.exceptAll(supp_nations).withColumn("tag", F.lit("CUSTOMER_ONLY"))
    supp_only = supp_nations.exceptAll(cust_nations).withColumn("tag", F.lit("SUPPLIER_ONLY"))
    return both.unionByName(cust_only).unionByName(supp_only).select("tag", "n_name")


ORACLE_Q09 = """
WITH cn AS (SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
     sn AS (SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
SELECT 'BOTH' AS tag, n_name FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
UNION ALL
SELECT 'CUSTOMER_ONLY' AS tag, n_name FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
UNION ALL
SELECT 'SUPPLIER_ONLY' AS tag, n_name FROM (SELECT n_name FROM sn EXCEPT SELECT n_name FROM cn)
"""


# ---------------------------------------------------------------------------
# q10 — anti join: customers who never ordered.
# Scale: LEFT ANTI shuffles only keys; returns ids, no payload explosion.
# ---------------------------------------------------------------------------
def q10_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# q11 — range join: orders binned into derived quarter dimension rows.
# Scale: the quarter dim is tiny → broadcast nested-loop join is the right
# physical plan; at 100 TB the probe side streams through it map-side.
# ---------------------------------------------------------------------------
def q11_quarter_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # Derive the quarter dim from min/max, not DISTINCT: a min/max agg is
    # map-side partial to ONE row (no wide shuffle of every order's
    # quarter), and `sequence()` expands it to the dim rows. The join is
    # INNER, so the superset of quarters between min and max is
    # result-identical to the oracle's DISTINCT form — empty quarters
    # match no orders and vanish. (Round 7: the DISTINCT derivation was
    # ~40% of q11's wall at sf0.1.)
    bounds = orders.agg(
        F.date_trunc("quarter", F.min("o_orderdate")).alias("q_min"),
        F.date_trunc("quarter", F.max("o_orderdate")).alias("q_max"),
    )
    quarters = bounds.select(
        F.explode(
            F.sequence("q_min", "q_max", F.expr("INTERVAL 3 MONTHS"))
        ).alias("q_start")
    ).withColumn("q_end", F.col("q_start") + F.expr("INTERVAL 3 MONTHS"))
    return (
        orders.join(
            F.broadcast(quarters),
            (F.col("o_orderdate") >= F.col("q_start")) & (F.col("o_orderdate") < F.col("q_end")),
        )
        .groupBy(F.date_format("q_start", "yyyy-MM-dd").alias("quarter"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum2("o_totalprice").alias("revenue"))
    )


ORACLE_Q11 = """
WITH quarters AS (
  SELECT DISTINCT date_trunc('quarter', o_orderdate) AS q_start,
         date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH AS q_end
  FROM orders
)
SELECT strftime(q_start, '%Y-%m-%d') AS quarter,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
FROM orders JOIN quarters
  ON o_orderdate >= q_start AND o_orderdate < q_end
GROUP BY strftime(q_start, '%Y-%m-%d')
"""


# ---------------------------------------------------------------------------
# q33 — customer cohort retention: customers grouped by first-order year,
# retention = fraction of the cohort that orders again in each later
# year. The classic subscription/engagement OLAP report. Plan: the
# first-order table is one (custkey)-keyed aggregate; activity joins it
# on custkey (shuffle join of two custkey-partitioned tables — the
# aggregate and the join REUSE the same partitioning, so Catalyst plans
# one exchange per side); cohort sizes broadcast back onto the tiny
# (cohort_year, order_year) grid.
# ---------------------------------------------------------------------------
def q33_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("order_year")
    )
    first = orders.groupBy("o_custkey").agg(
        F.min("order_year").alias("cohort_year")
    )
    sizes = first.groupBy("cohort_year").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        orders.join(first, "o_custkey")
        .select("cohort_year", "order_year", "o_custkey")
        .distinct()
        .groupBy("cohort_year", "order_year")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        active.join(F.broadcast(sizes), "cohort_year")
        .select(
            "cohort_year",
            "order_year",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (F.expr("n_active * 1000000 div cohort_size") / F.lit(1e6)).alias("retention"),
        )
    )


ORACLE_Q33 = """
WITH o AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS order_year FROM orders
),
first AS (
  SELECT o_custkey, MIN(order_year) AS cohort_year FROM o GROUP BY o_custkey
),
sizes AS (
  SELECT cohort_year, COUNT(*) AS cohort_size FROM first GROUP BY cohort_year
),
active AS (
  SELECT f.cohort_year, o.order_year, COUNT(DISTINCT o.o_custkey) AS n_active
  FROM o JOIN first f USING (o_custkey)
  GROUP BY f.cohort_year, o.order_year
)
SELECT a.cohort_year, a.order_year,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       a.n_active * 1000000 // s.cohort_size / 1e6 AS retention
FROM active a JOIN sizes s USING (cohort_year)
"""


# ---------------------------------------------------------------------------
# q34 — customer order-count distribution (TPC-H Q13 shape): how many
# customers placed exactly N orders, INCLUDING the zero-order customers a
# plain join would drop. Two aggregates: orders reduce to per-customer
# counts (map-side combinable), the left join attaches zeros, and the
# second groupBy is over ≤ max(N) distinct values — tiny. The left join
# shuffles on custkey, the natural key both sides already reduce on.
# ---------------------------------------------------------------------------
def q34_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select("n_orders", F.col("n_customers").cast("long").alias("n_customers"))
    )


ORACLE_Q34 = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
GROUP BY COALESCE(p.n_orders, 0)
"""



# ---------------------------------------------------------------------------
# q35 — part affinity (market-basket pairs): which parts are ordered
# together? The canonical fact-fact SELF-join: lineitem joins itself on
# l_orderkey (both sides shuffle on the SAME key → co-partitioned, one
# exchange each), p1 < p2 halves the pair space, and the per-order pair
# fan-out is bounded by order width (~7 items), never corpus size. Top-20
# by TakeOrderedAndProject.
# ---------------------------------------------------------------------------
Q35_TOP = 20


def q35_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No self-join: group each order's distinct parts into ONE sorted
    # array (a single shuffle, map-side combinable collect_set), then
    # expand p1<p2 pairs IN-ROW with array expressions — each pair appears
    # exactly once per order, so the count is a plain map-side-combinable
    # count, and the pair fan-out never crosses the network unaggregated
    # (the join variant shuffles the full pair explosion; measured ~40%
    # slower). Per-order work is width², bounded by order width.
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = per_order.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(ps, (p1, i) -> transform("
                    "slice(ps, i + 2, size(ps) - i - 1), "
                    "p2 -> struct(p1 AS p1, p2 AS p2)))"
                )
            )
        ).alias("pr")
    ).select("pr.p1", "pr.p2")
    order_cols = [
        F.col("n_orders").desc(), F.col("p1").asc(), F.col("p2").asc()
    ]
    top = (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(*order_cols)
        .limit(Q35_TOP)
    )
    w = Window.orderBy(*order_cols)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "p1", "p2", F.col("n_orders").cast("long").alias("n_orders")
    )


ORACLE_Q35 = f"""
WITH pairs AS (
  SELECT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
counted AS (
  SELECT p1, p2, COUNT(DISTINCT l_orderkey) AS n_orders
  FROM pairs GROUP BY p1, p2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_orders DESC, p1 ASC, p2 ASC)
            AS INTEGER) AS rank,
       p1, p2, CAST(n_orders AS BIGINT) AS n_orders
FROM counted
ORDER BY n_orders DESC, p1 ASC, p2 ASC
LIMIT {Q35_TOP}
"""



# ---------------------------------------------------------------------------
# q36 — supplier concentration (Herfindahl–Hirschman index) per nation:
# HHI = Σ share_i² over each nation's suppliers, the antitrust/market-
# structure staple. Cross-engine float discipline: revenues become exact
# integer CENTS, the squared sum runs in decimal(38,0) (1e10-cent
# suppliers square to 1e20 — wide but exact in both engines), and the
# single ratio is rounded once. Two shuffles: (nation, supplier) partial
# sums, then the per-nation combine.
# ---------------------------------------------------------------------------
def q36_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    per_supp = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    per_nation = per_supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev_cents").alias("total_cents"),
        F.sum(F.col("rev_cents") * F.col("rev_cents")).alias("sq_cents"),
    )
    return (
        per_nation.join(F.broadcast(nation), per_nation.s_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            # exact integer micros via decimal DIV (== DuckDB HUGEINT //):
            # both numerator and denominator are exact integer cents, so
            # no float enters until the final /1e6 of the same integer
            (
                F.expr(
                    "CAST(sq_cents * 1000000 div (total_cents * total_cents)"
                    " AS BIGINT)"
                )
                / F.lit(1e6)
            ).alias("hhi"),
        )
    )


ORACLE_Q36 = """
WITH per_supp AS (
  SELECT s.s_nationkey, l.l_suppkey,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS HUGEINT)) AS rev_cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
per_nation AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers,
         SUM(rev_cents) AS total_cents,
         SUM(rev_cents * rev_cents) AS sq_cents
  FROM per_supp GROUP BY s_nationkey
)
SELECT n.n_name,
       CAST(p.n_suppliers AS BIGINT) AS n_suppliers,
       CAST(p.sq_cents * 1000000 // (p.total_cents * p.total_cents)
            AS BIGINT) / 1e6 AS hhi
FROM per_nation p JOIN nation n ON p.s_nationkey = n.n_nationkey
"""


# ---------------------------------------------------------------------------
# q37 — product-line profit by supplier nation and order year (TPC-H Q9
# shape, minus partsupp — the test corpus has no supply-cost table, so
# profit is the discounted revenue): filter parts by a name token, join
# lineitem→part (SF-scaled: hint-free, AQE decides), lineitem→supplier→
# nation (nation fixed-size: broadcast hint), lineitem→orders for the
# year. One aggregate shuffle of |nation × year| groups, decimal-exact.
# ---------------------------------------------------------------------------
def q37_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", "o_year")
        .agg(
            dsum(profit).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_year").cast("int").alias("o_year"),
            "sum_profit",
            F.col("n_lines").cast("long").alias("n_lines"),
        )
    )


ORACLE_Q37 = """
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,10))) AS DOUBLE), 4) AS sum_profit,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
"""


# ---------------------------------------------------------------------------
# q38 — returned-item reporting (TPC-H Q10 shape): revenue lost to
# returns (l_returnflag = 'R') over a half-year order-date window
# (1996-01-01 to 1996-07-01 — wider than Q10's single quarter so the
# small-SF fixtures keep enough matching rows), per customer, top 20. customer/orders/lineitem all SF-scaled → hint-free joins;
# nation broadcast. Top-20 via orderBy+limit = TakeOrderedAndProject
# (per-partition partial top-k, no global sort).
# ---------------------------------------------------------------------------
Q38_TOP = 20


def q38_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).alias("revenue"))
    )
    order_cols = [F.col("revenue").desc(), F.col("c_custkey").asc()]
    top = agg.orderBy(*order_cols).limit(Q38_TOP)
    w = Window.orderBy(*order_cols)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        "revenue",
        F.col("c_acctbal").alias("c_acctbal"),
        F.col("n_name").alias("nation"),
    )


ORACLE_Q38 = f"""
WITH agg AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,10))) AS DOUBLE), 4) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC)
            AS INTEGER) AS rank,
       CAST(c_custkey AS BIGINT) AS c_custkey, c_name, revenue,
       c_acctbal, n_name AS nation
FROM agg
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q38_TOP}
"""


# ---------------------------------------------------------------------------
# q39 — shipping-lag service levels (TPC-H Q12 spirit — the corpus has no
# l_shipmode/l_receiptdate, so the lag is l_shipdate − o_orderdate and
# the mode axis becomes lag bands): per band, how many lines carried
# urgent-or-high priority orders vs the rest. One join (both sides
# SF-scaled, hint-free) + a 4-group aggregate; the band expression is a
# single codegen CASE chain.
# ---------------------------------------------------------------------------
def q39_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(lag < 0, "early")
        .when(lag <= 30, "on-time")
        .when(lag <= 90, "late")
        .otherwise("very-late")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(band.alias("lag_band"))
        .agg(
            F.sum(urgent.cast("long")).alias("high_priority_lines"),
            F.sum((~urgent).cast("long")).alias("low_priority_lines"),
            davg(lag, "decimal(18,2)", 4).alias("avg_lag_days"),
        )
        .select(
            "lag_band",
            F.col("high_priority_lines").cast("long").alias("high_priority_lines"),
            F.col("low_priority_lines").cast("long").alias("low_priority_lines"),
            "avg_lag_days",
        )
    )


ORACLE_Q39 = """
WITH lagged AS (
  SELECT datediff('day', o.o_orderdate, l.l_shipdate) AS lag,
         o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT CASE WHEN lag < 0 THEN 'early'
            WHEN lag <= 30 THEN 'on-time'
            WHEN lag <= 90 THEN 'late'
            ELSE 'very-late' END AS lag_band,
       CAST(SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT)
         AS high_priority_lines,
       CAST(SUM(CASE WHEN urgent THEN 0 ELSE 1 END) AS BIGINT)
         AS low_priority_lines,
       ROUND(CAST(SUM(CAST(lag AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)
         AS avg_lag_days
FROM lagged
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q40 — revenue-weighted median order price per market segment: the order
# price at which half the segment's REVENUE sits below (not half the
# orders — the robust "typical big order" statistic dashboards want when
# whales skew the mean). Weighted median = first order, in price order,
# whose cumulative revenue share crosses 50%.
#
# Scale: one (segment)-partitioned window over orders sorted by price —
# never a global sort; cumulative sums are exact decimal cents, and the
# 2×cum ≥ total comparison is pure integer arithmetic, so both engines
# pick the identical crossing row.
#
# Parallelism note: the window's unit of parallelism is the SEGMENT (5
# here), so once a single segment's orders outgrow one task's sort
# budget the exact answer moves to bucket+refine: pre-aggregate
# (segment, cents div W) partial sums (map-side-combinable, fully
# parallel), find the crossing bucket on the tiny bucket table, then
# run this exact window only over the one crossing bucket's rows —
# identical output (cum_before_bucket + within-bucket running sum
# crosses at the same order). Measured at sf0.1 the two-pass form is
# ~1.4x slower (two scans + two joins vs one 30k-row sort per segment),
# so the SIZE SWITCH (round-10 task #8): the exact single-window plan
# runs below Q40_BUCKET_THRESHOLD orders (a parquet-metadata count),
# the bucket+refine form above it. Both forms are exact and identical
# (tests/test_oracle_parity + test_q40_bucket_refine_matches); the
# plan-shape test pins which form runs at bench scale.
# ---------------------------------------------------------------------------
Q40_BUCKET_THRESHOLD = 50_000_000  # orders rows; ~10M-row per-segment sorts
Q40_BUCKET_W = 1_000_000  # bucket width in cents ($10k) — bounded domain


def _q40_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", cents.alias("cents")
    )


def _q40_publish(crossed: DataFrame) -> DataFrame:
    pick_w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").asc(), F.col("o_orderkey").asc()
    )
    return (
        crossed.withColumn("rn", F.row_number().over(pick_w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_mktsegment").alias("segment"),
            (F.col("cents").cast("double") / F.lit(100.0)).alias(
                "weighted_median_price"
            ),
            (
                F.expr("CAST(cum * 1000000 div total AS BIGINT)") / F.lit(1e6)
            ).alias("cum_share_at_median"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
    )


def _q40_single_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-pass form: one segment-partitioned sort window."""
    base = _q40_base(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").asc(), F.col("o_orderkey").asc()
    )
    wtot = Window.partitionBy("c_mktsegment")
    cum = (
        base.withColumn("cum", F.sum("cents").over(w))
        .withColumn("total", F.sum("cents").over(wtot))
        .withColumn("n_orders", F.count(F.lit(1)).over(wtot))
    )
    return _q40_publish(cum.filter(F.col("cum") * 2 >= F.col("total")))


def _q40_bucket_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-pass 100 TB form: (segment, cents DIV W) partial sums
    (map-side-combinable, fully parallel), crossing bucket found on the
    tiny bucket table, then the exact sort window over ONLY the crossing
    bucket's rows — cum_before_bucket + within-bucket running sum
    crosses at the identical order, so the output matches the
    single-window form bit for bit."""
    base = _q40_base(spark, sf_dir)
    bucketed = base.withColumn("b", F.expr(f"cents DIV {Q40_BUCKET_W}"))
    # Bounded bucket table: |segments| × price-domain/W rows.
    buckets = bucketed.groupBy("c_mktsegment", "b").agg(
        F.sum("cents").alias("b_sum"), F.count(F.lit(1)).alias("b_cnt")
    )
    wb = Window.partitionBy("c_mktsegment").orderBy(F.col("b").asc())
    wtot = Window.partitionBy("c_mktsegment")
    annotated = (
        buckets.withColumn("b_cum", F.sum("b_sum").over(wb))
        .withColumn("total", F.sum("b_sum").over(wtot))
        .withColumn("n_orders", F.sum("b_cnt").over(wtot))
        .withColumn("cum_before", F.col("b_cum") - F.col("b_sum"))
    )
    crossing = (
        annotated.filter(F.col("b_cum") * 2 >= F.col("total"))
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", "b", "cum_before", "total", "n_orders")
    )
    # Refine pass: only the crossing bucket's rows reach the sort window
    # (≤ corpus/W·heaviest-bucket rows per segment — the broadcast join
    # prunes everything else map-side).
    refined = bucketed.join(
        F.broadcast(crossing), ["c_mktsegment", "b"]
    )
    w_in = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").asc(), F.col("o_orderkey").asc()
    )
    cum = refined.withColumn(
        "cum", F.col("cum_before") + F.sum("cents").over(w_in)
    )
    return _q40_publish(cum.filter(F.col("cum") * 2 >= F.col("total")))


def q40_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parquet-metadata row count: cheap (no column scan) and the honest
    # switch signal — the failure mode is per-segment sort size, which
    # scales with the table.
    n = table(spark, sf_dir, "orders").count()
    if n <= Q40_BUCKET_THRESHOLD:
        return _q40_single_window(spark, sf_dir)
    return _q40_bucket_refine(spark, sf_dir)


ORACLE_Q40 = """
WITH base AS (
  SELECT c.c_mktsegment, o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100) AS HUGEINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cum AS (
  SELECT c_mktsegment, o_orderkey, cents,
         SUM(cents) OVER (PARTITION BY c_mktsegment
                          ORDER BY cents ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cents) OVER (PARTITION BY c_mktsegment) AS total,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_orders
  FROM base
),
crossed AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY cents ASC, o_orderkey ASC) AS rn
  FROM cum WHERE cum * 2 >= total
)
SELECT c_mktsegment AS segment,
       CAST(cents AS DOUBLE) / 100.0 AS weighted_median_price,
       CAST(cum * 1000000 // total AS BIGINT) / 1e6
         AS cum_share_at_median,
       CAST(n_orders AS BIGINT) AS n_orders
FROM crossed WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q41 — year-over-year revenue growth per nation: the trend report layered
# on q37's star join. One |nation × year| aggregate (decimal-exact), then
# a lag window over that tiny table — the window never touches fact rows.
# Growth is a ratio of two already-rounded decimals, rounded once more.
# ---------------------------------------------------------------------------
def q41_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").alias("o_year")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "o_year")
        .agg(dsum2("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("o_year").asc())
    return (
        yearly.withColumn("prev_revenue", F.lag("revenue").over(w))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_year").cast("int").alias("o_year"),
            "revenue",
            F.coalesce(F.col("prev_revenue"), F.lit(0.0)).alias("prev_revenue"),
            F.when(F.col("prev_revenue").isNull(), F.lit(0.0))
            .otherwise(
                F.expr(
                    "CAST((CAST(ROUND(revenue * 100) AS DECIMAL(38,0)) - CAST(ROUND(prev_revenue * 100) AS DECIMAL(38,0))) * 1000000 div CAST(ROUND(prev_revenue * 100) AS DECIMAL(38,0)) AS BIGINT)"
                )
                / F.lit(1e6)
            )
            .alias("yoy_growth"),
        )
    )


ORACLE_Q41 = """
WITH yearly AS (
  SELECT n.n_name, YEAR(o.o_orderdate) AS o_year,
         ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
           AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, YEAR(o.o_orderdate)
),
lagged AS (
  SELECT n_name, o_year, revenue,
         LAG(revenue) OVER (PARTITION BY n_name ORDER BY o_year ASC)
           AS prev_revenue
  FROM yearly
)
SELECT n_name AS nation, CAST(o_year AS INTEGER) AS o_year, revenue,
       COALESCE(prev_revenue, 0.0) AS prev_revenue,
       CASE WHEN prev_revenue IS NULL THEN 0.0
            ELSE CAST((CAST(ROUND(revenue * 100) AS HUGEINT)
                       - CAST(ROUND(prev_revenue * 100) AS HUGEINT)) * 1000000
                      // CAST(ROUND(prev_revenue * 100) AS HUGEINT) AS BIGINT)
                 / 1e6
       END AS yoy_growth
FROM lagged
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_top_customers": q02_top_customers,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_order_priority": q04_order_priority,
    "q05_regional_revenue": q05_regional_revenue,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_rollup_sales": q07_rollup_sales,
    "q08_order_history_windows": q08_order_history_windows,
    "q09_set_ops": q09_set_ops,
    "q10_customers_without_orders": q10_customers_without_orders,
    "q11_quarter_range_join": q11_quarter_range_join,
    "q33_cohort_retention": q33_cohort_retention,
    "q34_order_count_distribution": q34_order_count_distribution,
    "q35_part_affinity": q35_part_affinity,
    "q36_supplier_concentration": q36_supplier_concentration,
    "q37_profit_by_nation_year": q37_profit_by_nation_year,
    "q38_returned_items": q38_returned_items,
    "q39_ship_lag_priority": q39_ship_lag_priority,
    "q40_weighted_median": q40_weighted_median,
    "q41_yoy_revenue_growth": q41_yoy_revenue_growth,
}

ORACLES = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_top_customers": ORACLE_Q02,
    "q03_shipping_priority": ORACLE_Q03,
    "q04_order_priority": ORACLE_Q04,
    "q05_regional_revenue": ORACLE_Q05,
    "q06_forecast_revenue": ORACLE_Q06,
    "q07_rollup_sales": ORACLE_Q07,
    "q08_order_history_windows": ORACLE_Q08,
    "q09_set_ops": ORACLE_Q09,
    "q10_customers_without_orders": ORACLE_Q10,
    "q11_quarter_range_join": ORACLE_Q11,
    "q33_cohort_retention": ORACLE_Q33,
    "q34_order_count_distribution": ORACLE_Q34,
    "q35_part_affinity": ORACLE_Q35,
    "q36_supplier_concentration": ORACLE_Q36,
    "q37_profit_by_nation_year": ORACLE_Q37,
    "q38_returned_items": ORACLE_Q38,
    "q39_ship_lag_priority": ORACLE_Q39,
    "q40_weighted_median": ORACLE_Q40,
    "q41_yoy_revenue_growth": ORACLE_Q41,
}


# ---------------------------------------------------------------------------
# q42 — disjunctive-predicate revenue (TPC-H Q19 shape): three OR'd
# brand/size/quantity conjunctions over lineitem ⋈ part. The optimizer
# stress here is the DISJUNCTION: Catalyst must still push the common
# l_quantity bounds to the lineitem scan (derived from the OR branches)
# and keep the per-branch predicates as a post-join filter rather than
# exploding the join. The part side gets the classic Q19 pushdown: the
# part-only disjunction (brand, size) pre-filters part BEFORE the join,
# shrinking the build side ~1000x so hint-free AQE broadcasts it at
# runtime. part is SF-scaled, so a static broadcast hint is forbidden
# (SCALING.md:62); revenue uses the decimal recipe.
# ---------------------------------------------------------------------------
Q42_BRANCHES = (
    ("Brand#1", 5, 1, 11),
    ("Brand#7", 10, 10, 20),
    ("Brand#13", 15, 20, 30),
)


def q42_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Derived l_quantity bounds from the OR branches -> lineitem scan.
    q_lo = min(qlo for _, _, qlo, _ in Q42_BRANCHES)
    q_hi = max(qhi for _, _, _, qhi in Q42_BRANCHES)
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .filter((F.col("l_quantity") >= q_lo) & (F.col("l_quantity") <= q_hi))
    )
    # Part-only disjunction pushed to the part scan (the Q19 pushdown):
    # shrinks the build side ~1000x; AQE broadcasts at runtime, no hint.
    part_cond = reduce(
        lambda x, y: x | y,
        [
            (F.col("p_brand") == b) & (F.col("p_size") <= s)
            for b, s, _, _ in Q42_BRANCHES
        ],
    )
    part = (
        table(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_size")
        .filter(part_cond)
    )
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    branch = lambda b, s, qlo, qhi: (
        (F.col("p_brand") == b)
        & (F.col("p_size") <= s)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    cond = reduce(lambda x, y: x | y, [branch(*t) for t in Q42_BRANCHES])
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,10)"
    )
    return joined.filter(cond).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
    )


def _oracle_q42() -> str:
    branches = " OR ".join(
        f"(p_brand = '{b}' AND p_size <= {s}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, s, qlo, qhi in Q42_BRANCHES
    )
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,10))) AS DOUBLE), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {branches}
"""


QUERIES["q42_disjunctive_predicates"] = q42_disjunctive_predicates
ORACLES["q42_disjunctive_predicates"] = _oracle_q42()


# ---------------------------------------------------------------------------
# q43 — CDC MERGE (upsert/delete apply): apply a change batch
# (updates / deletes / inserts, derived deterministically from the
# snapshot) to the orders snapshot — the Delta/Iceberg MERGE INTO
# semantics expressed as a plain declarative plan: union snapshot +
# changes, one per-key window keeps the change when present, deletes
# drop out. The CDC-apply step every warehouse ingest runs.
#
# Scale: ONE shuffle (the per-key window) — no join at all; the change
# batch unions in map-side. At 100 TB the same plan applies per
# partition of a date-partitioned snapshot; row_number's per-key work is
# O(1) because a key carries at most one snapshot row + one change row.
# ---------------------------------------------------------------------------
def q43_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    snap = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.lit(0).alias("src"),
        F.lit("base").alias("version"),
    )
    orders = table(spark, sf_dir, "orders")
    upd = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        F.lit(1).alias("src"),
        F.lit("updated").alias("version"),
    )
    dele = orders.filter(F.col("o_orderkey") % 25 == 3).select(
        "o_orderkey",
        F.col("o_totalprice"),
        F.lit(1).alias("src"),
        F.lit("deleted").alias("version"),
    )
    ins = orders.filter(F.col("o_orderkey") % 40 == 7).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        (F.col("o_totalprice") * 2.0).alias("o_totalprice"),
        F.lit(1).alias("src"),
        F.lit("inserted").alias("version"),
    )
    unioned = snap.unionByName(upd).unionByName(dele).unionByName(ins)
    # Deterministic tie-break: at SF>=2 an inserted key (o_orderkey+10M)
    # can collide with a real orderkey, giving two src=1 rows per key.
    # upd/dele are disjoint (k%10==0 and k%25==3 is impossible mod 5),
    # so within (key, src) versions are distinct -> ordering by version
    # after src makes row_number deterministic in both engines.
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("src").desc(), F.col("version").asc()
    )
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("version") != "deleted"))
        .select(
            "o_orderkey",
            "o_totalprice",
            "version",
        )
    )


ORACLE_Q43 = """
WITH changes AS (
  SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
         'updated' AS version
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'deleted' AS version
  FROM orders WHERE o_orderkey % 25 = 3
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice * 2.0,
         'inserted' AS version
  FROM orders WHERE o_orderkey % 40 = 7
),
unioned AS (
  SELECT o_orderkey, o_totalprice, 0 AS src, 'base' AS version FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice, 1 AS src, version FROM changes
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY src DESC, version ASC) AS rn
  FROM unioned
)
SELECT o_orderkey, o_totalprice, version
FROM ranked WHERE rn = 1 AND version <> 'deleted'
"""


QUERIES["q43_cdc_merge"] = q43_cdc_merge
ORACLES["q43_cdc_merge"] = ORACLE_Q43


# ---------------------------------------------------------------------------
# q44 — RANGE-interval window frames: per customer, the rolling 30-day
# order revenue as of each order (RANGE BETWEEN INTERVAL 30 DAYS
# PRECEDING AND CURRENT ROW). The time-window frame every SLA/cohort
# dashboard leans on; Spark expresses the interval frame as a
# rangeBetween over an integer day number (same inclusive semantics as
# DuckDB's INTERVAL frame, tie rows are peers in both engines).
#
# Scale: ONE (o_custkey) hash exchange; the frame scan is a per-
# partition sliding accumulator, never a self-join. Decimal recipe for
# the windowed sum.
# ---------------------------------------------------------------------------
def q44_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    day_num = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    )
    w = Window.partitionBy("o_custkey").orderBy(day_num).rangeBetween(-30, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"),
            4,
        ).alias("rolling_revenue"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_window"),
    )


ORACLE_Q44 = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS day,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 4)
         AS rolling_revenue,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
"""


QUERIES["q44_rolling_revenue"] = q44_rolling_revenue
ORACLES["q44_rolling_revenue"] = ORACLE_Q44


# ---------------------------------------------------------------------------
# q45 — PIVOT report: nation x order-year revenue matrix in one
# aggregate. Spark's pivot with EXPLICIT values compiles to a single
# groupBy with one conditional aggregate per cell — no per-year scans,
# no transpose shuffle; the oracle is the equivalent conditional
# aggregation. Years are pinned (the generator's 1995-2001 span) so the
# output schema is deterministic.
#
# Scale: one (n_name) aggregate with map-side combine; nation resolves
# by broadcast (spec-fixed 25 rows).
# ---------------------------------------------------------------------------
Q45_YEARS = tuple(range(1995, 2002))


def q45_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    df = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("yr", F.year("o_orderdate"))
    )
    pivoted = (
        df.groupBy("n_name")
        .pivot("yr", list(Q45_YEARS))
        .agg(dsum2("o_totalprice"))
    )
    return pivoted.select(
        "n_name",
        *[
            F.coalesce(F.col(str(y)), F.lit(0.0)).alias(f"y{y}")
            for y in Q45_YEARS
        ],
    )


def _oracle_q45() -> str:
    cells = ",\n       ".join(
        f"COALESCE(ROUND(CAST(SUM(CASE WHEN year(o_orderdate) = {y}"
        f" THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 4), 0.0)"
        f" AS y{y}"
        for y in Q45_YEARS
    )
    return f"""
SELECT n_name,
       {cells}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES["q45_pivot_revenue"] = q45_pivot_revenue
ORACLES["q45_pivot_revenue"] = _oracle_q45()


# ---------------------------------------------------------------------------
# q46 — EXISTS / NOT EXISTS as semi/anti joins: customers who placed at
# least one 1-URGENT order but never had a returned lineitem. The
# correlated-subquery shape every warehouse audit query uses; Spark
# plans both as left-semi / left-anti hash joins (no row multiplication,
# no distinct needed — semi/anti output at most one row per customer).
#
# Scale: the returned-customer build side pre-filters lineitem to
# l_returnflag = 'R' at the scan (pushed filter) before the orderkey
# join; both semi and anti are plain shuffle joins, AQE broadcasts if a
# side fits. No hints (part of the bounded-broadcast discipline).
# ---------------------------------------------------------------------------
def q46_exists_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    returned = (
        orders.join(
            li.filter(F.col("l_returnflag") == "R"),
            orders.o_orderkey == F.col("l_orderkey"),
        ).select("o_custkey")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .join(returned, cust.c_custkey == returned.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_Q46 = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  WHERE o.o_custkey = c.c_custkey
                    AND l.l_returnflag = 'R')
"""


QUERIES["q46_exists_antijoin"] = q46_exists_antijoin
ORACLES["q46_exists_antijoin"] = ORACLE_Q46


# ---------------------------------------------------------------------------
# q48 — snapshot reconciliation diff: the audit twin of q43's CDC merge.
# Given the base snapshot and the merged result (base + the same change
# batch), classify every key as unchanged / changed / added / removed
# with ONE full-outer equi-join and report per-class counts plus the
# exact total price delta — the table-diff every warehouse runs to
# verify an ingest before swapping snapshots.
#
# Scale: one (o_orderkey) full-outer join (AQE picks the strategy, no
# hints) + a fixed-4-row aggregate; the delta sum uses the decimal
# recipe.
# ---------------------------------------------------------------------------
def q48_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    merged = q43_cdc_merge(spark, sf_dir).select(
        F.col("o_orderkey").alias("m_key"), F.col("o_totalprice").alias("m_price")
    )
    joined = base.join(
        merged, base.o_orderkey == merged.m_key, "full_outer"
    ).select(
        # q43 now publishes the raw parquet double, so the diff compares
        # raw vs raw — no float ROUND procedure on either side (the old
        # ROUND(b, 2) was itself a t09-class cross-engine comparison)
        F.when(F.col("o_orderkey").isNull(), "added")
        .when(F.col("m_key").isNull(), "removed")
        .when(F.col("o_totalprice") != F.col("m_price"), "changed")
        .otherwise("unchanged")
        .alias("diff_class"),
        F.abs(
            F.coalesce(F.col("m_price"), F.lit(0.0))
            - F.coalesce(F.col("o_totalprice"), F.lit(0.0))
        ).alias("delta"),
    )
    return joined.groupBy("diff_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(
            F.sum(F.col("delta").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_price_delta"),
    )


ORACLE_Q48 = f"""
WITH merged AS (
  SELECT o_orderkey AS m_key, o_totalprice AS m_price
  FROM ({ORACLE_Q43})
),
base AS (SELECT o_orderkey, o_totalprice FROM orders),
joined AS (
  SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
              WHEN m.m_key IS NULL THEN 'removed'
              WHEN b.o_totalprice <> m.m_price THEN 'changed'
              ELSE 'unchanged' END AS diff_class,
         ABS(COALESCE(m.m_price, 0.0)
             - COALESCE(b.o_totalprice, 0.0)) AS delta
  FROM base b FULL OUTER JOIN merged m ON b.o_orderkey = m.m_key
)
SELECT diff_class,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       ROUND(CAST(SUM(CAST(delta AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_price_delta
FROM joined GROUP BY diff_class
"""


QUERIES["q48_snapshot_diff"] = q48_snapshot_diff
ORACLES["q48_snapshot_diff"] = ORACLE_Q48


# ---------------------------------------------------------------------------
# q55 — semi-additive measure rollup (month-end balance): the OLAP
# pattern plain SUM cannot express — a balance-like measure aggregates
# across ACCOUNTS but NOT across time; the period value is each
# account's LAST observation in the period, summed over accounts.
# Treating each customer's order stream as account activity, the
# month-end "balance" is the customer's latest o_totalprice in that
# month; the report is the per-month total, account count, and
# month-over-month delta.
#
# Shape: max_by per (customer, month) — an AGGREGATE, not a row_number
# window over the corpus (one shuffle on the grouping key, map-side
# combinable, no corpus-sized sort); ties are impossible because the
# ordering key packs (epoch_day, orderkey) into one BIGINT with the
# unique orderkey in the low digits (both engines compare the same
# integer).  The month rollup and the MoM lag() then operate on the
# CALENDAR-BOUNDED per-month table.  Balances sum in DECIMAL(18,2) —
# exact, order-independent (the functions/numeric.py contract).
#
# Scale: one (custkey, month) exchange + a calendar-bounded aggregate;
# no join, no hint, nothing corpus-sized past the first aggregate.
#
# Reference parity: no analog in the reference relay (app/app.py); part
# of the relational-extension family (q40/q44's sibling).
# ---------------------------------------------------------------------------
def q55_semi_additive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("epoch_day"),
    )
    eom = orders.groupBy("o_custkey", "month").agg(
        F.max_by(
            F.col("o_totalprice").cast("decimal(18,2)"),
            F.col("epoch_day") * 10_000_000_000 + F.col("o_orderkey"),
        ).alias("eom_balance")
    )
    monthly = eom.groupBy("month").agg(
        F.sum("eom_balance").alias("total_balance"),
        F.count(F.lit(1)).alias("n_accounts"),
    )
    mom = Window.orderBy("month")
    return monthly.select(
        "month",
        F.round(F.col("total_balance").cast("double"), 2).alias("total_balance"),
        F.col("n_accounts").cast("long").alias("n_accounts"),
        F.round(
            (
                F.col("total_balance")
                - F.coalesce(
                    F.lag("total_balance").over(mom),
                    F.lit(0).cast("decimal(18,2)"),
                )
            ).cast("double"),
            2,
        ).alias("mom_delta"),
    )


ORACLE_Q55 = """
WITH keyed AS (
  SELECT o_custkey,
         strftime(o_orderdate, '%Y-%m') AS month,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           * 10000000000 + o_orderkey AS ord_key,
         CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS price
  FROM orders
),
eom AS (
  SELECT o_custkey, month, arg_max(price, ord_key) AS eom_balance
  FROM keyed GROUP BY o_custkey, month
),
monthly AS (
  SELECT month, SUM(eom_balance) AS total_balance, COUNT(*) AS n_accounts
  FROM eom GROUP BY month
)
SELECT month,
       ROUND(CAST(total_balance AS DOUBLE), 2) AS total_balance,
       CAST(n_accounts AS BIGINT) AS n_accounts,
       ROUND(CAST(total_balance
                  - COALESCE(LAG(total_balance) OVER (ORDER BY month),
                             CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS mom_delta
FROM monthly
"""


QUERIES["q55_semi_additive_balance"] = q55_semi_additive_balance
ORACLES["q55_semi_additive_balance"] = ORACLE_Q55
