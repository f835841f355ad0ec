"""Round-2 relational surface widening: window frames.

q25 exercises the window-frame grammar the rest of the suite doesn't:
percent_rank / cume_dist / ntile ranking, nth_value, a ROWS frame
(moving sum over the 3 most recent orders) and a numeric RANGE frame
(trailing-30-day spend, keyed on days-since-epoch so both engines use a
plain numeric range — Spark's DataFrame API has no calendar-interval
range frames, and the SQL form diverges between engines).

Scale design: every window partitions by o_custkey — the work
distributes across customers with no single-partition exchange (the
q02/e08 lesson from round 1, applied from the start). Determinism: tie
columns (o_orderdate, o_orderkey) give a total order inside each
partition, so ntile/nth_value/ROWS frames are engine-stable; money sums
are cast to DECIMAL(18,2) before aggregation so summation order can't
perturb doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import table

EPOCH = "1992-01-01"


def q25_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            F.datediff(F.to_date("o_orderdate"), F.lit(EPOCH)).alias("day_num"),
        )
    )
    w_total = Window.partitionBy("o_custkey").orderBy("day_num", "o_orderkey")
    w_range30 = (
        Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-30, 0)
    )
    w_rows3 = w_total.rowsBetween(-2, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "day_num",
        F.round(F.percent_rank().over(w_total), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_total), 6).alias("cume_dist"),
        F.ntile(4).over(w_total).alias("quartile"),
        # Sums aggregate in DECIMAL (order-insensitive, exact); the final
        # cast to rounded DOUBLE is display-only, so pandas dtypes agree
        # between engines (DuckDB fetchdf renders DECIMAL as float64).
        F.round(F.first("price").over(w_total).cast("double"), 2).alias("first_price"),
        F.round(F.nth_value("price", 2).over(w_total).cast("double"), 2).alias("second_price"),
        F.round(F.sum("price").over(w_rows3).cast("double"), 2).alias("last3_sum"),
        F.round(F.sum("price").over(w_range30).cast("double"), 2).alias("trailing30d_sum"),
    )


ORACLE_Q25 = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         datediff('day', DATE '{EPOCH}', CAST(o_orderdate AS DATE)) AS day_num
  FROM orders WHERE o_custkey % 50 = 0
)
SELECT o_orderkey, o_custkey, day_num,
       ROUND(percent_rank() OVER w_total, 6) AS pct_rank,
       ROUND(cume_dist() OVER w_total, 6) AS cume_dist,
       ntile(4) OVER w_total AS quartile,
       ROUND(CAST(first_value(price) OVER w_total AS DOUBLE), 2) AS first_price,
       ROUND(CAST(nth_value(price, 2) OVER w_total AS DOUBLE), 2) AS second_price,
       ROUND(CAST(SUM(price) OVER (w_total ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 2) AS last3_sum,
       ROUND(CAST(SUM(price) OVER (PARTITION BY o_custkey ORDER BY day_num
                                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 2) AS trailing30d_sum
FROM o
WINDOW w_total AS (PARTITION BY o_custkey ORDER BY day_num, o_orderkey)
"""


QUERIES = {
    "q25_window_frames": q25_window_frames,
}

ORACLES = {
    "q25_window_frames": ORACLE_Q25,
}
