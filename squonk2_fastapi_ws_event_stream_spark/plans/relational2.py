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

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import register_views, table

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


# ---------------------------------------------------------------------------
# x07 — bloom-filter join pruning (runtime-filter pattern): build a bloom
# filter over the qualifying build side (orders of AUTOMOBILE customers),
# broadcast it, and pre-filter the probe side (lineitem) MAP-SIDE before any
# shuffle. At 100 TB this is the difference between shuffling the full fact
# table on the join key and shuffling only the ~selectivity fraction that can
# possibly match — the same trick Spark's own runtime row-group filtering
# plays, made explicit and engine-checkable.
#
# The bloom uses the repo's closed-form hash family ((a*key + b) mod P mod M,
# functions/hashing.py rationale) so Spark and DuckDB build bit-identical
# filters and agree on every false positive — the summary row hash-matches
# exactly. The filter itself is a REAL packed bitmap: 2^18 bits folded into
# 4096 64-bit words with a bit_or aggregate, shipped to every probe task as
# one broadcast map row (32 KB regardless of build-side cardinality), and
# probed with O(1) lookups — the shape that survives a 100-TB probe side.
# Invariant carried in the output: false_negatives MUST be 0 (a bloom never
# drops a true match); false_positives is the honest cost of the M sizing
# (2^18 bits / 3 hashes holds fp under ~3% up to ~30k build keys).
# ---------------------------------------------------------------------------
BLOOM_M = 1 << 18
BLOOM_AB = ((4973, 911), (7369, 2617), (9973, 4397))  # hashing.py prime family
_P = 1_000_000_007


def _bloom_pos_spark(key: "F.Column", a: int, b: int) -> "F.Column":
    return ((key * a + b) % _P) % BLOOM_M


def _bloom_pos_sql(key: str, a: int, b: int) -> str:
    return f"((({key}) * {a} + {b}) % {_P}) % {BLOOM_M}"


def x07_bloom_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    okeys = (
        table(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey")
    )
    # Build: positions → (word, bit) → bit_or per word → ONE map row.
    words = okeys.select(
        F.explode(
            F.array(*[_bloom_pos_spark(F.col("o_orderkey"), a, b) for a, b in BLOOM_AB])
        ).alias("p")
    ).select(
        (F.col("p") / 64).cast("long").alias("w"),
        # shiftleft's amount arg must be a literal in the Python API → expr
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
    )
    # Dense word array, not a map: Spark's element_at on a map is a linear
    # scan per lookup; on an array it is O(1). One row of 4096 longs.
    bitmap = (
        words.groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .agg(F.map_from_arrays(F.collect_list("w"), F.collect_list("bits")).alias("bm"))
        .select(
            F.expr(
                f"transform(sequence(0, {BLOOM_M // 64 - 1}),"
                " w -> coalesce(element_at(bm, CAST(w AS BIGINT)), CAST(0 AS BIGINT)))"
            ).alias("bloom")
        )
    )

    def _probe_bit(a: int, b: int) -> "F.Column":
        p = f"((l_orderkey * {a} + {b}) % {_P}) % {BLOOM_M}"
        return F.expr(
            f"bloom[CAST(({p}) / 64 AS INT)]"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT)) != 0"
        )

    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    probe = li.crossJoin(F.broadcast(bitmap)).withColumn(
        "bloom_pass",
        reduce(lambda x, y: x & y, [_probe_bit(a, b) for a, b in BLOOM_AB]),
    )
    truth = okeys.distinct().withColumn("is_match", F.lit(True))
    tagged = (
        probe.join(F.broadcast(truth), probe["l_orderkey"] == truth["o_orderkey"], "left")
        .withColumn("is_match", F.coalesce("is_match", F.lit(False)))
    )
    return tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_rows"),
        F.sum(F.col("bloom_pass").cast("long")).cast("long").alias("n_bloom_pass"),
        F.sum(F.col("is_match").cast("long")).cast("long").alias("n_true_match"),
        F.sum((F.col("bloom_pass") & ~F.col("is_match")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum((~F.col("bloom_pass") & F.col("is_match")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
    )


ORACLE_X07 = f"""
WITH okeys AS (
  SELECT o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'AUTOMOBILE'
),
bits AS (
  SELECT DISTINCT p FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql('o_orderkey', a, b)} AS p FROM okeys" for a, b in BLOOM_AB)}
  )
),
truth AS (SELECT DISTINCT o_orderkey FROM okeys),
probe AS (
  SELECT l.l_orderkey,
         ({" AND ".join(f"EXISTS (SELECT 1 FROM bits WHERE p = {_bloom_pos_sql('l.l_orderkey', a, b)})" for a, b in BLOOM_AB)})
           AS bloom_pass,
         (t.o_orderkey IS NOT NULL) AS is_match
  FROM lineitem l LEFT JOIN truth t ON l.l_orderkey = t.o_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_rows,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
       CAST(SUM(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       CAST(SUM(CASE WHEN NOT bloom_pass AND is_match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_neg
FROM probe
"""


# ---------------------------------------------------------------------------
# q26 — LATERAL correlated subquery (top-2 orders per BUILDING customer):
# the ANSI lateral-join surface, written once and run VERBATIM by both
# engines (the q20/q24 discipline). Catalyst decorrelates the per-customer
# ORDER BY ... LIMIT into a partitioned window + filter — no per-row
# re-execution of the inner query; DuckDB executes the same text natively.
# Scale: after decorrelation the plan is one shuffle on o_custkey with a
# per-key top-k — exactly the q02 TakeOrdered shape, per group.
# ---------------------------------------------------------------------------
SQL_Q26 = """
SELECT c.c_custkey, o.o_orderkey, o.price, o.rk
FROM customer c,
LATERAL (
  SELECT o_orderkey, ROUND(o_totalprice, 2) AS price,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) o
WHERE c.c_mktsegment = 'BUILDING'
"""


def q26_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    df = spark.sql(SQL_Q26)
    # Spark types ROW_NUMBER as int, DuckDB as bigint — pin the contract.
    return df.withColumn("rk", F.col("rk").cast("long"))


ORACLE_Q26 = SQL_Q26.replace("o.rk", "CAST(o.rk AS BIGINT) AS rk")


# ---------------------------------------------------------------------------
# x08 — stratified deterministic sampling: per-stratum rates (downsample the
# dominant class, keep the rare one) via the closed-form hash bucket of x03.
# The classic rebalancing stage of a training-data pipeline — and because
# the bucket is a pure function of the row key, the sample is identical on
# any engine, partitioning, or cluster size (no rand(), no seed plumbing).
# Map-side filter; the only shuffle is the final per-stratum count.
# ---------------------------------------------------------------------------
_X08_MIX = 2_654_435_761  # Knuth multiplicative mix (public constant)
X08_RATES = {"AUTOMOBILE": 80, "BUILDING": 40, "MACHINERY": 20, "FURNITURE": 10, "HOUSEHOLD": 5}


def x08_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    bucket = (F.col("c_custkey") * _X08_MIX % 1_000_003) % 100
    rate = None
    for seg, pct in X08_RATES.items():
        cond = F.when(F.col("c_mktsegment") == seg, F.lit(pct))
        rate = cond if rate is None else rate.when(F.col("c_mktsegment") == seg, F.lit(pct))
    sampled = cust.withColumn("rate_pct", rate.otherwise(F.lit(0))).filter(
        bucket < F.col("rate_pct")
    )
    return (
        sampled.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2)
            .alias("sampled_balance"),
        )
    )


def _oracle_x08() -> str:
    rate_case = " ".join(f"WHEN '{seg}' THEN {pct}" for seg, pct in X08_RATES.items())
    return f"""
SELECT c_mktsegment,
       COUNT(*) AS n_sampled,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sampled_balance
FROM customer
WHERE (c_custkey * {_X08_MIX} % 1000003) % 100
      < (CASE c_mktsegment {rate_case} ELSE 0 END)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q27 — UNPIVOT/melt: wide per-nation metrics back to long (metric, value)
# rows — the inverse of q13's pivot, used to feed generic metric sinks.
# Spark side uses the DataFrame unpivot (melt) operator; the oracle states
# the same relation as a UNION ALL (the portable ANSI form), so the test
# pins Spark's unpivot semantics against first principles.
# ---------------------------------------------------------------------------
def q27_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2)
            .alias("total_balance"),
            F.round(F.max("c_acctbal"), 2).alias("max_balance"),
        )
    )
    return wide.unpivot(
        "c_mktsegment",
        ["n_customers", "total_balance", "max_balance"],
        "metric",
        "value",
    )


ORACLE_Q27 = """
WITH wide AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n_customers,
         ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_balance,
         ROUND(MAX(c_acctbal), 2) AS max_balance
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT c_mktsegment, 'total_balance' AS metric, total_balance AS value FROM wide
UNION ALL
SELECT c_mktsegment, 'max_balance' AS metric, max_balance AS value FROM wide
"""


QUERIES = {
    "q25_window_frames": q25_window_frames,
    "x07_bloom_join_pruning": x07_bloom_join_pruning,
    "q26_lateral_topn": q26_lateral_topn,
    "x08_stratified_hash_sample": x08_stratified_hash_sample,
    "q27_unpivot_metrics": q27_unpivot_metrics,
}

ORACLES = {
    "q25_window_frames": ORACLE_Q25,
    "x07_bloom_join_pruning": ORACLE_X07,
    "q26_lateral_topn": ORACLE_Q26,
    "x08_stratified_hash_sample": _oracle_x08(),
    "q27_unpivot_metrics": ORACLE_Q27,
}
