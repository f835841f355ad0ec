"""Extended relational surface: correlated subqueries, pivot, percentiles,
cube/grouping sets, token analytics, vector centroid aggregation.

These exercise the Catalyst features SURVEY §2.11 lists as absent in the
reference but required of a complete engine (subquery decorrelation,
grouping sets, exact percentiles) plus two more LLM-pipeline aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import floor_scaled, sql_floor_scaled
from ..tables import fan_out, table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# q12 — correlated scalar subquery: richest customer per nation.
# Expressed in SQL so Catalyst performs the decorrelation (rewrites to an
# aggregate + join — the plan a hand-written window would produce).
# ---------------------------------------------------------------------------
def q12_richest_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT n_name, c_custkey, c_name, c_acctbal AS acctbal
        FROM v_customer c JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal = (SELECT MAX(c2.c_acctbal) FROM v_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


ORACLE_Q12 = """
SELECT n_name, c_custkey, c_name, c_acctbal AS acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
"""


# ---------------------------------------------------------------------------
# q13 — pivot: daily event counts, one column per event type.
# Fixed pivot value list → stable schema at any SF (never let pivot infer
# distinct values at 100 TB — that is an extra full pass).
# ---------------------------------------------------------------------------
def q13_pivot_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


ORACLE_Q13 = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q14 — percentiles: exact (interpolated) and approximate quantiles.
# The approx path (approx_percentile/t-digest) is the 100-TB answer; the
# exact path is the oracle-checkable one (rounded — both engines use the
# same (n-1)p linear interpolation, differing only in final ulps).
# ---------------------------------------------------------------------------
def q14_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        floor_scaled(F.expr("percentile(value, 0.5)")).alias("p50"),
        floor_scaled(F.expr("percentile(value, 0.9)")).alias("p90"),
        floor_scaled(F.expr("percentile(value, 0.99)")).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_Q14 = f"""
SELECT event_type,
       {sql_floor_scaled(f"quantile_cont(value, 0.5)")} AS p50,
       {sql_floor_scaled(f"quantile_cont(value, 0.9)")} AS p90,
       {sql_floor_scaled(f"quantile_cont(value, 0.99)")} AS p99,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q15 — cube: revenue over (orderpriority, orderstatus) with all subtotal
# combinations (GROUPING SETS family beyond q07's rollup).
# ---------------------------------------------------------------------------
def q15_cube_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4).alias(
                "revenue"
            ),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
    )


ORACLE_Q15 = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# t12 — token frequency: explode → count → deterministic top-k.
# The wordcount shape: fully map-side-combinable, shuffle carries one row
# per distinct token.
# ---------------------------------------------------------------------------
def t12_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents").select("text"), spark)
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    return (
        toks.filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


ORACLE_T12 = """
SELECT token, COUNT(*) AS n
FROM documents, unnest(string_split(text, ' ')) AS u(token)
WHERE length(token) > 0
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# v04 — centroid aggregation: per-label mean embedding, one row per
# (label, dim). Row form (not array form) keeps the oracle comparison
# order-insensitive; decimal sums make the means exact.
# Scale: posexplode is a flatMap (no shuffle); the aggregate shuffles
# |labels| × dims rows — tiny.
# ---------------------------------------------------------------------------
def v04_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings"), spark)
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("dim", "val")
    )
    from ..functions.numeric import floor_scaled

    # floor-of-scaled, not ROUND: the decimal sum is exact but the /count
    # quotient is a float — ROUND of it is the t09 cross-engine
    # half-boundary class (AUDIT_ROUND_DOUBLES.md).
    return exploded.groupBy("label", "dim").agg(
        floor_scaled(
            F.sum(F.col("val").cast("double").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_val"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


ORACLE_V04 = """
SELECT label, CAST(d.i - 1 AS INTEGER) AS dim,
       FLOOR((CAST(SUM(CAST(CAST(embedding[d.i] AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)
              / COUNT(*)) * 1000000.0) / 1000000.0 + 0.0 AS mean_val,
       COUNT(*) AS n_vectors
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS d(i)
GROUP BY label, d.i
"""


# ---------------------------------------------------------------------------
# q16 — distinct counts: exact per group. The 100-TB path swaps the exact
# count for approx_count_distinct (HLL sketch, mergeable, one pass) —
# sketches differ per engine so only the exact form is oracle-comparable.
# ---------------------------------------------------------------------------
def q16_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.countDistinct("event_type").alias("distinct_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_Q16 = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(DISTINCT event_type) AS distinct_types,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q17 — uncorrelated scalar subquery in HAVING (TPC-H Q11 shape): nations
# whose order revenue exceeds 5% of global revenue.
# ---------------------------------------------------------------------------
def q17_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT n_name,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
                 AS revenue
        FROM v_orders
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) >
               (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 0.05 FROM v_orders)
        """
    )


ORACLE_Q17 = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) >
       (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 0.05 FROM orders)
"""


# ---------------------------------------------------------------------------
# t13_udtf_demo — Python UDTF: sentence segmentation as a table function
# (one row per fragment). UDTFs are the engine's user-extensible fan-out
# surface; the segmentation rule (split on ". ") is trivially mirrored in
# the oracle.
#
# DEMO, not the production path (round-8 VERDICT task #3): a same-window
# interleaved A/B at sf0.1 confirmed the UDTF's bench creep is real and
# entirely the Arrow batch-conversion overhead on tiny docs (useArrow=True
# ~1.1-1.9 s vs useArrow=False ~0.4 s, 3 interleaved iterations), so the
# simple-rule segmentation now ships as t13b_sentence_split (pure JVM
# split+posexplode, ~0.14 s — zero Python). This form stays registered as
# the user-extensible surface for segmenters a regex can't express.
# ---------------------------------------------------------------------------
def t13_udtf_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # useArrow: the UDTF runs as an Arrow-batched stage
    # (ArrowEvalPythonUDTF), not row-at-a-time BatchEvalPython — the same
    # hot-path rule every other Python stage in the engine follows.
    # Per-batch overhead dominates at toy scale (the A/B above), while
    # per-row pickling dominates at corpus scale; the Arrow path is the
    # one that survives 100 TB.
    @udtf(
        returnType="doc_id bigint, sent_idx int, sentence string, n_chars int",
        useArrow=True,
    )
    class SplitSentences:
        def eval(self, doc_id: int, text: str):
            for i, frag in enumerate(text.split(". ")):
                if frag:
                    yield doc_id, i, frag, len(frag)

    spark.udtf.register("split_sentences", SplitSentences)
    table(spark, sf_dir, "documents").createOrReplaceTempView("v_documents")
    return spark.sql(
        """
        SELECT s.* FROM v_documents d,
        LATERAL split_sentences(d.doc_id, d.text) s
        """
    )


ORACLE_T13 = """
SELECT doc_id,
       CAST(u.i - 1 AS INTEGER) AS sent_idx,
       parts[u.i] AS sentence,
       CAST(length(parts[u.i]) AS INTEGER) AS n_chars
FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
     unnest(range(1, len(parts) + 1)) AS u(i)
WHERE length(parts[u.i]) > 0
"""


# ---------------------------------------------------------------------------
# t13b — the same sentence segmentation as pure JVM split + posexplode:
# the fast path (whole-stage codegen, zero Python) for the common case
# where the segmentation rule IS expressible as a regex split. t13 keeps
# the UDTF form as the user-extensible surface (arbitrary Python
# segmenters); this is what the engine compiles the simple rule to.
# The t13-vs-t13b bench delta is the measured cost of crossing into
# Python (crossover analysis in SCALING.md).
# ---------------------------------------------------------------------------
def t13b_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # posexplode indexes pre-filter, matching the UDTF's enumerate() —
    # empty fragments consume an index but emit no row.
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", "\\. ")).alias("sent_idx", "sentence"),
        )
        .filter(F.length("sentence") > 0)
        .select(
            "doc_id",
            F.col("sent_idx").cast("int").alias("sent_idx"),
            "sentence",
            F.length("sentence").cast("int").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# q18 — explicit GROUPING SETS + grouping_id: mixed granularity aggregates
# in one pass (finer than q07's rollup / q15's cube).
# ---------------------------------------------------------------------------
def q18_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER)
                 AS gid,
               COUNT(*) AS n_orders
        FROM v_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


ORACLE_Q18 = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


# ---------------------------------------------------------------------------
# x01/x02 — approximate sketches: the 100-TB forms of q16/q14. Sketch
# internals (HLL registers, t-digest centroids) differ per engine, so the
# raw estimates are NOT hash-comparable across engines. Instead the hashed
# output carries (a) the exact value both engines can compute and (b) a
# deterministic tolerance-verdict boolean (approx within its published error
# bound of exact). DuckDB's oracle computes the same exact value and mirrors
# the verdict as TRUE — so the sketch's accuracy claim itself is what the
# correctness gate checks.
# ---------------------------------------------------------------------------
def x01_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count sketch vs exact, per event_type.

    approx_count_distinct(rsd=0.02) guarantees ~2% relative standard
    deviation; the verdict column checks |approx-exact|/exact <= 3*rsd
    (a 3-sigma bound). At 100 TB the exact countDistinct shuffles every
    distinct key; the HLL sketch is a fixed-size merge — that is the
    production path, and this query pins its accuracy contract.
    """
    ev = table(spark, sf_dir, "events")
    rsd = 0.02
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(3 * rsd)
            ).alias("within_tol"),
        )
    )


ORACLE_X01 = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_tol
FROM events GROUP BY event_type
"""


def x02_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles vs exact, per event_type.

    percentile_approx(accuracy=10_000) publishes a RANK-error bound
    (<= n/10_000), not a value bound — in a heavy tail, adjacent order
    statistics can be arbitrarily far apart in value, so the verdict
    checks rank: the approx answer's rank in the data
    (count of values <= approx) must sit within max(2, 0.1%·n) of the
    target rank p·n — 10x the published bound, deterministic at any SF.
    The hashed columns are the exact interpolated percentiles (the q14
    recipe) plus the three verdicts.
    """
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    PCTS = (0.5, 0.9, 0.99)
    agg = ev.groupBy("event_type").agg(
        *[
            floor_scaled(F.expr(f"percentile(value, {p})")).alias(
                f"p{int(p * 100)}_exact"
            )
            for p in PCTS
        ],
        *[
            F.percentile_approx("value", p, 10_000).alias(f"a{int(p * 100)}")
            for p in PCTS
        ],
        F.count(F.lit(1)).alias("n"),
    )
    # Rank of each approx answer: one more corpus pass with the 5-row agg
    # broadcast — no second shuffle of the data.
    ranks = (
        ev.join(F.broadcast(agg.select("event_type", "a50", "a90", "a99")), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                F.sum((F.col("value") <= F.col(f"a{int(p * 100)}")).cast("long")).alias(
                    f"r{int(p * 100)}"
                )
                for p in PCTS
            ]
        )
    )

    def verdict(p: float):
        target = F.lit(p) * F.col("n")
        slack = F.greatest(F.lit(2.0), F.lit(0.001) * F.col("n"))
        return F.abs(F.col(f"r{int(p * 100)}") - target) <= slack

    return agg.join(ranks, "event_type").select(
        "event_type",
        "p50_exact",
        "p90_exact",
        "p99_exact",
        verdict(0.5).alias("p50_ok"),
        verdict(0.9).alias("p90_ok"),
        verdict(0.99).alias("p99_ok"),
        "n",
    )


ORACLE_X02 = f"""
SELECT event_type,
       {sql_floor_scaled(f"quantile_cont(value, 0.5)")} AS p50_exact,
       {sql_floor_scaled(f"quantile_cont(value, 0.9)")} AS p90_exact,
       {sql_floor_scaled(f"quantile_cont(value, 0.99)")} AS p99_exact,
       TRUE AS p50_ok,
       TRUE AS p90_ok,
       TRUE AS p99_ok,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q19 — promo revenue share (TPC-H Q14 shape): lineitem ⋈ part with a
# conditional aggregate ratio. part is small relative to lineitem but
# still scales with SF → hint-free join (AQE broadcasts while it fits);
# the ratio of two exact decimal sums is deterministic.
# ---------------------------------------------------------------------------
def q19_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,10)")
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,10)"))
    joined = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).join(part, F.col("l_partkey") == F.col("p_partkey"))
    return joined.groupBy("p_brand").agg(
        F.round(F.sum(promo_rev).cast("double"), 4).alias("promo_revenue"),
        F.round(F.sum(rev).cast("double"), 4).alias("total_revenue"),
        F.round(
            100.0 * F.sum(promo_rev).cast("double") / F.sum(rev).cast("double"), 6
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q19 = """
SELECT p_brand,
       ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,10))
                  ELSE CAST(0 AS DECIMAL(18,10)) END) AS DOUBLE), 4) AS promo_revenue,
       ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,10))) AS DOUBLE), 4)
         AS total_revenue,
       ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,10))
                  ELSE CAST(0 AS DECIMAL(18,10)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,10))) AS DOUBLE), 6)
         AS promo_pct,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
GROUP BY p_brand
"""


QUERIES = {
    "q12_richest_per_nation": q12_richest_per_nation,
    "q13_pivot_daily_events": q13_pivot_daily_events,
    "q14_value_percentiles": q14_value_percentiles,
    "q15_cube_order_revenue": q15_cube_order_revenue,
    "t12_top_tokens": t12_top_tokens,
    "v04_label_centroids": v04_label_centroids,
    "q16_distinct_users_daily": q16_distinct_users_daily,
    "q17_revenue_share": q17_revenue_share,
    "t13_udtf_demo": t13_udtf_demo,
    "t13b_sentence_split": t13b_sentence_split,
    "q18_grouping_sets": q18_grouping_sets,
    "x01_approx_distinct": x01_approx_distinct,
    "x02_approx_percentiles": x02_approx_percentiles,
    "q19_promo_revenue": q19_promo_revenue,
}

ORACLES = {
    "q12_richest_per_nation": ORACLE_Q12,
    "q13_pivot_daily_events": ORACLE_Q13,
    "q14_value_percentiles": ORACLE_Q14,
    "q15_cube_order_revenue": ORACLE_Q15,
    "t12_top_tokens": ORACLE_T12,
    "v04_label_centroids": ORACLE_V04,
    "q16_distinct_users_daily": ORACLE_Q16,
    "q17_revenue_share": ORACLE_Q17,
    "t13_udtf_demo": ORACLE_T13,
    "t13b_sentence_split": ORACLE_T13,
    "q18_grouping_sets": ORACLE_Q18,
    "q19_promo_revenue": ORACLE_Q19,
    # x01/x02 hash the exact value + a tolerance-verdict boolean; the raw
    # sketch estimates (engine-specific) are deliberately not in the output.
    "x01_approx_distinct": ORACLE_X01,
    "x02_approx_percentiles": ORACLE_X02,
}


# ---------------------------------------------------------------------------
# q47 — correlated scalar subqueries + decorrelation: orders whose value
# exceeds 1.5x their own customer's average order value. Written as two
# correlated scalar subqueries (the way analysts write it); Catalyst
# must DECORRELATE them into per-customer aggregates joined back — the
# plan-shape guarantee that a naive per-row re-scan never ships. The
# 1.5x-average predicate is kept decimal-exact by multiplying through
# (2 * n * price > 3 * sum), because AVG returns an exact decimal in
# Spark but a double in DuckDB — comparing averages directly would
# diverge at the boundary.
#
# Scale: after decorrelation this is one per-customer aggregate of
# orders joined back to orders on o_custkey — aggregate-then-join, no
# row multiplication.
# ---------------------------------------------------------------------------
def q47_above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice, 2) AS o_totalprice
        FROM v_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
              (SELECT COUNT(*) FROM v_orders o2
               WHERE o2.o_custkey = o.o_custkey)
              > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     FROM v_orders o3 WHERE o3.o_custkey = o.o_custkey)
        """
    )


ORACLE_Q47 = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      > 3 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
"""


QUERIES["q47_above_customer_average"] = q47_above_customer_average
ORACLES["q47_above_customer_average"] = ORACLE_Q47
