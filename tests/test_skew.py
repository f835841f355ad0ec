"""Skew helpers: salted join and two-phase aggregation produce results
identical to their unsalted equivalents (salting must never change
semantics, only distribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.functions.skew import salted_join, two_phase_agg


def _skewed(spark):
    # 10k rows of hot key "h" + 100 distinct cold keys
    hot = spark.range(10_000).select(F.lit("h").alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_join_matches_plain_join(spark):
    probe = _skewed(spark)
    build = spark.range(50).select(
        F.when(F.col("id") == 0, "h").otherwise(F.concat(F.lit("c"), F.col("id"))).alias("k"),
        (F.col("id") * 10).alias("w"),
    )
    plain = probe.join(build, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(probe, build, "k", n_salts=4).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    probe = _skewed(spark).filter(F.col("k").isin("h", "c1", "c99"))
    build = spark.range(1).select(F.lit("h").alias("k"), F.lit(7).alias("w"))
    out = salted_join(probe, build, "k", n_salts=4, how="left")
    rows = out.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                F.count("w").alias("matched")).collect()
    got = {r["k"]: (r["n"], r["matched"]) for r in rows}
    assert got["h"] == (10_000, 10_000)
    assert got["c1"][1] == 0 and got["c99"][1] == 0  # null-extended, not dropped


def test_two_phase_agg_matches_single_phase(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    salted = two_phase_agg(
        df,
        ["k"],
        {
            "n": (F.count(F.lit(1)), "sum"),
            "sv": (F.sum("v"), "sum"),
            "mn": (F.min("v"), "min"),
            "mx": (F.max("v"), "max"),
        },
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
