"""Distributed exact-quantile selection (functions/quantiles.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from squonk2_fastapi_ws_event_stream_spark.functions import quantiles as Q

PCTS = (0.0, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0)


def _reference(spark, df, col, pcts):
    row = df.agg(
        *[F.expr(f"percentile({col}, {p})").alias(f"p{i}") for i, p in enumerate(pcts)]
    ).collect()[0]
    return [float(row[f"p{i}"]) for i in range(len(pcts))]


def test_matches_sparks_exact_percentile(spark):
    df = spark.range(10_001).select(
        ((F.col("id") * 2654435761) % 99991 / 7.0).alias("v")
    )
    n, got = Q.exact_percentiles(df, "v", PCTS)
    want = _reference(spark, df, "v", PCTS)
    assert n == 10_001
    for p, w in zip(PCTS, want):
        assert got[p] == pytest.approx(w, abs=1e-9), p


def test_recursion_path_and_value_pileups(spark):
    # Force the histogram-recursion path (TAKE_CAP=1: every bucket "too
    # big") over data with a massive identical-value pileup at 42.0 — the
    # pileup resolves via the min==max base case, never a huge take.
    df = spark.range(5000).select(
        F.when(F.col("id") < 3000, F.lit(42.0))
        .otherwise((F.col("id") % 97).cast("double"))
        .alias("v")
    )
    want = _reference(spark, df, "v", PCTS)
    old = Q.TAKE_CAP
    Q.TAKE_CAP = 1
    try:
        n, got = Q.exact_percentiles(df, "v", PCTS)
    finally:
        Q.TAKE_CAP = old
    assert n == 5000
    for p, w in zip(PCTS, want):
        assert got[p] == pytest.approx(w, abs=1e-9), p


def test_staged_memo_hits(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    Q._PCT_CACHE.clear()
    a = Q.staged_exact_percentiles(spark, sf, "lineitem", "l_extendedprice", (0.5,))
    assert len(Q._PCT_CACHE) == 1
    b = Q.staged_exact_percentiles(spark, sf, "lineitem", "l_extendedprice", (0.5,))
    assert a is b
