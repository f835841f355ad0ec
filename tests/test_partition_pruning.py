"""Partition pruning, static and dynamic: the scan-level complement to
test_bucketing's shuffle-level proof. At 100 TB the fact table is laid
out by a coarse directory key; these tests prove Spark's planner reads
only the selected directories — with the predicate written on the fact
(static) AND with the predicate written only on a joined dim (DPP)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.functions.partitioning import (
    dpp_join,
    pruned_scan,
    write_partitioned,
)
from squonk2_fastapi_ws_event_stream_spark.tables import table

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _partitioned_orders(spark, tmp_path, db: str) -> str:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path / 'wh'}'")
    orders = table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    name = f"{db}.orders_by_year"
    write_partitioned(orders, name, "o_year")
    return name


def test_static_partition_pruning_reaches_the_scan(spark, tmp_path):
    name = _partitioned_orders(spark, tmp_path, "ppstat")
    try:
        df = pruned_scan(spark, name, "o_year", 1995)
        plan = _explain(df)
        # The literal year predicate must land in PartitionFilters (plan
        # time — whole directories dropped), NOT in the row-level
        # PushedFilters/Filter node.
        assert "PartitionFilters" in plan and "1995" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        expected = (
            table(spark, SF, "orders")
            .filter(F.year("o_orderdate") == 1995)
            .count()
        )
        assert df.count() == expected and expected > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql("DROP DATABASE IF EXISTS ppstat")


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    name = _partitioned_orders(spark, tmp_path, "ppdyn")
    try:
        # Dim carries the year attribute; the QUERY's predicate exists
        # ONLY on the dim — the star-schema norm. DPP must derive the
        # fact's partition filter at runtime from the broadcast dim.
        years = spark.range(1990, 2011).select(
            F.col("id").cast("int").alias("o_year"),
            (F.col("id") % 2 == 0).alias("is_even_year"),
        )
        dim = years.filter(F.col("is_even_year"))
        df = dpp_join(spark, name, dim, "o_year").groupBy("o_year").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _explain(df)
        assert "dynamicpruningexpression" in plan
        got = {r["o_year"]: r["n"] for r in df.collect()}
        base = (
            table(spark, SF, "orders")
            .withColumn("o_year", F.year("o_orderdate"))
            .filter(F.col("o_year") % 2 == 0)
            .groupBy("o_year")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        want = {r["o_year"]: r["n"] for r in base.collect()}
        assert got == want and len(got) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql("DROP DATABASE IF EXISTS ppdyn")
