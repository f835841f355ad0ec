"""Bucketed co-located joins: the pre-shuffled fact⋈fact path. The plan
assertion is the point — bucketing must elide the per-query exchanges."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.functions.bucketing import (
    bucketed_join,
    write_bucketed,
)
from squonk2_fastapi_ws_event_stream_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is static conf — use a database with an explicit location
    spark.sql(f"CREATE DATABASE IF NOT EXISTS btest LOCATION '{tmp_path / 'wh'}'")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "btest.li_bucketed", "l_orderkey", n_buckets=4)
    write_bucketed(orders, "btest.orders_bucketed", "l_orderkey", n_buckets=4)

    # force the join strategy decision away from broadcast so the exchange
    # elision (not broadcast) is what's proven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "btest.li_bucketed", "btest.orders_bucketed", "l_orderkey")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-bucketed → no shuffle
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

        # and the result is correct vs the plain join
        plain = li.join(orders, "l_orderkey").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS btest.li_bucketed")
        spark.sql("DROP TABLE IF EXISTS btest.orders_bucketed")
        spark.sql("DROP DATABASE IF EXISTS btest")
