"""Incremental changelog compaction equals the full-history recompute.

The associativity claim in events.compact_incremental, proven on a split
of the events table: compact(first half) folded with the second half must
equal e14 over the whole table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.operators.events import (
    compact_incremental,
    e14_log_compaction,
)
from squonk2_fastapi_ws_event_stream_spark.tables import table


def _sorted_rows(df):
    return sorted(
        df.select(
            "user_id", "event_type", "last_event_id", "last_ts_us", "last_value"
        ).collect()
    )


def test_incremental_equals_full(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    cutoff = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    old = ev.filter(F.col("event_id") <= cutoff)
    new = ev.filter(F.col("event_id") > cutoff)

    # full recompute over all history
    full = e14_log_compaction(spark, sf_dir)

    # incremental: compact the old half via the same per-key rule, then
    # fold only the new half in
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    prev = (
        old.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros("ts").alias("last_ts_us"),
            F.round(F.col("value"), 6).alias("last_value"),
        )
    )
    incremental = compact_incremental(prev, new)
    assert _sorted_rows(incremental) == _sorted_rows(full)


def test_incremental_with_empty_new_batch_is_identity(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    full = e14_log_compaction(spark, sf_dir)
    empty = ev.filter(F.lit(False))
    again = compact_incremental(full, empty)
    assert _sorted_rows(again) == _sorted_rows(full)
