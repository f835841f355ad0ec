"""Streaming joins over event streams.

Two shapes the reference cannot express at all (its only join is the
registry lookup, SURVEY §2.6), both essential at scale:

- stream-static: enrich the flowing envelope with the registry catalog.
  The static side is broadcast per micro-batch — no state, no shuffle of
  the stream.
- stream-stream: correlate two live streams (e.g. clicks ⋈ purchases)
  within a time bound. Both sides are watermarked so the join state is
  evicted once the bound passes — the unbounded-state trap is the classic
  100-TB streaming failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_registry(envelope: DataFrame, registry_df: DataFrame) -> DataFrame:
    """Stream-static broadcast join: attach registry id/uuid to each message
    by routing key (the data-plane form of the reference's per-connection
    lookup, app/app.py:282-296)."""
    reg = F.broadcast(
        registry_df.select(
            F.col("routing_key").alias("key"),
            F.col("id").alias("es_id"),
            F.col("uuid").alias("es_uuid"),
        )
    )
    return envelope.join(reg, "key", "left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: right events that occur at-or-after a
    left event on the same key, within `max_delay`.

    Both sides watermarked → Spark bounds the buffered state to the
    interval + watermark and evicts beyond it.
    """
    l = left.withWatermark("timestamp", watermark).select(
        F.col("key"),
        F.col("offset").alias("l_offset"),
        F.col("timestamp").alias("l_ts"),
    )
    r = right.withWatermark("timestamp", watermark).select(
        F.col("key").alias("r_key"),
        F.col("offset").alias("r_offset"),
        F.col("timestamp").alias("r_ts"),
    )
    cond = (
        (l["key"] == r["r_key"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").select(
        "key", "l_offset", "l_ts", "r_offset", "r_ts"
    )
