"""Streaming aggregations over the event stream — the extension surface
beyond relay parity (SURVEY §2.9: the reference has no windows/watermarks;
the engine provides them Spark-natively).

Each function takes the envelope stream from the "eventstream" source and
returns a streaming DataFrame; the batch twins (operators/events.py
e09/e10) are oracle-checked, and tests assert the streaming results agree
with the batch results on the same log (stream-batch unification is the
point of Structured Streaming).

Scale notes:
- watermarks bound state: without them a windowed agg's state grows
  forever at 100 TB/day ingest.
- session_window is the built-in stateful sessionizer — state per active
  (key, session), evicted by the watermark.
- observe() computes per-batch stats inside the existing plan (no extra
  pass) and surfaces them on the StreamingQueryListener — the A1 counters
  (app/app.py:424-426,499-501) without touching the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    envelope: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window message counts + byte totals per stream key.

    Watermark on the broker timestamp: the reference guarantees it is
    monotonic per stream (README.md:172-180), so late data beyond the
    watermark can only come from cross-stream skew.
    """
    return (
        envelope.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window).alias("win"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.sum(F.octet_length("value").cast("long")).alias("n_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "key",
            "n_messages",
            "n_bytes",
        )
    )


def windowed_distinct(
    envelope: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window APPROXIMATE distinct senders per stream key — the
    streaming twin of x01/x17: `approx_count_distinct` keeps a bounded
    HLL buffer per open window in the state store (an exact distinct
    would buffer every value seen — the unbounded-state trap), merges
    across partitions, and emits on watermark close. rsd=0.01 ≈ 2.5 KB
    of state per (window, key) regardless of throughput."""
    sender = F.get_json_object(F.col("value").cast("string"), "$.sender")
    return (
        envelope.withWatermark("timestamp", watermark)
        .withColumn("sender", F.coalesce(sender, F.lit("unknown")))
        .groupBy(F.window("timestamp", window).alias("win"), "key")
        .agg(F.approx_count_distinct("sender", rsd=0.01).alias("approx_senders"))
        .select(
            F.col("win.start").alias("window_start"),
            "key",
            "approx_senders",
        )
    )


def sliding_counts(
    envelope: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding (overlapping) window counts per stream key — the streaming
    twin of the e12 batch query (operators/events.py). Each message lands
    in window/slide windows; the explode happens map-side and the
    watermark evicts window state once event time passes window_end +
    watermark, so state is bounded by (active windows x keys).
    """
    return (
        envelope.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window, slide).alias("win"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.sum(F.octet_length("value").cast("long")).alias("n_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "key",
            "n_messages",
            "n_bytes",
        )
    )


def session_counts(
    envelope: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session-window aggregation: a >gap silence closes the session.

    The streaming twin of the gaps-and-islands batch sessionizer
    (operators/events.py e10) using the built-in stateful operator.
    """
    return (
        envelope.withWatermark("timestamp", watermark)
        .groupBy(F.session_window("timestamp", gap).alias("sess"), "key")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "key",
            "n_events",
        )
    )


def with_message_stats(envelope: DataFrame, name: str = "ess_stats") -> DataFrame:
    """Attach A1-style counters via observe(): received count + byte stats
    appear in every micro-batch's StreamingQueryProgress under
    `observedMetrics[name]` (and on QueryProgressEvent for listeners) —
    the Spark-native ESS_MESSAGE_STATS_INTERVAL log line."""
    return envelope.observe(
        name,
        F.count(F.lit(1)).alias("received"),
        F.sum(F.octet_length("value").cast("long")).alias("total_bytes"),
        F.min(F.octet_length("value")).alias("min_bytes"),
        F.max(F.octet_length("value")).alias("max_bytes"),
    )


def windowed_topk(
    envelope: DataFrame,
    k: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming windowed heavy hitters — the streaming twin of the e13
    batch query: top-k stream keys per time window by message volume.

    Returns ``(aggregated_stream, rank_batch)``: ranking needs a window
    function, which Structured Streaming cannot run inside the stateful
    plan, so the rank happens per micro-batch in the SINK stage
    (`foreachBatch(lambda df, _: rank_batch(df)...)`) over the
    watermark-bounded aggregate — the standard two-stage shape for
    streaming top-k. The aggregate state is bounded by (windows x keys);
    the rank input per batch is only the updated aggregate rows.
    """
    from pyspark.sql.window import Window as W

    agg = (
        envelope.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window).alias("win"), "key")
        .agg(F.count(F.lit(1)).alias("n_messages"))
        .select(
            F.col("win.start").alias("window_start"),
            "key",
            "n_messages",
        )
    )

    def rank_batch(batch_df: DataFrame) -> DataFrame:
        w = W.partitionBy("window_start").orderBy(
            F.col("n_messages").desc(), F.col("key").asc()
        )
        return (
            batch_df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("window_start", "key", "n_messages", F.col("rk").cast("long").alias("rk"))
        )

    return agg, rank_batch


def windowed_quantile_sketch(
    envelope: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window DDSketch-style size histogram per stream key — the
    streaming twin of x20: message sizes fold into power-of-2 buckets
    (bucket = floor(log2 size) computed as bit length, no libm), so each
    open (window, key) holds at most 64 bounded counters in the state
    store and any quantile is answerable downstream with <= 2x relative
    error by walking the cumulative bucket counts. The buckets are
    MERGEABLE by addition — the property that lets 1000 executors (or
    1000 windows) combine partial sketches without ever buffering raw
    values, which an exact streaming percentile would require.

    Emits one row per (window, key, bucket) on watermark close; the
    p50/p95 reconstruction stays with the consumer (batch x20 shows the
    walk)."""
    size = F.octet_length("value").cast("long")
    bucket = (F.length(F.bin(F.greatest(size, F.lit(1)))) - 1).alias("bucket")
    return (
        envelope.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window).alias("win"), "key", bucket)
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.min(size).alias("min_bytes"),
            F.max(size).alias("max_bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "key",
            "bucket",
            "n_messages",
            "min_bytes",
            "max_bytes",
        )
    )


def windowed_minmax(
    envelope: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window M4 decimation per stream key — the streaming twin
    of the e36 batch query: each (window, key) reduces to its first /
    smallest / largest / last message (by byte size) with the OFFSETS
    kept for drill-down, the lossless-for-rendering series downsample.

    Every selected point is a plain min/max over a struct whose leading
    fields impose a total order ((size, offset) or (timestamp, offset))
    — ordinary aggregates, so the whole thing runs INSIDE the stateful
    streaming plan (unlike ranking, which needs windowed_topk's
    two-stage sink shape) with O(windows x keys) fixed-width state and
    watermark eviction. Ties resolve identically on replay: offsets are
    unique per stream, making the struct order total.
    """
    size = F.octet_length("value").cast("long")
    return (
        envelope.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window).alias("win"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.min(F.struct(F.col("timestamp"), F.col("offset"))).alias("_first"),
            F.min(F.struct(size.alias("sz"), F.col("offset"))).alias("_min"),
            F.max(F.struct(size.alias("sz"), F.col("offset"))).alias("_max"),
            F.max(F.struct(F.col("timestamp"), F.col("offset"))).alias("_last"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "key",
            "n_messages",
            F.col("_first.offset").alias("first_offset"),
            F.col("_min.sz").alias("min_bytes"),
            F.col("_min.offset").alias("min_offset"),
            F.col("_max.sz").alias("max_bytes"),
            F.col("_max.offset").alias("max_offset"),
            F.col("_last.offset").alias("last_offset"),
        )
    )
