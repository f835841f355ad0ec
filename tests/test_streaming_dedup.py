"""Streaming deduplication: dropDuplicatesWithinWatermark over the
eventstream source — the streaming twin of the batch dedup family
(duplicate deliveries collapse within the watermark horizon, state is
evicted beyond it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
    EventLogWriter,
    EventStreamDataSource,
)

BASE_TS = 1_700_000_000_000


def test_streaming_dedup_within_watermark(spark, tmp_path):
    root = str(tmp_path / "log")
    w = EventLogWriter(root, "dups")
    # same body published three times + two uniques, all within the horizon
    for i, body in enumerate(["a", "a", "b", "a", "c"]):
        w.publish('{"payload": "%s"}' % body, BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    stream = (
        spark.readStream.format("eventstream")
        .option("path", root)
        .option("stream", "dups")
        .option("startingOrdinal", 0)
        .load()
    )
    deduped = (
        stream.withColumn("body", F.col("value").cast("string"))
        .withWatermark("timestamp", "10 minutes")
        .dropDuplicatesWithinWatermark(["body"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT body, offset FROM stream_dedup ORDER BY offset").collect()
    # first occurrence of each body survives (offsets 1, 3, 5)
    assert [r["offset"] for r in rows] == [1, 3, 5]
    assert sorted(r["body"] for r in rows) == ['{"payload": "a"}', '{"payload": "b"}', '{"payload": "c"}']
