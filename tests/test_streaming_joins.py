"""Stream-static and stream-stream joins over the eventstream source."""

from __future__ import annotations

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
    EventLogWriter,
    EventStreamDataSource,
)
from squonk2_fastapi_ws_event_stream_spark.sources.registry import Registry
from squonk2_fastapi_ws_event_stream_spark.streaming.joins import (
    enrich_with_registry,
    interval_join,
)

BASE_TS = 1_700_000_000_000
MIN = 60_000


def _stream(spark, root, name):
    return (
        spark.readStream.format("eventstream")
        .option("path", root)
        .option("stream", name)
        .option("startingOrdinal", 0)
        .load()
    )


def test_stream_static_registry_enrichment(spark, tmp_path):
    root = str(tmp_path / "log")
    w = EventLogWriter(root, "charges")
    for i in range(3):
        w.publish('{"n": %d}' % i, BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    registry = Registry(str(tmp_path / "es.db"))
    rec = registry.create("charges")

    out = enrich_with_registry(_stream(spark, root, "charges"), registry.to_dataframe(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_reg")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enriched_reg ORDER BY offset").collect()
    assert len(rows) == 3
    assert all(r["es_id"] == rec["id"] and r["es_uuid"] == rec["uuid"] for r in rows)


def test_stream_static_join_unregistered_stream_null_extended(spark, tmp_path):
    """A stream with no registry row must still flow (left join null
    extension), not silently drop — the data plane never depends on
    control-plane completeness."""
    root = str(tmp_path / "log")
    EventLogWriter(root, "orphan").publish('{"x": 1}', BASE_TS)
    spark.dataSource.register(EventStreamDataSource)
    registry = Registry(str(tmp_path / "es.db"))  # empty

    out = enrich_with_registry(_stream(spark, root, "orphan"), registry.to_dataframe(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("orphan_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_orphan"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM orphan_stream").collect()
    assert len(rows) == 1
    assert rows[0]["es_id"] is None and rows[0]["es_uuid"] is None


def test_stream_stream_interval_join(spark, tmp_path):
    root = str(tmp_path / "log")
    clicks = EventLogWriter(root, "clicks")
    purchases = EventLogWriter(root, "purchases")
    # purchases at +5m (joins), +25m (outside 10m bound), click base +20m
    clicks.publish("c1", BASE_TS)
    clicks.publish("c2", BASE_TS + 20 * MIN)
    purchases.publish("p1", BASE_TS + 5 * MIN)   # joins c1
    purchases.publish("p2", BASE_TS + 25 * MIN)  # joins c2 (+5m), not c1 (+25m)
    spark.dataSource.register(EventStreamDataSource)

    # interval join requires equal keys: rename both to a shared key
    from pyspark.sql import functions as F

    left = _stream(spark, root, "clicks").withColumn("key", F.lit("user1"))
    right = _stream(spark, root, "purchases").withColumn("key", F.lit("user1"))
    out = interval_join(left, right, max_delay="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("joined_streams")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["l_offset"], r["r_offset"]) for r in spark.sql("SELECT * FROM joined_streams").collect()}
    assert rows == {(1, 1), (2, 2)}  # c1⋈p1 and c2⋈p2 only — bound enforced


def test_interval_join_state_stays_bounded(spark, tmp_path):
    """State-store rows must track the interval+watermark HORIZON, not the
    stream's full history — the unbounded-state trap is the classic 100-TB
    streaming failure. Four chunks arrive 2 h apart (far beyond the 10 min
    interval + 30 min watermark); each availableNow run advances the
    checkpointed watermark, and the no-data micro-batch applies it, so by
    the last run the state must hold at most ~one chunk per side."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "log")
    clicks = EventLogWriter(root, "clicks_l")
    purchases = EventLogWriter(root, "purch_l")
    spark.dataSource.register(EventStreamDataSource)
    ckpt = str(tmp_path / "ckpt_bound")

    chunk_rows = 50
    n_chunks = 4
    last_total = None
    for chunk in range(n_chunks):
        t0 = BASE_TS + chunk * 120 * MIN
        for i in range(chunk_rows):
            clicks.publish(f"c{chunk}_{i}", t0 + i * 1000)
            purchases.publish(f"p{chunk}_{i}", t0 + i * 1000 + 500)
        left = _stream(spark, root, "clicks_l").withColumn("key", F.lit("u"))
        right = _stream(spark, root, "purch_l").withColumn("key", F.lit("u"))
        out = interval_join(left, right, max_delay="10 minutes")
        # noop sink: the memory sink refuses checkpoint recovery, and this
        # test only reads the state-store counters from query progress.
        q = (
            out.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        progress = [p for p in q.recentProgress if p["stateOperators"]]
        if progress:
            last_total = progress[-1]["stateOperators"][0]["numRowsTotal"]
    assert last_total is not None
    # 8 * chunk_rows rows flowed in total. Eviction lags one micro-batch
    # (batch N evicts with the watermark derived from batch N-1's max
    # event time), so the surviving state is at most the newest TWO
    # chunks on each side — O(interval + watermark + one batch), never
    # O(history).
    assert last_total <= 4 * chunk_rows + 10, last_total
