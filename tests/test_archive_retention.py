"""Stream archival to parquet and log retention enforcement."""

from __future__ import annotations

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
    EventLogWriter,
    EventStreamDataSource,
    enforce_retention,
)
from squonk2_fastapi_ws_event_stream_spark.streaming.archive import (
    archive_stream,
    read_archive,
)

BASE_TS = 1_700_000_000_000  # 2023-11-14
DAY = 86_400_000


def test_archive_stream_to_parquet_and_read_back(spark, tmp_path):
    root = str(tmp_path / "log")
    for s in ("a", "b"):
        w = EventLogWriter(root, s)
        for i in range(5):
            w.publish('{"n": %d}' % i, BASE_TS + i * DAY)  # spans 5 days
    spark.dataSource.register(EventStreamDataSource)

    for s in ("a", "b"):
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", s)
            .option("startingOrdinal", 0)
            .load()
        )
        q = archive_stream(env, s, str(tmp_path / "archive"), str(tmp_path / f"ckpt_{s}"))
        q.awaitTermination(120)

    hist = read_archive(spark, str(tmp_path / "archive"))
    assert hist.count() == 10
    assert set(hist.columns) == {
        "key",
        "offset",
        "timestamp",
        "value",
        "body",
        "event_date",
    }
    # lossless: raw log bytes survive alongside the decoded view
    row = hist.filter((F.col("key") == "a") & (F.col("offset") == 1)).collect()[0]
    assert bytes(row["value"]) == b'{"n": 0}'
    assert row["body"] == '{"n": 0}'

    # partition pruning: filtering by event_date must prune partitions
    one_day = hist.filter(
        (F.col("event_date") == "2023-11-16") & (F.col("key") == "a")
    )
    assert one_day.count() == 1
    assert one_day.collect()[0]["offset"] == 3

    # re-running the archive query is exactly-once (no duplicates)
    env = (
        spark.readStream.format("eventstream")
        .option("path", root)
        .option("stream", "a")
        .option("startingOrdinal", 0)
        .load()
    )
    q = archive_stream(env, "a", str(tmp_path / "archive"), str(tmp_path / "ckpt_a"))
    q.awaitTermination(120)
    assert read_archive(spark, str(tmp_path / "archive")).count() == 10


def test_retention_by_age_and_count(spark, tmp_path):
    root = str(tmp_path / "log")
    w = EventLogWriter(root, "s")
    for i in range(10):
        w.publish("m%d" % i, BASE_TS + i * 1000)

    # age: drop everything older than 5s before the last message
    expired = enforce_retention(
        root, "s", max_age_ms=5000, now_ms=BASE_TS + 9000
    )
    assert expired == 4  # ordinals 1-4 (ts +0..+3s) are older than 5s
    df = spark.read.format("eventstream").option("path", root).option("stream", "s").load()
    assert sorted(r["offset"] for r in df.collect()) == [5, 6, 7, 8, 9, 10]

    # count: keep the newest 3
    assert enforce_retention(root, "s", max_messages=3) == 3
    df = spark.read.format("eventstream").option("path", root).option("stream", "s").load()
    assert sorted(r["offset"] for r in df.collect()) == [8, 9, 10]

    # replay older than retention → silently starts at first retained (Q6)
    df = (
        spark.read.format("eventstream")
        .option("path", root)
        .option("stream", "s")
        .option("startingOrdinal", 2)
        .load()
    )
    assert sorted(r["offset"] for r in df.collect()) == [8, 9, 10]


def test_retention_never_reuses_ordinals(spark, tmp_path):
    """Expiring EVERY record must not reset the ordinal counter — a
    checkpointed consumer at offset N would silently skip re-assigned
    ordinals 1..N, and replay clients would see duplicate ordinals."""
    root = str(tmp_path / "log")
    w = EventLogWriter(root, "s")
    for i in range(5):
        w.publish("m%d" % i, BASE_TS + i * 1000)
    expired = enforce_retention(root, "s", max_age_ms=1, now_ms=BASE_TS + 10_000_000)
    assert expired == 5  # log is now empty
    assert w.publish("fresh", BASE_TS + 10_000_000) == 6  # NOT 1


def test_health_endpoint(spark, tmp_path):
    from squonk2_fastapi_ws_event_stream_spark.sources.registry import Registry
    from squonk2_fastapi_ws_event_stream_spark.streaming.api import create_app
    from squonk2_fastapi_ws_event_stream_spark.streaming.manager import StreamManager

    registry = Registry(str(tmp_path / "es.db"))
    manager = StreamManager(spark, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    app = create_app(spark, registry, manager)
    app.testing = True
    r = app.test_client().get("/event-stream/health/")
    assert r.status_code == 200
    body = r.get_json()
    assert body["spark"] is True and body["consumers"] == {}
