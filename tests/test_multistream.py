"""Many-streams parallelism: the scale axis of the relay is stream count —
a batch read over N streams must produce one partition per stream and
preserve per-stream order within each partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
    EventLogWriter,
    EventStreamDataSource,
)

BASE_TS = 1_700_000_000_000


def test_fifty_streams_one_partition_each(spark, tmp_path):
    root = str(tmp_path / "log")
    for s in range(50):
        w = EventLogWriter(root, f"s{s:02d}")
        for i in range(20):
            w.publish('{"n": %d}' % i, BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    df = spark.read.format("eventstream").option("path", root).load()
    assert df.rdd.getNumPartitions() == 50  # one partition per stream
    assert df.count() == 1000

    # per-stream order == partition order: within each partition offsets
    # must already be monotonic without any sort
    def check(it):
        last = {}
        for row in it:
            k, off = row.key, row.offset
            assert off > last.get(k, 0), f"out of order in {k}"
            assert len(last) <= 1 or k in last, "partition mixes streams"
            last[k] = off
        yield len(last)

    streams_per_partition = df.rdd.mapPartitions(check).collect()
    assert all(n <= 1 for n in streams_per_partition)

    per = df.groupBy("key").agg(F.max("offset").alias("m"), F.count("*").alias("n"))
    assert all(r["m"] == 20 and r["n"] == 20 for r in per.collect())


def test_sixty_four_concurrent_relay_consumers_preserve_order(spark, tmp_path):
    """64 concurrent StreamingQueries (one per stream) through the full
    relay transform: every consumer must see ITS stream's messages, all of
    them, in ordinal order — concurrency never mixes or reorders streams.
    This is the correctness half of the bench's streams×throughput
    scaling curve (bench.py bench_streaming_relay)."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.pipeline import (
        relay_transform,
    )

    root = str(tmp_path / "log")
    n_streams, per_stream = 64, 30
    for s in range(n_streams):
        w = EventLogWriter(root, f"s{s:02d}")
        for i in range(per_stream):
            w.publish(
                '{"message_type": "bench", "message_body": {"sqn": %d}}' % i,
                BASE_TS + i * 1000,
            )
    spark.dataSource.register(EventStreamDataSource)

    seen: dict[str, list[int]] = {f"s{s:02d}": [] for s in range(n_streams)}

    def sink_for(name):
        def sink(df, _batch_id):
            for r in df.select("offset").orderBy("offset").collect():
                seen[name].append(r["offset"])

        return sink

    queries = []
    for s in range(n_streams):
        name = f"s{s:02d}"
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", name)
            .option("startingOrdinal", 0)
            .load()
        )
        q = (
            relay_transform(env)
            .writeStream.foreachBatch(sink_for(name))
            .option("checkpointLocation", str(tmp_path / f"ckpt-{name}"))
            .trigger(availableNow=True)
            .start()
        )
        queries.append(q)
    for q in queries:
        q.awaitTermination(300)

    want = list(range(1, per_stream + 1))
    for name, offs in seen.items():
        assert offs == want, f"{name}: {offs[:5]}..."
