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
