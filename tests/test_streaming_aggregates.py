"""Streaming aggregation extensions: windowed counts, session windows, and
observe()-based stats over the eventstream source — each checked against
its batch twin on the same log (stream-batch unification)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
    EventLogWriter,
    EventStreamDataSource,
)
from squonk2_fastapi_ws_event_stream_spark.streaming.aggregates import (
    session_counts,
    sliding_counts,
    windowed_counts,
    with_message_stats,
)

BASE_TS = 1_700_000_000_000  # 2023-11-14T22:13:20Z
HOUR = 3_600_000


@pytest.fixture()
def log_root(tmp_path, spark):
    root = str(tmp_path / "log")
    w = EventLogWriter(root, "metrics")
    # hour 0: 3 events; hour 1: 2 events; a >30min silence inside hour 1
    for ms in (0, 60_000, 120_000, HOUR, HOUR + 40 * 60_000):
        w.publish('{"m": 1}', BASE_TS + ms)
    spark.dataSource.register(EventStreamDataSource)
    return root


def _run(df, spark, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}"), q


def test_windowed_counts_match_batch_twin(spark, log_root, tmp_path):
    stream = (
        spark.readStream.format("eventstream")
        .option("path", log_root)
        .option("stream", "metrics")
        .option("startingOrdinal", 0)
        .load()
    )
    out, _ = _run(windowed_counts(stream), spark, tmp_path, "win_counts")
    got = {
        (r["window_start"].isoformat(), r["n_messages"], r["n_bytes"])
        for r in out.collect()
    }
    # batch twin over the same envelope
    batch = (
        spark.read.format("eventstream").option("path", log_root).load()
        .groupBy(F.window("timestamp", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.octet_length("value")).alias("b"))
    )
    want = {
        (r["w"]["start"].isoformat(), r["n"], r["b"]) for r in batch.collect()
    }
    assert got == want
    assert sum(n for _, n, _ in got) == 5


def test_sliding_counts_match_batch_twin(spark, log_root, tmp_path):
    stream = (
        spark.readStream.format("eventstream")
        .option("path", log_root)
        .option("stream", "metrics")
        .option("startingOrdinal", 0)
        .load()
    )
    out, _ = _run(sliding_counts(stream), spark, tmp_path, "slide_counts")
    got = {
        (r["window_start"].isoformat(), r["window_end"].isoformat(), r["n_messages"])
        for r in out.collect()
    }
    batch = (
        spark.read.format("eventstream").option("path", log_root).load()
        .groupBy(F.window("timestamp", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {
        (r["w"]["start"].isoformat(), r["w"]["end"].isoformat(), r["n"])
        for r in batch.collect()
    }
    assert got == want
    # every message appears in exactly window/slide = 2 windows
    assert sum(n for _, _, n in got) == 2 * 5


def test_session_window_splits_on_gap(spark, log_root, tmp_path):
    stream = (
        spark.readStream.format("eventstream")
        .option("path", log_root)
        .option("stream", "metrics")
        .option("startingOrdinal", 0)
        .load()
    )
    out, _ = _run(session_counts(stream), spark, tmp_path, "sess_counts")
    rows = sorted(out.collect(), key=lambda r: r["session_start"])
    # events at +0,+1m,+2m form one session; +60m another; +100m (40min gap)
    # a third
    assert [r["n_events"] for r in rows] == [3, 1, 1]


def test_observe_stats_surface_in_progress(spark, log_root, tmp_path):
    stream = (
        spark.readStream.format("eventstream")
        .option("path", log_root)
        .option("stream", "metrics")
        .option("startingOrdinal", 0)
        .load()
    )
    q = (
        with_message_stats(stream)
        .writeStream.format("memory")
        .queryName("obs_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt_obs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    observed = [
        p.observedMetrics["ess_stats"]
        for p in (q.recentProgress or [])
        if "ess_stats" in (p.observedMetrics or {})
    ]
    assert observed, "no observed metrics in progress events"
    total_received = sum(m["received"] for m in observed)
    assert total_received == 5
    assert all(m["min_bytes"] == len('{"m": 1}') for m in observed)


def test_windowed_topk_matches_batch_rank(spark, tmp_path):
    """Streaming aggregate + sink-stage rank = the same top-k a batch
    computation produces over the full log (e13's shape on stream keys)."""
    from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
        EventLogWriter,
        EventStreamDataSource,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.aggregates import (
        windowed_topk,
    )

    root = str(tmp_path / "log")
    base = 1_700_000_000_000
    # three streams with distinct volumes inside one hour window
    for stream, n in (("a", 5), ("b", 3), ("c", 1)):
        w = EventLogWriter(root, stream)
        for i in range(n):
            w.publish(f"m{i}", base + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    results: list = []
    queries = []
    for stream in ("a", "b", "c"):
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", stream)
            .option("startingOrdinal", 0)
            .load()
        )
        agg, rank_batch = windowed_topk(env, k=2)
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(lambda df, _id: results.extend(rank_batch(df).collect()))
            .option("checkpointLocation", str(tmp_path / f"ckpt-{stream}"))
            .trigger(availableNow=True)
            .start()
        )
        queries.append(q)
    for q in queries:
        q.awaitTermination(120)

    # each per-stream query emits its own single-key rank; union of finals
    finals = {}
    for r in results:
        finals[(r["window_start"], r["key"])] = r["n_messages"]
    assert finals == {
        (next(iter({k[0] for k in finals})), "a"): 5,
        (next(iter({k[0] for k in finals})), "b"): 3,
        (next(iter({k[0] for k in finals})), "c"): 1,
    }


def test_windowed_distinct_counts_unique_senders(spark, tmp_path):
    """approx_count_distinct in a watermarked window: 30 messages from 7
    distinct senders in one hour window -> the HLL estimate at rsd=0.01
    must be exact at this cardinality, and state stays bounded (one
    sketch per open window, not one row per message)."""
    import json

    from squonk2_fastapi_ws_event_stream_spark.streaming.aggregates import (
        windowed_distinct,
    )

    root = str(tmp_path / "log")
    w = EventLogWriter(root, "senders")
    for i in range(30):
        w.publish(json.dumps({"sender": f"user{i % 7}"}), BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    env = (
        spark.readStream.format("eventstream")
        .option("path", root)
        .option("stream", "senders")
        .option("startingOrdinal", 0)
        .load()
    )
    rows: list = []
    q = (
        windowed_distinct(env)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only CLOSED windows; all 30 messages share one
    # window which never closes within this bounded run — re-publish a
    # message 3 hours later to push the watermark past it, then rerun.
    # watermark application lags one micro-batch (the interval-join
    # lesson), so two pushes are needed: one to advance the watermark
    # past the window, one more batch to flush the closed window.
    for k, hours in enumerate((3, 6)):
        w.publish(
            json.dumps({"sender": "late"}), BASE_TS + hours * 3600 * 1000
        )
        q2 = (
            windowed_distinct(env)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
    assert any(r["approx_senders"] == 7 for r in rows), rows


def test_windowed_quantile_sketch_buckets_match_batch_twin(spark, tmp_path):
    from squonk2_fastapi_ws_event_stream_spark.streaming.aggregates import (
        windowed_quantile_sketch,
    )

    root = str(tmp_path / "qlog")
    w = EventLogWriter(root, "sizes")
    # sizes 1,2,3,4,8,9,31,32 -> buckets 0,1,1,2,3,3,4,5
    for i, n in enumerate((1, 2, 3, 4, 8, 9, 31, 32)):
        w.publish("x" * n, BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)
    stream = (
        spark.readStream.format("eventstream")
        .option("path", root)
        .option("stream", "sizes")
        .option("startingOrdinal", 0)
        .load()
    )
    out, _ = _run(windowed_quantile_sketch(stream), spark, tmp_path, "qsketch")
    got = {
        (r["bucket"], r["n_messages"], r["min_bytes"], r["max_bytes"])
        for r in out.collect()
    }
    assert got == {
        (0, 1, 1, 1),
        (1, 2, 2, 3),
        (2, 1, 4, 4),
        (3, 2, 8, 9),
        (4, 1, 31, 31),
        (5, 1, 32, 32),
    }
    # the sketch's invariant: every value in bucket b satisfies
    # 2^b <= v < 2^(b+1) (the <=2x relative-error guarantee)
    for b, _n, lo, hi in got:
        assert 2**b <= lo <= hi < 2 ** (b + 1)


def test_windowed_minmax_matches_batch_twin(spark, tmp_path):
    from squonk2_fastapi_ws_event_stream_spark.streaming.aggregates import (
        windowed_minmax,
    )

    root = str(tmp_path / "log_mm")
    w = EventLogWriter(root, "metrics")
    # varied sizes across two hours; hour 0 has min/max extremes inside
    for i, ms in enumerate((0, 60_000, 120_000, 180_000, HOUR, HOUR + 60_000)):
        w.publish('{"m": ' + "9" * (1 + (i * 3) % 7) + "}", BASE_TS + ms)
    spark.dataSource.register(EventStreamDataSource)
    stream = (
        spark.readStream.format("eventstream")
        .option("path", root)
        .option("stream", "metrics")
        .option("startingOrdinal", 0)
        .load()
    )
    out, _ = _run(windowed_minmax(stream), spark, tmp_path, "win_minmax")
    got = {
        (
            r["window_start"].isoformat(),
            r["n_messages"],
            r["first_offset"],
            r["min_bytes"],
            r["min_offset"],
            r["max_bytes"],
            r["max_offset"],
            r["last_offset"],
        )
        for r in out.collect()
    }
    batch = spark.read.format("eventstream").option("path", root).load()
    sz = F.octet_length("value").cast("long")
    want_df = (
        batch.groupBy(F.window("timestamp", "1 hour").alias("w"), "key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct(F.col("timestamp"), F.col("offset"))).alias("f"),
            F.min(F.struct(sz.alias("sz"), F.col("offset"))).alias("mn"),
            F.max(F.struct(sz.alias("sz"), F.col("offset"))).alias("mx"),
            F.max(F.struct(F.col("timestamp"), F.col("offset"))).alias("l"),
        )
    )
    want = {
        (
            r["w"]["start"].isoformat(),
            r["n"],
            r["f"]["offset"],
            r["mn"]["sz"],
            r["mn"]["offset"],
            r["mx"]["sz"],
            r["mx"]["offset"],
            r["l"]["offset"],
        )
        for r in want_df.collect()
    }
    assert got == want
    assert sum(r[1] for r in got) == 6
    # hour-0 extremes are real: 4 distinct sizes -> min < max
    h0 = min(got)
    assert h0[3] < h0[5]
