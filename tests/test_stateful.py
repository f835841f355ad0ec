"""Custom stateful operator: state persists across micro-batches."""

from __future__ import annotations

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
    EventLogWriter,
    EventStreamDataSource,
)
from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import running_totals

BASE_TS = 1_700_000_000_000


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    root = str(tmp_path / "log")
    w = EventLogWriter(root, "s1")
    for i in range(4):
        w.publish("x" * (i + 1), BASE_TS + i * 1000)  # 1+2+3+4 = 10 bytes
    spark.dataSource.register(EventStreamDataSource)

    # maxOffsetsPerTrigger caps each batch at 2 messages; the shared
    # checkpoint makes run 2 a RESTART — keyed state and the offset cursor
    # must both recover. (foreachBatch sink: the memory sink does not
    # support checkpoint recovery; rate-limited restart needs a recurring
    # trigger — see the reader's docstring.)
    import time

    def stream_df():
        return (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "s1")
            .option("startingOrdinal", 0)
            .option("maxOffsetsPerTrigger", 2)
            .load()
        )

    first: list = []
    q = (
        running_totals(stream_df())
        .writeStream.foreachBatch(lambda df, _id: first.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(first) == 1
    assert first[0]["total_messages"] == 2 and first[0]["total_bytes"] == 3

    second: list = []
    q2 = (
        running_totals(stream_df())
        .writeStream.foreachBatch(lambda df, _id: second.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        if any(r["total_messages"] == 4 for r in second):
            break
        time.sleep(0.5)
    q2.stop()
    final = sorted(second, key=lambda r: r["total_messages"])[-1]
    assert final["key"] == "s1"
    assert final["total_messages"] == 4  # state recovered across restart
    assert final["total_bytes"] == 10  # 1+2+3+4 bytes
    assert final["batch_messages"] == 2  # only the new messages this run
