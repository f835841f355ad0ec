"""Custom stateful operator: state persists across micro-batches."""

from __future__ import annotations

from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
    EventLogWriter,
    EventStreamDataSource,
)
from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import running_totals

BASE_TS = 1_700_000_000_000

# The batch/stream twin tests replay this SF's log through both paths.
# Default sf0.001 keeps CI fast; TWIN_SF=/root/testdata/sf0.01 runs the
# same bit-identity comparisons one scale up (a once-per-round sweep,
# like ORACLE_PARITY_SF for the oracle suite).
import os as _os

TWIN_SF = _os.environ.get("TWIN_SF", "/root/testdata/sf0.001")


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


def test_latest_state_compacts_to_max_offset(spark, tmp_path):
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import latest_state

    root = str(tmp_path / "log")
    w = EventLogWriter(root, "s1")
    for i in range(5):
        w.publish(f"v{i}", BASE_TS + i * 1000)
    w2 = EventLogWriter(root, "s2")
    w2.publish("only", BASE_TS)
    spark.dataSource.register(EventStreamDataSource)

    rows: list = []
    q = (
        latest_state(
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "s1")
            .option("startingOrdinal", 0)
            .load()
        )
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-compact"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {r["key"]: r for r in rows}  # last emission per key wins
    assert final["s1"]["last_offset"] == 5
    assert final["s1"]["last_value"] == "v4"


def test_latest_state_survives_restart(spark, tmp_path):
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import latest_state

    root = str(tmp_path / "log")
    w = EventLogWriter(root, "s1")
    w.publish("first", BASE_TS)
    spark.dataSource.register(EventStreamDataSource)
    ckpt = str(tmp_path / "ckpt-restart")

    def run_once() -> list:
        got: list = []
        q = (
            latest_state(
                spark.readStream.format("eventstream")
                .option("path", root)
                .option("stream", "s1")
                .option("startingOrdinal", 0)
                .load()
            )
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    first = run_once()
    assert first and first[-1]["last_offset"] == 1
    # new messages after the first run; the restart must resume from the
    # checkpointed offset AND the recovered keyed state
    w.publish("second", BASE_TS + 1000)
    second = run_once()
    assert second and second[-1]["last_offset"] == 2
    assert second[-1]["last_value"] == "second"


def test_decayed_counts_integer_exact_and_restart_safe(spark, tmp_path):
    """Three days of messages arriving across two runs (shared checkpoint
    → run 2 is a RESTART): the decayed count must equal the closed-form
    sum over ages computed in plain Python, exactly — the decay state is
    integer arithmetic, so restarts cannot drift it."""
    import time

    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        DECAY_SHIFT,
        decayed_counts,
    )

    root = str(tmp_path / "log")
    w = EventLogWriter(root, "d1")
    day_ms = 86_400_000
    # day 0: 3 msgs; day 1: 2 msgs (written now, consumed in run 1)
    for i in range(3):
        w.publish("a", BASE_TS + i * 1000)
    for i in range(2):
        w.publish("b", BASE_TS + day_ms + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    def stream_df():
        return (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "d1")
            .option("startingOrdinal", 0)
            .load()
        )

    out1: list = []
    q = (
        decayed_counts(stream_df())
        .writeStream.foreachBatch(lambda df, _id: out1.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    base_day = (BASE_TS + day_ms) // day_ms
    want1 = 3 * (1 << (DECAY_SHIFT - 1)) + 2 * (1 << DECAY_SHIFT)
    assert out1[-1]["as_of_day"] == base_day
    assert out1[-1]["scaled"] == want1

    # day 3 arrives (2-day jump): prior state must shift right by 2
    for i in range(4):
        w.publish("c", BASE_TS + 3 * day_ms + i * 1000)
    out2: list = []
    q2 = (
        decayed_counts(stream_df())
        .writeStream.foreachBatch(lambda df, _id: out2.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    want2 = (want1 >> 2) + 4 * (1 << DECAY_SHIFT)
    assert out2[-1]["as_of_day"] == base_day + 2
    assert out2[-1]["scaled"] == want2


def test_idle_keys_are_evicted_state_plateaus_under_churn(spark, tmp_path):
    """Round-6 task #4: stream keys are unbounded over months of churn,
    so the stateful operators evict keys idle past retention
    (ProcessingTimeTimeout + state.remove). Drive running_totals with a
    rate stream where EVERY row is a brand-new key that never returns:
    without eviction state rows == all keys ever seen; with a 1 s
    retention the store must plateau far below that (and report
    removals)."""
    import time

    from pyspark.sql import functions as F

    rows = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
        .select(
            F.concat(F.lit("k"), F.col("value")).alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    )
    q = (
        running_totals(rows, retention_ms=1000)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-churn"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        progress = []
        while time.time() < deadline:
            time.sleep(1.0)
            p = q.lastProgress
            if p and p.get("stateOperators"):
                progress.append(p)
            done = [
                pp
                for pp in progress
                if pp["stateOperators"][0]["numRowsRemoved"] > 0
            ]
            total_in = sum(pp["numInputRows"] for pp in progress)
            if done and total_in > 2000:
                break
    finally:
        q.stop()

    assert progress, "no streaming progress observed"
    total_input = sum(p["numInputRows"] for p in progress)
    last_state_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in progress)
    # Every input row is a distinct key; without eviction numRowsTotal
    # would equal total_input. Plateau bound: keys live <= retention +
    # trigger lag (~1.5 s * 200 rps = ~300), leave slack for scheduling.
    assert total_input > 2000, f"too little churn generated: {total_input}"
    assert removed > 0, "no state rows were ever evicted"
    assert last_state_rows < total_input / 2, (
        f"state did not plateau: {last_state_rows} rows for "
        f"{total_input} distinct keys"
    )


def test_heavy_hitters_space_saving_guarantees_and_restart(spark, tmp_path):
    """Sharded Space-Saving: the true heavy key must be reported with
    reported >= true and reported - overcount <= true; per-shard state
    stays at <= capacity counters under key churn; and a restart from
    the checkpoint continues the counters."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import heavy_hitters

    root = str(tmp_path / "log")
    w = EventLogWriter(root, "hh")
    seq = ["hot"] * 300 + ["warm"] * 50 + [f"filler{i}" for i in range(200)]
    # Interleave deterministically so hot appears throughout the stream.
    seq = [seq[i] for i in range(0, len(seq), 2)] + [
        seq[i] for i in range(1, len(seq), 2)
    ]
    for i, item in enumerate(seq):
        w.publish(item, BASE_TS + i * 10)
    spark.dataSource.register(EventStreamDataSource)

    def run_once(tag_unused=None) -> list:
        got: list = []
        q = (
            heavy_hitters(
                spark.readStream.format("eventstream")
                .option("path", root)
                .option("stream", "hh")
                .option("startingOrdinal", 0)
                .option("maxOffsetsPerTrigger", 100)
                .load()
                .selectExpr("cast(value as string) as item"),
                item_col="item",
                n_shards=4,
                capacity=8,
            )
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt-hh"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return got

    rows = run_once()
    # availableNow + maxOffsetsPerTrigger drains one cap per run; loop
    # runs until the backlog is consumed (each run resumes the cursor).
    for _ in range(10):
        if sum(r["counts"][0] for r in rows[-4:] if r["counts"]) >= 300:
            break
        rows = run_once()
    latest: dict = {}
    for r in rows:
        latest[r["shard"]] = r  # last emission per shard wins
    hot = None
    for r in latest.values():
        assert len(r["keys"]) <= 8  # capacity bound under churn
        if "hot" in r["keys"]:
            i = r["keys"].index("hot")
            hot = (r["counts"][i], r["overcounts"][i])
    assert hot is not None, f"heavy key evicted: {latest}"
    n_hot = sum(1 for s in seq if s == "hot")
    assert hot[0] >= n_hot  # never undercounts
    assert hot[0] - hot[1] <= n_hot  # overcount-corrected lower bound

    # Restart: more hot traffic, same checkpoint — counters continue.
    for i in range(100):
        w.publish("hot", BASE_TS + 10_000_000 + i * 10)
    rows2 = run_once()
    for _ in range(5):
        rows2 = run_once()
        found = [
            r for r in rows2 if "hot" in r["keys"]
        ]
        if found and max(
            r["counts"][r["keys"].index("hot")] for r in found
        ) >= n_hot + 100:
            break
    found = [r for r in rows2 if "hot" in r["keys"]]
    assert found, "hot lost after restart"
    best = max(r["counts"][r["keys"].index("hot")] for r in found)
    assert best >= n_hot + 100  # state recovered and continued


def test_running_zscore_flags_spike_and_survives_restart(spark, tmp_path):
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        running_zscore,
    )

    root = str(tmp_path / "zlog")
    w = EventLogWriter(root, "s1")
    # 40 constant-size messages build the history (well past ZSCORE_MIN_N).
    for i in range(40):
        w.publish("x" * 5, BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    def stream_df():
        return (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "s1")
            .option("startingOrdinal", 0)
            .load()
        )

    first: list = []
    q = (
        running_zscore(stream_df())
        .writeStream.foreachBatch(lambda df, _id: first.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "zckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert first[-1]["n_seen"] == 40
    assert first[-1]["batch_anomalies"] == 0  # constants are never anomalous
    assert first[-1]["mean_milli"] == 5000

    # Restart run: 3 more normals + one 100-byte spike. The restored
    # (n, s, s2) state must carry the history — the spike deviates from a
    # zero-variance prior and MUST be flagged; normals must not.
    for i in range(3):
        w.publish("x" * 5, BASE_TS + 50_000 + i * 1000)
    w.publish("x" * 100, BASE_TS + 60_000)
    second: list = []
    q2 = (
        running_zscore(stream_df())
        .writeStream.foreachBatch(lambda df, _id: second.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "zckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert second[-1]["n_seen"] == 44
    assert second[-1]["batch_anomalies"] == 1


def test_funnel_tracker_prefix_rule_and_restart(spark, tmp_path):
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        funnel_tracker,
    )

    root = str(tmp_path / "flog")
    w = EventLogWriter(root, "f1")
    # u1: clean signup -> click -> purchase (+ noise event ignored).
    # u2: signup then purchase WITHOUT click — must NOT convert.
    seq = [
        ("u1", "signup", 0),
        ("u2", "signup", 1_000),
        ("u1", "noise", 2_000),
        ("u1", "click", 3_000),
        ("u2", "purchase", 4_000),   # out of order: ignored
        ("u1", "purchase", 5_000),
    ]
    for user, step, dt in seq:
        w.publish(f"{user} {step}", BASE_TS + dt)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "f1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "split(cast(value as string), ' ')[0] as user",
            "split(cast(value as string), ' ')[1] as step",
            "unix_millis(timestamp) as ms",
            "offset",
        )

    def run_once(tag: str) -> list:
        got: list = []
        q = (
            funnel_tracker(events_df())
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "fckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    rows = {r["user"]: r for r in run_once("first")}
    assert rows["u1"]["converted"] and rows["u1"]["stage"] == 3
    assert rows["u1"]["conv_ms"] == 5_000  # signup at +0, purchase at +5s
    assert not rows["u2"]["converted"] and rows["u2"]["stage"] == 1

    # Restart: u2 completes the missing click then purchases — the
    # recovered state must convert with latency from the ORIGINAL signup.
    w.publish("u2 click", BASE_TS + 60_000)
    w.publish("u2 purchase", BASE_TS + 90_000)
    rows2 = {r["user"]: r for r in run_once("second")}
    assert rows2["u2"]["converted"] and rows2["u2"]["stage"] == 3
    assert rows2["u2"]["conv_ms"] == 89_000  # signup at +1s, purchase at +90s


def test_twap_tracker_integral_exactness_late_skip_and_restart(spark, tmp_path):
    """The streaming TWAP must equal the hand-computed integral, skip
    time-regressing observations, and carry the integral across a
    checkpoint restart (the e41 batch-twin semantics)."""
    import json

    from pyspark.sql import functions as F

    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        twap_tracker,
    )

    root = str(tmp_path / "twaplog")
    w = EventLogWriter(root, "s1")
    # (event-time us, value cents): 10.00 for 4s, 20.00 for 2s, then a
    # LATE reading (event time regresses) that must be skipped, then
    # 40.00 closing the 20.00 segment after 2 more seconds.
    obs = [
        (1_000_000, 1000),
        (5_000_000, 2000),
        (3_000_000, 9999),  # late: arrives after the 5s reading
        (7_000_000, 4000),
    ]
    for i, (us, cents) in enumerate(obs):
        w.publish(json.dumps({"us": us, "cents": cents}), BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    def shaped():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "s1")
            .option("startingOrdinal", 0)
            .load()
        )
        parsed = env.select(
            "key",
            "offset",
            F.get_json_object(F.col("value").cast("string"), "$.us")
            .cast("long")
            .alias("us"),
            F.get_json_object(F.col("value").cast("string"), "$.cents")
            .cast("long")
            .alias("cents"),
        )
        return twap_tracker(parsed)

    first: list = []
    q = (
        shaped()
        .writeStream.foreachBatch(lambda df, _id: first.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "twapckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = first[-1]
    # integral: 1000c x 4s + 2000c x 2s = 8_000_000 cents-us... in us units:
    # vt = 1000*4e6 + 2000*2e6 = 8e9; dur = 6e6; twap = 8e9*10 // 6e6 = 13333
    assert row["n_obs"] == 3 and row["late"] == 1
    assert row["span_us"] == 6_000_000
    assert row["twap_milli"] == 13333  # 13.333: 10.00 weighted 2x vs 20.00
    assert row["last_value_milli"] == 40_000

    # Restart: 40.00 holds 6 more seconds -> vt += 4000*6e6 = 2.4e10.
    w.publish(json.dumps({"us": 13_000_000, "cents": 1000}), BASE_TS + 9000)
    second: list = []
    q2 = (
        shaped()
        .writeStream.foreachBatch(lambda df, _id: second.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "twapckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    row2 = second[-1]
    assert row2["n_obs"] == 4 and row2["late"] == 1
    assert row2["span_us"] == 12_000_000
    # vt = 8e9 + 4000*6e6 = 3.2e10; twap = 3.2e10*10 // 12e6 = 26666
    assert row2["twap_milli"] == 26666


def test_cusum_monitor_alarms_rearm_and_restart(spark, tmp_path):
    """The streaming CUSUM must fold Page's statistic integer-exactly,
    alarm exactly when the drift crosses the threshold, re-arm after the
    alarm, and carry (cum, cum_min) across a checkpoint restart."""
    import json

    from pyspark.sql import functions as F

    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        cusum_monitor,
    )

    root = str(tmp_path / "cusumlog")
    w = EventLogWriter(root, "s1")
    # target 1000, threshold 500: four on-target readings keep stat 0;
    # then a +300 drift accumulates 300/600 -> alarm on the 6th message.
    vals = [1000, 1000, 1000, 1000, 1300, 1300]
    for i, v in enumerate(vals):
        w.publish(json.dumps({"cents": v}), BASE_TS + i * 1000)
    spark.dataSource.register(EventStreamDataSource)

    def shaped():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "s1")
            .option("startingOrdinal", 0)
            .load()
        )
        parsed = env.select(
            "key",
            "offset",
            F.get_json_object(F.col("value").cast("string"), "$.cents")
            .cast("long")
            .alias("cents"),
        )
        return cusum_monitor(parsed, target_cents=1000, threshold_cents=500)

    first: list = []
    q = (
        shaped()
        .writeStream.foreachBatch(lambda df, _id: first.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cusumckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = first[-1]
    # drift: after 5th msg stat=300 (no alarm); 6th msg stat=600 > 500 ->
    # alarm, re-arm (stat back to 0).
    assert row["n_obs"] == 6
    assert row["n_alarms"] == 1 and row["alarmed_in_batch"]
    assert row["stat"] == 0  # re-armed at the alarm

    # Restart: two more +300 readings accumulate 300/600 from the
    # re-armed baseline -> exactly one more alarm, state carried.
    w.publish(json.dumps({"cents": 1300}), BASE_TS + 7000)
    w.publish(json.dumps({"cents": 1300}), BASE_TS + 8000)
    second: list = []
    q2 = (
        shaped()
        .writeStream.foreachBatch(lambda df, _id: second.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cusumckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    row2 = second[-1]
    assert row2["n_obs"] == 8
    assert row2["n_alarms"] == 2 and row2["alarmed_in_batch"]
    assert row2["stat"] == 0


def test_session_tracker_gap_split_restart_and_timeout_flush(spark, tmp_path):
    """Gap-split sessions emit exactly once with exact bounds; the open
    session survives a checkpoint restart; an idle key's open session is
    FLUSHED by the timeout (closed_by='timeout') before eviction."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        session_tracker,
    )

    root = str(tmp_path / "slog")
    w = EventLogWriter(root, "s1")
    GAP = 10_000
    # u1: two events 3s apart, then a 60s silence, then one more event ->
    # first session [0, 3s] n=2 closes when the post-gap event arrives.
    # u2: one event only — stays OPEN (no emission in run 1).
    seq = [
        ("u1", 0),
        ("u2", 1_000),
        ("u1", 3_000),
        ("u1", 63_000),
    ]
    for user, dt in seq:
        w.publish(f"{user}", BASE_TS + dt)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "s1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "cast(value as string) as user",
            "unix_millis(timestamp) as ms",
            "offset",
        )

    def run_once(retention_ms: int) -> list:
        got: list = []
        q = (
            session_tracker(events_df(), gap_ms=GAP, retention_ms=retention_ms)
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "sckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    rows = run_once(retention_ms=3_600_000)
    assert len(rows) == 1
    r = rows[0]
    assert r["user"] == "u1" and r["closed_by"] == "gap"
    assert r["session_start_ms"] == BASE_TS and r["session_end_ms"] == BASE_TS + 3_000
    assert r["n_events"] == 2

    # Restart: u1's open session (started at +63s) gains an in-gap event
    # and a regressing (late) event — both extend membership, the late
    # one must not move the end. A fresh gap event then closes it.
    w.publish("u1", BASE_TS + 70_000)
    w.publish("u1", BASE_TS + 65_000)   # late: session end stays 70s
    w.publish("u1", BASE_TS + 95_000)   # > GAP after 70s: closes
    rows2 = run_once(retention_ms=3_600_000)
    assert len(rows2) == 1
    r2 = rows2[0]
    assert r2["user"] == "u1" and r2["closed_by"] == "gap"
    assert r2["session_start_ms"] == BASE_TS + 63_000
    assert r2["session_end_ms"] == BASE_TS + 70_000
    assert r2["n_events"] == 3

    # Timeout flush: a key must be ARMED with the short retention in a
    # batch it participates in (timeouts fire off the timestamp set when
    # the key was last seen — re-running with a smaller retention does
    # not rearm idle keys). Arm u4 at 1 ms, let wall time pass, then any
    # next batch fires hasTimedOut and flushes u4's open session.
    import time

    w.publish("u4", BASE_TS + 150_000)
    rows3 = run_once(retention_ms=1)  # arms u4's timeout at +1 ms
    assert not [r for r in rows3 if r["user"] == "u4"]  # still open
    time.sleep(1.2)
    w.publish("u5", BASE_TS + 200_000)  # any traffic to trigger a batch
    rows4 = run_once(retention_ms=1)
    flushed = {r["user"]: r for r in rows4 if r["closed_by"] == "timeout"}
    assert "u4" in flushed and flushed["u4"]["n_events"] == 1
    assert flushed["u4"]["session_start_ms"] == BASE_TS + 150_000
    assert flushed["u4"]["session_end_ms"] == BASE_TS + 150_000


def test_lateness_histogram_buckets_and_restart(spark, tmp_path):
    """Each message's lateness is measured against the running max event
    time BEFORE advancing it; buckets are cumulative across a restart."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        lateness_histogram,
    )

    root = str(tmp_path / "llog")
    w = EventLogWriter(root, "l1")
    # k1 event times (ms): 10_000, then 9_500 (0.5s late), then 12_000
    # (on time), then 2_000 (10s late -> lt_100s bucket).
    for dt in (10_000, 9_500, 12_000, 2_000):
        w.publish("k1", BASE_TS + dt)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "l1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "cast(value as string) as key",
            "unix_micros(timestamp) as us",
            "offset",
        )

    def run_once() -> list:
        got: list = []
        q = (
            lateness_histogram(events_df())
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "lckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    r = {x["key"]: x for x in run_once()}["k1"]
    assert r["n_msgs"] == 4
    assert r["on_time"] == 2      # first message + 12_000
    assert r["lt_1s"] == 1        # 9_500 is 0.5 s late
    assert r["lt_10s"] == 0
    assert r["lt_100s"] == 1      # 2_000 is 10 s late (edge: 10s in [10,100))
    assert r["max_event_us"] == (BASE_TS + 12_000) * 1000

    # Restart: one more very-late message lands in ge_100s cumulatively.
    w.publish("k1", BASE_TS - 200_000)
    r2 = {x["key"]: x for x in run_once()}["k1"]
    assert r2["n_msgs"] == 5 and r2["ge_100s"] == 1
    assert r2["on_time"] == 2 and r2["lt_1s"] == 1 and r2["lt_100s"] == 1


def test_streaming_kmv_matches_batch_kmv_bit_for_bit(spark, tmp_path):
    """The streaming sketch over the whole log must equal the batch x13
    computation on the same ids — same hashes, same k-mins, same
    estimate — including across a checkpoint restart."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        KMV_K,
        _KMV_A,
        _KMV_B,
        _KMV_P,
        kmv_distinct,
    )

    root = str(tmp_path / "klog")
    w = EventLogWriter(root, "k1")
    ids1 = [i * 37 % 501 for i in range(300)]  # dups on purpose
    for v in ids1:
        w.publish(str(v), BASE_TS)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "k1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "'k1' as key", "CAST(cast(value as string) AS BIGINT) as value_id"
        )

    def run_once() -> list:
        got: list = []
        q = (
            kmv_distinct(events_df())
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "kckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    def batch_kmv(ids):
        hs = sorted({((v % _KMV_P) * _KMV_A + _KMV_B) % _KMV_P for v in ids})
        mins = hs[:KMV_K]
        k, kth = len(mins), mins[-1]
        est = float(k) if k < KMV_K else ((k - 1) * _KMV_P * 10000 // kth) / 1e4
        return k, kth, est

    r = run_once()[-1]
    k, kth, est = batch_kmv(ids1)
    assert (r["k_kept"], r["kth_min_hash"]) == (k, kth)
    assert r["kmv_estimate"] == est and r["n_seen"] == 300

    # restart with more ids — the sketch must merge, not reset
    ids2 = [1000 + i * 13 % 400 for i in range(200)]
    for v in ids2:
        w.publish(str(v), BASE_TS + 1000)
    r2 = run_once()[-1]
    k2, kth2, est2 = batch_kmv(ids1 + ids2)
    assert (r2["k_kept"], r2["kth_min_hash"]) == (k2, kth2)
    assert r2["kmv_estimate"] == est2 and r2["n_seen"] == 500


def test_rate_limiter_event_time_bucket_exact_and_restart(spark, tmp_path):
    """Token-bucket decisions are exact integer arithmetic on event
    time: a 25-message burst against burst=20 accepts exactly 20; after
    1 s of event time at rate=10 exactly 10 more fit; the bucket level
    survives a checkpoint restart."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        rate_limiter,
    )

    root = str(tmp_path / "rlog")
    w = EventLogWriter(root, "r1")
    for i in range(25):  # all at the same event time: pure burst
        w.publish("r1", BASE_TS)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "r1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "cast(value as string) as key",
            "unix_micros(timestamp) as us",
            "offset",
        )

    def run_once() -> list:
        got: list = []
        q = (
            rate_limiter(events_df(), rate_per_sec=10, burst=20)
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "rckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    r = run_once()[-1]
    assert (r["n_msgs"], r["n_accepted"], r["n_throttled"]) == (25, 20, 5)
    assert r["tokens_milli"] == 0

    # +1 s of event time refills 10 tokens; 12 arrivals -> 10 accepted.
    for i in range(12):
        w.publish("r1", BASE_TS + 1000)
    r2 = run_once()[-1]
    assert (r2["n_msgs"], r2["n_accepted"], r2["n_throttled"]) == (12, 10, 2)
    assert r2["tokens_milli"] == 0


def test_rate_limiter_matches_e50_batch_replay_bit_for_bit(spark, tmp_path):
    """VERDICT r7 task #4: the streaming token bucket and its batch
    replay twin (e50_token_bucket_replay) must produce bit-identical
    accept/throttle verdicts over the same log. Feed one user's sf0.001
    event history (same (us, event_id) order) through the streaming
    operator with e50's fine-grained rate and compare the final row to
    e50's output for that user."""
    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        E50_BURST,
        E50_RATE_MILLI,
        e50_token_bucket_replay,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        rate_limiter,
    )

    sf = TWIN_SF
    batch = {
        r["user_id"]: r
        for r in e50_token_bucket_replay(spark, sf).collect()
    }
    user = sorted(batch)[0]
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    ev = (
        table(spark, sf, "events")
        .selectExpr("user_id", "unix_micros(ts) as us", "event_id")
        .where(f"user_id = {user}")
        .orderBy("us", "event_id")
        .collect()
    )

    root = str(tmp_path / "e50log")
    w = EventLogWriter(root, "u")
    for r in ev:
        w.publish(str(user), r["us"] // 1000)  # publish ts is millis
    spark.dataSource.register(EventStreamDataSource)

    env = (
        spark.readStream.format("eventstream")
        .option("path", root)
        .option("stream", "u")
        .option("startingOrdinal", 0)
        .load()
    )
    events = env.selectExpr(
        "cast(value as string) as key", "unix_micros(timestamp) as us", "offset"
    )
    got: list = []
    q = (
        rate_limiter(
            events,
            burst=E50_BURST,
            rate_milli_per_ksec=E50_RATE_MILLI,
        )
        .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "e50ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = got[-1]
    b = batch[user]
    assert (
        r["n_msgs"],
        r["n_accepted"],
        r["n_throttled"],
        r["tokens_milli"],
    ) == (
        b["n_msgs"],
        b["n_accepted"],
        b["n_throttled"],
        b["tokens_milli"],
    )


def test_streaming_ddsketch_matches_batch_x20_bit_for_bit(spark, tmp_path):
    """The streaming DDSketch over the whole log must equal the batch
    x20 computation on the same values — same power-of-2 histogram,
    same ceil(q*n) ranks, same chosen buckets — including across a
    checkpoint restart. The batch side here is the x20 plan's own
    expressions (length(bin(v))-1, ceil(q*n)) run through Spark SQL."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        DDS_QS,
        ddsketch_quantiles,
    )

    root = str(tmp_path / "dlog")
    w = EventLogWriter(root, "d1")
    vals1 = [((i * 7919) % 100000) + 1 for i in range(400)]
    for v in vals1:
        w.publish(str(v), BASE_TS)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "d1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "'d1' as key", "CAST(cast(value as string) AS BIGINT) as value_id"
        )

    def run_once() -> list:
        got: list = []
        q = (
            ddsketch_quantiles(events_df())
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "dckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    def batch_x20(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        df.createOrReplaceTempView("dds_vals")
        hist = {
            r["bucket"]: r["c"]
            for r in spark.sql(
                "SELECT length(bin(v)) - 1 AS bucket, COUNT(*) AS c "
                "FROM dds_vals GROUP BY 1"
            ).collect()
        }
        n = len(vals)
        chosen = []
        for q in DDS_QS:
            rank = spark.sql(f"SELECT CEIL({q} * {n}) AS r").collect()[0]["r"]
            cum = 0
            for b in sorted(hist):
                cum += hist[b]
                if cum >= rank:
                    chosen.append(b)
                    break
        return chosen

    r = run_once()[-1]
    assert r["n_seen"] == 400
    assert [r["b50"], r["b95"], r["b99"]] == batch_x20(vals1)
    assert r["est50_x2"] == 3 << r["b50"]

    # restart with more values — the sketch must merge, not reset
    vals2 = [((i * 104729) % 4000) + 1 for i in range(250)]
    for v in vals2:
        w.publish(str(v), BASE_TS + 1000)
    r2 = run_once()[-1]
    assert r2["n_seen"] == 650
    assert [r2["b50"], r2["b95"], r2["b99"]] == batch_x20(vals1 + vals2)


def test_streaming_histogram_drift_matches_batch_x26_math(spark, tmp_path):
    """The streaming drift monitor must reproduce batch x26's math over
    the same values: identical clamped bucketing (verified through the
    batch plan's own SQL expression) and identical exact-integer
    cross-scaled KS/L1, here in ppm — including rolling the open period
    into the reference across a checkpoint RESTART."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        DRIFT_BUCKETS,
        histogram_drift,
    )

    LO, W = 100, 50
    p0 = [(i * 37) % 2000 + 100 for i in range(300)]
    p1 = [(i * 53) % 2600 + 400 for i in range(260)]  # shifted: real drift

    root = str(tmp_path / "hlog")
    w = EventLogWriter(root, "h1")
    for v in p0:
        w.publish(f"0:{v}", BASE_TS)
    for v in p1:
        w.publish(f"1:{v}", BASE_TS + 1000)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "h1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "'h1' as key",
            "CAST(split(cast(value as string), ':')[0] AS BIGINT) as period",
            "CAST(split(cast(value as string), ':')[1] AS BIGINT) as value_id",
        )

    def run_once() -> list:
        got: list = []
        q = (
            histogram_drift(events_df(), lo=LO, width=W)
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "hckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    def batch_hist(vals):
        """Histogram via the batch x26 bucket expression run through
        Spark SQL — proves the streaming bucketing is the same rule."""
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        df.createOrReplaceTempView("drift_vals")
        rows = spark.sql(
            f"SELECT LEAST(GREATEST((v - {LO}) div {W}, 0),"
            f" {DRIFT_BUCKETS - 1}) AS b, COUNT(*) AS c"
            " FROM drift_vals GROUP BY 1"
        ).collect()
        h = [0] * DRIFT_BUCKETS
        for r in rows:
            h[r["b"]] = r["c"]
        return h

    def ppm(ref, cur):
        n_r, n_c = sum(ref), sum(cur)
        cum_r = cum_c = ks = l1 = 0
        for r, c in zip(ref, cur):
            cum_r += r
            cum_c += c
            ks = max(ks, abs(cum_c * n_r - cum_r * n_c))
            l1 += abs(c * n_r - r * n_c)
        return ks * 1_000_000 // (n_r * n_c), l1 * 1_000_000 // (n_r * n_c)

    r = run_once()[-1]
    want_ks, want_l1 = ppm(batch_hist(p0), batch_hist(p1))
    assert (r["period"], r["n_ref"], r["n_cur"]) == (1, 300, 260)
    assert (r["ks_ppm"], r["l1_ppm"]) == (want_ks, want_l1)
    assert r["ks_ppm"] > 0  # the shift is real drift, not a degenerate 0

    # restart: period 2 arrives — period 1 must roll into the reference
    p2 = [(i * 29) % 1500 + 200 for i in range(180)]
    for v in p2:
        w.publish(f"2:{v}", BASE_TS + 2000)
    r2 = run_once()[-1]
    want_ks2, want_l12 = ppm(batch_hist(p1), batch_hist(p2))
    assert (r2["period"], r2["n_ref"], r2["n_cur"]) == (2, 260, 180)
    assert (r2["ks_ppm"], r2["l1_ppm"]) == (want_ks2, want_l12)


def test_streaming_ams_f2_matches_batch_x27_fold_bit_for_bit(spark, tmp_path):
    """The seventh batch/stream twin (VERDICT r8 task #7): the streaming
    AMS F2 sketch must reproduce batch x27's fold over the same log —
    identical signed counters through the SHARED sign-hash family
    (functions/hashing.py AMS_*, one declaration), hence identical
    min / median(×2) / max squared-counter estimates — including across a
    checkpoint RESTART."""
    from squonk2_fastapi_ws_event_stream_spark.functions.hashing import (
        AMS_A,
        AMS_B,
        AMS_D,
        AMS_P,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import ams_f2

    vals0 = [(i * 37) % 97 + 3 for i in range(400)]  # skewed small domain
    vals1 = [(i * 53) % 211 + 11 for i in range(250)]

    root = str(tmp_path / "amslog")
    w = EventLogWriter(root, "a1")
    for v in vals0:
        w.publish(str(v), BASE_TS)
    spark.dataSource.register(EventStreamDataSource)

    def events_df():
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "a1")
            .option("startingOrdinal", 0)
            .load()
        )
        return env.selectExpr(
            "'a1' as key", "CAST(cast(value as string) AS BIGINT) as value_id"
        )

    def run_once() -> list:
        got: list = []
        q = (
            ams_f2(events_df())
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "amsckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    def batch_fold(vals):
        """Batch x27's sketch expressions run through Spark SQL over the
        same values — proves the streaming counters are the same fold."""
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        exprs = ", ".join(
            f"SUM(1 - 2 * ((v * {AMS_A[i]} + {AMS_B[i]}) % {AMS_P} % 2)) AS z{i}"
            for i in range(AMS_D)
        )
        df.createOrReplaceTempView("ams_vals")
        row = spark.sql(f"SELECT {exprs} FROM ams_vals").collect()[0]
        sq = sorted(int(row[f"z{i}"]) ** 2 for i in range(AMS_D))
        return sq[0], sq[AMS_D // 2 - 1] + sq[AMS_D // 2], sq[AMS_D - 1]

    r = run_once()[-1]
    want = batch_fold(vals0)
    assert r["n_events"] == len(vals0)
    assert (r["est_min"], r["est_median_x2"], r["est_max"]) == want

    # restart: more events — the counters must CONTINUE from state, so
    # the post-restart sketch equals one batch fold over the full prefix
    for v in vals1:
        w.publish(str(v), BASE_TS + 1000)
    r2 = run_once()[-1]
    want2 = batch_fold(vals0 + vals1)
    assert r2["n_events"] == len(vals0) + len(vals1)
    assert (r2["est_min"], r2["est_median_x2"], r2["est_max"]) == want2


def test_streaming_funnel_matches_batch_e18_bit_for_bit(spark, tmp_path):
    """The eighth batch/stream twin: per-user streaming funnel states,
    aggregated, must reproduce batch e18_conversion_funnel's published
    step counts AND its exact integer-micros conversion rates over the
    same event log — including across a checkpoint restart mid-log.

    Semantics note (why greedy-in-order == e18's min-after-previous):
    e18 takes t_s = MIN(signup ts), t_c = MIN(click ts >= t_s),
    t_p = MIN(purchase ts >= t_c). Feeding the log ordered by
    (ts, funnel-stage-rank, event_id) makes the tracker's first-match
    scan find exactly those minima: any qualifying click sorts after
    the signup that qualifies it (the stage-rank tiebreak covers
    ts-equality, where e18's >= still counts the click).

    At sf0.001 every real user fully converts (15/15/15 — degenerate),
    so the log is AUGMENTED with adversarial users that exercise each
    gate: steps before signup, purchase without click, a purchase
    BETWEEN signup and click (must be ignored), exact-ts ties, and a
    step-free user. e18 runs on the same augmented table written to a
    tmp sf-dir, so both paths see identical data."""
    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        e18_conversion_funnel,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        FUNNEL_STEPS,
        funnel_tracker,
    )
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    sf = TWIN_SF
    T = BASE_TS
    # (user_id, event_type, ms) — expected final stages in EXPECT below
    adversarial = [
        (9001, "click", T), (9001, "signup", T + 1_000),
        (9002, "signup", T), (9002, "purchase", T + 1_000),
        (9003, "signup", T), (9003, "purchase", T + 1_000),
        (9003, "click", T + 2_000), (9003, "purchase", T + 3_000),
        (9004, "view", T),
        (9005, "signup", T), (9005, "click", T), (9005, "purchase", T),
        (9006, "click", T), (9006, "purchase", T + 1_000),
        (9006, "signup", T + 2_000), (9006, "click", T + 3_000),
        (9007, "signup", T), (9007, "purchase", T + 1_000),
        (9007, "click", T + 2_000),
    ]
    EXPECT = {9001: 1, 9002: 1, 9003: 3, 9004: 0, 9005: 3, 9006: 2, 9007: 2}

    aug_dir = str(tmp_path / "augsf")
    real = table(spark, sf, "events")
    synth = spark.createDataFrame(
        [
            (10_000 + i, ms, uid, et, 0.0, "{}")
            for i, (uid, et, ms) in enumerate(adversarial)
        ],
        "event_id long, ms long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "timestamp_millis(ms) as ts", "user_id", "event_type",
        "value", "props",
    )
    real.select(*synth.columns).unionByName(synth).write.parquet(
        aug_dir + "/events.parquet"
    )

    batch = {
        r["step"]: r for r in e18_conversion_funnel(spark, aug_dir).collect()
    }

    rank = {s: i for i, s in enumerate(FUNNEL_STEPS)}
    ev = (
        table(spark, aug_dir, "events")
        .selectExpr(
            "user_id",
            "event_type",
            "unix_micros(ts) as us",
            "unix_millis(ts) as ms",
            "event_id",
        )
        .collect()
    )
    # full-precision (us) ordering: a sub-ms ts difference must win over
    # the stage-rank tiebreak, or the tracker could count a click whose
    # true ts is BEFORE the signup e18 anchors on
    ev.sort(key=lambda r: (r["us"], rank.get(r["event_type"], 99), r["event_id"]))
    n_users = len({r["user_id"] for r in ev})

    root = str(tmp_path / "funlog")
    w = EventLogWriter(root, "f1")
    spark.dataSource.register(EventStreamDataSource)

    def run_once(states: dict) -> None:
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "f1")
            .option("startingOrdinal", 0)
            .load()
        )
        events = env.selectExpr(
            r"split(cast(value as string), '\\|')[0] as user",
            r"split(cast(value as string), '\\|')[1] as step",
            "unix_millis(timestamp) as ms",
            "offset",
        )

        def keep_last(df, _id):
            for row in df.collect():
                states[row["user"]] = row

        q = (
            funnel_tracker(events)
            .writeStream.foreachBatch(keep_last)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "funckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # first half, run, then the rest, run again from the SAME checkpoint:
    # per-user stage state must survive the restart for the totals to match
    half = len(ev) // 2
    for r in ev[:half]:
        w.publish(f"{r['user_id']}|{r['event_type']}", r["ms"])
    states: dict = {}
    run_once(states)
    for r in ev[half:]:
        w.publish(f"{r['user_id']}|{r['event_type']}", r["ms"])
    run_once(states)

    assert len(states) == n_users
    # the adversarial users hit exactly the expected gate each
    for uid, stage in EXPECT.items():
        assert states[str(uid)]["stage"] == stage, uid
    n_signup = sum(1 for s in states.values() if s["stage"] >= 1)
    n_click = sum(1 for s in states.values() if s["stage"] >= 2)
    n_purchase = sum(1 for s in states.values() if s["stage"] == 3)
    assert n_signup == batch["signup"]["n_users"]
    assert n_click == batch["click_after_signup"]["n_users"]
    assert n_purchase == batch["purchase_after_click"]["n_users"]
    # the published rates are integer micros / 1e6 — recompute the SAME
    # integers from the streaming counts: identical doubles, not approx
    assert batch["signup"]["conv_from_prev"] == (
        n_signup * 1_000_000 // n_users / 1e6
    )
    assert batch["click_after_signup"]["conv_from_prev"] == (
        n_click * 1_000_000 // n_signup / 1e6
    )
    assert batch["purchase_after_click"]["conv_from_prev"] == (
        n_purchase * 1_000_000 // n_click / 1e6
    )
    # converted users carry an exact signup->purchase latency in state
    assert all(
        s["conv_ms"] >= 0 for s in states.values() if s["stage"] == 3
    )


def test_streaming_twap_matches_batch_e41_fold_bit_for_bit(spark, tmp_path):
    """The ninth batch/stream twin: the streaming TWAP's integer state
    (value-time integral, held duration, observation counts) must equal
    e41_time_weighted_avg's fold over the same log, per event_type —
    including across a checkpoint restart mid-log.

    e41's day-partitioned windows + calendar stitching are algebraically
    one global (us, event_id)-ordered integral per event_type; the twin
    recomputes that global form inline (exact decimal cents x micros)
    and also cross-checks the two exact columns e41 itself publishes
    (n_obs, span_us). The published twap double is ROUND-bearing until
    the round-10 conversion, so the integral is compared in integers —
    twap_milli = vt x 10 DIV dur — not through the float."""
    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        e41_time_weighted_avg,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        twap_tracker,
    )
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    sf = TWIN_SF
    ev = (
        table(spark, sf, "events")
        .selectExpr(
            "event_type",
            "unix_micros(ts) as us",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) as cents",
            "event_id",
        )
        .collect()
    )
    ev.sort(key=lambda r: (r["us"], r["event_id"]))

    # inline global fold of e41's integral (its day windows + stitching
    # are equivalence-tested elsewhere; per key this is the same sum)
    want: dict = {}
    for r in ev:
        k = r["event_type"]
        last_us, last_cents, vt, dur, n = want.get(k, (-1, 0, 0, 0, 0))
        if last_us >= 0:
            vt += last_cents * (r["us"] - last_us)
            dur += r["us"] - last_us
        want[k] = (r["us"], r["cents"], vt, dur, n + 1)

    batch = {r["event_type"]: r for r in e41_time_weighted_avg(spark, sf).collect()}

    root = str(tmp_path / "twaplog")
    w = EventLogWriter(root, "w1")
    spark.dataSource.register(EventStreamDataSource)

    def run_once(states: dict) -> None:
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "w1")
            .option("startingOrdinal", 0)
            .load()
        )
        obs = env.selectExpr(
            r"split(cast(value as string), '\\|')[0] as key",
            r"CAST(split(cast(value as string), '\\|')[1] AS BIGINT) as cents",
            r"CAST(split(cast(value as string), '\\|')[2] AS BIGINT) as us",
            "offset",
        )

        def keep_last(df, _id):
            for row in df.collect():
                states[row["key"]] = row

        q = (
            twap_tracker(obs)
            .writeStream.foreachBatch(keep_last)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "twapckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half = len(ev) // 2
    states: dict = {}
    for r in ev[:half]:
        w.publish(f"{r['event_type']}|{r['cents']}|{r['us']}", r["us"] // 1000)
    run_once(states)
    for r in ev[half:]:
        w.publish(f"{r['event_type']}|{r['cents']}|{r['us']}", r["us"] // 1000)
    run_once(states)

    assert set(states) == set(want) == set(batch)
    for k, (last_us, last_cents, vt, dur, n) in want.items():
        s = states[k]
        assert s["late"] == 0
        assert s["n_obs"] == n == batch[k]["n_obs"]
        assert s["span_us"] == dur == batch[k]["span_us"]
        assert s["twap_milli"] == vt * 10 // dur
        assert s["last_value_milli"] == last_cents * 10


def test_streaming_cusum_norearm_matches_batch_e32_bit_for_bit(spark, tmp_path):
    """The tenth batch/stream twin: cusum_monitor(rearm=False) over a
    key's day-ordered centered series must reproduce batch
    e32_cusum_changepoint exactly — same alarm-day count, same first
    alarm day, same closing Page statistic — in pure integers.

    e32 centers without division (d = cnt*n_days - total, threshold
    h = E32_H_MULT*total), so feeding that exact integer series with
    target 0 makes the streaming fold e32's statistic verbatim. The
    real sf0.001 types never alarm (uniform synthetic traffic), so the
    table is augmented with an 'incident' type whose last two days
    burst past h — covering the alarm branch, first-alarm capture, and
    the no-rearm above-threshold counting that distinguishes this form
    from the operational rearm=True default."""
    import datetime as dt

    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        E32_H_MULT,
        e32_cusum_changepoint,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        cusum_monitor,
    )
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    sf = TWIN_SF
    day0 = dt.date(2020, 1, 1)
    counts = [5, 5, 5, 5, 5, 5, 5, 5, 200, 250]  # stats: 0x8, 1510, 3520; h=1470
    incident = []
    eid = 20_000
    for i, cnt in enumerate(counts):
        ms = int(
            dt.datetime(2020, 1, 1 + i, 12, tzinfo=dt.timezone.utc).timestamp()
            * 1000
        )
        for _ in range(cnt):
            incident.append((eid, ms, 1, "incident", 0.0, "{}"))
            eid += 1

    aug_dir = str(tmp_path / "augsf")
    real = table(spark, sf, "events")
    synth = spark.createDataFrame(
        incident,
        "event_id long, ms long, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "timestamp_millis(ms) as ts", "user_id", "event_type",
        "value", "props",
    )
    real.select(*synth.columns).unionByName(synth).write.parquet(
        aug_dir + "/events.parquet"
    )

    batch = {
        r["event_type"]: r
        for r in e32_cusum_changepoint(spark, aug_dir).collect()
    }

    # day-ordered centered series per type, straight from the same table
    daily = (
        table(spark, aug_dir, "events")
        .selectExpr("event_type", "CAST(ts AS DATE) as day")
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["count"]))
    for v in series.values():
        v.sort()

    spark.dataSource.register(EventStreamDataSource)

    def stream_one(etype: str) -> dict:
        days = series[etype]
        n_days, total = len(days), sum(c for _, c in days)
        root = str(tmp_path / f"cusumlog-{etype}")
        w = EventLogWriter(root, etype)
        for _day, cnt in days:
            w.publish(str(cnt * n_days - total), BASE_TS)
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", etype)
            .option("startingOrdinal", 0)
            .load()
        )
        obs = env.selectExpr(
            f"'{etype}' as key",
            "CAST(cast(value as string) AS BIGINT) as cents",
            "offset",
        )
        got: list = []
        q = (
            cusum_monitor(
                obs,
                target_cents=0,
                threshold_cents=E32_H_MULT * total,
                rearm=False,
            )
            .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"cusumckpt-{etype}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got[-1]

    # the alarming type: 2 above-threshold days, first on day 9
    r = stream_one("incident")
    b = batch["incident"]
    assert r["n_obs"] == b["n_days"] == len(counts)
    assert r["n_alarms"] == b["n_alarm_days"] == 2
    assert r["first_alarm_n"] == 9
    assert (
        series["incident"][r["first_alarm_n"] - 1][0].isoformat()
        == b["first_alarm_day"]
    )
    assert r["stat"] == 3520

    # a real type that never alarms: identical zero-alarm accounting
    r2 = stream_one("view")
    b2 = batch["view"]
    assert r2["n_obs"] == b2["n_days"]
    assert r2["n_alarms"] == 0 == b2["n_alarm_days"]
    assert r2["first_alarm_n"] == 0 and b2["first_alarm_day"] is None


def test_streaming_hourly_monitor_matches_batch_e21_bit_for_bit(spark, tmp_path):
    """The eleventh batch/stream twin: hourly_anomaly_monitor over the
    ts-ordered sf0.001 log must flag exactly the hours
    e21_hourly_anomalies flags — same (key, hour_no, n_events) set and
    the same integer-micros ratio doubles — across a checkpoint restart
    that splits the log mid-stream. The only excluded rows are each
    key's final hour, which never closes in the stream (the batch
    replay is the tool for the trailing edge)."""
    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        e21_hourly_anomalies,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        hourly_anomaly_monitor,
    )
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    sf = TWIN_SF
    ev = (
        table(spark, sf, "events")
        .selectExpr(
            "event_type",
            "CAST(unix_micros(ts) / 3600000000 AS BIGINT) as hour_no",
            "unix_micros(ts) as us",
        )
        .collect()
    )
    ev.sort(key=lambda r: r["us"])
    last_hour = {}
    for r in ev:
        last_hour[r["event_type"]] = max(
            last_hour.get(r["event_type"], -1), r["hour_no"]
        )

    want = {
        (r["event_type"], r["hour_no"]): (r["n_events"], r["ratio"])
        for r in e21_hourly_anomalies(spark, sf).collect()
        if r["hour_no"] < last_hour[r["event_type"]]
    }
    assert len(want) > 50  # the comparison is not vacuous at sf0.001

    root = str(tmp_path / "hourlog")
    w = EventLogWriter(root, "h1")
    spark.dataSource.register(EventStreamDataSource)

    got: dict = {}

    def run_once() -> None:
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "h1")
            .option("startingOrdinal", 0)
            .load()
        )
        events = env.selectExpr(
            r"split(cast(value as string), '\\|')[0] as key",
            r"CAST(split(cast(value as string), '\\|')[1] AS BIGINT) as hour_no",
        )
        q = (
            hourly_anomaly_monitor(events)
            .writeStream.foreachBatch(
                lambda df, _id: got.update(
                    {
                        (r["key"], r["hour_no"]): (r["n_events"], r["ratio"])
                        for r in df.collect()
                    }
                )
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "hourckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half = len(ev) // 2
    for r in ev[:half]:
        w.publish(f"{r['event_type']}|{r['hour_no']}", r["us"] // 1000)
    run_once()
    for r in ev[half:]:
        w.publish(f"{r['event_type']}|{r['hour_no']}", r["us"] // 1000)
    run_once()

    assert got == want


def test_streaming_totals_match_batch_e07_bit_for_bit(spark, tmp_path):
    """The twelfth batch/stream twin: running_totals per event_type over
    the sf0.001 props payloads must reproduce every column
    e07_message_stats publishes — counts, byte totals, min/max message
    size, and the exact integer-micros avg_bytes — across a checkpoint
    restart mid-log. (props is ASCII in the test tables, so
    octet_length == the batch side's length.)"""
    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        e07_message_stats,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        running_totals,
    )
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    sf = TWIN_SF
    batch = {r["event_type"]: r for r in e07_message_stats(spark, sf).collect()}
    ev = (
        table(spark, sf, "events")
        .selectExpr("event_type", "props", "event_id")
        .collect()
    )

    root = str(tmp_path / "totlog")
    w = EventLogWriter(root, "t1")
    spark.dataSource.register(EventStreamDataSource)

    states: dict = {}

    def run_once() -> None:
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "t1")
            .option("startingOrdinal", 0)
            .load()
        )
        # re-key the envelope: first '|' splits type from the raw payload
        shaped = env.selectExpr(
            "substring_index(cast(value as string), '|', 1) as key",
            "substring(cast(value as string), "
            "length(substring_index(cast(value as string), '|', 1)) + 2) as value",
        )
        q = (
            running_totals(shaped)
            .writeStream.foreachBatch(
                lambda df, _id: states.update(
                    {r["key"]: r for r in df.collect()}
                )
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "totckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half = len(ev) // 2
    for r in ev[:half]:
        w.publish(f"{r['event_type']}|{r['props']}", BASE_TS)
    run_once()
    for r in ev[half:]:
        w.publish(f"{r['event_type']}|{r['props']}", BASE_TS + 1000)
    run_once()

    assert set(states) == set(batch)
    for k, b in batch.items():
        s = states[k]
        assert s["total_messages"] == b["total_messages"]
        assert s["total_bytes"] == b["total_bytes"]
        assert s["min_bytes"] == b["min_bytes"]
        assert s["max_bytes"] == b["max_bytes"]
        # e07's avg_bytes is integer micros / 1e6 — same integer, same double
        assert b["avg_bytes"] == (
            s["total_bytes"] * 1_000_000 // s["total_messages"] / 1e6
        )


def test_streaming_latest_state_matches_batch_e14_bit_for_bit(spark, tmp_path):
    """The thirteenth batch/stream twin: latest_state over the log fed
    in e14's winner order — (ts us, event_id) ascending per
    (user, event_type) key — must elect exactly e14_log_compaction's
    winners: same last_event_id, same full-precision last_ts_us, and
    the same raw parquet double last_value (round-tripped through
    repr(), which is exact for IEEE doubles) — across a checkpoint
    restart mid-log."""
    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        e14_log_compaction,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        latest_state,
    )
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    sf = TWIN_SF
    batch = {
        (r["user_id"], r["event_type"]): r
        for r in e14_log_compaction(spark, sf).collect()
    }
    ev = (
        table(spark, sf, "events")
        .selectExpr(
            "user_id", "event_type", "unix_micros(ts) as us",
            "event_id", "value",
        )
        .collect()
    )
    ev.sort(key=lambda r: (r["us"], r["event_id"]))

    root = str(tmp_path / "complog")
    w = EventLogWriter(root, "c1")
    spark.dataSource.register(EventStreamDataSource)

    final: dict = {}

    def run_once() -> None:
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "c1")
            .option("startingOrdinal", 0)
            .load()
        )
        shaped = env.selectExpr(
            "substring_index(cast(value as string), '#', 1) as key",
            "substring(cast(value as string), "
            "length(substring_index(cast(value as string), '#', 1)) + 2) as value",
            "offset",
            "timestamp",
        )
        q = (
            latest_state(shaped)
            .writeStream.foreachBatch(
                lambda df, _id: final.update({r["key"]: r for r in df.collect()})
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "compckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half = len(ev) // 2
    for r in ev[:half]:
        w.publish(
            f"{r['user_id']}:{r['event_type']}#{r['event_id']}|{r['us']}|{r['value']!r}",
            r["us"] // 1000,
        )
    run_once()
    for r in ev[half:]:
        w.publish(
            f"{r['user_id']}:{r['event_type']}#{r['event_id']}|{r['us']}|{r['value']!r}",
            r["us"] // 1000,
        )
    run_once()

    assert len(final) == len(batch)
    for (uid, etype), b in batch.items():
        s = final[f"{uid}:{etype}"]
        eid, us, val = s["last_value"].split("|")
        assert int(eid) == b["last_event_id"]
        assert int(us) == b["last_ts_us"]
        assert float(val) == b["last_value"]  # exact: repr round-trips IEEE


def test_streaming_decayed_counts_match_batch_e29_bit_for_bit(spark, tmp_path):
    """The fourteenth batch/stream twin: decayed_counts(shift=40) over
    the per-type sf0.001 log must reproduce e29_decayed_trending
    exactly — same n_events, the same exact scaled weighted sum
    (sum of cnt·2^(40-age)), hence the same published integer-micros
    decayed_score and the same rank order. This is what the per-day
    count ring buys: the old single-counter form right-shifted an
    aggregated sum on day advance, flooring away carry bits that e29's
    per-event weighting keeps. Restart mid-log included; every type has
    events on the global max day (asserted), so per-key as_of aligns
    with e29's global horizon."""
    from squonk2_fastapi_ws_event_stream_spark.operators.events import (
        E29_SHIFT,
        e29_decayed_trending,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        decayed_counts,
    )
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    sf = TWIN_SF
    batch = {r["event_type"]: r for r in e29_decayed_trending(spark, sf).collect()}
    ev = (
        table(spark, sf, "events")
        .selectExpr("event_type", "unix_millis(ts) as ms")
        .collect()
    )
    global_max_day = max(r["ms"] for r in ev) // 86_400_000

    root = str(tmp_path / "declog")
    w = EventLogWriter(root, "d9")
    spark.dataSource.register(EventStreamDataSource)

    states: dict = {}

    def run_once() -> None:
        env = (
            spark.readStream.format("eventstream")
            .option("path", root)
            .option("stream", "d9")
            .option("startingOrdinal", 0)
            .load()
        )
        shaped = env.selectExpr("cast(value as string) as key", "timestamp")
        q = (
            decayed_counts(shaped, shift=E29_SHIFT)
            .writeStream.foreachBatch(
                lambda df, _id: states.update({r["key"]: r for r in df.collect()})
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "decckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    half = len(ev) // 2
    for r in ev[:half]:
        w.publish(r["event_type"], r["ms"])
    run_once()
    for r in ev[half:]:
        w.publish(r["event_type"], r["ms"])
    run_once()

    assert set(states) == set(batch)
    for k, b in batch.items():
        s = states[k]
        assert s["as_of_day"] == global_max_day  # alignment precondition
        assert s["n_events"] == b["n_events"]
        # same integer -> same published double
        assert b["decayed_score"] == (
            s["scaled"] * 1_000_000 // (1 << E29_SHIFT) / 1e6
        )
    # identical ranking: scaled desc, type asc == e29's published rank
    order = sorted(states, key=lambda k: (-states[k]["scaled"], k))
    for i, k in enumerate(order, 1):
        assert batch[k]["rank"] == i


def test_streaming_heavy_hitters_bounded_by_batch_x30_contract(spark, tmp_path):
    """The 16th twin — BOUNDED, not bit-identical (the one deliberately
    approximate stateful op): streaming heavy_hitters (Space-Saving)
    over a log must satisfy, against the exact batch counts of the SAME
    item sequence, the error contract batch x30 verifies for its own
    Misra-Gries pass — per shard with n items and capacity c:

      1. reported >= true                     (SS never undercounts)
      2. reported - overcount <= true         (corrected lower bound)
      3. overcount <= n_shard // capacity     (the MG/SS error bound)
      4. every key with true > n_shard // capacity is PRESENT
         (x30's guaranteed_present_ok, the reason the sketch is usable)

    — across a CHECKPOINT RESTART (half the log per run), with the
    sharding recomputed batch-side through the same xxhash64 rule, so
    the bound is checked per shard exactly as the state is kept."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import heavy_hitters

    N_SHARDS, CAPACITY = 4, 8
    # Adversarial mix: two heavies, a mid tier, and a churn tail that
    # forces evictions (tail keys outnumber capacity many times over).
    seq = (
        ["hot"] * 240
        + ["warm"] * 90
        + [f"mid{i % 6}" for i in range(120)]
        + [f"tail{i}" for i in range(160)]
    )
    # Deterministic interleave so heavies arrive throughout both halves.
    seq = [seq[i] for i in range(0, len(seq), 3)] + [
        seq[i] for i in range(1, len(seq), 3)
    ] + [seq[i] for i in range(2, len(seq), 3)]

    root = str(tmp_path / "hhlog")
    w = EventLogWriter(root, "hh2")
    spark.dataSource.register(EventStreamDataSource)

    latest: dict = {}

    def run_once() -> None:
        q = (
            heavy_hitters(
                spark.readStream.format("eventstream")
                .option("path", root)
                .option("stream", "hh2")
                .option("startingOrdinal", 0)
                .load()
                .selectExpr("cast(value as string) as item"),
                item_col="item",
                n_shards=N_SHARDS,
                capacity=CAPACITY,
            )
            .writeStream.foreachBatch(
                lambda df, _id: latest.update({r["shard"]: r for r in df.collect()})
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "hh2ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    half = len(seq) // 2
    for i, item in enumerate(seq[:half]):
        w.publish(item, BASE_TS + i * 10)
    run_once()
    for i, item in enumerate(seq[half:]):
        w.publish(item, BASE_TS + (half + i) * 10)
    run_once()  # restart: state continues from the checkpoint

    # Batch ground truth over the same sequence, sharded by the SAME rule.
    items_df = spark.createDataFrame([(s,) for s in seq], "item string")
    truth_rows = (
        items_df.selectExpr(
            "item",
            f"cast((xxhash64(item) % {N_SHARDS} + {N_SHARDS}) % {N_SHARDS}"
            " as string) as shard",
        )
        .groupBy("shard", "item")
        .count()
        .collect()
    )
    true_counts: dict = {}
    n_shard: dict = {}
    for r in truth_rows:
        true_counts[(r["shard"], r["item"])] = r["count"]
        n_shard[r["shard"]] = n_shard.get(r["shard"], 0) + r["count"]

    assert set(latest) == set(n_shard), "every shard must report"
    for shard, row in latest.items():
        bound = n_shard[shard] // CAPACITY
        assert len(row["keys"]) <= CAPACITY
        reported = dict(zip(row["keys"], zip(row["counts"], row["overcounts"])))
        for key, (cnt, over) in reported.items():
            true = true_counts.get((shard, key), 0)
            assert cnt >= true, (shard, key)  # 1. never undercounts
            assert cnt - over <= true, (shard, key)  # 2. corrected lower bound
            assert over <= bound, (shard, key, over, bound)  # 3. MG/SS bound
        for (s2, key), true in true_counts.items():
            if s2 == shard and true > bound:
                assert key in reported, (
                    f"guaranteed-present violated: {key} true={true} "
                    f"> bound={bound} absent from shard {shard}"
                )  # 4. x30's guaranteed_present_ok
