"""Custom stateful streaming operator: per-stream running totals via
``applyInPandasWithState``.

The reference keeps per-connection counters in Python dicts
(/root/reference/app/app.py:91-95,424-426,499-501) — ephemeral, lost on
restart. The Spark-native equivalent is a keyed state store: durable
across micro-batches (and restarts, via the checkpoint), partitioned by
stream key, with timeout-based eviction bounding state size at scale.

Emits one row per (stream, micro-batch): cumulative message count and
byte total — the A1 stats as a *stream* instead of a log line.

API choice: Spark 4's `transformWithStateInPandas` (typed state, TTL,
timers) is the successor API, but it cannot run in this environment.
Re-probed on Spark 4.1.2 (round 6): the "driver worker exited
unexpectedly (crashed)" failure root-causes to
`STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE` with
`ImportError: cannot import name 'descriptor' from 'google.protobuf'` —
the TWS state-server protocol speaks protobuf between the JVM and a
long-lived Python runner, and the `google.protobuf` package is absent
in this container (`ModuleNotFoundError: No module named 'google'`;
installs are not permitted). Environment-bound, not a Spark bug:
re-probe when protobuf is available. The operators stay on
`applyInPandasWithState`, which is fully functional, restart-tested,
and (as of round 6) evicts idle keys via ProcessingTimeTimeout — the
one feature TWS timers would have given us for free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, total_messages long, total_bytes long, "
    "min_bytes long, max_bytes long, batch_messages long"
)
STATE_SCHEMA = (
    "total_messages long, total_bytes long, min_bytes long, max_bytes long"
)

# Idle-key eviction (round-6 task #4): stream keys are unbounded over
# months of churn, so NoTimeout state is O(all keys ever seen) — a slow
# leak that eventually exceeds the state store. Every operator below
# arms a ProcessingTimeTimeout per key and removes the key's state once
# it has been idle past retention. Eviction is SAFE here because the
# broker's own retention window bounds what a re-appearing key could
# need: a key idle longer than the broker retention has no replayable
# history, so its counters restart from zero exactly as a fresh consumer
# would observe. Keep DEFAULT_IDLE_RETENTION_MS >= the broker retention.
DEFAULT_IDLE_RETENTION_MS = 6 * 3_600_000  # 6h, matches eventstream default


def _update_totals_fn(retention_ms: int):
    def _update_totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Key idle past retention: drop its two-long state row. A
            # later re-appearance restarts from zero (re-derivable from
            # the broker within its retention; see module note).
            state.remove()
            return
        total_msgs, total_bytes, min_bytes, max_bytes = (
            state.get if state.exists else (0, 0, -1, -1)
        )
        batch_msgs = 0
        for pdf in pdfs:
            batch_msgs += len(pdf)
            total_msgs += len(pdf)
            total_bytes += int(pdf["n_bytes"].sum())
            if len(pdf):
                lo, hi = int(pdf["n_bytes"].min()), int(pdf["n_bytes"].max())
                min_bytes = lo if min_bytes < 0 else min(min_bytes, lo)
                max_bytes = max(max_bytes, hi)
        state.update((total_msgs, total_bytes, min_bytes, max_bytes))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total_messages": [total_msgs],
                "total_bytes": [total_bytes],
                "min_bytes": [min_bytes],
                "max_bytes": [max_bytes],
                "batch_messages": [batch_msgs],
            }
        )

    return _update_totals


def running_totals(
    envelope: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming cumulative (messages, bytes, min/max message size) per
    stream key — the A1 server-stats shape plus e07's size extremes
    (min/max are -1 until the key's first message). Keys idle past
    `retention_ms` are evicted from the state store."""
    sized = envelope.select(
        "key", F.octet_length("value").cast("long").alias("n_bytes")
    )
    return sized.groupBy("key").applyInPandasWithState(
        _update_totals_fn(retention_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming changelog compaction — the streaming twin of the e14 batch
# operator: latest (offset, value) per stream key, updated each
# micro-batch from keyed state. The state per key is one row (the current
# winner), so state size is O(keys) regardless of throughput; the offset
# total-order (monotonic ordinals, README.md:172-180) makes the fold
# associative and restart-safe: replaying a batch can only re-apply
# max-by-offset.
# ---------------------------------------------------------------------------
COMPACT_OUTPUT_SCHEMA = "key string, last_offset long, last_value string"
COMPACT_STATE_SCHEMA = "last_offset long, last_value string"


def _update_latest_fn(retention_ms: int):
    def _update_latest(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Idle key: its compacted row ages out with the broker's own
            # retention — downstream re-derives it from a replay if the
            # key ever returns.
            state.remove()
            return
        best_off, best_val = state.get if state.exists else (-1, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            idx = pdf["offset"].idxmax()
            off = int(pdf["offset"][idx])
            if off > best_off:
                best_off, best_val = off, str(pdf["value_str"][idx])
        state.update((best_off, best_val))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {"key": [key[0]], "last_offset": [best_off], "last_value": [best_val]}
        )

    return _update_latest


def latest_state(
    envelope: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming compacted view: one (latest offset, value) row per key
    per micro-batch that touches the key. Keys idle past `retention_ms`
    are evicted from the state store."""
    rows = envelope.select(
        "key", "offset", F.col("value").cast("string").alias("value_str")
    )
    return rows.groupBy("key").applyInPandasWithState(
        _update_latest_fn(retention_ms),
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=COMPACT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming decayed counters — the streaming twin of the e29 batch
# operator: per stream key, an exponentially decayed message count with a
# one-day half-life, maintained in keyed state. The decay arithmetic is
# INTEGER-exact (the e29 discipline): state holds the per-day count RING
# for the last `shift`+1 days, and the published scaled count is
# recomputed from it as sum(count[age] << (shift - age)) — the exact
# per-event weighting e29 assigns, with no accumulated truncation. (The
# previous form kept one running scaled counter and right-shifted it as
# days advanced; shifting a SUM floors away carry bits that per-event
# weighting keeps — two weight-1 events merged to 2 then aged one day
# publish 1, while e29 publishes 0+0 — so it could drift one ulp-of-
# weight per day-advance from the batch truth. The ring cannot.)
# Restart-safe by construction: replaying a batch re-increments the same
# integer cells. State per key is `shift`+3 longs — O(keys) forever.
#
# int64 bound (the e29 docstring's own discipline): `scaled` overflows
# past 2^63, so a key needs < 2^(63-shift) same-day events — 2^43 at the
# default shift, 2^23 (~8.4M) at e29's shift=40. e29 widens to decimal
# for the batch sum; the streaming emit stays a long and documents the
# bound instead.
# ---------------------------------------------------------------------------
DECAY_SHIFT = 20  # day-0 weight = 2^20; events older than 20 days weigh 0
_MS_PER_DAY = 86_400_000

DECAYED_OUTPUT_SCHEMA = (
    "key string, as_of_day long, n_events long, scaled long, "
    "decayed_count double"
)
DECAYED_STATE_SCHEMA = "last_day long, n_events long, counts array<long>"


def _update_decayed_fn(shift: int, retention_ms: int):
    def _update_decayed(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # A key idle past retention has decayed to (near) zero
            # anyway: `shift` days of silence zero the counter by
            # construction, so eviction loses nothing a re-appearance
            # couldn't re-derive.
            state.remove()
            return
        last_day, n_events, counts = (
            state.get if state.exists else (-1, 0, [0] * (shift + 1))
        )
        # counts[a] = events aged a days relative to last_day
        counts = list(counts)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            days = (pdf["timestamp"] // _MS_PER_DAY).astype("int64")
            n_events += len(days)
            batch_max = int(days.max())
            if batch_max > last_day:
                if last_day >= 0:
                    d = batch_max - last_day
                    counts = [0] * min(d, shift + 1) + counts[: max(shift + 1 - d, 0)]
                last_day = batch_max
            for day, cnt in days.value_counts().items():
                age = last_day - int(day)
                if age <= shift:
                    counts[age] += int(cnt)
        state.update((last_day, n_events, counts))
        state.setTimeoutDuration(retention_ms)
        scaled = sum(c << (shift - a) for a, c in enumerate(counts))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "as_of_day": [last_day],
                "n_events": [n_events],
                "scaled": [scaled],
                "decayed_count": [scaled / float(1 << shift)],
            }
        )

    return _update_decayed


def decayed_counts(
    envelope: DataFrame,
    shift: int = DECAY_SHIFT,
    retention_ms: int = DEFAULT_IDLE_RETENTION_MS,
) -> DataFrame:
    """Streaming per-key decayed message count (one-day half-life,
    events older than `shift` days weigh zero — pass shift=40 for e29's
    exact window). Keys idle past `retention_ms` are evicted from the
    state store."""
    # envelope.timestamp is a TimestampType; the state math wants integer
    # broker milliseconds (pandas datetime64 cannot floor-divide an int).
    rows = envelope.select("key", F.unix_millis("timestamp").alias("timestamp"))
    return rows.groupBy("key").applyInPandasWithState(
        _update_decayed_fn(int(shift), retention_ms),
        outputStructType=DECAYED_OUTPUT_SCHEMA,
        stateStructType=DECAYED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters — sharded Space-Saving (Metwally et al. '05):
# per hash shard, keep at most CAPACITY (key, count, overcount)
# counters; an unseen key evicts the minimum counter and inherits its
# count as overcount. Guarantees: reported >= true (never undercounts)
# and reported - overcount <= true, with O(CAPACITY) state per shard —
# the streaming top-k every dashboard wants without per-key state
# (running_totals is O(keys); this is O(shards x capacity) FOREVER,
# churn-immune by construction). Global candidates = union of shard
# candidates (a key's traffic all lands in one shard, so per-key
# guarantees survive sharding).
#
# Determinism: batch items merge in (count desc, key asc) order and
# eviction picks the (min count, max key) victim, so a replayed batch
# re-derives identical counters (restart-safe).
# ---------------------------------------------------------------------------
HH_CAPACITY = 8

HH_OUTPUT_SCHEMA = (
    "shard string, keys array<string>, counts array<long>, overcounts array<long>"
)
HH_STATE_SCHEMA = (
    "keys array<string>, counts array<long>, overcounts array<long>"
)


def _update_hh_fn(capacity: int, retention_ms: int):
    def _update_hh(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ks, cs, os_ = state.get
            table = {k: [c, o] for k, c, o in zip(ks, cs, os_)}
        else:
            table = {}
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            batch = pdf["item"].value_counts()
            # Deterministic merge order: count desc, then key asc.
            for item, c in sorted(
                batch.items(), key=lambda kv: (-kv[1], kv[0])
            ):
                c = int(c)
                if item in table:
                    table[item][0] += c
                elif len(table) < capacity:
                    table[item] = [c, 0]
                else:
                    victim = min(table, key=lambda k: (table[k][0], [-ord(ch) for ch in k]))
                    floor_c = table[victim][0]
                    del table[victim]
                    table[item] = [floor_c + c, floor_c]
        state.update(
            (
                list(table.keys()),
                [v[0] for v in table.values()],
                [v[1] for v in table.values()],
            )
        )
        state.setTimeoutDuration(retention_ms)
        ordered = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "keys": [[k for k, _ in ordered]],
                "counts": [[v[0] for _, v in ordered]],
                "overcounts": [[v[1] for _, v in ordered]],
            }
        )

    return _update_hh


def heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    n_shards: int = 8,
    capacity: int = HH_CAPACITY,
    retention_ms: int = DEFAULT_IDLE_RETENTION_MS,
) -> DataFrame:
    """Streaming top-k candidates per shard with Space-Saving guarantees.
    `items` is any streaming DataFrame; `item_col` is hashed into
    `n_shards` groups (a key's rows always land in one shard)."""
    sharded = items.select(
        F.col(item_col).cast("string").alias("item"),
    ).withColumn(
        "shard", (F.xxhash64("item") % n_shards + n_shards) % n_shards
    ).withColumn("shard", F.col("shard").cast("string"))
    return sharded.groupBy("shard").applyInPandasWithState(
        _update_hh_fn(capacity, retention_ms),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming running z-score anomaly detection — the streaming twin of the
# batch anomaly family (e21 rolling z, e26 MAD, e32 CUSUM): each message
# is judged against its stream's PRIOR running distribution, then folded
# in. State per key is three numbers (n, sum, sum-of-squares) — O(keys),
# evicted when idle like every operator above.
#
# Integer-exact: the z test  (x-mean)² > Z²·var  is cross-multiplied to
#     (x·n − s)² > Z²·(n·s2 − s²)
# so no float division or sqrt ever happens; s2 is carried as a Python
# bigint serialized into a string state column because x²-sums overflow
# int64 at ~1e21 (million-byte messages × billions of rows — real at
# 100 TB; Spark would wrap silently, the documented divergence class).
# A zero-variance history with a deviating point (d != 0) is an anomaly
# by convention (infinite z).
# ---------------------------------------------------------------------------
ZSCORE_OUTPUT_SCHEMA = (
    "key string, n_seen long, batch_n long, batch_anomalies long, mean_milli long"
)
ZSCORE_STATE_SCHEMA = "n long, s long, s2 string"
ZSCORE_Z = 3
ZSCORE_MIN_N = 30  # no verdicts before a minimal history


def _update_zscore_fn(retention_ms: int):
    def _update_zscore(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, s, s2_str = state.get if state.exists else (0, 0, "0")
        s2 = int(s2_str)
        batch_n = 0
        anomalies = 0
        for pdf in pdfs:
            for x in pdf["x"].astype("int64").tolist():
                x = int(x)
                if n >= ZSCORE_MIN_N:
                    d = x * n - s
                    var_n2 = n * s2 - s * s  # n² · var ≥ 0, exact
                    if (var_n2 == 0 and d != 0) or (
                        var_n2 > 0 and d * d > ZSCORE_Z * ZSCORE_Z * var_n2
                    ):
                        anomalies += 1
                n += 1
                s += x
                s2 += x * x
                batch_n += 1
        state.update((n, s, str(s2)))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n],
                "batch_n": [batch_n],
                "batch_anomalies": [anomalies],
                "mean_milli": [s * 1000 // n if n else 0],
            }
        )

    return _update_zscore


def running_zscore(
    envelope: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming per-key anomaly counts: each message's size is z-tested
    against the key's prior running distribution (integer-exact, no
    float state). Keys idle past `retention_ms` are evicted."""
    sized = envelope.select(
        "key", F.octet_length("value").cast("long").alias("x")
    )
    return sized.groupBy("key").applyInPandasWithState(
        _update_zscore_fn(retention_ms),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming conversion-funnel tracker — the stateful streaming twin of
# the e18 batch funnel: each user advances through the ordered steps
# (signup → click → purchase) with OUT-OF-ORDER STEPS IGNORED (a
# purchase before the click does not convert — the same prefix rule the
# batch query's chained windows enforce), and a conversion emits the
# signup→purchase latency (e27's number) the moment it completes.
#
# State per user is three longs (stage, signup_ms, conv_ms) — O(active
# users), idle-evicted like every operator above. Messages within a
# batch are re-ordered by offset before folding (applyInPandasWithState
# guarantees grouping, not intra-group order). At 100 TB this is the
# standard real-time conversion pipeline: state ∝ live users, not
# events.
# ---------------------------------------------------------------------------
FUNNEL_STEPS = ("signup", "click", "purchase")
FUNNEL_OUTPUT_SCHEMA = (
    "user string, stage long, n_events long, converted boolean, conv_ms long"
)
FUNNEL_STATE_SCHEMA = "stage long, signup_ms long, conv_ms long"


def _update_funnel_fn(retention_ms: int):
    step_idx = {s: i for i, s in enumerate(FUNNEL_STEPS)}

    def _update_funnel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        stage, signup_ms, conv_ms = (
            state.get if state.exists else (0, 0, -1)
        )
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("offset")
        n_events = len(rows)
        for step, ms in zip(rows["step"], rows["ms"]):
            i = step_idx.get(step)
            if i is None or i != stage:
                continue  # not a step, or out of order: ignored
            stage += 1
            if i == 0:
                signup_ms = int(ms)
            if stage == len(FUNNEL_STEPS) and conv_ms < 0:
                conv_ms = int(ms) - signup_ms
        state.update((stage, signup_ms, conv_ms))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {
                "user": [key[0]],
                "stage": [stage],
                "n_events": [n_events],
                "converted": [stage == len(FUNNEL_STEPS)],
                "conv_ms": [conv_ms],
            }
        )

    return _update_funnel


def funnel_tracker(
    events: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming per-user funnel state. `events` must carry
    (user string, step string, ms long, offset long); the caller maps
    its envelope into that shape (see tests for the payload form)."""
    return events.groupBy("user").applyInPandasWithState(
        _update_funnel_fn(retention_ms),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming time-weighted average — the stateful streaming twin of the
# e41 batch TWAP (operators/events.py): per key, each observation's
# value "holds" from its event time until the next observation, and the
# running integral of value x holding-time updates incrementally as
# messages arrive. The metering/financial aggregate that a burst of
# cheap readings cannot drag the way it drags a plain running mean
# (`running_totals`).
#
# State per key is (last_us, last_cents, vt, dur, n, late) — vt is the
# exact integer cents x microseconds integral carried as a STRING (the
# running_zscore s2 discipline: it exceeds int64 at design scale; Python
# ints are unbounded and the state column stays a string). Messages
# within a batch fold in offset order; an observation whose event time
# regresses BELOW the key's last observation is counted `late` and
# skipped (its holding interval already belongs to the newer value —
# exactly what the e42 lateness audit quantifies). Keys idle past
# retention are evicted; a re-appearing key restarts its integral (the
# broker's retention makes the tail re-derivable).
#
# Scale: O(active keys) state, six scalars each; per-message work is a
# few integer ops. The output stream emits one row per (key, batch) —
# the live dashboard row.
# ---------------------------------------------------------------------------
TWAP_OUTPUT_SCHEMA = (
    "key string, n_obs long, late long, span_us long, twap_milli long, "
    "last_value_milli long"
)
TWAP_STATE_SCHEMA = (
    "last_us long, last_cents long, vt string, dur long, n long, late long"
)


def _update_twap_fn(retention_ms: int):
    def _update_twap(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us, last_cents, vt_str, dur, n, late = (
            state.get if state.exists else (-1, 0, "0", 0, 0, 0)
        )
        vt = int(vt_str)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("offset")
        for us, cents in zip(
            rows["us"].astype("int64").tolist(),
            rows["cents"].astype("int64").tolist(),
        ):
            us, cents = int(us), int(cents)
            if last_us >= 0:
                if us < last_us:
                    late += 1
                    continue
                vt += last_cents * (us - last_us)
                dur += us - last_us
            last_us, last_cents = us, cents
            n += 1
        state.update((last_us, last_cents, str(vt), dur, n, late))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_obs": [n],
                "late": [late],
                "span_us": [dur],
                # cents * 1000 / 100 = x10: milli-value units, exact DIV
                "twap_milli": [vt * 10 // dur if dur else -1],
                "last_value_milli": [last_cents * 10],
            }
        )

    return _update_twap


def twap_tracker(
    observations: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming per-key TWAP. `observations` must carry
    (key string, us long, cents long, offset long); the caller maps its
    envelope into that shape (see tests for the payload form)."""
    return observations.groupBy("key").applyInPandasWithState(
        _update_twap_fn(retention_ms),
        outputStructType=TWAP_OUTPUT_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM drift monitor — the stateful streaming twin of the
# e32 batch change-point query (operators/events.py): per key, the
# one-sided CUSUM statistic folds incrementally as
#
#   cum_n    = cum_{n-1} + (x_n - target)
#   stat_n   = cum_n - min(cum_0..cum_n)       (Page's closed form)
#   alarm at stat_n > threshold, then RESTART (the running min resets
#   to the current prefix — the standard post-alarm re-arm).
#
# Everything is integer cents: prefix sum, running prefix-min, and the
# threshold compare — a replayed batch after checkpoint restore folds
# to identical integers (restart-tested). State is five longs; keys
# idle past retention are evicted like every operator in this module.
#
# rearm=False switches to e32's forensic form: the running min is NOT
# reset after an alarm, so `n_alarms` counts every observation whose
# statistic exceeds the threshold — exactly e32's n_alarm_days when fed
# the same day-ordered integer series — and `first_alarm_n` (1-based
# observation index, 0 = none) identifies e32's first_alarm_day. The
# default rearm=True stays the operational alarm (one count per
# excursion, re-armed).
#
# Scale: O(active keys) state, constant work per message. This is the
# always-on drift alarm; e32 is its forensic batch replay.
# ---------------------------------------------------------------------------
CUSUM_OUTPUT_SCHEMA = (
    "key string, n_obs long, stat long, n_alarms long, "
    "first_alarm_n long, alarmed_in_batch boolean"
)
CUSUM_STATE_SCHEMA = (
    "cum long, cum_min long, n long, alarms long, first_alarm_n long"
)


def _update_cusum_fn(
    target: int, threshold: int, retention_ms: int, rearm: bool
):
    def _update_cusum(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cum, cum_min, n, alarms, first_alarm_n = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        batch_alarm = False
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("offset")
        for x in rows["cents"].astype("int64").tolist():
            cum += int(x) - target
            if cum < cum_min:
                cum_min = cum
            n += 1
            if cum - cum_min > threshold:
                alarms += 1
                batch_alarm = True
                if first_alarm_n == 0:
                    first_alarm_n = n
                if rearm:
                    cum_min = cum  # re-arm
        state.update((cum, cum_min, n, alarms, first_alarm_n))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_obs": [n],
                "stat": [cum - cum_min],
                "n_alarms": [alarms],
                "first_alarm_n": [first_alarm_n],
                "alarmed_in_batch": [batch_alarm],
            }
        )

    return _update_cusum


def cusum_monitor(
    observations: DataFrame,
    target_cents: int,
    threshold_cents: int,
    retention_ms: int = DEFAULT_IDLE_RETENTION_MS,
    rearm: bool = True,
) -> DataFrame:
    """Streaming per-key CUSUM drift alarms. `observations` must carry
    (key string, cents long, offset long)."""
    return observations.groupBy("key").applyInPandasWithState(
        _update_cusum_fn(
            int(target_cents), int(threshold_cents), retention_ms, rearm
        ),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming gap sessionizer — the stateful streaming twin of the e10
# batch sessionize (operators/events.py): a user's events belong to one
# session until a silence longer than SESSION_GAP_MS splits it. Batch
# sessionization re-derives sessions from the full log; this carries the
# OPEN session per key in the state store and emits each session exactly
# once, WHEN IT CLOSES — either a later event arrives past the gap
# (closed_by='gap') or the key idles past retention and the timeout
# flushes the still-open session before eviction (closed_by='timeout').
# That emit-on-timeout is the piece batch plans can't express: the last
# session of a churned user is still delivered, bounded-state.
#
# State per key is three scalars (start_ms, last_ms, n_events); events
# fold in offset order within a batch; an event whose time regresses
# below the session's last event extends the session without moving its
# end (the e42 lateness class — counted, not dropped, since session
# membership is unaffected by intra-session reordering).
#
# Scale: O(active keys) state; per-message work is two comparisons. The
# output stream is append-mode closed sessions — the exact shape a
# downstream session-metrics aggregation (or the reference's relay)
# consumes.
# ---------------------------------------------------------------------------
SESSION_GAP_MS = 1_800_000  # 30 min, the analytics default
SESSION_OUTPUT_SCHEMA = (
    "user string, session_start_ms long, session_end_ms long, "
    "n_events long, closed_by string"
)
SESSION_STATE_SCHEMA = "start_ms long, last_ms long, n long"


def _update_session_fn(gap_ms: int, retention_ms: int):
    def _update_session(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int, str]] = []
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user": [key[0]],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [last_ms],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        start_ms, last_ms, n = state.get if state.exists else (-1, -1, 0)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("offset")
        for ms in rows["ms"]:
            ms = int(ms)
            if n == 0:
                start_ms, last_ms, n = ms, ms, 1
            elif ms - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n, "gap"))
                start_ms, last_ms, n = ms, ms, 1
            else:
                last_ms, n = max(last_ms, ms), n + 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutDuration(retention_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user": [key[0]] * len(closed),
                    "session_start_ms": [c[0] for c in closed],
                    "session_end_ms": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "closed_by": [c[3] for c in closed],
                }
            )

    return _update_session


def session_tracker(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_MS,
    retention_ms: int = DEFAULT_IDLE_RETENTION_MS,
) -> DataFrame:
    """Streaming gap sessionization. `events` must carry
    (user string, ms long, offset long); emits one row per CLOSED
    session (gap-split or timeout-flushed)."""
    return events.groupBy("user").applyInPandasWithState(
        _update_session_fn(gap_ms, retention_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming lateness histogram — e42's (batch watermark-lateness audit)
# streaming twin: per key, how late do messages arrive relative to the
# maximum event time already seen on that key? The number that SETS a
# production watermark delay: run it for a day, read the histogram, pick
# the delay that bounds loss. Lateness buckets are exponential
# (on-time, <1 s, <10 s, <100 s, >=100 s) and the counters live in the
# state store (6 longs per key), so the audit is cumulative across
# batches and restarts — a batch job can only see one log window.
#
# Messages fold in offset order; each message first measures its
# lateness against the running max event time, THEN advances it — the
# same order the engine's own watermark would observe.
# ---------------------------------------------------------------------------
LATENESS_OUTPUT_SCHEMA = (
    "key string, n_msgs long, on_time long, lt_1s long, lt_10s long, "
    "lt_100s long, ge_100s long, max_event_us long"
)
LATENESS_STATE_SCHEMA = (
    "max_us long, n long, b0 long, b1 long, b2 long, b3 long, b4 long"
)
_LATENESS_EDGES_US = (0, 1_000_000, 10_000_000, 100_000_000)


def _update_lateness_fn(retention_ms: int):
    def _update_lateness(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        max_us, n, b0, b1, b2, b3, b4 = (
            state.get if state.exists else (-1, 0, 0, 0, 0, 0, 0)
        )
        buckets = [b0, b1, b2, b3, b4]
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("offset")
        for us in rows["us"]:
            us = int(us)
            late = max(0, max_us - us) if max_us >= 0 else 0
            if late <= _LATENESS_EDGES_US[0]:
                buckets[0] += 1
            elif late < _LATENESS_EDGES_US[1]:
                buckets[1] += 1
            elif late < _LATENESS_EDGES_US[2]:
                buckets[2] += 1
            elif late < _LATENESS_EDGES_US[3]:
                buckets[3] += 1
            else:
                buckets[4] += 1
            n += 1
            max_us = max(max_us, us)
        state.update((max_us, n, *buckets))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_msgs": [n],
                "on_time": [buckets[0]],
                "lt_1s": [buckets[1]],
                "lt_10s": [buckets[2]],
                "lt_100s": [buckets[3]],
                "ge_100s": [buckets[4]],
                "max_event_us": [max_us],
            }
        )

    return _update_lateness


def lateness_histogram(
    events: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming per-key lateness histogram. `events` must carry
    (key string, us long, offset long); emits the cumulative histogram
    row per (key, batch)."""
    return events.groupBy("key").applyInPandasWithState(
        _update_lateness_fn(retention_ms),
        outputStructType=LATENESS_OUTPUT_SCHEMA,
        stateStructType=LATENESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct-count — x13's (batch KMV sketch) streaming
# twin: per key, the K smallest distinct hash values of everything ever
# seen, carried as an ARRAY state column. Exact distinct counting in a
# stream buffers every value forever; the KMV sketch is K longs per key,
# mergeable, and its estimate (K−1)·P/h_(K) is the same closed form the
# batch/x13 oracle checks — so a dashboard's "unique users on this
# stream" stays O(K) state at any volume.
#
# Hash is the x13 affine family (overflow-safe: both factors reduced
# mod P before multiplying), so a batch KMV over the same log computes
# the IDENTICAL sketch — the streaming and batch answers are
# bit-comparable, not just statistically similar (tested).
# ---------------------------------------------------------------------------
from ..functions.hashing import (  # noqa: E402 — section-local import
    AMS_A,
    AMS_B,
    AMS_D,
    AMS_P,
    KMV_A as _KMV_A,
    KMV_B as _KMV_B,
    KMV_K,
    KMV_P as _KMV_P,
)

KMV_OUTPUT_SCHEMA = (
    "key string, n_seen long, k_kept long, kth_min_hash long, "
    "kmv_estimate double"
)
KMV_STATE_SCHEMA = "n_seen long, mins array<long>"


def _update_kmv_fn(retention_ms: int):
    def _update_kmv(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_seen, mins = state.get if state.exists else (0, [])
        kept = set(mins)
        rows = pd.concat(list(pdfs), ignore_index=True)
        for v in rows["value_id"]:
            n_seen += 1
            h = ((int(v) % _KMV_P) * _KMV_A + _KMV_B) % _KMV_P
            if h in kept:
                continue
            if len(kept) < KMV_K:
                kept.add(h)
            else:
                worst = max(kept)
                if h < worst:
                    kept.discard(worst)
                    kept.add(h)
        mins = sorted(kept)
        state.update((n_seen, mins))
        state.setTimeoutDuration(retention_ms)
        k = len(mins)
        kth = mins[-1] if mins else 0
        # e4 fixed-point integer estimate (the x13/x25b published form):
        # same integer on any engine, no float round procedure
        est = float(k) if k < KMV_K else ((k - 1) * _KMV_P * 10000 // kth) / 1e4
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n_seen],
                "k_kept": [k],
                "kth_min_hash": [kth],
                "kmv_estimate": [est],
            }
        )

    return _update_kmv


def kmv_distinct(
    events: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming per-key KMV distinct sketch. `events` must carry
    (key string, value_id long); emits the cumulative sketch row per
    (key, batch)."""
    return events.groupBy("key").applyInPandasWithState(
        _update_kmv_fn(retention_ms),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming token-bucket rate limiter — the per-consumer throttle a
# production relay puts in front of slow WebSocket clients (the
# reference serves one socket per stream with no backpressure policy;
# at fleet scale a runaway publisher must be shed deterministically,
# not by OOM). Classic token bucket, but refilled by EVENT time, not
# wall clock, so decisions are reproducible: replaying the same log
# yields the same accept/throttle verdict per message (tested exactly).
#
# State per key is two longs: (tokens_milli, last_us). Refill is exact
# integer arithmetic — rate_milli_per_ksec milli-tokens per 1000 s of
# event-time delta (delta_us · rate // 1e9; rate_per_sec=R is the
# coarse form R·1e6), capped at burst — and each message costs 1000
# milli-tokens. Messages fold in offset order; an event-time regression
# refills nothing (delta clamps at 0) but still charges the message.
# The batch replay twin (operators/events.py e50_token_bucket_replay)
# folds the IDENTICAL recurrence over the events table, so replaying a
# log through either path yields bit-identical verdicts (tested).
# ---------------------------------------------------------------------------
RATE_OUTPUT_SCHEMA = (
    "key string, n_msgs long, n_accepted long, n_throttled long, "
    "tokens_milli long"
)
RATE_STATE_SCHEMA = "tokens_milli long, last_us long"


def _update_rate_fn(rate_milli_per_ksec: int, burst: int, retention_ms: int):
    burst_milli = burst * 1000

    def _update_rate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        tokens, last_us = state.get if state.exists else (burst_milli, -1)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("offset")
        n = acc = 0
        for us in rows["us"]:
            us = int(us)
            if last_us >= 0:
                delta = max(0, us - last_us)
                tokens = min(
                    burst_milli,
                    tokens + delta * rate_milli_per_ksec // 1_000_000_000,
                )
            last_us = max(last_us, us)
            n += 1
            if tokens >= 1000:
                tokens -= 1000
                acc += 1
        state.update((tokens, last_us))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_msgs": [n],
                "n_accepted": [acc],
                "n_throttled": [n - acc],
                "tokens_milli": [tokens],
            }
        )

    return _update_rate


def rate_limiter(
    events: DataFrame,
    rate_per_sec: int = 10,
    burst: int = 20,
    retention_ms: int = DEFAULT_IDLE_RETENTION_MS,
    rate_milli_per_ksec: int | None = None,
) -> DataFrame:
    """Streaming per-key event-time token bucket. `events` must carry
    (key string, us long, offset long); emits per-(key, batch) accept /
    throttle counts and the remaining bucket.

    `rate_milli_per_ksec` is the fine-grained rate (milli-tokens per
    1000 s of event time) the batch replay twin e50 uses — pass it to get
    bit-identical accept/throttle verdicts over the same log (tested);
    `rate_per_sec=R` is exactly `rate_milli_per_ksec=R*1_000_000`."""
    if rate_milli_per_ksec is None:
        rate_milli_per_ksec = rate_per_sec * 1_000_000
    return events.groupBy("key").applyInPandasWithState(
        _update_rate_fn(rate_milli_per_ksec, burst, retention_ms),
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming DDSketch quantiles — x20's (batch power-of-2 DDSketch)
# streaming twin: per key, a FIXED 64-counter bucket histogram
# (bucket = floor(log2 v) = bit_length(v) - 1, exactly the batch
# `length(bin(cents)) - 1`), carried as an array state column. Exact
# streaming quantiles buffer every value forever; the sketch is 64
# longs per key, mergeable, and answers any quantile with the same
# relative-error bound the batch form publishes (est within [2^b,
# 2^(b+1)] of the true value — factor-2 worst case, the x20 verdict).
#
# Bit-compatibility: the histogram, the ceil(q*n) rank arithmetic
# (same IEEE double multiply the batch plan's F.ceil(q*n) performs),
# and the chosen buckets are IDENTICAL to batch x20 over the same
# values (tested, including across a checkpoint restart) — the
# dashboard's streaming p99 and the nightly batch p99 cannot disagree.
# ---------------------------------------------------------------------------
DDS_N_BUCKETS = 64
DDS_QS = (0.5, 0.95, 0.99)
DDS_OUTPUT_SCHEMA = (
    "key string, n_seen long, b50 int, b95 int, b99 int, "
    "est50_x2 long, est95_x2 long, est99_x2 long"
)
DDS_STATE_SCHEMA = "n_seen long, counts array<long>"


def _dds_bucket(v: int) -> int:
    # length(bin(v)) - 1 for v >= 1; v <= 0 pins to bucket 0 (the batch
    # form never sees non-positive cents; the clamp keeps state bounded)
    return v.bit_length() - 1 if v >= 1 else 0


def _dds_chosen(counts: list, n: int) -> list:
    """Smallest bucket whose cumulative count reaches ceil(q*n), per q —
    float multiply then ceil, matching the batch plan's F.ceil(q * n)."""
    import math

    out = []
    for q in DDS_QS:
        rank = math.ceil(q * n)
        cum = 0
        chosen = DDS_N_BUCKETS - 1
        for b, c in enumerate(counts):
            cum += c
            if cum >= rank:
                chosen = b
                break
        out.append(chosen)
    return out


def _update_dds_fn(retention_ms: int):
    def _update_dds(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_seen, counts = state.get if state.exists else (0, [0] * DDS_N_BUCKETS)
        counts = list(counts)
        rows = pd.concat(list(pdfs), ignore_index=True)
        for v in rows["value_id"]:
            counts[_dds_bucket(int(v))] += 1
            n_seen += 1
        state.update((n_seen, counts))
        state.setTimeoutDuration(retention_ms)
        b50, b95, b99 = _dds_chosen(counts, n_seen)
        # est midpoint (2^b + 2^(b+1)) / 2 published x2 so it stays an
        # exact integer: est_x2 = 3 * 2^b
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n_seen],
                "b50": [b50],
                "b95": [b95],
                "b99": [b99],
                "est50_x2": [3 << b50],
                "est95_x2": [3 << b95],
                "est99_x2": [3 << b99],
            }
        )

    return _update_dds


def ddsketch_quantiles(
    events: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming per-key power-of-2 DDSketch. `events` must carry
    (key string, value_id long); emits the cumulative sketch's bucket
    choices and midpoint estimates per (key, batch)."""
    return events.groupBy("key").applyInPandasWithState(
        _update_dds_fn(retention_ms),
        outputStructType=DDS_OUTPUT_SCHEMA,
        stateStructType=DDS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming histogram drift — x26's (batch period-over-period binned
# KS/L1 drift) streaming twin: per key, TWO fixed 64-bucket integer
# histograms in state (reference = last closed period, current = the
# open one). When the event-time period advances, current rolls into
# reference and every subsequent batch emits the drift between them —
# the data-drift monitor a feature pipeline runs beside its ingest.
#
# Same bucketing as batch x26 (clamped (v - lo) // width) and the same
# exact integer cross-scaled statistics: KS = max |cum_c·n_r − cum_r·n_c|
# and L1 = Σ |c_c·n_r − c_r·n_c|, published in ppm via Python
# arbitrary-precision ints then // (n_r·n_c) — no floats anywhere, so a
# replay computes bit-identical drift (tested against the batch bucket
# expression + formula on the same values, incl. checkpoint restart).
# State is 2·64 longs + 1 per key, idle-evicted.
# ---------------------------------------------------------------------------
DRIFT_BUCKETS = 64
DRIFT_OUTPUT_SCHEMA = (
    "key string, period long, n_ref long, n_cur long, "
    "ks_ppm long, l1_ppm long"
)
DRIFT_STATE_SCHEMA = "period long, ref array<long>, cur array<long>"


def _drift_ppm(ref: list, cur: list) -> tuple:
    """Exact integer (ks_ppm, l1_ppm) between two histograms, or
    (-1, -1) while either period is empty."""
    n_r, n_c = sum(ref), sum(cur)
    if n_r == 0 or n_c == 0:
        return -1, -1
    cum_r = cum_c = 0
    ks_num = l1_num = 0
    for r, c in zip(ref, cur):
        cum_r += r
        cum_c += c
        ks_num = max(ks_num, abs(cum_c * n_r - cum_r * n_c))
        l1_num += abs(c * n_r - r * n_c)
    denom = n_r * n_c
    return ks_num * 1_000_000 // denom, l1_num * 1_000_000 // denom


def _update_drift_fn(lo: int, width: int, retention_ms: int):
    def _update_drift(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            period, ref, cur = state.get
            ref, cur = list(ref), list(cur)
        else:
            period, ref, cur = -1, [0] * DRIFT_BUCKETS, [0] * DRIFT_BUCKETS
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("period")
        for p, v in zip(rows["period"], rows["value_id"]):
            p, v = int(p), int(v)
            if p > period:
                # roll: an ADJACENT advance closes the open period into
                # the reference; a gap means the closed period is empty
                ref = cur if period >= 0 and p == period + 1 else [0] * DRIFT_BUCKETS
                cur = [0] * DRIFT_BUCKETS
                period = p
            if p == period:  # stale (late) periods don't reopen history
                b = min(max((v - lo) // width, 0), DRIFT_BUCKETS - 1)
                cur[b] += 1
        state.update((period, ref, cur))
        state.setTimeoutDuration(retention_ms)
        ks_ppm, l1_ppm = _drift_ppm(ref, cur)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "period": [period],
                "n_ref": [sum(ref)],
                "n_cur": [sum(cur)],
                "ks_ppm": [ks_ppm],
                "l1_ppm": [l1_ppm],
            }
        )

    return _update_drift


def histogram_drift(
    events: DataFrame,
    lo: int = 0,
    width: int = 1000,
    retention_ms: int = DEFAULT_IDLE_RETENTION_MS,
) -> DataFrame:
    """Streaming per-key period-over-period histogram drift. `events`
    must carry (key string, period long, value_id long); emits the
    reference-vs-current KS and L1 distances in exact integer ppm per
    (key, batch)."""
    return events.groupBy("key").applyInPandasWithState(
        _update_drift_fn(lo, width, retention_ms),
        outputStructType=DRIFT_OUTPUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming AMS F2 — x27's (batch second-frequency-moment sketch)
# streaming twin: per stream key, the 8 signed counters Z_i = Σ s_i(v)
# live in state and fold one event at a time — the self-join-size /
# skew monitor a planner reads continuously instead of rescanning the
# log. Signs come from the SAME affine-parity family as batch x27
# (functions/hashing.py AMS_*, one declaration — the KMV discipline), so
# a batch x27-style fold over the same log computes bit-identical
# counters (tested, incl. checkpoint restart).
#
# All-integer state and output: the median estimate publishes as
# est_median_x2 = e[3] + e[4] of the sorted squared counters (×2, exact
# — the ddsketch est*_x2 trick), never a float. Python arbitrary-
# precision squares cannot overflow; state is AMS_D+1 longs per key
# (Z_i ≤ n ≤ 3e9 at any realistic per-key volume, squared fits the
# published long after the ×2 trick up to |Z| ~ 2.1e9), idle-evicted.
# ---------------------------------------------------------------------------
AMS_OUTPUT_SCHEMA = (
    "key string, n_events long, est_min long, est_median_x2 long, est_max long"
)
AMS_STATE_SCHEMA = "n long, zs array<long>"


def _ams_sign(v: int, i: int) -> int:
    return 1 - 2 * ((v * AMS_A[i] + AMS_B[i]) % AMS_P % 2)


def _update_ams_fn(retention_ms: int):
    def _update_ams(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, zs = state.get
            zs = list(zs)
        else:
            n, zs = 0, [0] * AMS_D
        for pdf in pdfs:
            for v in pdf["value_id"]:
                v = int(v)
                n += 1
                for i in range(AMS_D):
                    zs[i] += _ams_sign(v, i)
        state.update((n, zs))
        state.setTimeoutDuration(retention_ms)
        sq = sorted(z * z for z in zs)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "est_min": [sq[0]],
                "est_median_x2": [sq[AMS_D // 2 - 1] + sq[AMS_D // 2]],
                "est_max": [sq[AMS_D - 1]],
            }
        )

    return _update_ams


def ams_f2(
    events: DataFrame, retention_ms: int = DEFAULT_IDLE_RETENTION_MS
) -> DataFrame:
    """Streaming per-key AMS F2 sketch. `events` must carry (key string,
    value_id long); emits the cumulative sketch's min / median×2 / max
    squared counters per (key, batch) — exact integers, bit-identical to
    a batch fold over the same prefix of the log."""
    return events.groupBy("key").applyInPandasWithState(
        _update_ams_fn(retention_ms),
        outputStructType=AMS_OUTPUT_SCHEMA,
        stateStructType=AMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming hourly burst monitor — the stateful streaming twin of the
# e21 batch hourly-anomaly query (operators/events.py): per key, an
# hour's event count is compared against the SUM OF ITS 6 TRAILING
# OBSERVED HOURS (rows, not calendar hours — an hour with zero events
# produces no row in either engine), flagging when
#
#   n_events · 6 · E21_DEN  >=  trail_sum · E21_NUM
#
# with the same published ratio form (n·6e6 DIV trail / 1e6 — the exact
# integer-micros double e21 emits). An hour is EVALUATED WHEN IT CLOSES,
# i.e. when the first event of a LATER hour arrives; the ring of the
# last 6 closed (hour, count) pairs is the whole per-key state, so this
# is the live "traffic burst" alarm over an unbounded key space while
# e21 is its forensic batch replay. Events for already-closed hours are
# dropped (the e42 lateness histogram is the instrument that quantifies
# such lateness); feed the log in timestamp order for exact parity.
#
# Scale: O(active keys) state, 14 longs each; per-message work is a
# comparison and an increment. The always-open final hour is emitted
# only by a later arrival or never — batch replay is the tool for the
# trailing edge, identical to every monitor in this module.
# ---------------------------------------------------------------------------
HOURLY_NUM, HOURLY_DEN = 15, 10  # threshold 1.5 as a rational (== e21)

HOURLY_OUTPUT_SCHEMA = (
    "key string, hour_no long, n_events long, ratio double"
)
HOURLY_STATE_SCHEMA = (
    "open_hour long, open_cnt long, hours array<long>, counts array<long>"
)


def _update_hourly_fn(num: int, den: int, retention_ms: int):
    def _close(
        out: list, key: str, hour: int, cnt: int, hours: list, counts: list
    ) -> None:
        """Evaluate a closing hour against its 6 trailing observed hours,
        then push it into the ring (trimmed to 6)."""
        if len(hours) == 6:
            trail = sum(counts)
            if cnt * 6 * den >= trail * num:
                out.append(
                    (key, hour, cnt, cnt * 6_000_000 // trail / 1e6)
                )
        hours.append(hour)
        counts.append(cnt)
        del hours[:-6], counts[:-6]

    def _update_hourly(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        open_hour, open_cnt, hours, counts = (
            state.get if state.exists else (-1, 0, [], [])
        )
        hours, counts = list(hours), list(counts)
        out: list = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        for h in sorted(rows["hour_no"].astype("int64").tolist()):
            h = int(h)
            if h == open_hour:
                open_cnt += 1
            elif h > open_hour:
                if open_hour >= 0:
                    _close(out, key[0], open_hour, open_cnt, hours, counts)
                open_hour, open_cnt = h, 1
            # h < open_hour: late for a closed hour — dropped (see header)
        state.update((open_hour, open_cnt, hours, counts))
        state.setTimeoutDuration(retention_ms)
        yield pd.DataFrame(
            out or None,
            columns=["key", "hour_no", "n_events", "ratio"],
        )

    return _update_hourly


def hourly_anomaly_monitor(
    events: DataFrame,
    num: int = HOURLY_NUM,
    den: int = HOURLY_DEN,
    retention_ms: int = DEFAULT_IDLE_RETENTION_MS,
) -> DataFrame:
    """Streaming per-key hourly burst alarms, e21's num/den rule over
    the 6 trailing observed hours. `events` must carry (key string,
    hour_no long); emits one row per FLAGGED CLOSED hour."""
    return events.groupBy("key").applyInPandasWithState(
        _update_hourly_fn(int(num), int(den), retention_ms),
        outputStructType=HOURLY_OUTPUT_SCHEMA,
        stateStructType=HOURLY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
