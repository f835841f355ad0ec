"""Stream archival: event streams → parquet tables (and back).

The piece that unifies the engine's streaming and batch halves: a stream
relayed live today is an analytics table tomorrow. The reference has no
analog (broker retention simply expires data, README.md:222-237); here
retention can expire the hot log because the archive holds history.

Scale notes:
- the sink partitions output by stream key and event date → partition
  pruning for both "one stream's history" and "all streams, one day".
- exactly-once into parquet files via the streaming commit log (Spark's
  file-sink guarantee), so re-running after failure cannot duplicate.
- archived parquet feeds every relational/dedup/similarity operator in
  plans/ and operators/ unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def archive_stream(envelope: DataFrame, stream: str, path: str, checkpoint: str):
    """Start (or continue) archiving one stream's envelope to parquet.

    Returns the StreamingQuery. Layout: path/key=<stream>/event_date=…/ —
    one file-sink directory per stream, because Spark's file sink keeps a
    per-path `_spark_metadata` commit log and two queries sharing one path
    collide on batch ids (the second silently skips its writes).
    """
    # The archive is the lossless record of the log: keep the raw bytes
    # (`value`) verbatim, plus the relay's decoded view (`body`, NULL for
    # invalid UTF-8 via try_validate_utf8 — a plain string cast would
    # silently substitute U+FFFD and lose the original bytes).
    enriched = envelope.select(
        "offset",
        "timestamp",
        "value",
        F.try_validate_utf8(F.col("value")).alias("body"),
        F.date_format("timestamp", "yyyy-MM-dd").alias("event_date"),
    )
    return (
        enriched.writeStream.format("parquet")
        .option("path", f"{path}/key={stream}")
        .option("checkpointLocation", checkpoint)
        .partitionBy("event_date")
        .trigger(availableNow=True)
        .start()
    )


def read_archive(spark: SparkSession, path: str) -> DataFrame:
    """Archived history as a batch DataFrame; `key` and `event_date` are
    directory partition columns (pruned on filters)."""
    return spark.read.option("basePath", path).parquet(f"{path}/key=*")
