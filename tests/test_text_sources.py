"""Source-format breadth: the engine's tables are parquet, but a pipeline
fed from JSONL or CSV drops must produce IDENTICAL DataFrames. These tests
round-trip the events table through both text formats with explicit
schemas and assert row-level equality with the parquet read — the
connector contract a format migration relies on.

Scale note: both text formats split by line, so reads parallelize the
same way parquet does (minus column pruning/pushdown — the reason parquet
stays the canonical store and text is ingest-only).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from squonk2_fastapi_ws_event_stream_spark.tables import table

from .conftest import SMOKE_SF_DIR

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _canon(df):
    # microsecond-precision string form makes timestamp equality explicit
    return {
        tuple(r)
        for r in df.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
            "user_id",
            "event_type",
            F.round("value", 6).alias("value_r"),
            "props",
        ).collect()
    }


def test_jsonl_source_matches_parquet(spark, tmp_path):
    pq = table(spark, SMOKE_SF_DIR, "events")
    path = str(tmp_path / "events_jsonl")
    pq.write.option("timestampFormat", TS_FMT).json(path)
    back = (
        spark.read.schema(EVENTS_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .json(path)
    )
    assert back.schema["ts"].dataType == T.TimestampType()
    assert _canon(back) == _canon(pq)


def test_csv_source_matches_parquet(spark, tmp_path):
    pq = table(spark, SMOKE_SF_DIR, "events")
    path = str(tmp_path / "events_csv")
    (
        pq.write.option("header", True)
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )
    back = (
        spark.read.schema(EVENTS_SCHEMA)
        .option("header", True)
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )
    assert _canon(back) == _canon(pq)


def test_jsonl_malformed_rows_dropped(spark, tmp_path):
    """PERMISSIVE-vs-DROPMALFORMED contract: a corrupt line must not fail
    the read — mode=DROPMALFORMED skips it (the P3 drop-don't-fail
    discipline applied at the source)."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"event_id": 1, "user_id": 7, "event_type": "click", "value": 1.5}\n'
        "not json at all\n"
        '{"event_id": 2, "user_id": 8, "event_type": "view", "value": 2.5}\n'
    )
    schema = "event_id long, user_id long, event_type string, value double"
    got = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r["event_id"] for r in got.collect()} == {1, 2}
