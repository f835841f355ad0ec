"""Contract test: ``tables.table()`` yields TIMESTAMP ``ts`` for every
physical parquet encoding the driver has ever generated.

The driver regenerated events.parquet mid-round-2 switching the physical
type from TIMESTAMP(NANOS) to timestamp[us]-no-tz (read by Spark 4.x as
TIMESTAMP_NTZ), which broke every ``unix_millis(ts)`` call site at analysis
time. This fixture writes the same rows in all three encodings and asserts
``table()`` normalizes each to a plain TIMESTAMP with identical epoch-ms
values, so the next regeneration cannot regress silently.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.tables import table

ROWS = [
    (1, dt.datetime(2024, 1, 28, 0, 0, 0), 10, "view", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 28, 12, 34, 56, 789000), 11, "click", 2.5, "{}"),
    (3, dt.datetime(2024, 2, 1, 23, 59, 59, 999999), 12, "view", 3.5, "{}"),
]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    ts_vals = [r[1] for r in ROWS]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(ts_vals, ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(tbl, path)


ENCODINGS = {
    # round-1 driver data: TIMESTAMP(NANOS), no tz
    "nanos": pa.timestamp("ns"),
    # round-2 driver data: timestamp[us], no tz → Spark TIMESTAMP_NTZ
    "ntz_us": pa.timestamp("us"),
    # instant-semantics encoding → Spark TIMESTAMP (LTZ) directly
    "tz_us": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_ts_normalized_to_timestamp(spark, tmp_path, enc):
    sf_dir = tmp_path / enc
    sf_dir.mkdir()
    _write_events(str(sf_dir / "events.parquet"), ENCODINGS[enc])

    df = table(spark, str(sf_dir), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{enc}: ts must normalize to TIMESTAMP, got {dict(df.dtypes)['ts']}"
    )

    # unix_millis (the round-2 crash site) must resolve and give exact values.
    got = {
        r["event_id"]: r["ms"]
        for r in df.select(
            "event_id", F.unix_millis(F.col("ts")).alias("ms")
        ).collect()
    }
    want = {
        r[0]: int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        for r in ROWS
    }
    assert got == want, f"{enc}: epoch-ms mismatch"


def test_all_encodings_agree(spark, tmp_path):
    frames = {}
    for enc, ts_type in ENCODINGS.items():
        sf_dir = tmp_path / enc
        sf_dir.mkdir()
        _write_events(str(sf_dir / "events.parquet"), ts_type)
        frames[enc] = {
            r["event_id"]: r["ms"]
            for r in table(spark, str(sf_dir), "events")
            .select("event_id", F.unix_millis("ts").alias("ms"))
            .collect()
        }
    assert frames["nanos"] == frames["ntz_us"] == frames["tz_us"]


def test_ntz_normalized_on_any_table(spark, tmp_path):
    """The normalization is table-generic: a regenerated lineitem/orders
    with NTZ timestamp columns must also come back as TIMESTAMP."""
    sf_dir = tmp_path / "any"
    sf_dir.mkdir()
    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 20], pa.int64()),
            "o_orderstatus": pa.array(["O", "F"], pa.string()),
            "o_totalprice": pa.array([1.0, 2.0], pa.float64()),
            "o_orderdate": pa.array(
                [dt.datetime(1995, 1, 1), dt.datetime(1996, 6, 15)],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
        }
    )
    pq.write_table(tbl, str(sf_dir / "orders.parquet"))
    df = table(spark, str(sf_dir), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    got = {r["o_orderkey"]: r["y"] for r in df.select(
        "o_orderkey", F.year("o_orderdate").alias("y")).collect()}
    assert got == {1: 1995, 2: 1996}
