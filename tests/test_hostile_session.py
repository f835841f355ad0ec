"""The driver builds its OWN SparkSession (not our tuned factory) and may
carry any session conf — the verify skill's canonical hostile probe is a
non-UTC session timezone, which silently shifts every timestamp-bearing
result vs the DuckDB oracle unless the engine forces UTC back.

``tables.table()`` runs ``session.apply_session_conf`` on every load, so
the FIRST table access repairs a hostile session. These tests pin that
contract with ``spark.newSession()`` (fresh runtime conf, shared
context — the only way to get a differently-configured session in one
JVM)."""

from __future__ import annotations

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.tables import table


def test_hostile_timezone_session_is_repaired_on_first_table_load(spark, sf_dir):
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")
    assert hostile.conf.get("spark.sql.session.timeZone") == "America/New_York"
    df = table(hostile, sf_dir, "events")
    # The load itself must have forced the engine conf back.
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"
    # And a timestamp-derived value computed on the repaired session must
    # equal the tuned session's (a 5-hour tz shift would move date_trunc
    # buckets and unix hours).
    want = (
        table(spark, sf_dir, "events")
        .agg(F.min(F.hour("ts")), F.max(F.date_trunc("day", "ts")))
        .collect()[0]
    )
    got = df.agg(F.min(F.hour("ts")), F.max(F.date_trunc("day", "ts"))).collect()[0]
    assert tuple(got) == tuple(want)


def test_hostile_session_runs_a_timestamp_query_identically(spark, sf_dir):
    from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES

    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")
    name = "e09_tumbling_window"
    want = sorted(map(str, QUERIES[name](spark, sf_dir).collect()))
    got = sorted(map(str, QUERIES[name](hostile, sf_dir).collect()))
    assert got == want
