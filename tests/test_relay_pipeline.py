"""Relay-pipeline parity: golden enrichment bytes derived from the
reference's documented wire formats (README.md:137-158; app/app.py:463-494).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.streaming.pipeline import (
    annotate,
    relay_transform,
)

TS = datetime(2025, 4, 30, 19, 20, 37, tzinfo=timezone.utc)
TS_MS = int(TS.timestamp() * 1000)


def _envelope(spark, rows):
    return spark.createDataFrame(
        [(k, v.encode("utf-8"), o, TS) for (k, v, o) in rows],
        "key string, value binary, offset long, timestamp timestamp",
    )


def test_json_enrichment_appends_ess_keys(spark):
    body = '{"message_type": "accountserver.MerchantProcessingCharge", "message_body": {"sqn": 1}}'
    df = relay_transform(_envelope(spark, [("s", body, 42)]))
    out = df.collect()[0]["out"]
    import json

    parsed = json.loads(out)
    # envelope preserved + only ess_-prefixed keys added (app/app.py:470-489)
    assert parsed["message_type"] == "accountserver.MerchantProcessingCharge"
    assert parsed["message_body"] == {"sqn": 1}
    assert parsed["ess_ordinal"] == 42
    assert parsed["ess_timestamp"] == TS_MS
    assert set(parsed) == {"message_type", "message_body", "ess_ordinal", "ess_timestamp"}
    # original body text is preserved verbatim (string-splice enrichment)
    assert out.startswith(body[:-1])


def test_empty_object_body_enriches_to_valid_json(spark):
    # '{}' has no key to splice after: no leading comma (the reference's
    # json.loads/json.dumps round-trip emits valid JSON for this input too)
    import json

    for body in ("{}", "{ }", "{  }"):
        df = relay_transform(_envelope(spark, [("s", body, 9)]))
        out = df.collect()[0]["out"]
        parsed = json.loads(out)  # must not raise
        assert parsed == {"ess_ordinal": 9, "ess_timestamp": TS_MS}


def test_preexisting_ess_key_last_value_wins(spark):
    # a body already carrying ess_ keys: parsers take the last (spliced)
    # value, matching the reference's dict-overwrite (app/app.py:486-488)
    import json

    df = relay_transform(_envelope(spark, [("s", '{"ess_ordinal": 1, "a": 2}', 9)]))
    parsed = json.loads(df.collect()[0]["out"])
    assert parsed["ess_ordinal"] == 9
    assert parsed["a"] == 2


def test_prototext_enrichment_appends_ordinal_timestamp(spark):
    body = 'accountserver.MerchantCharge|timestamp: "2025-04-30T19:20:37" merchant_kind: "DATA_MANAGER"'
    df = relay_transform(_envelope(spark, [("s", body, 7)]))
    out = df.collect()[0]["out"]
    # byte-exact append semantics (app/app.py:490-494; README.md:137-147)
    assert out == body + f"|ordinal: 7|timestamp: {TS_MS}"


def test_merchant_charge_golden_prototext_roundtrip(spark):
    """Golden MerchantCharge fixture: the reference publisher's exact wire
    shape — `<class>|<text_format one-line>` (ampq_publisher.py:38-52) —
    enriched byte-for-byte per the README's documented example
    (README.md:137-147: append `|ordinal: N|timestamp: M`).
    The field text is what protobuf text_format.MessageToString(...,
    as_one_line=True) emits for the publisher's demonstration message.
    """
    wire = (
        "accountserver.MerchantCharge"
        '|timestamp: "2025-04-30T19:20:37.926+00:00"'
        ' merchant_kind: "DATA_MANAGER" merchant_name: "squonk"'
        " merchant_id: 1 operation: OPERATION_ENUM_PROCESSING"
        ' auth_code: 456782 value: "0.50" sqn: 1'
    )
    ordinal = 2
    ts = datetime.fromtimestamp(1746042171620 / 1000, tz=timezone.utc)
    env = spark.createDataFrame(
        [("s", wire.encode("utf-8"), ordinal, ts)],
        "key string, value binary, offset long, timestamp timestamp",
    )
    out = relay_transform(env).collect()[0]["out"]
    assert out == wire + "|ordinal: 2|timestamp: 1746042171620"


def test_poison_empty_malformed_dropped(spark):
    rows = [
        ("s", "POISON", 1),
        ("s", "", 2),
        ("s", '{"broken": ', 3),  # starts like JSON, fails to parse → dropped
        ("s", '{"ok": 1}', 4),
        ("s", "proto|x: 1", 5),
    ]
    df = relay_transform(_envelope(spark, rows))
    offs = sorted(r["offset"] for r in df.collect())
    assert offs == [4, 5]


def test_invalid_utf8_dropped_not_mangled(spark):
    # the reference drops undecodable bytes (app/app.py:433-443) — they must
    # not surface as replacement characters
    df = spark.createDataFrame(
        [("s", b"\xff\xfe\x01", 1, TS), ("s", '{"ok": 1}'.encode(), 2, TS)],
        "key string, value binary, offset long, timestamp timestamp",
    )
    out = relay_transform(df).collect()
    assert [r["offset"] for r in out] == [2]


def test_unicode_bodies_survive_enrichment(spark):
    body = '{"message_type": "t", "message_body": {"name": "héllo → wörld ✓"}}'
    df = relay_transform(_envelope(spark, [("s", body, 9)]))
    import json

    parsed = json.loads(df.collect()[0]["out"])
    assert parsed["message_body"]["name"] == "héllo → wörld ✓"
    assert parsed["ess_ordinal"] == 9


def test_annotate_flags_poison_without_forwarding(spark):
    rows = [("s", "POISON", 1), ("s", '{"ok": 1}', 2)]
    ann = annotate(_envelope(spark, rows)).orderBy("offset").collect()
    assert ann[0]["is_poison"] is True and ann[0]["out"] is None
    assert ann[1]["is_poison"] is False and ann[1]["out"] is not None


def test_ordering_preserved_within_stream(spark):
    rows = [("s", '{"n": %d}' % i, i) for i in range(50)]
    df = relay_transform(_envelope(spark, rows))
    got = [r["offset"] for r in df.orderBy("offset").collect()]
    assert got == list(range(50))
    # gap detectability: ess_ordinal is embedded in every delivered message
    sample = df.filter(F.col("offset") == 13).collect()[0]["out"]
    assert '"ess_ordinal": 13' in sample


def test_prototext_escaping_edge_cases_byte_exact(spark):
    """Protobuf text_format escapes inside quoted string fields must pass
    through the relay byte-for-byte: the reference appends to the raw
    string without parsing it (app/app.py:490-494), so escaped quotes,
    backslashes, newlines, unicode escapes — and even a literal `|` inside
    a quoted value — are preserved verbatim with the enrichment appended
    at the end (README.md:137-147)."""
    cases = [
        # escaped quote and backslash inside a string field
        r'accountserver.MerchantCharge|merchant_name: "say \"hi\" \\ bye" sqn: 1',
        # escaped newline/tab (text_format emits \n \t escapes in one-line mode)
        r'accountserver.MerchantCharge|merchant_name: "line1\nline2\tend" sqn: 2',
        # octal / hex escapes as text_format renders non-printables
        r'accountserver.MerchantCharge|merchant_name: "\001\x7f" sqn: 3',
        # a literal | inside a quoted value: the relay must still append at
        # the very end (the reference's client-side split-on-| quirk is the
        # client's concern, ws_listener.py:61-72 — the wire stays intact)
        r'accountserver.MerchantCharge|merchant_name: "a|b" sqn: 4',
        # unicode text passes through UTF-8 intact
        'accountserver.MerchantCharge|merchant_name: "café ☃" sqn: 5',
        # negative + large int64 values, enum, decimal-as-string money
        'accountserver.MerchantCharge|merchant_id: -9223372036854775808 '
        'operation: OPERATION_ENUM_PROCESSING value: "0.50" sqn: 6',
    ]
    rows = [("s", body, i + 1) for i, body in enumerate(cases)]
    df = relay_transform(_envelope(spark, rows))
    got = {r["offset"]: r["out"] for r in df.collect()}
    for i, body in enumerate(cases):
        assert got[i + 1] == body + f"|ordinal: {i + 1}|timestamp: {TS_MS}", body


def test_readme_full_example_byte_exact(spark):
    """The README's own worked example (README.md:137-147) reassembled on
    one line: class accountserver.MerchantProcessingCharge, the documented
    field text, ordinal 2, timestamp 1746042171620."""
    body = (
        "accountserver.MerchantProcessingCharge"
        '|timestamp: "2025-04-30T19:20:37.926+00:00"'
        ' merchant_kind: "DATA_MANAGER" merchant_name: "squonk"'
        " merchant_id: 1 operation: OPERATION_ENUM_PROCESSING"
        ' auth_code: 456782 value: "0.50" sqn: 1'
    )
    ts = datetime.fromtimestamp(1746042171620 / 1000, tz=timezone.utc)
    env = spark.createDataFrame(
        [("s", body.encode("utf-8"), 2, ts)],
        "key string, value binary, offset long, timestamp timestamp",
    )
    out = relay_transform(env).collect()[0]["out"]
    assert out == body + "|ordinal: 2|timestamp: 1746042171620"
