"""Multimodal column plumbing: binary payloads, Arrow batch stages,
metadata-only pruning."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from squonk2_fastapi_ws_event_stream_spark.operators.multimodal import (
    ADLER_MOD,
    attach_payload,
    decode_features,
    metadata_only,
    resize_images,
    sample_frames,
)
from squonk2_fastapi_ws_event_stream_spark.tables import table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return attach_payload(table(spark, SF, "documents").select("doc_id", "text").limit(20))


def test_decode_features_deterministic(spark):
    rows = {r["doc_id"]: r for r in decode_features(_docs(spark)).collect()}
    src = {r["doc_id"]: r["text"] for r in
           table(spark, SF, "documents").select("doc_id", "text").limit(20).collect()}
    for doc_id, text in src.items():
        got = rows[doc_id]
        payload = text.encode("utf-8")
        assert got["n_bytes"] == len(payload)
        assert got["first_byte"] == payload[0]
        assert got["checksum"] == sum(payload) % ADLER_MOD
        assert got["kind"] == "text/plain"


def test_resize_stage_produces_fixed_size_thumbs(spark):
    out = resize_images(_docs(spark), size=(16, 8)).collect()
    assert len(out) == 20
    for r in out:
        assert (r["width"], r["height"]) == (16, 8)
        assert len(r["thumb"]) == 16 * 8  # exact thumbnail byte size


def test_frame_sampling_fans_out(spark):
    out = sample_frames(_docs(spark), n_frames=4).collect()
    assert len(out) == 80  # 20 docs × 4 frames
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def test_metadata_query_prunes_payload_bytes(spark):
    df = metadata_only(_docs(spark))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the binary payload column must not survive into the scan output
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    if read_schema:  # parquet scan present
        assert "payload" not in read_schema[0]
    rows = df.collect()
    assert rows and all(r["mime"] == "text/plain" for r in rows)
