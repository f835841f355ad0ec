"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode step is a clearly
marked deterministic stub (`_decode_stub`) — but everything Spark-side is
real and tested: schema, binary columns, metadata struct, the mapInPandas
batch shape, and partition-parallel execution. Swapping `_decode_stub` for
PIL/ffmpeg is a one-function change.

Scale: mapInPandas streams Arrow batches through Python — the right shape
for CPU-bound decode at 100 TB (per-partition parallelism, no collect, no
per-row UDF overhead). Binary payloads stay opaque until the decode stage,
so scans of metadata-only queries never read the bytes (parquet column
pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import fan_out, table

ADLER_MOD = 65521

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, checksum long, kind string"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal ingest: text → opaque binary payload + metadata.

    Real pipelines read image/audio bytes from parquet/object storage; here
    the payload is the UTF-8 encoding of the text, which keeps the whole
    path deterministic and oracle-checkable.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB for the real decoder (PIL.Image.open / soundfile / av).

    Deterministic fake 'feature extraction': byte count, first byte, and an
    Adler-style checksum. Raise NotImplementedError here if you want a hard
    gate instead of a fake.
    """
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum": sum(payload) % ADLER_MOD,
    }


def decode_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "first_byte": feats.map(lambda d: d["first_byte"]),
                    "checksum": feats.map(lambda d: d["checksum"]),
                    "kind": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return with_payload.mapInPandas(run, schema=DECODED_SCHEMA)


def m01_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return decode_features(attach_payload(docs))


# The documents corpus is pure ASCII, so bytes == code points and DuckDB can
# mirror the stub exactly with list arithmetic.
ORACLE_M01 = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(unicode(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(list_sum(list_transform(range(1, length(text) + 1),
            i -> unicode(substr(text, i, 1)))) % {ADLER_MOD} AS BIGINT) AS checksum,
       'text/plain' AS kind
FROM documents
"""


# ---------------------------------------------------------------------------
# Image / audio stage stubs: real Spark plumbing (schemas, Arrow batching,
# partition parallelism), deterministic fake compute where the codec would
# run. Swap the marked line for PIL/ffmpeg on a cluster that has them.
# ---------------------------------------------------------------------------
RESIZE_SCHEMA = "doc_id long, width int, height int, thumb binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_checksum long"


def resize_images(with_payload: DataFrame, size: tuple[int, int] = (32, 32)) -> DataFrame:
    """Thumbnail stage. STUB decode: treats the payload as raw bytes and
    derives a deterministic pseudo-thumbnail (repeating byte pattern) of
    exactly width*height bytes — the Arrow batch shape and output schema
    are what a PIL implementation would produce."""
    w, h = size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                bytes((payload * ((w * h) // max(len(payload), 1) + 1))[: w * h])
                # ^ STUB: replace with PIL.Image.open(io.BytesIO(payload)).resize(size)
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "thumb": thumbs,
                }
            )

    return with_payload.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(with_payload: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage (video/audio analog): emits n_frames rows per
    payload — a fan-out mapInPandas, the shape a real ffmpeg frame sampler
    has. STUB compute: per-frame checksum over a byte stride."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                stride = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * stride : (i + 1) * stride]
                    # STUB: replace with av/ffmpeg frame decode + feature
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(sum(chunk) % ADLER_MOD)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return with_payload.mapInPandas(run, schema=FRAMES_SCHEMA)


def metadata_only(docs_with_payload: DataFrame) -> DataFrame:
    """Metadata projection — never touches the payload column, so the scan
    prunes the binary bytes entirely (asserted in test_plan_shapes)."""
    return docs_with_payload.select("doc_id", "meta.mime", "meta.n_bytes")


# ---------------------------------------------------------------------------
# m02/m03 — the resize and frame-sample stages as ledger queries. The raw
# thumb bytes are summarized to (octet_length, checksum) so the result is
# hash-comparable; the corpus is ASCII, so DuckDB mirrors the byte
# arithmetic with string functions.
# ---------------------------------------------------------------------------
THUMB_W, THUMB_H = 32, 32
N_FRAMES = 4


def m02_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    thumbs = resize_images(attach_payload(docs), (THUMB_W, THUMB_H))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "thumb_bytes": pdf["thumb"].map(len),
                    "thumb_checksum": pdf["thumb"].map(lambda b: sum(b) % ADLER_MOD),
                }
            )

    return thumbs.mapInPandas(
        summarize,
        schema="doc_id long, width int, height int, thumb_bytes long, thumb_checksum long",
    )


ORACLE_M02 = f"""
WITH thumb AS (
  SELECT doc_id,
         substr(repeat(text, ({THUMB_W * THUMB_H} // GREATEST(length(text), 1)) + 1),
                1, {THUMB_W * THUMB_H}) AS t
  FROM documents
)
SELECT doc_id,
       {THUMB_W} AS width,
       {THUMB_H} AS height,
       CAST(length(t) AS BIGINT) AS thumb_bytes,
       CAST(COALESCE(list_sum(list_transform(range(1, length(t) + 1),
            i -> unicode(substr(t, i, 1)))), 0) % {ADLER_MOD} AS BIGINT) AS thumb_checksum
FROM thumb
"""


def m03_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return sample_frames(attach_payload(docs), N_FRAMES)


ORACLE_M03 = f"""
WITH strided AS (
  SELECT doc_id, text,
         GREATEST(length(text) // {N_FRAMES}, 1) AS stride
  FROM documents
),
frames AS (
  SELECT doc_id,
         CAST(f.i AS INTEGER) AS frame_idx,
         substr(text, f.i * stride + 1, stride) AS chunk
  FROM strided, unnest(range(0, {N_FRAMES})) AS f(i)
)
SELECT doc_id, frame_idx,
       CAST(COALESCE(list_sum(list_transform(range(1, length(chunk) + 1),
            i -> unicode(substr(chunk, i, 1)))), 0) % {ADLER_MOD} AS BIGINT)
         AS frame_checksum
FROM frames
"""


# ---------------------------------------------------------------------------
# m04 — media content-hash dedup: the t01/t05 stage for binary payloads,
# run BEFORE any decode. sha2 over the payload bytes is pure JVM (no Python
# stage at all), the shuffle carries (32-byte digest, doc_id) only, and the
# parquet scan prunes to the payload column — at 100 TB this is the first
# filter of every media-ingest pipeline (exact byte-duplicates are the
# dominant duplication mode for scraped media). Duplicate payloads are
# synthesized (every 40th doc, ids +30000) since the corpus has none.
# ---------------------------------------------------------------------------
def m04_media_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 30000).alias("doc_id"), "text"
    )
    payloads = attach_payload(docs.unionByName(copies))
    return (
        payloads.select("doc_id", F.sha2("payload", 256).alias("content_sha"),
                        F.col("meta.n_bytes").alias("n_bytes"))
        .groupBy("content_sha")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_bytes").cast("long").alias("n_bytes"),
        )
        .filter(F.col("n_copies") > 1)
        .select("content_sha", "kept_doc_id", "n_copies", "n_bytes")
    )


ORACLE_M04 = """
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 30000 AS doc_id, text FROM documents WHERE doc_id % 40 = 0
)
SELECT sha256(text) AS content_sha,
       MIN(doc_id) AS kept_doc_id,
       COUNT(*) AS n_copies,
       CAST(MIN(length(text)) AS BIGINT) AS n_bytes
FROM unioned GROUP BY sha256(text) HAVING COUNT(*) > 1
"""


QUERIES = {
    "m01_multimodal_decode": m01_multimodal_decode,
    "m02_multimodal_resize": m02_multimodal_resize,
    "m03_multimodal_frame_sample": m03_multimodal_frame_sample,
    "m04_media_content_dedup": m04_media_content_dedup,
}
ORACLES = {
    "m01_multimodal_decode": ORACLE_M01,
    "m02_multimodal_resize": ORACLE_M02,
    "m03_multimodal_frame_sample": ORACLE_M03,
    "m04_media_content_dedup": ORACLE_M04,
}
