"""Round-10 verdict task #6: batch-boundary invariance of the fused
media kernels.

``fused_media_stage`` (operators/multimodal.py) carries the whole
m-family since the round-10 fuse: synthesis + feature kernel run as ONE
mapInPandas, so the batch stream a kernel sees is whatever Arrow hands
it (``spark.sql.execution.arrow.maxRecordsPerBatch``, partition sizes).
The correctness contract is that re-batching the same rows — 1-row
batches, one big batch, any split — yields byte-identical output: no
kernel may carry state across batches or normalize within a batch.

Two pins, neither of which touches a query plan (the near-zero r11
head is by design — lifting the closures to named functions would
rename the MapInPandas node and drift every m-family fingerprint):

- a Hypothesis property over the importable kernels and the fuse
  contract itself (pure pandas — exactly what mapInPandas executes per
  partition), including a filtering kernel that emits EMPTY frames for
  media-free batches (the m09/m13/m17 shape);
- an end-to-end check that shrinking ``arrow.maxRecordsPerBatch`` (a
  runtime conf: re-batches the REAL fused stages without changing any
  plan) leaves m01/m09/m13/m17 results identical at sf0.001.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from squonk2_fastapi_ws_event_stream_spark.operators.multimodal import (
    _attach_media_pdf,
    _decode_media_pdf,
    _downsample_run,
    wav_features,
)

# doc_id % 10 picks the modality (3 -> BMP, 7 -> WAV, else text); spread
# ids across all three and let text vary so checksum paths are exercised.
DOC_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=499),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40,
        ),
    ),
    min_size=1,
    max_size=30,
)


def _docs_pdf(rows) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
        }
    )


def _splits(pdf: pd.DataFrame, cuts: list[int]) -> list[pd.DataFrame]:
    """Partition pdf's rows into consecutive batches at the cut points
    (mapInPandas semantics: batches concatenate to the partition)."""
    bounds = sorted({0, len(pdf), *[c % (len(pdf) + 1) for c in cuts]})
    out = []
    for lo, hi in zip(bounds, bounds[1:]):
        if hi > lo:
            out.append(pdf.iloc[lo:hi].reset_index(drop=True))
    return out or [pdf]


def _run_fused(kernel, batches) -> pd.DataFrame:
    """The exact composition fused_media_stage installs: synthesis folded
    into the kernel's batch stream."""
    parts = list(kernel(_attach_media_pdf(pdf) for pdf in batches))
    parts = [p for p in parts if len(p)]
    if not parts:
        return pd.DataFrame()
    return pd.concat(parts, ignore_index=True)


def _wav_only_kernel(batches):
    """The m09/m13/m17 shape: magic-byte filter, possibly-empty output
    frames for batches with no WAV rows."""
    for pdf in batches:
        out = {"doc_id": [], "n_samples": [], "sum_sq": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                n, sum_sq, _peak, _zc = wav_features(payload)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sum_sq"].append(sum_sq)
        yield pd.DataFrame(out)


KERNELS = {
    "m01_decode": lambda batches: (_decode_media_pdf(p) for p in batches),
    "m05_downsample": _downsample_run,
    "wav_filtering": _wav_only_kernel,
}


@settings(max_examples=40, deadline=None)
@given(DOC_ROWS, st.lists(st.integers(min_value=0, max_value=60), max_size=6))
def test_fused_kernels_are_batch_boundary_invariant(rows, cuts):
    pdf = _docs_pdf(rows)
    one = [pdf]
    per_row = [pdf.iloc[i : i + 1].reset_index(drop=True) for i in range(len(pdf))]
    split = _splits(pdf, cuts)
    for name, kernel in KERNELS.items():
        base = _run_fused(kernel, one)
        for batching in (per_row, split):
            got = _run_fused(kernel, batching)
            assert got.shape == base.shape, (name, got.shape, base.shape)
            if len(base):
                pd.testing.assert_frame_equal(
                    got, base, check_dtype=False, obj=name
                )


def test_fused_queries_survive_arrow_rebatching(spark, sf_dir):
    """End-to-end: the REAL fused m-family stages, re-batched by the
    Arrow runtime conf instead of by hand — results must be identical
    whether a partition arrives as one batch or as 3-row slivers."""
    from squonk2_fastapi_ws_event_stream_spark.operators.multimodal import (
        m01_multimodal_decode,
        m09_audio_features,
        m13_silence_trim,
        m17_audio_clipping,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key)
    for q in (
        m01_multimodal_decode,
        m09_audio_features,
        m13_silence_trim,
        m17_audio_clipping,
    ):
        try:
            spark.conf.set(key, default)
            big = sorted(map(str, q(spark, sf_dir).collect()))
            spark.conf.set(key, "3")
            small = sorted(map(str, q(spark, sf_dir).collect()))
        finally:
            spark.conf.set(key, default)
        assert small == big, q.__name__
