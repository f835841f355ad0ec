"""Size guard on the deliberately-quadratic ground-truth verifiers.

t04 (all-pairs n-gram Jaccard) and v01 (all-pairs cosine) exist to validate
the linear-scale LSH paths at test scale; the guard makes "never run these
at 100 TB" structural: they raise above a configurable row bound instead of
silently launching a cartesian-class join.
"""

from __future__ import annotations

import pytest

from squonk2_fastapi_ws_event_stream_spark.operators.dedup import (
    t04_ngram_jaccard_pairs,
)
from squonk2_fastapi_ws_event_stream_spark.operators.similarity import (
    v01_neardup_cosine,
)
from squonk2_fastapi_ws_event_stream_spark.tables import guard_all_pairs


def test_guard_passes_small_input(spark):
    df = spark.range(100)
    out = guard_all_pairs(df, "op", "alt", bound=1000)
    assert out is df


def test_guard_raises_above_bound(spark):
    df = spark.range(2000)
    with pytest.raises(ValueError, match=r"O\(n\^2\).*use the linear-scale|linear-scale"):
        guard_all_pairs(df, "myop", "the_alternative", bound=1000)


def test_guard_message_names_alternative(spark):
    with pytest.raises(ValueError, match="the_alternative"):
        guard_all_pairs(spark.range(11), "myop", "the_alternative", bound=10)


def test_t04_guarded(spark, sf_dir, monkeypatch):
    import squonk2_fastapi_ws_event_stream_spark.tables as tables

    monkeypatch.setattr(tables, "ALLPAIRS_MAX_ROWS", 5)
    with pytest.raises(ValueError, match="t02_dedup_minhash_lsh"):
        t04_ngram_jaccard_pairs(spark, sf_dir).count()


def test_v01_guarded(spark, sf_dir, monkeypatch):
    import squonk2_fastapi_ws_event_stream_spark.tables as tables

    monkeypatch.setattr(tables, "ALLPAIRS_MAX_ROWS", 5)
    with pytest.raises(ValueError, match="v08_srp_lsh_neardup"):
        v01_neardup_cosine(spark, sf_dir).count()


def test_t04_and_v01_still_run_at_test_scale(spark, sf_dir):
    # sf0.001 is far below the default bound — verifiers stay usable.
    assert t04_ngram_jaccard_pairs(spark, sf_dir).count() >= 0
    assert v01_neardup_cosine(spark, sf_dir).count() >= 0
