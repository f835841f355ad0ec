"""Property tests: the Spark expression builders, the DuckDB SQL fragment
builders, and a plain-Python reference implementation of the hashing
pipeline must agree on arbitrary ASCII text — this is the invariant the
whole oracle-checkable dedup family rests on."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from squonk2_fastapi_ws_event_stream_spark.functions import hashing as H

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=H.K,
    max_size=60,
)


def py_shingle_hashes(text: str) -> list[int]:
    codes = [ord(c) for c in text]
    return [
        sum(codes[i + j] * H.COEF[j] for j in range(H.K)) % H.P
        for i in range(len(text) - H.K + 1)
    ]


def py_minhash(hashes: list[int]) -> list[int]:
    hs = sorted(set(hashes))
    return [
        min((a * x + b) % H.P for x in hs) for a, b in zip(H.MINHASH_A, H.MINHASH_B)
    ]


def py_simhash(hashes: list[int], bits: int = H.SIMHASH_BITS) -> int:
    n = len(hashes)
    out = 0
    for j in range(bits):
        if j < 30:
            ones = sum((x >> j) & 1 for x in hashes)
        else:  # shingle hashes carry <30 bits of entropy: re-mix (hashing.py)
            ones = sum((((x * (j + 1)) % H.P) >> (j % 30)) & 1 for x in hashes)
        if 2 * ones > n:
            out |= 1 << j
    return out


@settings(max_examples=40, deadline=None)
@given(ASCII_TEXT)
def test_duckdb_fragments_match_python_reference(text):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1 AS doc_id, ? AS text", [text])
    sql = f"""
    WITH c AS (SELECT doc_id, text, {H.sql_char_codes('text')} AS codes FROM documents),
    s AS (SELECT doc_id, {H.sql_shingle_hashes('codes', 'text')} AS hs FROM c)
    SELECT hs, list_distinct(hs) AS dhs,
           {H.sql_minhash_signature('list_distinct(hs)')} AS mh,
           {H.sql_simhash('hs')} AS sh
    FROM s
    """
    hs, dhs, mh, sh = con.execute(sql).fetchone()
    assert list(hs) == py_shingle_hashes(text)
    assert sorted(dhs) == sorted(set(py_shingle_hashes(text)))
    assert list(mh) == py_minhash(py_shingle_hashes(text))
    assert sh == py_simhash(py_shingle_hashes(text))


def test_spark_builders_match_python_reference(spark):
    import pyspark.sql.functions as F

    samples = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaa",
        "key agg row scan slow fast table value part",
        "x" * 8,
        "0123456789 abcdef {}[]()!@#$",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "id long, text string")
    out = (
        df.withColumn("codes", H.char_codes("text"))
        .withColumn("hs", H.shingle_hashes("codes", "length(text)"))
        .withColumn("mh", H.minhash_signature("array_distinct(hs)"))
        .withColumn("sh", H.simhash("hs"))
        .select("id", "hs", "mh", "sh")
        .collect()
    )
    for r in out:
        text = samples[r["id"]]
        assert list(r["hs"]) == py_shingle_hashes(text)
        assert list(r["mh"]) == py_minhash(py_shingle_hashes(text))
        assert r["sh"] == py_simhash(py_shingle_hashes(text))


def test_t06_banded_plan_equals_allpairs_ground_truth(spark):
    """The pigeonhole claim: with HAMMING_MAX < SIMHASH_BANDS the banded
    LSH candidate set provably contains every qualifying pair, so the
    banded plan's output must equal a brute-force all-pairs hamming scan.
    """
    from pyspark.sql import functions as F

    from squonk2_fastapi_ws_event_stream_spark.operators import dedup as D

    sf = "/root/testdata/sf0.001"
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.t06_dedup_simhash_banded(spark, sf).collect()
    }

    # Brute force: same synthesized corpus, same fingerprints, all pairs.
    from squonk2_fastapi_ws_event_stream_spark.tables import table

    docs = table(spark, sf, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 70 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    unioned = docs.unionByName(exact).unionByName(near)
    sims = D._with_shingles(unioned, spark).select(
        "doc_id", D.H.simhash("shingles", D.T06_SIMHASH_BITS).alias("sim")
    )
    a = sims.select(F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"))
    b = sims.select(F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .withColumn(
                "hamming",
                F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
            )
            .filter(F.col("hamming") <= D.HAMMING_MAX)
        ).collect()
    }
    assert banded == brute and len(brute) > 0


# ---------------------------------------------------------------------------
# Round-4 hash paths: the DSIR bucket hash and the 48-bit SRP signature
# must agree with plain-Python references (same invariant the dedup
# family rests on), and t41's normalization must be idempotent.
# ---------------------------------------------------------------------------
def py_dsir_bucket(word: str) -> int:
    from squonk2_fastapi_ws_event_stream_spark.operators import corpus

    padded = (word + " " * corpus._PAD_W)[: corpus._PAD_W]
    h = sum(ord(c) * corpus._PAD_COEF[j] for j, c in enumerate(padded)) % H.P
    return h % corpus.DSIR_BUCKETS


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_dsir_bucket_matches_python_reference(word):
    import duckdb

    from squonk2_fastapi_ws_event_stream_spark.operators import corpus

    got = duckdb.sql(
        f"SELECT {corpus._sql_bucket('w')} AS b FROM (SELECT ? AS w)",
        params=[word],
    ).fetchone()[0]
    assert got == py_dsir_bucket(word)
    assert 0 <= got < corpus.DSIR_BUCKETS


def py_srp_sig48(vec) -> int:
    from squonk2_fastapi_ws_event_stream_spark.operators import similarity as S

    sig = 0
    for p in range(S.V18_BITS):
        dot = 0.0
        for x, c in zip(vec, S._V18_H[p]):
            dot += float(x) * float(c)
        if dot >= 0:
            sig |= 1 << p
    return sig


@given(st.lists(st.floats(min_value=-1, max_value=1, allow_nan=False,
                          width=32),
                min_size=64, max_size=64))
@settings(max_examples=10, deadline=None)
def test_srp_sig48_spark_matches_python(spark, vec):
    from pyspark.sql import functions as F

    from squonk2_fastapi_ws_event_stream_spark.operators import similarity as S

    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    got = df.select(S._srp_sig48(F.col("embedding")).alias("s")).collect()[0]["s"]
    # Spark evaluates the same left-fold sum over float32-widened terms;
    # tiny dot products can straddle 0 differently only if the fold order
    # differed — it doesn't (aggregate = sequential left fold).
    assert got == py_srp_sig48([__import__("struct").unpack("f", __import__("struct").pack("f", x))[0] for x in vec])


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=80))
@settings(max_examples=30, deadline=None)
def test_t41_normalization_idempotent(spark, text):
    from pyspark.sql import functions as F

    from squonk2_fastapi_ws_event_stream_spark.operators.dedup import _normalized

    df = spark.createDataFrame([(text,)], "t string")
    once, twice = df.select(
        _normalized(F.col("t")).alias("n1"),
    ).select("n1", _normalized(F.col("n1")).alias("n2")).collect()[0]
    assert once == twice


@settings(max_examples=25, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=300)
)
def test_kmv_sketch_matches_python_reference(ids):
    """x13's DuckDB oracle fragment computes exactly the pure-Python KMV:
    k smallest distinct Knuth-multiplicative hashes, estimate with the
    small-n branch."""
    from squonk2_fastapi_ws_event_stream_spark.plans.pipeline import (
        X13_A, X13_B, X13_K, _X13_P,
    )

    hs = sorted({(X13_A * u + X13_B) % _X13_P for u in ids})
    kmin = hs[:X13_K]
    want_kept, want_kth = len(kmin), kmin[-1]
    want_est = (
        float(want_kept)
        if want_kept < X13_K
        else round((want_kept - 1) * float(_X13_P) / want_kth, 4)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE ids (user_id BIGINT)")
    con.executemany("INSERT INTO ids VALUES (?)", [(u,) for u in ids])
    got = con.execute(
        f"""
        WITH hashed AS (
          SELECT DISTINCT (user_id * {X13_A} + {X13_B}) % {_X13_P} AS h FROM ids
        ),
        kmin AS (SELECT h FROM hashed ORDER BY h ASC LIMIT {X13_K}),
        sketch AS (SELECT COUNT(*) AS k_kept, MAX(h) AS kth FROM kmin)
        SELECT k_kept, kth,
               CASE WHEN k_kept < {X13_K} THEN CAST(k_kept AS DOUBLE)
                    ELSE ROUND((k_kept - 1) * CAST({_X13_P} AS DOUBLE) / kth, 4)
               END
        FROM sketch
        """
    ).fetchone()
    assert got == (want_kept, want_kth, want_est)


@settings(max_examples=25, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=300)
)
def test_linear_counting_matches_python_reference(ids):
    """x14's occupied-bucket count equals the pure-Python bitmap model."""
    import math

    from squonk2_fastapi_ws_event_stream_spark.plans.pipeline import (
        X13_A, X13_B, X14_M, _X13_P,
    )

    occ = len({((X13_A * u + X13_B) % _X13_P) % X14_M for u in ids})
    want_est = round(X14_M * math.log(X14_M / max(1.0, X14_M - occ)), 2)
    con = duckdb.connect()
    con.execute("CREATE TABLE ids (user_id BIGINT)")
    con.executemany("INSERT INTO ids VALUES (?)", [(u,) for u in ids])
    got = con.execute(
        f"""
        WITH occ AS (
          SELECT COUNT(*) AS occupied FROM (
            SELECT DISTINCT ((user_id * {X13_A} + {X13_B}) % {_X13_P}) % {X14_M} AS b
            FROM ids)
        )
        SELECT occupied,
               ROUND({X14_M}.0 * ln({X14_M}.0 / GREATEST(1.0, {X14_M}.0 - occupied)), 2)
        FROM occ
        """
    ).fetchone()
    assert got == (occ, want_est)


def test_kmv_hash_is_overflow_safe_for_any_bigint_key(spark):
    # The reduced form (u % P) * (A % P) + B stays inside int64 for ANY
    # BIGINT key, and is congruent mod P with the textbook u*A + B — so
    # hashes match exact big-int arithmetic even where the unreduced
    # product would exceed 2^63 (user_id > ~3.47e9) and silently wrap.
    from pyspark.sql import functions as F

    from squonk2_fastapi_ws_event_stream_spark.plans.pipeline import (
        X13_A,
        X13_B,
        _X13_P,
        _kmv_hash,
    )

    big_ids = [3_500_000_000, 2**62, 2**63 - 1, 987_654_321_987_654_321]
    df = spark.createDataFrame([(u,) for u in big_ids], "user_id long")
    got = {
        r["user_id"]: r["h"]
        for r in df.select("user_id", _kmv_hash(F.col("user_id")).alias("h")).collect()
    }
    for u in big_ids:
        assert got[u] == (u * X13_A + X13_B) % _X13_P, u
