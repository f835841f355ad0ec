"""Corpus-quality operators: repetition metrics, PII redaction, and
cross-document boilerplate removal — the filtering stages of an
LLM-training-data pipeline that sit between raw ingest and dedup.

All hot-path logic is built-in string/array/aggregate expressions
(JVM-side, whole-stage codegen); no Python UDFs.

Scale design (100 TB):
- t17 explodes words/bigrams but aggregates them back per-document in the
  same stage — the shuffle key is doc_id, partial aggregation happens
  map-side, and nothing wider than (doc_id, token, count) ever moves.
- t18 is purely per-row regexp work: zero shuffle, one codegen span.
- t19's global line-frequency table is the one genuinely corpus-wide
  shuffle (groupBy line digest); at 100 TB the key is sha2(line) (fixed
  32-byte key, same trick as t05) and the frequent-line table it yields
  is tiny (boilerplate is by definition heavy-hitter lines), so the
  join-back qualifies for a broadcast. Test scale joins on the raw line.

Reference parity: no analog in the reference relay (app/app.py); part of
the driver's LLM-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import fan_out, table

# ---------------------------------------------------------------------------
# t17 — intra-document repetition metrics (Gopher-style quality signals:
# Rae et al. 2021, "Scaling Language Models", App. A1.1): duplicate-word
# fraction, top-word fraction, top-bigram fraction. High values mark
# degenerate/templated documents that repetition-sensitive LM training
# filters out.
# ---------------------------------------------------------------------------
# zip_with over two aligned slices, not transform+element_at: the indexed
# lambda re-resolves the outer array per element and benches ~2.5x slower.
BIGRAM_EXPR = (
    "zip_with(slice(words, 1, size(words) - 1),"
    " slice(words, 2, size(words) - 1), (a, b) -> concat(a, ' ', b))"
)

SQL_BIGRAMS = (
    "list_transform(generate_series(1, len(words) - 1),"
    " i -> words[i] || ' ' || words[i + 1])"
)


def t17_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
        .withColumn("words", F.split("text", " "))
        .withColumn("bigrams", F.expr(BIGRAM_EXPR))
    )
    wc = (
        docs.select("doc_id", F.explode("words").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.max("n").alias("top_word_n"),
        )
    )
    bc = (
        docs.select("doc_id", F.explode("bigrams").alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n_bigrams"), F.max("n").alias("top_bigram_n"))
    )
    return (
        wc.join(bc, "doc_id")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_distinct_words").cast("long").alias("n_distinct_words"),
            F.round(
                (F.col("n_words") - F.col("n_distinct_words")) / F.col("n_words") * 1.0, 6
            ).alias("dup_word_frac"),
            F.round(F.col("top_word_n") / F.col("n_words") * 1.0, 6).alias("top_word_frac"),
            F.round(F.col("top_bigram_n") / F.col("n_bigrams") * 1.0, 6).alias(
                "top_bigram_frac"
            ),
        )
    )


ORACLE_T17 = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
db AS (SELECT doc_id, words, {SQL_BIGRAMS} AS bigrams FROM d),
wc AS (
  SELECT doc_id, w, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(words) AS w FROM db)
  GROUP BY doc_id, w
),
ws AS (
  SELECT doc_id, SUM(n) AS n_words, COUNT(*) AS n_distinct_words, MAX(n) AS top_word_n
  FROM wc GROUP BY doc_id
),
bc AS (
  SELECT doc_id, b, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(bigrams) AS b FROM db)
  GROUP BY doc_id, b
),
bs AS (SELECT doc_id, SUM(n) AS n_bigrams, MAX(n) AS top_bigram_n FROM bc GROUP BY doc_id)
SELECT ws.doc_id,
       CAST(ws.n_words AS BIGINT) AS n_words,
       CAST(ws.n_distinct_words AS BIGINT) AS n_distinct_words,
       ROUND(1.0 * (ws.n_words - ws.n_distinct_words) / ws.n_words, 6) AS dup_word_frac,
       ROUND(1.0 * ws.top_word_n / ws.n_words, 6) AS top_word_frac,
       ROUND(1.0 * bs.top_bigram_n / bs.n_bigrams, 6) AS top_bigram_frac
FROM ws JOIN bs ON ws.doc_id = bs.doc_id
"""


# ---------------------------------------------------------------------------
# t18 — PII detection + redaction. The test corpus contains no PII, so
# deterministic emails/phone numbers are injected first (doc_id-keyed), then
# detected with regexes and redacted; output carries the match counts and a
# sha256 of the redacted text so the oracle verifies the redaction
# byte-for-byte without hashing megabytes through the driver.
# ---------------------------------------------------------------------------
EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
PHONE_RE = "[0-9]{3}-[0-9]{4}"


def t18_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    injected = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.col("text"), F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
    ).when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.col("text"), F.lit(" call 555-0"), (F.col("doc_id") % 900 + 100), F.lit(" today")),
    ).otherwise(F.col("text"))
    red = F.regexp_replace(
        F.regexp_replace(F.col("txt"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return (
        docs.withColumn("txt", injected)
        .select(
            "doc_id",
            F.size(F.regexp_extract_all("txt", F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
            F.size(F.regexp_extract_all("txt", F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
            F.length(red).cast("long").alias("redacted_len"),
            F.sha2(red, 256).alias("redacted_sha"),
        )
    )


ORACLE_T18 = f"""
WITH injected AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 5 = 0 THEN text || ' contact user' || doc_id || '@example.com now'
           WHEN doc_id % 7 = 0 THEN text || ' call 555-0' || (doc_id % 900 + 100) || ' today'
           ELSE text
         END AS txt
  FROM documents
),
red AS (
  SELECT doc_id, txt,
         regexp_replace(regexp_replace(txt, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM injected
)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(txt, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(redacted) AS BIGINT) AS redacted_len,
       sha256(redacted) AS redacted_sha
FROM red
"""


# ---------------------------------------------------------------------------
# t19 — cross-document boilerplate line removal: lines whose document
# frequency reaches BP_MIN_DOCS are boilerplate (nav bars, cookie banners,
# license footers) and are dropped from every document. The test corpus is
# single-line, so known boilerplate lines are prepended deterministically;
# the operator itself is generic over any line-structured corpus.
# ---------------------------------------------------------------------------
BP_MIN_DOCS = 5
BP_LINE_A = "subscribe to our newsletter"
BP_LINE_B = "all rights reserved"

LINES_EXPR = (
    "filter(array("
    f" CASE WHEN doc_id % 4 = 0 THEN '{BP_LINE_A}' END,"
    f" CASE WHEN doc_id % 10 = 0 THEN '{BP_LINE_B}' END,"
    " text), x -> x IS NOT NULL)"
)


def t19_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = (
        fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
        .withColumn("lines", F.expr(LINES_EXPR))
        .select("doc_id", F.explode("lines").alias("line"))
    )
    freq = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
    )
    tagged = lines.join(F.broadcast(freq), "line")
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum((F.col("doc_freq") < BP_MIN_DOCS).cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("doc_freq") < BP_MIN_DOCS, F.length("line")).otherwise(F.lit(0))
            ).cast("long").alias("kept_chars"),
        )
    )


ORACLE_T19 = f"""
WITH lines AS (
  SELECT doc_id, unnest(list_filter([
           CASE WHEN doc_id % 4 = 0 THEN '{BP_LINE_A}' END,
           CASE WHEN doc_id % 10 = 0 THEN '{BP_LINE_B}' END,
           text], x -> x IS NOT NULL)) AS line
  FROM documents
),
freq AS (SELECT line, COUNT(DISTINCT doc_id) AS doc_freq FROM lines GROUP BY line)
SELECT l.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN f.doc_freq < {BP_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN f.doc_freq < {BP_MIN_DOCS} THEN length(l.line) ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM lines l JOIN freq f ON l.line = f.line
GROUP BY l.doc_id
"""


# ---------------------------------------------------------------------------
# t20 — decontamination: flag training documents that overlap an evaluation
# set by >= MIN_SHARED distinct 8-gram shingles (the n-gram-overlap rule of
# GPT-3 App. C / PaLM App. D). The eval set here is doc_id % 97 == 0
# (deterministic stand-in for a benchmark suite); overlap candidates come
# from an equi-join on shingle hash — linear in corpus size, never
# all-pairs — then per-(train, eval) distinct-shingle counting. Synthetic
# true contamination: every 90th doc re-enters the corpus with an eval
# doc's text appended (ids +40000), guaranteeing hits.
# Scale: the eval side is small by definition (benchmarks are thousands of
# docs, the corpus is billions) — its exploded shingle table broadcasts,
# so the corpus-side shingle stream never shuffles for the probe; only
# surviving (train, eval) pairs aggregate.
# ---------------------------------------------------------------------------
MIN_SHARED_SHINGLES = 3
EVAL_STRIDE = 97
CONTAM_STRIDE = 90


def _shingle_rows(docs: DataFrame, spark: SparkSession, id_alias: str) -> DataFrame:
    """(id, shingle-hash) rows, one per K-gram position (duplicates kept —
    the consumer counts DISTINCT). Explode positions first, then hash with
    direct substr terms: the array-form shingle expression must NOT be
    nested under the explode (see hashing.shingle_hash_at)."""
    from ..functions import hashing as H
    from ..tables import fan_out

    d = fan_out(docs.filter(F.length("text") >= H.K), spark)
    positions = d.select(
        F.col("doc_id").alias(id_alias),
        "text",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - F.lit(H.K - 1))
        ).alias("pos"),
    )
    return positions.select(
        id_alias, H.shingle_hash_at(F.col("text"), F.col("pos")).alias("h")
    )


def t20_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    evald = docs.filter(F.col("doc_id") % EVAL_STRIDE == 0)
    eval0 = evald.filter(F.col("doc_id") == 0).select(F.col("text").alias("e_text"))
    contaminated = (
        docs.filter(
            (F.col("doc_id") % CONTAM_STRIDE == 0) & (F.col("doc_id") % EVAL_STRIDE != 0)
        )
        .crossJoin(F.broadcast(eval0))  # append eval doc 0's text to each
        .select(
            (F.col("doc_id") + 40000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" "), F.col("e_text")).alias("text"),
        )
    )
    corpus = docs.filter(F.col("doc_id") % EVAL_STRIDE != 0).unionByName(contaminated)
    train_sh = _shingle_rows(corpus, spark, "train_id")
    eval_sh = _shingle_rows(evald, spark, "eval_id")
    shared = (
        train_sh.join(F.broadcast(eval_sh), "h")
        .groupBy("train_id", "eval_id")
        .agg(F.countDistinct("h").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED_SHINGLES)
    )
    return shared.select(
        "train_id", "eval_id", F.col("n_shared").cast("long").alias("n_shared")
    )


def _oracle_t20() -> str:
    from ..functions import hashing as H

    shingles_of = (
        "SELECT doc_id, list_distinct({expr}) AS shingles "
        "FROM (SELECT doc_id, text, {codes} AS codes FROM {src} "
        f"      WHERE length(text) >= {H.K})"
    )

    def sh(src: str) -> str:
        return shingles_of.format(
            expr=H.sql_shingle_hashes("codes", "text"),
            codes=H.sql_char_codes("text"),
            src=src,
        )

    return f"""
WITH evald AS (SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_STRIDE} = 0),
contaminated AS (
  SELECT d.doc_id + 40000 AS doc_id, d.text || ' ' || e.text AS text
  FROM documents d, evald e
  WHERE d.doc_id % {CONTAM_STRIDE} = 0 AND d.doc_id % {EVAL_STRIDE} != 0
    AND e.doc_id = 0
),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_STRIDE} != 0
  UNION ALL SELECT doc_id, text FROM contaminated
),
train_sh AS (
  SELECT doc_id AS train_id, unnest(shingles) AS h FROM ({sh('corpus')})
),
eval_sh AS (
  SELECT doc_id AS eval_id, unnest(shingles) AS h FROM ({sh('evald')})
)
SELECT t.train_id, e.eval_id, CAST(COUNT(DISTINCT t.h) AS BIGINT) AS n_shared
FROM train_sh t JOIN eval_sh e ON t.h = e.h
GROUP BY t.train_id, e.eval_id
HAVING COUNT(DISTINCT t.h) >= {MIN_SHARED_SHINGLES}
"""


QUERIES = {
    "t17_repetition_stats": t17_repetition_stats,
    "t18_pii_redaction": t18_pii_redaction,
    "t19_boilerplate_removal": t19_boilerplate_removal,
    "t20_decontamination": t20_decontamination,
}

ORACLES = {
    "t17_repetition_stats": ORACLE_T17,
    "t18_pii_redaction": ORACLE_T18,
    "t19_boilerplate_removal": ORACLE_T19,
    "t20_decontamination": _oracle_t20(),
}
