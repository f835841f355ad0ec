"""Text-analysis operators over ``documents``: language ID, quality scoring,
token counting, document fingerprinting (winnowing).

All Spark-side logic is built-in string/array expressions — one
whole-stage-codegen span per query, no shuffle except final aggregation,
no Python. That is the property that scales to 100 TB: these are the
per-document map-side stages of a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..tables import fan_out, table

# Stopword marker lists for the n-gram language heuristic. The padded-
# occurrence-count trick (len(t) - len(replace(t, w, ''))) / len(w) is
# exactly expressible in both engines.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " que "],
}

BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

WINNOW_WINDOW = 5


def _occurrences(padded: Column, word: str) -> Column:
    """Count of non-overlapping occurrences of `word` in `padded`."""
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(word), F.lit(""))))
        / len(word)
    ).cast("long")


def _sql_occurrences(padded: str, word: str) -> str:
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{word}', ''))) "
        f"/ {len(word)} AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# t08 — language ID via stopword-marker counts.
# ---------------------------------------------------------------------------
def t08_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    hits = {
        lang: sum((_occurrences(padded, w) for w in words), F.lit(0).cast("long"))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = priority on ties
        pred = pred.when(hits[lang] == best, F.lit(lang))
    out = docs.withColumn("predicted_lang", pred)
    for lang in LANG_MARKERS:
        out = out.withColumn(f"hits_{lang}", hits[lang])
    return out.select(
        "doc_id", "lang", "predicted_lang", *[f"hits_{lang}" for lang in LANG_MARKERS]
    )


def _oracle_t08() -> str:
    padded = "(' ' || lower(text) || ' ')"
    hit_exprs = {
        lang: "(" + " + ".join(_sql_occurrences(padded, w) for w in words) + ")"
        for lang, words in LANG_MARKERS.items()
    }
    best = f"GREATEST({', '.join(hit_exprs.values())})"
    whens = "\n         ".join(
        f"WHEN {hit_exprs[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    hit_cols = ",\n       ".join(f"{hit_exprs[lang]} AS hits_{lang}" for lang in LANG_MARKERS)
    return f"""
SELECT doc_id, lang,
       CASE WHEN {best} = 0 THEN 'und'
         {whens}
       END AS predicted_lang,
       {hit_cols}
FROM documents
"""


# ---------------------------------------------------------------------------
# t09 — quality scoring: word count, avg word length, stopword ratio,
# composite score + bucket.
#
# The composite is computed in EXACT INTEGER MICROS, not floating point:
# the round-7 sf0.1 parity sweep caught one row whose double composite
# landed exactly on a ROUND(x, 6) half boundary, where Spark and DuckDB
# round the same double differently (0.824974 vs 0.824975 — the 1-ulp
# class the cross-engine rules exist for). With
#   score_micro = 3000·least(n_words, 100)                 [0.3·min(n/100,1)]
#               + 400000 − stop_micro·2 DIV 5              [0.4·(1−ratio)]
#               + least(awl_micro, 6000000) DIV 20         [0.3·min(awl/6,1)]
# every term is integer arithmetic (truncating DIV ≡ DuckDB //), the
# bucket thresholds compare integers, and the published double is the
# SAME integer divided by 1e6 in both engines. Since round 10 the ratio
# micros flow end to end as truncating-DIV integers (the published 6-dp
# ratios were themselves ROUND(int/int, 6) with a reachable half
# boundary — AUDIT_ROUND_DOUBLES.md round-10 worklist).
# ---------------------------------------------------------------------------
def quality_score_micro_expr() -> "F.Column":
    """Exact-integer composite score in micros; expects the micro-integer
    ratio columns n_words, stop_micro, awl_micro (round-10 conversion:
    the old form ROUND-recovered micros from the published 6-dp doubles,
    which themselves carried a reachable 1e-6 half boundary — now the
    micros are computed once with truncating DIV and flow through)."""
    return F.expr(
        "3000 * least(n_words, 100)"
        " + 400000 - stop_micro * 2 DIV 5"
        " + least(awl_micro, 6000000) DIV 20"
    )


SQL_QUALITY_MICRO = (
    "3000 * LEAST(n_words, 100)"
    " + 400000 - stop_micro * 2 // 5"
    " + LEAST(awl_micro, 6000000) // 20"
)


def t09_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    stop_hits = (
        _occurrences(padded, " the ") + _occurrences(padded, " a ") + _occurrences(padded, " of ")
    )
    base = (
        docs.select(
            "doc_id",
            "n_chars",
            n_words.alias("n_words"),
            stop_hits.alias("stop_hits"),
        )
        .select(
            "doc_id",
            "n_words",
            F.expr("(n_chars - (n_words - 1)) * 1000000 DIV n_words").alias("awl_micro"),
            F.expr("stop_hits * 1000000 DIV n_words").alias("stop_micro"),
        )
        .withColumn("score_micro", quality_score_micro_expr())
    )
    return base.select(
        "doc_id",
        "n_words",
        (F.col("awl_micro") / 1_000_000.0).alias("avg_word_len"),
        (F.col("stop_micro") / 1_000_000.0).alias("stopword_ratio"),
        (F.col("score_micro") / 1_000_000.0).alias("quality_score"),
        F.when(F.col("score_micro") >= 800_000, "high")
        .when(F.col("score_micro") >= 600_000, "medium")
        .otherwise("low")
        .alias("quality_bucket"),
    )


def _oracle_t09() -> str:
    padded = "(' ' || lower(text) || ' ')"
    stop_hits = " + ".join(_sql_occurrences(padded, w) for w in (" the ", " a ", " of "))
    return f"""
WITH base AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         ({stop_hits}) AS stop_hits
  FROM documents
),
m AS (
  SELECT doc_id, n_words,
         (n_chars - (n_words - 1)) * 1000000 // n_words AS awl_micro,
         stop_hits * 1000000 // n_words AS stop_micro
  FROM base
),
s AS (
  SELECT doc_id, n_words, awl_micro, stop_micro,
         {SQL_QUALITY_MICRO} AS score_micro
  FROM m
)
SELECT doc_id, n_words,
       awl_micro / 1000000.0 AS avg_word_len,
       stop_micro / 1000000.0 AS stopword_ratio,
       score_micro / 1000000.0 AS quality_score,
       CASE WHEN score_micro >= 800000 THEN 'high'
            WHEN score_micro >= 600000 THEN 'medium'
            ELSE 'low' END AS quality_bucket
FROM s
"""


# ---------------------------------------------------------------------------
# t10 — token counting: whitespace tokens + BPE-ish regex tokens.
# ---------------------------------------------------------------------------
def t10_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    lowered = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(lowered, F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
    )


ORACLE_T10 = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{BPE_ISH_PATTERN}')) AS BIGINT) AS bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# t11 — document fingerprinting via winnowing: min shingle-hash per sliding
# window, distinct mins = fingerprint set; reported as count + checksum.
# ---------------------------------------------------------------------------
def t11_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        fan_out(
            table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.length("text") >= H.K + WINNOW_WINDOW - 1),
            spark,
        )
        .withColumn("_codes", H.char_codes("text"))
        .withColumn("hs", H.shingle_hashes("_codes", "length(text)"))
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.size("hs") - F.lit(WINNOW_WINDOW - 1)),
        lambda i: F.array_min(F.slice(F.col("hs"), i, WINNOW_WINDOW)),
    )
    fp = F.array_distinct(wins)
    checksum = F.aggregate(fp, F.lit(0).cast("long"), lambda acc, x: (acc + x) % F.lit(H.P))
    return docs.select(
        "doc_id",
        F.size(fp).cast("long").alias("n_fingerprints"),
        F.array_min(fp).alias("fp_min"),
        F.array_max(fp).alias("fp_max"),
        checksum.alias("fp_checksum"),
    )


def _oracle_t11() -> str:
    return f"""
WITH sh AS (
  SELECT doc_id,
         {H.sql_shingle_hashes('codes', 'text')} AS hs
  FROM (SELECT doc_id, text, {H.sql_char_codes('text')} AS codes
        FROM documents WHERE length(text) >= {H.K + WINNOW_WINDOW - 1})
),
fp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(hs) - {WINNOW_WINDOW - 2}),
             i -> list_min(hs[i:i+{WINNOW_WINDOW - 1}]))) AS f
  FROM sh
)
SELECT doc_id,
       CAST(len(f) AS BIGINT) AS n_fingerprints,
       list_min(f) AS fp_min,
       list_max(f) AS fp_max,
       CAST(list_sum(f) % {H.P} AS BIGINT) AS fp_checksum
FROM fp
"""


# ---------------------------------------------------------------------------
# t14 — string-function battery: case ops, trim/pad, substring, translate,
# edit distance (all JVM built-ins with exact DuckDB twins).
# ---------------------------------------------------------------------------
REF_PHRASE = "the quick brown fox"


def t14_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    head = F.substring(F.col("text"), 1, 19)
    return docs.select(
        "doc_id",
        F.upper(head).alias("head_upper"),
        F.length(F.trim(F.col("text"))).cast("long").alias("trimmed_len"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.translate(head, "aeiou", "AEIOU").alias("vowels_up"),
        F.levenshtein(head, F.lit(REF_PHRASE)).alias("edit_dist"),
        F.reverse(head).alias("head_rev"),
        F.concat_ws("|", F.lit("doc"), F.col("doc_id"), head).alias("tagged"),
    )


ORACLE_T14 = f"""
SELECT doc_id,
       upper(substr(text, 1, 19)) AS head_upper,
       CAST(length(trim(text)) AS BIGINT) AS trimmed_len,
       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
       translate(substr(text, 1, 19), 'aeiou', 'AEIOU') AS vowels_up,
       CAST(levenshtein(substr(text, 1, 19), '{REF_PHRASE}') AS INTEGER) AS edit_dist,
       reverse(substr(text, 1, 19)) AS head_rev,
       concat_ws('|', 'doc', CAST(doc_id AS VARCHAR), substr(text, 1, 19)) AS tagged
FROM documents
"""




# ---------------------------------------------------------------------------
# t32 — language-ID confusion matrix: t08's predictions evaluated against
# the labeled `lang` column — per-(true, predicted) counts plus per-true-
# language accuracy. The third member of the in-engine evaluation family
# (v10 ANN recall, t31 MinHash estimator accuracy): classifier quality is
# a query, so threshold/marker changes are priced without leaving Spark.
# Scale: rides t08's map-side expressions; the only shuffle is the tiny
# (true, predicted) aggregate.
# ---------------------------------------------------------------------------
def t32_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = t08_lang_id(spark, sf_dir).select("doc_id", "lang", "predicted_lang")
    cells = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = pred.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(F.col("predicted_lang") == F.col("lang"), 1).otherwise(0)
        ).alias("n_correct"),
    )
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "predicted_lang",
            "n_docs",
            F.col("n_correct").cast("long").alias("n_correct"),
            F.col("n_total").cast("long").alias("n_total"),
            (F.expr("n_correct * 1000000 div n_total") / F.lit(1e6)).alias("accuracy"),
        )
    )


def _oracle_t32() -> str:
    return f"""
WITH pred AS (SELECT doc_id, lang, predicted_lang FROM ({_oracle_t08()})),
cells AS (
  SELECT lang, predicted_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY 1, 2
),
totals AS (
  SELECT lang, COUNT(*) AS n_total,
         SUM(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END) AS n_correct
  FROM pred GROUP BY lang
)
SELECT c.lang, c.predicted_lang, c.n_docs,
       CAST(t.n_correct AS BIGINT) AS n_correct,
       CAST(t.n_total AS BIGINT) AS n_total,
       t.n_correct * 1000000 // t.n_total / 1e6 AS accuracy
FROM cells c JOIN totals t USING (lang)
"""


QUERIES = {
    "t08_lang_id": t08_lang_id,
    "t09_quality_score": t09_quality_score,
    "t10_token_count": t10_token_count,
    "t11_doc_fingerprint": t11_doc_fingerprint,
    "t14_string_ops": t14_string_ops,
    "t32_langid_confusion": t32_langid_confusion,
}

ORACLES = {
    "t08_lang_id": _oracle_t08(),
    "t09_quality_score": _oracle_t09(),
    "t10_token_count": ORACLE_T10,
    "t11_doc_fingerprint": _oracle_t11(),
    "t14_string_ops": ORACLE_T14,
    "t32_langid_confusion": _oracle_t32(),
}
