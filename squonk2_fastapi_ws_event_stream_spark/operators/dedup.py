"""Deduplication operators over the ``documents`` table.

Exact dedup, MinHash+LSH near-dedup, SimHash, and n-gram Jaccard — the
LLM-training-pipeline surface (BASELINE.json north star). All Spark-side
logic is built-in array/aggregate expressions (JVM, codegen); the only
Python is in the oracle-SQL builders.

Scale design:
- exact dedup: groupBy(text) at test scale; at 100 TB group by sha2(text)
  first (fixed-width shuffle key) — see t01's docstring.
- MinHash LSH: signatures are per-row expressions (no shuffle); candidate
  generation is an equi-join on (band_id, band_key) — the classic
  distributed LSH plan, linear in corpus size, never all-pairs.
- n-gram Jaccard brute force is the verifier / small-corpus baseline; the
  LSH path is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..tables import fan_out, guard_all_pairs, table

JACCARD_THRESHOLD = 0.10  # test corpus has no true near-dups; 0.10 yields pairs
# ppm twin of the threshold: jac_micros >= JACCARD_PPM is EXACTLY
# jaccard >= JACCARD_THRESHOLD (jac_micros/1e6 and the 0.10 literal round
# to the same doubles) — the integer form size_ratio_ok prunes on.
JACCARD_PPM = 100_000
assert JACCARD_PPM / 1e6 == JACCARD_THRESHOLD


def _with_shingles(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """doc_id + distinct 8-gram shingle hash set (docs shorter than K dropped)."""
    return (
        fan_out(docs.filter(F.length("text") >= H.K), spark)
        .withColumn("_codes", H.char_codes("text"))
        .withColumn("_hs", H.shingle_hashes("_codes", "length(text)"))
        .withColumn("shingles", F.array_distinct(F.col("_hs")))
        .drop("_codes")
    )


SQL_SHINGLES = f"""
  SELECT doc_id,
         {H.sql_shingle_hashes('codes', 'text')} AS hs,
         list_distinct({H.sql_shingle_hashes('codes', 'text')}) AS shingles
  FROM (SELECT doc_id, text, {H.sql_char_codes('text')} AS codes
        FROM documents WHERE length(text) >= {H.K})
"""


# ---------------------------------------------------------------------------
# t01 — exact dedup: keep lowest doc_id per identical text.
# The test corpus has no exact dups, so we synthesize copies of every 50th
# doc (ids offset by 10000) and report the dup groups.
# At 100 TB: group by sha2(text, 256) instead of raw text so the shuffle
# carries 32-byte keys, then resolve rare hash collisions inside the group.
# ---------------------------------------------------------------------------
def t01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    union = docs.unionByName(copies)
    return (
        union.groupBy("text")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("kept_doc_id", "n_copies")
    )


ORACLE_T01 = """
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
)
SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
FROM unioned GROUP BY text HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# t05 — exact dedup at 100 TB: the sha2-keyed form t01's docstring promises.
# Phase 1 shuffles ONLY (digest, doc_id) — 32-byte keys, zero document
# bytes — to find candidate-dup digests. Phase 2 joins the (tiny) candidate
# set back and groups by exact text to resolve sha collisions in-group, so
# the full text is only ever shuffled for rows already known to share a
# digest. Same output contract as t01; at scale t01's groupBy(text) would
# shuffle the whole corpus body while this shuffles ~n×40 bytes.
# ---------------------------------------------------------------------------
def t05_dedup_exact_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    keyed = docs.unionByName(copies).withColumn("digest", F.sha2(F.col("text"), 256))
    cand = (
        keyed.select("digest", "doc_id")
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_digest"))
        .filter(F.col("n_digest") > 1)
        .select("digest")
    )
    return (
        keyed.join(cand, "digest")
        .groupBy("digest", "text")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("kept_doc_id", "n_copies")
    )


ORACLE_T05 = """
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
),
keyed AS (SELECT doc_id, text, sha256(text) AS digest FROM unioned),
cand AS (SELECT digest FROM keyed GROUP BY digest HAVING COUNT(*) > 1)
SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
FROM keyed JOIN cand USING (digest)
GROUP BY digest, text HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# t02 — MinHash + LSH near-dedup: shingle → minhash signature → band keys →
# bucket equi-join → verify true Jaccard.
#
# HOT-BUCKET SUPPRESSION (round 11, T65_BUCKET_CAP's rationale applied
# to the flagship): a band bucket shared by B docs yields B(B-1)/2
# candidates, and on a boilerplate-heavy corpus one non-discriminative
# minhash value can pull thousands of docs into one bucket — the
# "banded" join silently goes quadratic. Measured on a synthetic
# 10x-sf0.1 corpus (50k docs, replica-suffixed vocab): max bucket 2,231
# docs, 9.36M candidate pairs vs sf0.1's 1,243 — t02 ran 53x its sf0.1
# time (SCALING.md round-11 band-family scale probe). Buckets larger
# than T02_BUCKET_CAP are dropped in BOTH engine and oracle: they carry
# no discrimination signal, and candidates stay <= b * CAP^2 / 2 per
# bucket. At every driver SF the max bucket is 5, so tested outputs are
# bit-identical with or without the cap — this is purely the 100-TB
# guard.
# ---------------------------------------------------------------------------
T02_BUCKET_CAP = 64  # same bound + rationale as T65_BUCKET_CAP


def suppress_hot_buckets(bands: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Drop band rows whose bucket (the rows sharing `keys`) holds more
    than `cap` rows — the shared 100-TB guard for every LSH band family
    (t02/t31/t38 minhash, t49 sweep configs, t52 train×eval, t55's
    standing index, m10 ahash bands, v08 SRP bands). A bucket that
    large carries no discrimination signal and makes the band join
    quadratic on boilerplate-heavy corpora (SCALING.md round-11 probe:
    one 2,231-doc bucket drove t02 to 53x its sf0.1 time).

    Implementation is the measured t02 form: hot-key detection is a
    combiner-friendly aggregate + hint-free LEFT ANTI join (never a
    count window — that sorts every band row; the aggregate ships only
    (key, count) partials and the anti-join's build side is just the
    hot keys, empty at every driver SF and rare by definition at any
    scale)."""
    hot = (
        bands.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > cap)
        .select(*keys)
    )
    return bands.join(hot, keys, "left_anti")


def _capped_bands(sf_dir: str, sig: DataFrame) -> DataFrame:
    """The staged bucket-capped minhash band table (doc_id, n_sh,
    band_id, band_key) — the per-corpus artifact every t02-family
    consumer probes: the t02/t31/t38 candidate self-join and t55's
    standing index. Staging it means the suppression is paid once per
    corpus, exactly like the production pipeline that persists its band
    index — warm queries pay only their join, so the 100-TB guard costs
    the bench's warm path nothing (SCALING.md round-11 probe: the
    unstaged forms re-ran t02 at 1.8-2.4x its best-ever from fixed
    extra-stage overhead at toy scale).

    round 12: the table also carries n_sh = |shingle set| (one int per
    band row) so threshold-bearing consumers can prune candidate pairs
    on the Jaccard-implied size ratio BEFORE the shingle re-join — see
    size_ratio_ok."""

    def build() -> DataFrame:
        bands_all = sig.select(
            "doc_id",
            F.size("shingles").alias("n_sh"),
            F.posexplode(H.band_keys("sig")).alias("band_id", "band_key"),
        )
        return suppress_hot_buckets(bands_all, ["band_id", "band_key"], T02_BUCKET_CAP)

    return _stage_cached("t02_bands", sf_dir, build)


def size_ratio_ok(n_a, n_b, threshold_ppm: int):
    """LOSSLESS candidate prune for a published Jaccard threshold
    (guide §3.1 — prune before the join; round-12 VERDICT task #1).

    Every emitted pair must satisfy jac_micros >= T where jac_micros =
    |A∩B| * 1e6 DIV |A∪B| (exact integers).  Since |A∩B| <= min(|A|,|B|)
    and |A∪B| >= max(|A|,|B|), a qualifying pair necessarily has
    min(|A|,|B|) * 1e6 >= T * max(|A|,|B|) — pairs failing that can
    NEVER clear the threshold, so dropping them before the exact
    array_intersect verify is value-preserving (no oracle change; the
    threshold filter downstream is untouched).  Integer arithmetic
    only: n * 1e6 stays far under int64 for any real shingle count."""
    lo = F.least(n_a, n_b).cast("long") * F.lit(1_000_000)
    hi = F.greatest(n_a, n_b).cast("long") * F.lit(int(threshold_ppm))
    return lo >= hi


def _banded_candidates(
    sf_dir: str, sig: DataFrame, threshold_ppm: int | None = None
) -> DataFrame:
    """(doc_a < doc_b) candidate pairs from the bucket-capped minhash
    band self-join — shared by t02 (the dedup itself), t31 (the
    estimator-accuracy eval) and t38 (containment) so their candidate
    sets can never drift apart.

    `threshold_ppm` (t02 only — t31/t38 PUBLISH every candidate pair,
    so no prune may apply to them) drops pairs that provably cannot
    clear the Jaccard threshold, BEFORE the distinct and the shingle
    re-join (see size_ratio_ok): the verify stage's pair count becomes
    bounded by the threshold's size band instead of raw bucket
    co-membership — the round-11 10x probe's residual super-linearity
    (t02 18.1x at 10x data) was exactly unpruned verify pairs."""
    bands = _capped_bands(sf_dir, sig)
    joined = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    if threshold_ppm is not None:
        joined = joined.filter(
            size_ratio_ok(F.col("a.n_sh"), F.col("b.n_sh"), threshold_ppm)
        )
    return (
        joined.select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def sql_capped_bands(body: str, keys: str, cols: str, cap: int) -> str:
    """Oracle mirror of suppress_hot_buckets: count-window bucket cap
    over a band-rows relation (DuckDB is single-node, so the window form
    is exact and cheap there; the engine uses the aggregate+anti-join
    form for the distributed reasons documented on the helper)."""
    return (
        f"SELECT {cols} FROM (\n"
        f"    SELECT {cols}, COUNT(*) OVER (PARTITION BY {keys}) AS bucket_n\n"
        f"    FROM ({body})\n"
        f"  ) WHERE bucket_n <= {cap}"
    )


# The oracle-side mirror of _banded_candidates (t02/t31/t38 share it the
# same way): band rows -> bucket-capped -> self-join -> DISTINCT ordered
# pairs.
def _sql_banded_candidates() -> str:
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_id, {H.sql_band_key('sig', b)} AS band_key FROM sig"
        for b in range(H.N_BANDS)
    )
    return f"""bands_all AS (
{band_selects}
),
bands AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT doc_id, band_id, band_key,
           COUNT(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
    FROM bands_all
  ) WHERE bucket_n <= {T02_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""
# Persisted LSH staging tables (t02 signatures, t06 fingerprints), keyed by
# (operator, sf_dir). A long-lived session (driver sweeps, bench warm
# passes) would otherwise accumulate one orphaned cache per invocation.
# Eviction discipline: a repeat call on the SAME corpus keeps the cache —
# the staging table is exactly the artifact a production pipeline persists
# once and reuses — while a call on a different corpus evicts its
# predecessor, so at most one cached table exists per operator.
# unpersist_lsh_cache() releases everything.
_SIG_CACHE: dict[str, tuple[str, DataFrame]] = {}

# Round-12 staging visibility (VERDICT r11 task #2): every staged build is
# timed — build() + persist + EAGER materialization (a noop-sink write, so
# the cache is populated here rather than lazily inside whichever consumer
# runs first) — and recorded per (op, sf_dir).  bench.py publishes the map
# as BENCH_FULL.json's `staged_build_sec`, so warm-headline wins can be
# split into structure vs cache placement.  CURRENT_CONSUMER (set by the
# bench around each query) records which queries touch which staged
# artifacts; the bench's staging-inclusive pass re-runs exactly those.
STAGE_BUILD_SEC: dict[str, dict] = {}
STAGE_CONSUMERS: dict[str, set] = {}
CURRENT_CONSUMER: list[str] = []  # [name] while a bench query is running


def _stage_cached(op: str, sf_dir: str, build) -> DataFrame:
    if CURRENT_CONSUMER:
        STAGE_CONSUMERS.setdefault(CURRENT_CONSUMER[0], set()).add(op)
    hit = _SIG_CACHE.get(op)
    if hit is not None and hit[0] == sf_dir:
        return hit[1]
    if hit is not None:
        hit[1].unpersist()
    import time as _time

    t0 = _time.perf_counter()
    df = build().persist()
    df.write.format("noop").mode("overwrite").save()  # materialize NOW
    STAGE_BUILD_SEC[op] = {
        "sf_dir": sf_dir,
        "sec": round(_time.perf_counter() - t0, 3),
    }
    _SIG_CACHE[op] = (sf_dir, df)
    return df


def unpersist_lsh_cache() -> None:
    while _SIG_CACHE:
        _SIG_CACHE.popitem()[1][1].unpersist()


def t02_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Persist the signature table (shingles + minhash sig): it feeds four
    # consumers — both sides of the band self-join and both sides of the
    # verify join — and shingling+minhash is the dominant CPU cost; without
    # persist Spark recomputes it per consumer. At cluster scale this is
    # the standard LSH staging table (disk-backed).
    # Band join carries only (doc_id, band_id, band_key) — never the shingle
    # arrays (carrying them through a 4-band explode would 4× the shuffled
    # bytes). Shingle sets are re-joined once per verified pair.
    sig = _stage_cached(
        "t02",
        sf_dir,
        lambda: _with_shingles(
            table(spark, sf_dir, "documents").select("doc_id", "text"), spark
        ).withColumn("sig", H.minhash_signature("shingles")),
    )
    # round 12 (guide §3.1): candidates are pruned on the threshold-implied
    # size ratio BEFORE the shingle re-join — lossless for the published
    # threshold (see size_ratio_ok), so the oracle below is untouched.
    cand = _banded_candidates(sf_dir, sig, threshold_ppm=JACCARD_PPM)
    sh = sig.select("doc_id", "shingles")  # reads the persisted table
    pairs = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b")
    )
    # exact integer micros (round-8 conversion, AUDIT_ROUND_DOUBLES.md):
    # intersection/union sizes are exact ints, so jaccard publishes as
    # (inter * 1e6 DIV union) / 1e6 — no float ROUND (the t09 class); the
    # threshold compares the same truncated value on both engines.
    # round 12 (guide §1.2): |A∪B| = |A| + |B| − |A∩B| for distinct
    # arrays, so the per-pair array_union materialization is replaced by
    # integer arithmetic over sizes — same exact value, half the per-pair
    # array work.
    jac_micros = F.expr(
        "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 1000000"
        " div (size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
    )
    return (
        pairs.withColumn("jaccard", jac_micros / F.lit(1e6))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _oracle_t02() -> str:
    return f"""
WITH sh AS ({SQL_SHINGLES}),
sig AS (
  SELECT doc_id, shingles, {H.sql_minhash_signature('shingles')} AS sig FROM sh
),
{_sql_banded_candidates()}
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) * 1000000
         // len(list_distinct(list_concat(sa.shingles, sb.shingles)))
         / 1e6 AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) * 1000000
        // len(list_distinct(list_concat(sa.shingles, sb.shingles)))
        / 1e6
      >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# t31 — MinHash estimator accuracy: for every LSH candidate pair, compare
# the MinHash Jaccard ESTIMATE (fraction of agreeing signature positions —
# the Broder '97 unbiased estimator the whole LSH design rests on) with
# the TRUE shingle Jaccard. The v10-for-text evaluation: it prices the
# N_PERM accuracy/cost knob in-engine, so tuning the signature width is a
# query, not a guess. Reuses t02's persisted signature staging table; the
# only added work per candidate pair is a 16-element positional compare.
# ---------------------------------------------------------------------------
def t31_minhash_estimate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _stage_cached(
        "t02",
        sf_dir,
        lambda: _with_shingles(
            table(spark, sf_dir, "documents").select("doc_id", "text"), spark
        ).withColumn("sig", H.minhash_signature("shingles")),
    )
    cand = _banded_candidates(sf_dir, sig)  # bucket-capped, shared with t02
    side = lambda suffix: sig.select(
        F.col("doc_id").alias(f"doc_{suffix}"),
        F.col("shingles").alias(f"sh_{suffix}"),
        F.col("sig").alias(f"sig_{suffix}"),
    )
    pairs = cand.join(side("a"), "doc_a").join(side("b"), "doc_b")
    matches = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    # exact integer micros throughout (round-8 conversion): both jaccards
    # are int/int ratios, so the estimate, truth, and their absolute error
    # are computed on BIGINT micros and published /1e6 — no float ROUND.
    # round 12 (guide §1.2): union size via |A|+|B|−|A∩B| — exact, no
    # array_union materialization per pair (t02's identity; NO candidate
    # prune here — t31 publishes every candidate pair).
    true_k = F.expr(
        "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 1000000"
        " div (size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
    )
    assert 1_000_000 % H.N_PERM == 0  # est micros are exact integers
    est_k = matches.cast("long") * F.lit(1_000_000 // H.N_PERM)
    return pairs.select(
        "doc_a",
        "doc_b",
        matches.cast("long").alias("sig_matches"),
        (est_k / F.lit(1e6)).alias("est_jaccard"),
        (true_k / F.lit(1e6)).alias("true_jaccard"),
        (F.abs(est_k - true_k) / F.lit(1e6)).alias("abs_err"),
    )


def _oracle_t31() -> str:
    matches = (
        "list_sum(list_transform(range(1, "
        f"{H.N_PERM} + 1), i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"
    )
    true_k = (
        "(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)"
        " * 1000000"
        " // len(list_distinct(list_concat(sa.shingles, sb.shingles))))"
    )
    est_k = f"(CAST({matches} AS BIGINT) * {1_000_000 // H.N_PERM})"
    return f"""
WITH sh AS ({SQL_SHINGLES}),
sig AS (
  SELECT doc_id, shingles, {H.sql_minhash_signature('shingles')} AS sig FROM sh
),
{_sql_banded_candidates()}
SELECT c.doc_a, c.doc_b,
       CAST({matches} AS BIGINT) AS sig_matches,
       {est_k} / 1e6 AS est_jaccard,
       {true_k} / 1e6 AS true_jaccard,
       ABS({est_k} - {true_k}) / 1e6 AS abs_err
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
"""


# ---------------------------------------------------------------------------
# t38 — shingle containment for LSH candidate pairs: |A∩B|/|A| and
# |A∩B|/|B| (Broder's containment, the asymmetric twin of Jaccard).
# Jaccard misses the quote/subset case — a short document wholly embedded
# in a long one scores low Jaccard but containment ≈ 1 — which is exactly
# the near-dup class quote-heavy web corpora are full of. Same staged
# signature table and band-join candidate generation as t02/t31; the only
# added work per candidate pair is two divisions.
# ---------------------------------------------------------------------------
def t38_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _stage_cached(
        "t02",
        sf_dir,
        lambda: _with_shingles(
            table(spark, sf_dir, "documents").select("doc_id", "text"), spark
        ).withColumn("sig", H.minhash_signature("shingles")),
    )
    # Any single-band collision is a candidate — the classic b=4/r=4 LSH
    # form, via the SAME bucket-capped staged band table as t02/t31
    # (round-11 scale probe: the uncapped copy of this join is exactly
    # the shape that ran t02 53x at 10x data, and at every driver SF the
    # max bucket is 5, so the cap never bites the tested outputs).
    # Deliberately NO band-agreement prefilter here: t38 exists to
    # surface the low-Jaccard / high-containment (quote/subset) pairs,
    # and with r=4 bands a pair at J ~= 0.2 agrees in >= 2 of the 4
    # bands with probability ~ C(4,2)*J^8 ~= 1.5e-5 — a prefilter
    # structurally kills exactly the pairs this operator is for. The
    # capped + prefiltered variant is t65 (r=1 banding, oracle updated
    # in lockstep).
    cand = _banded_candidates(sf_dir, sig)
    sh = sig.select("doc_id", "shingles")
    pairs = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
    )
    shared = F.size(F.array_intersect("sh_a", "sh_b"))
    # exact integer micros (round-8 conversion): containments are int/int
    # ratios — publish (shared * 1e6 DIV size) / 1e6, no float ROUND.
    return pairs.select(
        "doc_a",
        "doc_b",
        shared.cast("long").alias("n_shared"),
        (
            F.expr(
                "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 1000000"
                " div size(sh_a)"
            )
            / F.lit(1e6)
        ).alias("containment_a_in_b"),
        (
            F.expr(
                "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 1000000"
                " div size(sh_b)"
            )
            / F.lit(1e6)
        ).alias("containment_b_in_a"),
    )


def _oracle_t38() -> str:
    shared = "len(list_intersect(sa.shingles, sb.shingles))"
    return f"""
WITH sh AS ({SQL_SHINGLES}),
sig AS (
  SELECT doc_id, shingles, {H.sql_minhash_signature('shingles')} AS sig FROM sh
),
{_sql_banded_candidates()}
SELECT c.doc_a, c.doc_b,
       CAST({shared} AS BIGINT) AS n_shared,
       CAST({shared} AS BIGINT) * 1000000 // len(sa.shingles) / 1e6
         AS containment_a_in_b,
       CAST({shared} AS BIGINT) * 1000000 // len(sb.shingles) / 1e6
         AS containment_b_in_a
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
"""


# ---------------------------------------------------------------------------
# t41 — normalize-then-dedup: exact dedup AFTER casefolding, punctuation
# stripping, and whitespace collapse — the cheap tier between byte-exact
# (t01/t05) and near-dup (t02/t03) that catches trivially-reformatted
# copies (case changes, punctuation edits, double spaces). Synthetic
# variants re-enter every 60th doc (ids +50000) as UPPERCASED text with
# doubled spaces, so normalization provably matters: t05 would MISS these
# (different bytes), t41 must catch every one. Same sha2-keyed single
# shuffle as t05 — normalization is a per-row codegen expression chain.
# ---------------------------------------------------------------------------
def _normalized(col: "F.Column") -> "F.Column":
    no_punct = F.regexp_replace(F.lower(col), "[.,;:!?'\"()\\[\\]{}-]", "")
    return F.trim(F.regexp_replace(no_punct, " +", " "))


def t41_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") % 60 == 0).select(
        (F.col("doc_id") + 50000).alias("doc_id"),
        F.regexp_replace(F.upper("text"), " ", "  ").alias("text"),
    )
    keyed = (
        docs.unionByName(variants)
        .withColumn("digest", F.sha2(_normalized(F.col("text")), 256))
    )
    return (
        keyed.groupBy("digest")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select("kept_doc_id", F.col("n_copies").cast("long").alias("n_copies"))
    )


_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), "
    "'[.,;:!?''\"()\\[\\]{{}}-]', '', 'g'), ' +', ' ', 'g'))"
)

ORACLE_T41 = f"""
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 50000 AS doc_id, replace(upper(text), ' ', '  ') AS text
  FROM documents WHERE doc_id % 60 = 0
),
keyed AS (
  SELECT doc_id, sha256({_SQL_NORM.format(c='text')}) AS digest FROM unioned
)
SELECT MIN(doc_id) AS kept_doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM keyed GROUP BY digest HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# t03 — SimHash document signatures.
# ---------------------------------------------------------------------------
def t03_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_shingles(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return docs.select("doc_id", H.simhash("shingles").alias("simhash"))


def _oracle_t03() -> str:
    return f"""
WITH sh AS ({SQL_SHINGLES})
SELECT doc_id, {H.sql_simhash('shingles')} AS simhash FROM sh
"""


# ---------------------------------------------------------------------------
# t06 — SimHash near-dedup, banded: the scale form of SimHash (t03 computes
# the fingerprints; this finds the near-dup PAIRS). A 60-bit fingerprint
# splits into 4 bands of 15 bits; candidates equi-join on (band_id,
# band_val); verification keeps hamming(xor) <= HAMMING_MAX. Because
# HAMMING_MAX (3) < N bands (4), the pigeonhole principle guarantees every
# qualifying pair collides in at least one band — the banded plan is
# EXACT, not approximate, so the oracle's direct all-pairs filter computes
# the identical result. Band width drives scale: 15-bit bands give 32768
# buckets per band, so expected candidates grow ~n²/32768 per band —
# the wider the fingerprint, the flatter the curve (an 8-bit band would be
# n²/256, quasi-quadratic). All-pairs is only ever run by the sf0.01
# oracle.
# The test corpus has no near-dups, so we synthesize exact copies (every
# 50th doc, ids +10000 → hamming 0) and lightly perturbed copies (every
# 70th doc with 3 appended chars, ids +20000 → small nonzero hamming).
# ---------------------------------------------------------------------------
HAMMING_MAX = 3
SIMHASH_BANDS = 4
T06_SIMHASH_BITS = 60
SIMHASH_BAND_BITS = T06_SIMHASH_BITS // SIMHASH_BANDS  # 15


def t06_dedup_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    exact_copies = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near_copies = docs.filter(F.col("doc_id") % 70 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    unioned = docs.unionByName(exact_copies).unionByName(near_copies)
    # The fingerprint table feeds three consumers (band explode + both
    # sides of the verify join): persist it so the 60-aggregate simhash
    # computes once, with the same keyed eviction discipline as t02.
    sims = _stage_cached(
        "t06",
        sf_dir,
        lambda: _with_shingles(unioned, spark).select(
            "doc_id", H.simhash("shingles", T06_SIMHASH_BITS).alias("sim")
        ),
    )
    band_vals = F.array(
        *[
            F.shiftright(F.col("sim"), b * SIMHASH_BAND_BITS).bitwiseAND(
                F.lit((1 << SIMHASH_BAND_BITS) - 1)
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    bands = sims.select("doc_id", F.posexplode(band_vals).alias("band_id", "band_val"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sims.select(F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"))
    sb = sims.select(F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


def _oracle_t06() -> str:
    # All-pairs filter — identical result to the banded plan because
    # HAMMING_MAX < SIMHASH_BANDS (see t06 comment).
    return f"""
WITH unioned AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 20000 AS doc_id, text || ' zq' AS text
  FROM documents WHERE doc_id % 70 = 0
),
sh AS (
  SELECT doc_id, list_distinct({H.sql_shingle_hashes('codes', 'text')}) AS shingles
  FROM (SELECT doc_id, text, {H.sql_char_codes('text')} AS codes
        FROM unioned WHERE length(text) >= {H.K})
),
sims AS (SELECT doc_id, {H.sql_simhash('shingles', T06_SIMHASH_BITS)} AS sim FROM sh)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= {HAMMING_MAX}
"""


# ---------------------------------------------------------------------------
# t04 — brute-force n-gram Jaccard pairs (verifier / baseline).
# All-pairs is O(n²): correct at test scale, replaced by t02's LSH plan at
# 100 TB. Kept as a first-class query because it is the ground truth the
# LSH path approximates.
# ---------------------------------------------------------------------------
def t04_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_shingles(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    docs = guard_all_pairs(docs, "t04_ngram_jaccard_pairs", "t02_dedup_minhash_lsh / t06_dedup_simhash_banded")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    # exact integer micros — same publication as t02 (its LSH twin), so
    # the ground-truth/LSH comparison stays value-compatible.
    jac_micros = F.expr(
        "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 1000000"
        " div size(array_union(sh_a, sh_b))"
    )
    return (
        pairs.withColumn("jaccard", jac_micros / F.lit(1e6))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _oracle_t04() -> str:
    return f"""
WITH sh AS ({SQL_SHINGLES})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) * 1000000
         // len(list_distinct(list_concat(a.shingles, b.shingles)))
         / 1e6 AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) * 1000000
        // len(list_distinct(list_concat(a.shingles, b.shingles)))
        / 1e6
      >= {JACCARD_THRESHOLD}
"""


QUERIES = {
    "t01_dedup_exact": t01_dedup_exact,
    "t02_dedup_minhash_lsh": t02_dedup_minhash_lsh,
    "t03_simhash": t03_simhash,
    "t04_ngram_jaccard_pairs": t04_ngram_jaccard_pairs,
    "t05_dedup_exact_sha2": t05_dedup_exact_sha2,
    "t06_dedup_simhash_banded": t06_dedup_simhash_banded,
    "t31_minhash_estimate_eval": t31_minhash_estimate_eval,
    "t38_shingle_containment": t38_shingle_containment,
    "t41_dedup_normalized": t41_dedup_normalized,
}

ORACLES = {
    "t01_dedup_exact": ORACLE_T01,
    "t02_dedup_minhash_lsh": _oracle_t02(),
    "t03_simhash": _oracle_t03(),
    "t04_ngram_jaccard_pairs": _oracle_t04(),
    "t05_dedup_exact_sha2": ORACLE_T05,
    "t06_dedup_simhash_banded": _oracle_t06(),
    "t31_minhash_estimate_eval": _oracle_t31(),
    "t38_shingle_containment": _oracle_t38(),
    "t41_dedup_normalized": ORACLE_T41,
}


# ---------------------------------------------------------------------------
# t49 — LSH band/row tuning sweep: candidate-pair counts for three
# groupings of the same 16-perm MinHash signature — (2 bands × 8 rows),
# (4 × 4, t02's production setting), (8 × 2) — each with its S-curve
# midpoint s50 = (1/b)^(1/r), the Jaccard level at which detection
# probability crosses 50%. More bands/shorter rows → lower threshold →
# more candidates; the sweep prices that recall/verify-cost tradeoff
# before fixing b×r (the LSH analog of x12's lgK and v16's n_probe
# sweeps).
#
# Scale: all three configs ride the ONE staged signature table; each
# config's candidate generation is the same band equi-join as t02
# (keys only, linear in corpus). s50 is injected as the SAME Python
# float literal into both engines — no pow() drift.
#
# Hot-bucket suppression (round-11 scale probe, SCALING.md): the sweep
# was 7.55x at 10x data off uncapped buckets — the WEAKLY-discriminative
# (8 bands × 2 rows) config collides boilerplate docs by the thousands
# (its whole point is a low s50 threshold). Buckets above T49_BUCKET_CAP
# are dropped per config in BOTH engines; the cap is 256, not t02's 64,
# because the b=8/r=2 config legitimately reaches 159-doc buckets at
# sf0.1 — the cap must never bite a driver-SF output (max measured
# buckets per SF: 21/21/159), only the 100-TB blowup above them.
# The capped three-config band table is ONE staged artifact (the t02
# staging discipline), so suppression is paid once per corpus.
# ---------------------------------------------------------------------------
T49_CONFIGS = ((2, 8), (4, 4), (8, 2))
T49_BUCKET_CAP = 256


def t49_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _stage_cached(
        "t02",
        sf_dir,
        lambda: _with_shingles(
            table(spark, sf_dir, "documents").select("doc_id", "text"), spark
        ).withColumn("sig", H.minhash_signature("shingles")),
    )

    def build() -> DataFrame:
        parts = []
        for b, r in T49_CONFIGS:
            keys = [
                F.concat_ws(
                    "-",
                    *[
                        F.element_at(F.col("sig"), band * r + j + 1).cast("string")
                        for j in range(r)
                    ],
                )
                for band in range(b)
            ]
            parts.append(
                sig.select(
                    F.lit(b).alias("cfg_b"),
                    "doc_id",
                    F.posexplode(F.array(*keys)).alias("band_id", "band_key"),
                )
            )
        allb = parts[0]
        for p in parts[1:]:
            allb = allb.unionByName(p)
        # per-config buckets: cfg_b joins the suppression keys
        return suppress_hot_buckets(
            allb, ["cfg_b", "band_id", "band_key"], T49_BUCKET_CAP
        )

    bands_all = _stage_cached("t49_bands", sf_dir, build)
    parts = []
    for b, r in T49_CONFIGS:
        bands = bands_all.filter(F.col("cfg_b") == b).drop("cfg_b")
        pairs = (
            bands.alias("x")
            .join(bands.alias("y"), ["band_id", "band_key"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
            )
            .distinct()
        )
        s50 = round((1.0 / b) ** (1.0 / r), 4)
        parts.append(
            pairs.agg(
                F.lit(b).alias("n_bands"),
                F.lit(r).alias("rows_per_band"),
                F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
                F.lit(s50).alias("s50_threshold"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _oracle_t49() -> str:
    blocks = []
    for b, r in T49_CONFIGS:
        band_selects = " UNION ALL ".join(
            "SELECT doc_id, {band} AS band_id, {key} AS band_key FROM sig".format(
                band=band,
                key=" || '-' || ".join(
                    f"CAST(sig[{band * r + j + 1}] AS VARCHAR)" for j in range(r)
                ),
            )
            for band in range(b)
        )
        capped = sql_capped_bands(
            band_selects, "band_id, band_key",
            "doc_id, band_id, band_key", T49_BUCKET_CAP,
        )
        s50 = round((1.0 / b) ** (1.0 / r), 4)
        blocks.append(
            f"""
SELECT {b} AS n_bands, {r} AS rows_per_band,
       CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
       {s50} AS s50_threshold
FROM (
  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
  FROM ({capped}) x JOIN ({capped}) y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
)"""
        )
    body = "\nUNION ALL\n".join(blocks)
    return f"""
WITH sh AS ({SQL_SHINGLES}),
sig AS (SELECT doc_id, {H.sql_minhash_signature('shingles')} AS sig FROM sh)
{body}
"""


QUERIES["t49_lsh_band_sweep"] = t49_lsh_band_sweep
ORACLES["t49_lsh_band_sweep"] = _oracle_t49()


# ---------------------------------------------------------------------------
# t50 — fuzzy record linkage via multi-pass blocking + edit-distance
# verify: the entity-resolution primitive (Fellegi-Sunter / dedupe-style
# pipelines) a training-data ingest needs when near-identical titles/
# names differ by a typo rather than whole shingles. Candidates come from
# TWO blocking passes — (length, 8-char prefix) and (length, 8-char
# suffix) — so one corruption anywhere except both ends is caught;
# candidates are verified with exact Levenshtein and kept at distance
# 1..T50_MAX_DIST (distance 0 is t01/t05's exact-dedup job). Synthetic
# near-dups re-enter every 25th doc (ids +40000) with character 15
# replaced, so every variant shares both block keys with its original.
#
# Scale: blocking is the LSH-band discipline — two equi-joins on compact
# fixed-width keys, never all-pairs; the per-key fan-out is bounded by
# block size, the pair set is DISTINCT'd before the Levenshtein so the
# O(len²) verify runs once per candidate pair, map-side.
# Reference: the dedup surface (SURVEY §2) — the reference has no fuzzy
# linkage; this is the LLM-pipeline extension family.
# ---------------------------------------------------------------------------
T50_MAX_DIST = 2
T50_TITLE_LEN = 30
T50_BLOCK = 8


def t50_fuzzy_blocking_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, T50_TITLE_LEN).alias("title")
    )
    variants = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 40_000).alias("doc_id"),
        F.concat(
            F.substring("title", 1, 14), F.lit("#"), F.substring("title", 16, T50_TITLE_LEN)
        ).alias("title"),
    )
    entities = fan_out(docs.unionByName(variants), spark)

    def keyed(tag: str, key_expr) -> DataFrame:
        return entities.select(
            "doc_id",
            "title",
            F.concat_ws(
                "|", F.lit(tag), F.length("title").cast("string"), key_expr
            ).alias("bkey"),
        )

    blocks = keyed("p", F.substring("title", 1, T50_BLOCK)).unionByName(
        keyed("s", F.substring("title", -T50_BLOCK, T50_BLOCK))
    )
    a = blocks.select(
        F.col("doc_id").alias("id_a"), F.col("title").alias("t_a"), "bkey"
    )
    b = blocks.select(
        F.col("doc_id").alias("id_b"), F.col("title").alias("t_b"), "bkey"
    )
    pairs = (
        a.join(b, "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "t_a", "t_b")
        .distinct()
    )
    return (
        pairs.withColumn("edit_distance", F.levenshtein("t_a", "t_b"))
        .filter(
            (F.col("edit_distance") >= 1) & (F.col("edit_distance") <= T50_MAX_DIST)
        )
        .select(
            "id_a",
            "id_b",
            F.col("edit_distance").cast("long").alias("edit_distance"),
        )
    )


ORACLE_T50 = f"""
WITH docs AS (
  SELECT doc_id, substr(text, 1, {T50_TITLE_LEN}) AS title FROM documents
),
entities AS (
  SELECT doc_id, title FROM docs
  UNION ALL
  SELECT doc_id + 40000 AS doc_id,
         substr(title, 1, 14) || '#' || substr(title, 16, {T50_TITLE_LEN}) AS title
  FROM docs WHERE doc_id % 25 = 0
),
blocks AS (
  SELECT doc_id, title,
         'p' || '|' || CAST(length(title) AS VARCHAR) || '|'
             || substr(title, 1, {T50_BLOCK}) AS bkey
  FROM entities
  UNION ALL
  SELECT doc_id, title,
         's' || '|' || CAST(length(title) AS VARCHAR) || '|'
             || substr(title, -{T50_BLOCK}, {T50_BLOCK}) AS bkey
  FROM entities
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.title AS t_a, b.title AS t_b
  FROM blocks a JOIN blocks b
    ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(levenshtein(t_a, t_b) AS BIGINT) AS edit_distance
FROM pairs
WHERE levenshtein(t_a, t_b) BETWEEN 1 AND {T50_MAX_DIST}
"""


QUERIES["t50_fuzzy_blocking_match"] = t50_fuzzy_blocking_match
ORACLES["t50_fuzzy_blocking_match"] = ORACLE_T50


# ---------------------------------------------------------------------------
# t52 — FUZZY decontamination: flag training documents that NEAR-match an
# eval/benchmark document (t20/t21 catch only exact n-gram overlap; the
# leakage that actually survives pipelines is lightly-edited copies).
# The eval set re-enters every 50th doc (ids +60000) with its last two
# words dropped — a high-but-below-1 Jaccard variant — and a train doc is
# contaminated when LSH banding pairs it with an eval doc AND the true
# shingle Jaccard clears T52_THRESHOLD.
#
# Scale: the t02 LSH discipline end-to-end — signatures staged once per
# corpus, band keys equi-join train×eval (never all-pairs; the eval side
# is benchmark-sized, so its band table is small), exact Jaccard verify
# only on candidates.
# ---------------------------------------------------------------------------
T52_THRESHOLD = 0.5
T52_PPM = 500_000  # integer twin (see JACCARD_PPM); 500000/1e6 == 0.5 exactly
assert T52_PPM / 1e6 == T52_THRESHOLD
T52_ID_OFFSET = 60_000


def t52_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    evals = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + T52_ID_OFFSET).alias("doc_id"),
        F.array_join(
            F.slice(words, 1, F.greatest(F.size(words) - 2, F.lit(1))), " "
        ).alias("text"),
    )
    sig = _stage_cached(
        "t52",
        sf_dir,
        lambda: _with_shingles(docs.unionByName(evals), spark).withColumn(
            "sig", H.minhash_signature("shingles")
        ),
    )
    # Bucket-capped band table, staged per corpus (round-11 scale probe:
    # uncapped, t52 ran 6.06x at 10x data off hot train-side buckets —
    # every eval probe of a hot bucket fans out by the full bucket).
    # The cap is computed over the COMBINED train+eval band rows (the
    # one band table both sides split from), max bucket 5 at every
    # driver SF, so tested outputs are bit-identical.
    def build_bands() -> DataFrame:
        bands_all = sig.select(
            "doc_id",
            F.size("shingles").alias("n_sh"),
            F.posexplode(H.band_keys("sig")).alias("band_id", "band_key"),
        )
        return suppress_hot_buckets(
            bands_all, ["band_id", "band_key"], T02_BUCKET_CAP
        )

    bands = _stage_cached("t52_bands", sf_dir, build_bands)
    train_b = bands.filter(F.col("doc_id") < T52_ID_OFFSET).select(
        F.col("doc_id").alias("train_id"), F.col("n_sh").alias("n_t"),
        "band_id", "band_key",
    )
    eval_b = bands.filter(F.col("doc_id") >= T52_ID_OFFSET).select(
        F.col("doc_id").alias("eval_id"), F.col("n_sh").alias("n_e"),
        "band_id", "band_key",
    )
    # round 12 (guide §3.1): J >= 0.5 forces min/max set-size ratio >= 0.5
    # — prune candidates on sizes BEFORE the distinct and the shingle
    # re-join (lossless for the published threshold; see size_ratio_ok).
    cand = (
        train_b.join(eval_b, ["band_id", "band_key"])
        .filter(size_ratio_ok(F.col("n_t"), F.col("n_e"), T52_PPM))
        .select("train_id", "eval_id")
        .distinct()
    )
    sh = sig.select("doc_id", "shingles")
    pairs = cand.join(
        sh.select(F.col("doc_id").alias("train_id"), F.col("shingles").alias("sh_t")),
        "train_id",
    ).join(
        sh.select(F.col("doc_id").alias("eval_id"), F.col("shingles").alias("sh_e")),
        "eval_id",
    )
    # exact integer micros (round-8 conversion) — see t02; union size via
    # |A|+|B|−|A∩B| (round 12, guide §1.2 — no array_union per pair)
    jac_micros = F.expr(
        "CAST(size(array_intersect(sh_t, sh_e)) AS BIGINT) * 1000000"
        " div (size(sh_t) + size(sh_e) - size(array_intersect(sh_t, sh_e)))"
    )
    return (
        pairs.withColumn("jaccard", jac_micros / F.lit(1e6))
        .filter(F.col("jaccard") >= T52_THRESHOLD)
        .select("train_id", "eval_id", "jaccard")
    )


def _oracle_t52() -> str:
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_id, {H.sql_band_key('sig', b)} AS band_key FROM sig"
        for b in range(H.N_BANDS)
    )
    words = "string_split(text, ' ')"
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {T52_ID_OFFSET} AS doc_id,
         array_to_string(
           ({words})[1:GREATEST(len({words}) - 2, 1)], ' ') AS text
  FROM documents WHERE doc_id % 50 = 0
),
sh AS (
  SELECT doc_id,
         list_distinct({H.sql_shingle_hashes('codes', 'text')}) AS shingles
  FROM (SELECT doc_id, text, {H.sql_char_codes('text')} AS codes
        FROM corpus WHERE length(text) >= {H.K})
),
sig AS (SELECT doc_id, shingles, {H.sql_minhash_signature('shingles')} AS sig FROM sh),
bands_all AS (
{band_selects}
),
bands AS (
  {sql_capped_bands('SELECT * FROM bands_all', 'band_id, band_key',
                    'doc_id, band_id, band_key', T02_BUCKET_CAP)}
),
cand AS (
  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
  FROM bands t JOIN bands e
    ON t.band_id = e.band_id AND t.band_key = e.band_key
   AND t.doc_id < {T52_ID_OFFSET} AND e.doc_id >= {T52_ID_OFFSET}
)
SELECT c.train_id, c.eval_id,
       CAST(len(list_intersect(st.shingles, se.shingles)) AS BIGINT) * 1000000
         // len(list_distinct(list_concat(st.shingles, se.shingles)))
         / 1e6 AS jaccard
FROM cand c
JOIN sh st ON st.doc_id = c.train_id
JOIN sh se ON se.doc_id = c.eval_id
WHERE CAST(len(list_intersect(st.shingles, se.shingles)) AS BIGINT) * 1000000
        // len(list_distinct(list_concat(st.shingles, se.shingles)))
        / 1e6
      >= {T52_THRESHOLD}
"""


QUERIES["t52_fuzzy_decontamination"] = t52_fuzzy_decontamination
ORACLES["t52_fuzzy_decontamination"] = _oracle_t52()


# ---------------------------------------------------------------------------
# t54 — INCREMENTAL dedup: classify an incoming batch against the staged
# digest index of the existing corpus — at 100 TB you never re-dedup the
# corpus when a 1-TB delta arrives; you probe the delta against the
# standing index (v27's incremental-maintenance idea on the text side).
# The synthetic batch re-enters every 30th doc (a dup-of-existing),
# every 45th doc reversed-word-order (novel text, same vocabulary), and
# every 90th doc reversed AGAIN under a third id (novel text repeated
# INSIDE the batch), ids offset. Classes: `dup_of_existing` (digest in
# the index),
# `dup_within_batch` (digest new but repeated in the batch — keeper =
# min id), `novel`. kept = novel or within-batch keeper.
#
# Scale: the standing index is (digest → min doc_id) — 32-byte keys,
# staged once per corpus; the batch probes it with ONE equi-join (left),
# and the within-batch window partitions by digest. The existing corpus
# is scanned only when the index is (re)built, never per batch.
# ---------------------------------------------------------------------------
T54_ID_OFFSET = 80_000


def t54_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    index = _stage_cached(
        "t54_index",
        sf_dir,
        lambda: docs.select(
            F.sha2("text", 256).alias("digest"), "doc_id"
        )
        .groupBy("digest")
        .agg(F.min("doc_id").alias("existing_id")),
    )
    words = F.split("text", " ")
    batch = (
        docs.filter(F.col("doc_id") % 30 == 0)
        .select((F.col("doc_id") + T54_ID_OFFSET).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 45 == 0).select(
                (F.col("doc_id") + 2 * T54_ID_OFFSET).alias("doc_id"),
                F.array_join(F.reverse(words), " ").alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 90 == 0).select(
                (F.col("doc_id") + 3 * T54_ID_OFFSET).alias("doc_id"),
                F.array_join(F.reverse(words), " ").alias("text"),
            )
        )
        .withColumn("digest", F.sha2("text", 256))
    )
    # Hint-free: the digest index grows with the corpus (billions of rows
    # at 100 TB), so a static broadcast hint would be job-fatal past the
    # 8 GB cap. Digest keys are sha2-uniform — a plain shuffle equi-join
    # has no skew, and AQE broadcasts at runtime when the index genuinely
    # fits. (SCALING.md bounded-broadcast rule; guarded by
    # tests/test_plan_shapes2.py::test_no_unbounded_broadcast_hints.)
    probed = batch.join(index, "digest", "left")
    w = Window.partitionBy("digest").orderBy(F.col("doc_id").asc())
    classified = probed.withColumn("rn", F.row_number().over(w)).select(
        "doc_id",
        F.when(F.col("existing_id").isNotNull(), "dup_of_existing")
        .when(F.col("rn") > 1, "dup_within_batch")
        .otherwise("novel")
        .alias("status"),
        F.coalesce("existing_id", F.lit(-1)).cast("long").alias("existing_id"),
    )
    return classified.withColumn(
        "kept", F.col("status") == "novel"
    )


ORACLE_T54 = f"""
WITH docs AS (SELECT doc_id, text FROM documents),
index_ AS (
  SELECT sha256(text) AS digest, MIN(doc_id) AS existing_id
  FROM docs GROUP BY sha256(text)
),
batch AS (
  SELECT doc_id + {T54_ID_OFFSET} AS doc_id, text
  FROM docs WHERE doc_id % 30 = 0
  UNION ALL
  SELECT doc_id + {2 * T54_ID_OFFSET} AS doc_id,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
  FROM docs WHERE doc_id % 45 = 0
  UNION ALL
  SELECT doc_id + {3 * T54_ID_OFFSET} AS doc_id,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
  FROM docs WHERE doc_id % 90 = 0
),
probed AS (
  SELECT b.doc_id, sha256(b.text) AS digest, i.existing_id
  FROM batch b LEFT JOIN index_ i ON sha256(b.text) = i.digest
),
classified AS (
  SELECT doc_id,
         CASE WHEN existing_id IS NOT NULL THEN 'dup_of_existing'
              WHEN ROW_NUMBER() OVER (PARTITION BY digest
                                      ORDER BY doc_id ASC) > 1
                   THEN 'dup_within_batch'
              ELSE 'novel' END AS status,
         CAST(COALESCE(existing_id, -1) AS BIGINT) AS existing_id
  FROM probed
)
SELECT doc_id, status, existing_id, status = 'novel' AS kept
FROM classified
"""


QUERIES["t54_incremental_dedup"] = t54_incremental_dedup
ORACLES["t54_incremental_dedup"] = ORACLE_T54


# ---------------------------------------------------------------------------
# t55 — INCREMENTAL near-dedup: t54's delta path for NEAR-duplicates.
# The standing corpus keeps a staged MinHash band index; an incoming
# batch is shingled, signed, and probed against it with the same banded
# equi-join t02 uses — the corpus is never re-shingled per delta, and
# nothing is all-pairs. The synthetic delta re-enters every 40th doc
# with its last word dropped (a true near-dup of the original) and
# every 60th doc word-reversed (same vocabulary, different shingles —
# novel), ids offset. Each batch doc is classified `near_dup` (best
# verified Jaccard >= threshold, deterministic argmax: jaccard desc,
# then lowest existing id) or `novel`.
#
# Scale: the band index is (band_id, band_key, doc_id) — linear in the
# corpus, staged once (persisted; at cluster scale a bucketed table on
# (band_id, band_key)); the delta probes it with ONE equi-join, and the
# Jaccard verify joins shingles for CANDIDATE pairs only. This is the
# standing-index maintenance loop every production near-dedup runs.
# ---------------------------------------------------------------------------
T55_ID_OFFSET = 400_000


def t55_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sig = _stage_cached(
        "t02",  # shared with t02/t31: the corpus signature staging table
        sf_dir,
        lambda: _with_shingles(
            table(spark, sf_dir, "documents").select("doc_id", "text"), spark
        ).withColumn("sig", H.minhash_signature("shingles")),
    )
    # The standing band index IS t02's staged bucket-capped band table
    # (round-11 scale probe: with hot buckets uncapped, t55 ran 17.2x at
    # 10x data — every delta probe of a hot bucket fans out by the full
    # bucket; capped, each delta band row matches <= cap index rows, so
    # the probe is linear in the delta). Max bucket at every driver SF
    # is 5: tested outputs are bit-identical with or without the cap.
    index_bands = _capped_bands(sf_dir, sig).select(
        F.col("doc_id").alias("existing_id"), F.col("n_sh").alias("n_e"),
        "band_id", "band_key",
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    delta = (
        docs.filter(F.col("doc_id") % 40 == 0)
        .select(
            (F.col("doc_id") + T55_ID_OFFSET).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 60 == 0).select(
                (F.col("doc_id") + 2 * T55_ID_OFFSET).alias("doc_id"),
                F.array_join(F.reverse(words), " ").alias("text"),
            )
        )
        .filter(F.length("text") >= H.K)
    )
    dsig = _with_shingles(delta, spark).withColumn(
        "sig", H.minhash_signature("shingles")
    )
    dbands = dsig.select(
        "doc_id",
        F.size("shingles").alias("n_d"),
        F.posexplode(H.band_keys("sig")).alias("band_id", "band_key"),
    )
    # round 12 (guide §3.1): only pairs at jaccard >= threshold can ever
    # become a best match, and those force min/max set-size ratio >= the
    # threshold — prune delta×index probe hits on sizes BEFORE the
    # distinct and the shingle re-join (lossless; see size_ratio_ok).
    cand = (
        dbands.join(index_bands, ["band_id", "band_key"])
        .filter(size_ratio_ok(F.col("n_d"), F.col("n_e"), JACCARD_PPM))
        .select("doc_id", "existing_id")
        .distinct()
    )
    pairs = cand.join(dsig.select("doc_id", F.col("shingles").alias("sh_d")), "doc_id").join(
        sig.select(F.col("doc_id").alias("existing_id"), F.col("shingles").alias("sh_e")),
        "existing_id",
    )
    # exact integer micros (round-8 conversion) — see t02; union size via
    # |A|+|B|−|A∩B| (round 12, guide §1.2 — no array_union per pair)
    jac_micros = F.expr(
        "CAST(size(array_intersect(sh_d, sh_e)) AS BIGINT) * 1000000"
        " div (size(sh_d) + size(sh_e) - size(array_intersect(sh_d, sh_e)))"
    )
    scored = pairs.select(
        "doc_id", "existing_id", (jac_micros / F.lit(1e6)).alias("jaccard")
    ).filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("existing_id").asc()
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return delta.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("existing_id").isNotNull(), "near_dup")
        .otherwise("novel")
        .alias("status"),
        F.coalesce("existing_id", F.lit(-1)).cast("long").alias("matched_id"),
        F.coalesce("jaccard", F.lit(-1.0)).alias("jaccard"),
    )


def _oracle_t55() -> str:
    corpus_bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id AS existing_id, {b} AS band_id,"
        f" {H.sql_band_key('sig', b)} AS band_key FROM sig"
        for b in range(H.N_BANDS)
    )
    delta_bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_id, {H.sql_band_key('sig', b)} AS band_key"
        " FROM dsig"
        for b in range(H.N_BANDS)
    )
    return rf"""
WITH sh AS ({SQL_SHINGLES}),
sig AS (
  SELECT doc_id, shingles, {H.sql_minhash_signature('shingles')} AS sig FROM sh
),
bands_all AS (
{corpus_bands}
),
bands AS (
  {sql_capped_bands('SELECT * FROM bands_all', 'band_id, band_key',
                    'existing_id, band_id, band_key', T02_BUCKET_CAP)}
),
delta AS (
  SELECT doc_id + {T55_ID_OFFSET} AS doc_id,
         regexp_replace(text, '\s+\S+$', '') AS text
  FROM documents WHERE doc_id % 40 = 0
  UNION ALL
  SELECT doc_id + {2 * T55_ID_OFFSET} AS doc_id,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
  FROM documents WHERE doc_id % 60 = 0
),
dvalid AS (SELECT * FROM delta WHERE length(text) >= {H.K}),
dsh AS (
  SELECT doc_id, list_distinct({H.sql_shingle_hashes('codes', 'text')}) AS shingles
  FROM (SELECT doc_id, text, {H.sql_char_codes('text')} AS codes FROM dvalid)
),
dsig AS (
  SELECT doc_id, shingles, {H.sql_minhash_signature('shingles')} AS sig FROM dsh
),
dbands AS (
{delta_bands}
),
cand AS (
  SELECT DISTINCT d.doc_id, i.existing_id
  FROM dbands d JOIN bands i
    ON d.band_id = i.band_id AND d.band_key = i.band_key
),
scored AS (
  SELECT c.doc_id, c.existing_id,
         CAST(len(list_intersect(dd.shingles, ee.shingles)) AS BIGINT)
           * 1000000
           // len(list_distinct(list_concat(dd.shingles, ee.shingles)))
           / 1e6 AS jaccard
  FROM cand c
  JOIN dsh dd ON dd.doc_id = c.doc_id
  JOIN sh ee ON ee.doc_id = c.existing_id
),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY jaccard DESC, existing_id ASC) AS rn
  FROM scored WHERE jaccard >= {JACCARD_THRESHOLD}
)
SELECT v.doc_id,
       CASE WHEN b.existing_id IS NOT NULL THEN 'near_dup'
            ELSE 'novel' END AS status,
       CAST(COALESCE(b.existing_id, -1) AS BIGINT) AS matched_id,
       COALESCE(b.jaccard, -1.0) AS jaccard
FROM dvalid v
LEFT JOIN (SELECT doc_id, existing_id, jaccard FROM best WHERE rn = 1) b
  ON v.doc_id = b.doc_id
"""


QUERIES["t55_incremental_neardup"] = t55_incremental_neardup
ORACLES["t55_incremental_neardup"] = _oracle_t55()


# ---------------------------------------------------------------------------
# t65 — CONTAINMENT dedup: t02 finds near-duplicates by symmetric
# Jaccard, which structurally MISSES excerpt/quote relationships — a
# paragraph lifted whole into a 4x longer document has tiny Jaccard but
# containment ~1. Per LSH candidate pair, the exact asymmetric
# containments C(a,b) = |A∩B|/|A| and C(b,a) = |A∩B|/|B| over the
# 8-gram shingle sets, with a DIRECTION verdict ('a_in_b' / 'b_in_a' /
# 'mutual') — the signal that decides which side survives curation
# (keep the superset, drop the excerpt).
#
# Fixture (the t01 discipline — the corpus has no true excerpts, its
# LSH candidates are all near-identical): every 80th doc gets a planted
# QUARTER-length excerpt (id + 20000) and every (80k+40)th doc gets a
# planted 2x SUPERSET (original + an upper-cased copy whose shingles
# are disjoint), so all three directions exercise: the excerpt's
# shingles sit inside the original (b_in_a), the original sits inside
# its superset (a_in_b), and the corpus's own dup groups stay mutual.
#
# Cross-engine determinism: containments are integer ppm via BIGINT
# truncating division (set sizes are exact integers); verdicts compare
# integers.
#
# Scale: identical to t02 — banded equi-join candidates (never
# all-pairs) over a persisted signature staging table; shingle sets
# re-join ONCE per candidate; the fixture union is two cheap projected
# scans.
# ---------------------------------------------------------------------------
T65_CONTAIN_PPM = 400_000  # containment >= 0.40 flags a directional overlap
T65_BUCKET_CAP = 64  # hot-bucket suppression: drop non-discriminative bands
T65_MIN_BAND_AGREE = 2  # candidates must agree in >= 2 of 16 positions


def _t65_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    excerpts = docs.filter(F.col("doc_id") % 80 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(length(text) DIV 4 AS INT))").alias(
            "text"
        ),
    )
    supersets = docs.filter(F.col("doc_id") % 80 == 40).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" "), F.upper("text")).alias("text"),
    )
    return docs.unionByName(excerpts).unionByName(supersets)


def t65_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stage ONLY (doc_id, shingles, sig): _with_shingles also carries the
    # raw text and the pre-distinct hash array — persisting those ~2x'es
    # the staging footprint and evicts OTHER operators' staging tables
    # mid-bench (measured as neighbor-query slowdowns under the 16 GB
    # local driver; on a cluster it's wasted storage-memory all the same).
    sig = _stage_cached(
        "t65",
        sf_dir,
        lambda: _with_shingles(_t65_corpus(spark, sf_dir), spark)
        .withColumn("sig", H.minhash_signature("shingles"))
        .select("doc_id", "shingles", "sig"),
    )
    # r=1 banding (every signature position its own band): a quarter-size
    # excerpt has Jaccard ~0.2 against its source — t02's r=4 bands
    # collide with probability (1-(1-J^4)^4) ~ 1%, structurally missing
    # the very pairs this operator exists for. With r=1, b=16 the
    # collision probability at J=0.2 is 1-(1-J)^16 ~ 97%; the exact
    # containment verify prunes the extra low-J candidates.
    #
    # HOT-BUCKET SUPPRESSION (the standard production LSH guard): a
    # band bucket shared by B docs yields B(B-1)/2 candidates — on a
    # low-diversity corpus a single non-discriminative minhash can pull
    # the whole corpus into one bucket and the "banded" join silently
    # goes quadratic (measured: 17 s at sf0.1 before the cap). Buckets
    # larger than T65_BUCKET_CAP are dropped entirely — they carry no
    # signal (the hash failed to discriminate), and candidates stay
    # <= b * CAP^2 / 2 per bucket. The oracle applies the same cap.
    #
    # round-11 OPTIMIZATION (guide §2.4 — remove the accidental sort):
    # t65 pioneered the cap as a count WINDOW, which sorts every band
    # row inside the (band_id, band_key) shuffle; the rest of the family
    # since measured the aggregate + LEFT ANTI form faster at sf0.1 and
    # strictly better at scale (ships only (key, count) partials; the
    # anti-join build side is just the hot keys). The row set kept is
    # identical at ANY scale — count<=cap survivors either way — so the
    # oracle's count-window mirror is untouched. The capped table is
    # staged per corpus like t02's, so both sides of the self-join scan
    # one artifact instead of re-deriving the explode+cap twice.
    bands = _stage_cached(
        "t65_bands",
        sf_dir,
        lambda: suppress_hot_buckets(
            sig.select(
                "doc_id",
                F.posexplode(F.col("sig")).alias("band_id", "band_key"),
            ),
            ["band_id", "band_key"],
            T65_BUCKET_CAP,
        ),
    )
    # SIGNATURE-AGREEMENT PREFILTER: a pair colliding in k of the 16
    # positions has MinHash-estimated Jaccard k/16 — requiring k >= 2
    # (est J >= 0.125) keeps true containment pairs (expected agreement
    # ~ J*16 >= 3 at J ~ 0.2) while dropping the single-position noise
    # collisions that dominate the candidate set (measured: the exact
    # shingle verify was 90% of the 9 s wall before this filter).
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_agree"))
        .filter(F.col("n_agree") >= T65_MIN_BAND_AGREE)
        .select("doc_a", "doc_b")
    )
    sh = sig.select("doc_id", "shingles")
    pairs = (
        cand.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_shared"),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
    )
    scored = pairs.select(
        "doc_a",
        "doc_b",
        "n_shared",
        F.expr("n_shared * 1000000 DIV n_a").alias("contain_a_ppm"),
        F.expr("n_shared * 1000000 DIV n_b").alias("contain_b_ppm"),
    ).filter(
        (F.col("contain_a_ppm") >= T65_CONTAIN_PPM)
        | (F.col("contain_b_ppm") >= T65_CONTAIN_PPM)
    )
    return scored.select(
        "doc_a",
        "doc_b",
        "n_shared",
        "contain_a_ppm",
        "contain_b_ppm",
        F.when(
            (F.col("contain_a_ppm") >= T65_CONTAIN_PPM)
            & (F.col("contain_b_ppm") >= T65_CONTAIN_PPM),
            "mutual",
        )
        .when(F.col("contain_a_ppm") >= T65_CONTAIN_PPM, "a_in_b")
        .otherwise("b_in_a")
        .alias("direction"),
    )


def _oracle_t65() -> str:
    # r=1 bands: one select per signature position (band_key = the raw
    # minhash value, matching the Spark posexplode over `sig`)
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, shingles, {b} AS band_id,"
        f" sig[{b + 1}] AS band_key FROM sig"
        for b in range(H.N_PERM)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000 AS doc_id,
         substr(text, 1, CAST(length(text) // 4 AS INTEGER)) AS text
  FROM documents WHERE doc_id % 80 = 0
  UNION ALL
  SELECT doc_id + 20000 AS doc_id,
         text || ' ' || upper(text) AS text
  FROM documents WHERE doc_id % 80 = 40
),
sh AS (
  SELECT doc_id,
         {H.sql_shingle_hashes('codes', 'text')} AS hs,
         list_distinct({H.sql_shingle_hashes('codes', 'text')}) AS shingles
  FROM (SELECT doc_id, text, {H.sql_char_codes('text')} AS codes
        FROM corpus WHERE length(text) >= {H.K})
),
sig AS (
  SELECT doc_id, shingles, {H.sql_minhash_signature('shingles')} AS sig FROM sh
),
bands AS (
{band_selects}
),
capped AS (
  SELECT doc_id, band_id, band_key
  FROM (SELECT doc_id, band_id, band_key,
               COUNT(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
        FROM bands)
  WHERE bucket_n <= {T65_BUCKET_CAP}
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {T65_MIN_BAND_AGREE}
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
           AS n_shared,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
           * 1000000 // len(sa.shingles) AS contain_a_ppm,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
           * 1000000 // len(sb.shingles) AS contain_b_ppm
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_shared, contain_a_ppm, contain_b_ppm,
       CASE WHEN contain_a_ppm >= {T65_CONTAIN_PPM}
             AND contain_b_ppm >= {T65_CONTAIN_PPM} THEN 'mutual'
            WHEN contain_a_ppm >= {T65_CONTAIN_PPM} THEN 'a_in_b'
            ELSE 'b_in_a' END AS direction
FROM scored
WHERE contain_a_ppm >= {T65_CONTAIN_PPM} OR contain_b_ppm >= {T65_CONTAIN_PPM}
"""


QUERIES["t65_containment_dedup"] = t65_containment_dedup
ORACLES["t65_containment_dedup"] = _oracle_t65()
