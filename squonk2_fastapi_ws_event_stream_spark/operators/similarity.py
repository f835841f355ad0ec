"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Three tiers, mirroring a production ANN stack:
- v01: all-pairs near-duplicate detection (cosine ≥ threshold) — the
  embedding-space twin of dedup.t04; brute force, ground truth.
- v02: brute-force top-k for a fixed query set — the exact-search baseline.
  The query side is tiny → broadcast; the corpus streams through map-side.
  This plan IS 100-TB-correct (one pass, no shuffle on the corpus).
- v03: IVF-style cell-probed top-k — the scale path: corpus is assigned to
  centroid cells once (map-side, centroids broadcast), queries probe only
  NPROBE cells, so the scanned fraction drops to ~NPROBE/N_CELLS.
- v07: v03 with the centroids actually trained — deterministic Lloyd
  iterations (exact-decimal means), same IVF search plan on the result.

v03's centroids are a deterministic subset of vectors (every 50th) so the
cheapest oracle can replicate cell assignment exactly; v07 is the
production form and is equally oracle-checked because every Lloyd step is
itself cross-engine deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import floor_scaled, sql_floor_scaled
from ..functions.vectors import cosine, dot, norm, sql_cosine, sql_dot, sql_norm
from ..tables import fan_out, guard_all_pairs, table

COSINE_THRESHOLD = 0.40  # corpus max pairwise cosine ≈ 0.45 — yields pairs
TOP_K = 10
N_PROBE = 3
QUERY_STRIDE = 100   # query set: vec_id % 100 == 0  (5 queries at sf0.01)
CENTROID_STRIDE = 50  # base centroid stride: vec_id % 50 == 0 (10 cells at sf0.01)

# Size-adaptive centroid stride (round-11 optimization, SCALING.md
# "round-11 band-family scale probe"): with the stride FIXED at 50 the
# cell count K is N/50, so the map-side assignment/probe argmax over the
# packed centroids is O(N*K) = O(N²/50) — v33 measured 20.5x at 4x data.
# The effective stride grows as ceil(sqrt(N / IVF_BASE_N)) base strides,
# so K ≈ 1.41·sqrt(N): assignment O(N^1.5) and, for the all-corpus kNN
# probes, scoring O(n_probe·N²/K) = O(N^1.5) too — the balanced optimum
# (d/dK [2NK + 3N²/K] = 0 at K* = sqrt(1.5N) ≈ 1.22·sqrt(N)), and the
# K ~ sqrt(N) regime FAISS documents for IVF. At every driver SF
# N <= IVF_BASE_N, so the stride is exactly 50 and every output is
# bit-identical to the fixed-stride form; both engines derive the stride
# from the same COUNT with IEEE sqrt/ceil (deterministic).
IVF_BASE_N = 5000  # sf0.1's embedding count: N <= IVF_BASE_N → stride 50

# Oracle-side centroid predicate. The literal `% 50` conjunct is implied
# by the derived stride (always a multiple of 50) — it is kept so the
# engine can pre-filter before the 1-row count join and so the plan
# guard's stride-workload classification still proves the subtree
# bounded (functions/plan_guard.py).
SQL_CENTROID_COND = (
    f"vec_id % {CENTROID_STRIDE} = 0 AND vec_id % (CAST({CENTROID_STRIDE}"
    f" * CEIL(SQRT((SELECT COUNT(*) FROM embeddings) / {IVF_BASE_N}.0))"
    f" AS BIGINT)) = 0"
)


def _centroid_rows(emb: DataFrame) -> DataFrame:
    """Corpus rows at the size-adaptive centroid stride (engine twin of
    SQL_CENTROID_COND): exactly the `% 50` set at the driver SFs, every
    sqrt(N/IVF_BASE_N)-th of those above. The count is a 1-row aggregate
    broadcast (the v09 max_abs pattern); the literal `% 50` filter runs
    map-side BEFORE the join, so the derived-stride filter touches only
    N/50 rows."""
    n1 = emb.agg(F.count(F.lit(1)).alias("_ivf_n"))
    stride = (
        F.lit(CENTROID_STRIDE)
        * F.ceil(F.sqrt(F.col("_ivf_n") / F.lit(float(IVF_BASE_N))))
    ).cast("long")
    return (
        emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0)
        .crossJoin(F.broadcast(n1))
        .filter(F.col("vec_id") % stride == 0)
        .drop("_ivf_n")
    )


def _staged_stride_centroids(sf_dir: str, emb: DataFrame) -> DataFrame:
    """The stride-IVF centroid table (cell_id, c_emb), persisted once per
    corpus: a production IVF index stores its centroids alongside the
    assignment, so the derived-stride count subtree (_centroid_rows) is
    paid when the index is built, not once per consumer — at sf0.1 the
    unstaged form re-ran the 1-row COUNT job in every one of the 14
    IVF-family queries (~0.1-0.25 s each, OPTIMIZATION_r11.md)."""
    from .dedup import _stage_cached

    return _stage_cached(
        "ivf_stride_cents",
        sf_dir,
        lambda: _centroid_rows(emb).select(
            F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
        ),
    )


def v01_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    emb = guard_all_pairs(emb, "v01_neardup_cosine", "v08_srp_lsh_neardup")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cos")
    )


ORACLE_V01 = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {sql_cosine('a.embedding', 'b.embedding')} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {sql_cosine('a.embedding', 'b.embedding')} >= {COSINE_THRESHOLD}
"""


def v02_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
    )


ORACLE_V02 = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
           WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_id, e.vec_id,
         {sql_cosine('q.q_emb', 'e.embedding')} AS cos
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cos FROM ranked WHERE rank <= {TOP_K}
"""


def _packed_cells(cents: DataFrame) -> DataFrame:
    """All centroids as ONE broadcastable array row (k is small by design).

    collect_list order is nondeterministic → array_sort (struct compares by
    cell_id first) pins it, keeping argmax/slice results reproducible.
    Centroid norms are precomputed here so the per-(row, centroid) work in
    assignment is a single dot product. ``norm(c_emb)`` is the exact
    expression ``cosine`` would evaluate, so factoring it out is
    bit-identical to the oracle's inline form.
    """
    return cents.agg(
        F.array_sort(
            F.collect_list(F.struct("cell_id", "c_emb", norm(F.col("c_emb")).alias("c_norm")))
        ).alias("cells")
    )


def _cell_cos(emb_col: str, c: "F.Column") -> "F.Column":
    """cos(row, centroid) with norms factored:
    floor_scaled(dot/(row_norm*c_norm), 6) — the same IEEE ops ``cosine``
    performs (identical sub-expressions, same engine-safe publication),
    with each norm computed once instead of once per pair."""
    return floor_scaled(
        dot(F.col(emb_col), c.c_emb) / (F.col("_row_norm") * c.c_norm), 6
    )


def _with_nearest_cell(df: DataFrame, packed: DataFrame, emb_col: str) -> DataFrame:
    """Nearest-centroid assignment as a map-side argmax.

    The packed centroid row is broadcast and the argmax runs inside a single
    projection — the corpus is never shuffled. (The crossJoin+row_number
    alternative shuffles corpus×k rows into a per-vector window sort: fine
    at sf0.1, the dominant cost at 100 TB.) Ordering matches the oracle's
    ``ORDER BY cos DESC, cell_id ASC``: struct max on (cos, -cell_id).
    """
    best = F.array_max(
        F.transform(
            F.col("cells"),
            lambda c: F.struct(
                _cell_cos(emb_col, c).alias("cos"), (-c.cell_id).alias("neg_cell")
            ),
        )
    )
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn("_row_norm", norm(F.col(emb_col)))
        .withColumn("cell_id", -best.neg_cell)
        .drop("cells", "_row_norm")
    )


def _with_probe_cells(queries: DataFrame, packed: DataFrame, n_probe: int) -> DataFrame:
    """Top-n_probe nearest cells per query: sort the scored array, slice —
    same map-side shape as assignment; ascending (-cos, cell_id) struct sort
    reproduces ``cos DESC, cell_id ASC``."""
    scored = F.array_sort(
        F.transform(
            F.col("cells"),
            lambda c: F.struct(
                (-_cell_cos("q_emb", c)).alias("neg_cos"), c.cell_id.alias("cell_id")
            ),
        )
    )
    return (
        queries.crossJoin(F.broadcast(packed))
        .withColumn("_row_norm", norm(F.col("q_emb")))
        .select("query_id", "q_emb", F.explode(F.slice(scored, 1, n_probe)).alias("p"))
        .select("query_id", "q_emb", F.col("p").cell_id.alias("cell_id"))
    )


def _query_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strided query set (query_id, q_emb), ~N/QUERY_STRIDE rows, read
    UNfanned (round 12, guide §2.4): every consumer either broadcasts it
    or shuffles it by cell_id immediately, so fan_out's widening
    repartition was a wasted exchange+stage under the broadcast — at 100
    TB the query set is still corpus/100 and never the side that needs
    scan parallelism."""
    return (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )


def _stride_ivf_index(spark: SparkSession, sf_dir: str):
    """(packed centroid row, assigned corpus) for the stride-centroid IVF
    family (v03/v12/v13/v14). The assigned table persists once per corpus
    — the production reality: an IVF index is BUILT once and queried many
    times; rebuilding the cell assignment per query would re-scan the
    corpus (t02's staging-table discipline applied to the ANN index)."""
    from .dedup import _stage_cached

    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    centroids = _staged_stride_centroids(sf_dir, emb)
    # round 12 (guide §2.4): the packed 1-row centroid array is ALSO a
    # per-corpus index artifact — staging it removes the repeated
    # collect_list aggregate + its exchange from every consumer's plan
    # (~14 IVF queries × the probe and assignment sites); consumers now
    # broadcast straight from the cached row.  Identical expression,
    # identical values.
    packed = _stage_cached("ivf_packed", sf_dir, lambda: _packed_cells(centroids))
    assigned = _stage_cached(
        "ivf_stride_assign",
        sf_dir,
        lambda: _with_nearest_cell(emb, packed, "embedding").select(
            "vec_id", "embedding", "cell_id"
        ),
    )
    return emb, packed, assigned


def _ivf_topk(spark: SparkSession, sf_dir: str, n_probe: int) -> DataFrame:
    """Stride-IVF top-k with a parameterized probe count (v03's plan;
    v16 sweeps n_probe over the same staged index)."""
    # Cell assignment: map-side argmax, single pass over the corpus,
    # persisted via the shared stride-IVF index.
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    # Queries probe their n_probe nearest cells (unfanned — see _query_rows).
    queries = _query_rows(spark, sf_dir)
    probes = _with_probe_cells(queries, packed, n_probe)
    # Search only the probed cells.
    scored = (
        assigned.join(probes, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    rank_w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
    )


def v03_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir, N_PROBE)


def _oracle_v03_probe(n_probe: int) -> str:
    return f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {QUERY_STRIDE} = 0),
probes AS (
  SELECT query_id, q_emb, cell_id FROM (
    SELECT q.query_id, q.q_emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cosine('q.q_emb', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS p_rank
    FROM q CROSS JOIN c
  ) WHERE p_rank <= {n_probe}
),
scored AS (
  SELECT p.query_id, a.vec_id,
         {sql_cosine('p.q_emb', 'a.embedding')} AS cos
  FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cos FROM ranked WHERE rank <= {TOP_K}
"""


ORACLE_V03 = _oracle_v03_probe(N_PROBE)


# ---------------------------------------------------------------------------
# v07 — k-means IVF: v03 with Lloyd-iterated centroids instead of the raw
# stride subset. Each iteration is one map-side pass over the corpus
# (centroids broadcast) plus a (cell_id, dim)-keyed partial aggregate —
# the shuffle carries k×dim rows, not the corpus — so at 100 TB the loop
# costs ITERS corpus scans and nothing else. Determinism for the oracle:
# centroid components are exact decimal means rounded to 6 (the q14/v04
# recipe), so both engines iterate from bit-identical centroids; cosine
# assignment ties break on cell_id.
# ---------------------------------------------------------------------------
KMEANS_ITERS = 2
_CDEC = "decimal(28,12)"


def _lloyd_step(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd iteration: assign to nearest centroid, re-average.

    Assignment is the map-side argmax (zero corpus shuffle); the re-average
    explodes to (cell_id, dim) keys whose cardinality is k×dim, so partial
    (map-side) aggregation collapses each task's contribution to ≤ k×dim
    rows before the only shuffle.
    """
    assigned = _with_nearest_cell(emb, _packed_cells(cents), "embedding").select(
        "cell_id", "embedding"
    )
    by_dim = (
        assigned.select("cell_id", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cell_id", "dim")
        .agg(
            floor_scaled(
                F.sum(F.col("val").cast(_CDEC)).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_val")
        )
    )
    return by_dim.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "avg_val"))),
            lambda s: s.avg_val,
        ).alias("c_emb")
    )


def _kmeans_ivf_index(spark: SparkSession, sf_dir: str):
    """(corpus, packed trained-centroid row, assigned corpus) for the
    k-means IVF path. Both the TRAINED centroids and the cell assignment
    persist once per corpus (the stride-IVF staging discipline): training
    costs ITERS corpus passes and an index is built once, queried many
    times — re-running Lloyd per query call would re-scan the corpus
    ITERS times per consumer."""
    from .dedup import _stage_cached

    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)

    def train():
        cents = _centroid_rows(emb).select(
            F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
        )
        for _ in range(KMEANS_ITERS):
            # Materialize the k centroid rows after each Lloyd step: the
            # loop otherwise builds one lineage chain, so iteration i
            # re-runs every earlier iteration's corpus pass. Checkpointing
            # k tiny rows caps training at exactly ITERS corpus passes
            # (Spark MLlib's k-means keeps centroids on the driver for the
            # same reason).
            cents = _lloyd_step(emb, cents).localCheckpoint(eager=True)
        return cents

    cents = _stage_cached("v07_kmeans_cents", sf_dir, train)
    # staged for the same reason as ivf_packed (round 12, guide §2.4)
    packed = _stage_cached("v07_packed", sf_dir, lambda: _packed_cells(cents))
    assigned = _stage_cached(
        "v07_kmeans_assign",
        sf_dir,
        lambda: _with_nearest_cell(emb, packed, "embedding").select(
            "vec_id", "embedding", "cell_id"
        ),
    )
    return emb, packed, assigned


def v07_ann_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF search against the learned centroids — identical plan to v03.
    emb, packed, assigned = _kmeans_ivf_index(spark, sf_dir)
    queries = _query_rows(spark, sf_dir)  # unfanned — see _query_rows
    probes = _with_probe_cells(queries, packed, N_PROBE)
    scored = (
        assigned.join(probes, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    rank_w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
    )


def _oracle_v07() -> str:
    def assign(cent_cte: str, name: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN {cent_cte} c
  ) WHERE c_rank = 1
)"""

    def recenter(assign_cte: str, name: str) -> str:
        return f"""{name} AS (
  SELECT cell_id, list(avg_val ORDER BY dim) AS c_emb FROM (
    SELECT cell_id, d.i AS dim,
           FLOOR((CAST(SUM(CAST(embedding[d.i] AS DECIMAL(28,12))) AS DOUBLE)
                  / COUNT(*)) * 1000000.0) / 1000000.0 + 0.0 AS avg_val
    FROM {assign_cte}, unnest(range(1, len(embedding) + 1)) AS d(i)
    GROUP BY cell_id, d.i
  ) GROUP BY cell_id
)"""

    steps = [
        f"""cent0 AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND})"""
    ]
    for i in range(KMEANS_ITERS):
        steps.append(assign(f"cent{i}", f"assign{i}"))
        steps.append(recenter(f"assign{i}", f"cent{i + 1}"))
    final = f"cent{KMEANS_ITERS}"
    steps.append(assign(final, "assigned"))
    steps.append(
        f"""q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {QUERY_STRIDE} = 0)"""
    )
    steps.append(
        f"""probes AS (
  SELECT query_id, q_emb, cell_id FROM (
    SELECT q.query_id, q.q_emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cosine('q.q_emb', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS p_rank
    FROM q CROSS JOIN {final} c
  ) WHERE p_rank <= {N_PROBE}
)"""
    )
    steps.append(
        f"""scored AS (
  SELECT p.query_id, a.vec_id,
         {sql_cosine('p.q_emb', 'a.embedding')} AS cos
  FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)"""
    )
    return (
        "WITH "
        + ",\n".join(steps)
        + f"\nSELECT query_id, rank, vec_id, cos FROM ranked WHERE rank <= {TOP_K}"
    )


# ---------------------------------------------------------------------------
# v08 — SRP-LSH near-dup: the scale path for v01's all-pairs cosine scan.
# Sign-random-projection sketch: bit p = [dot(v, h_p) >= 0] for N_PLANES
# deterministic hyperplanes (integer components from a closed-form LCG,
# embedded as literals in BOTH engines — no RNG at runtime). Bits pack into
# SRP_BANDS bands; candidate pairs equi-join on (band_id, band_val) — the
# t02 LSH plan, linear in corpus size — then verify true cosine >= the
# v01 threshold. Semantics ARE the bucketed semantics (pairs sharing >= 1
# band), so the oracle mirrors the same sketch + bucket join, not a cosine
# scan: deterministic, hash-checkable, and honest about SRP recall.
# The corpus has no true near-dups, so every 40th vector gets a lightly
# perturbed copy (+0.05 on dim 0, ids +100000): cos ≈ 0.999 → recall
# ≈ 1-(1-(1-θ/π)^12)^3 ≈ 0.9 (empirically ~0.85: the perturbation is
# axis-aligned, slightly worse than the random-direction bound). Band
# width drives scale: 12-bit bands give 4096 buckets, so candidate volume
# grows ~n²/4096 per band; at higher corpus density, widen the bands (the
# knob is compile-time). Narrow bands (4-bit = 16 buckets) would be
# quasi-quadratic.
# ---------------------------------------------------------------------------
SRP_PLANES = 36
SRP_BANDS = 3
SRP_BAND_BITS = SRP_PLANES // SRP_BANDS  # 12
COPY_STRIDE = 40
COPY_ID_OFFSET = 100_000

# h[p][d] in [-48, 48]: fixed LCG over the (plane, dim) index — pure integer
# arithmetic, so the literal tables below are identical in Spark and DuckDB.
_SRP_H = [
    [((1103515245 * (p * 64 + d) + 12345) >> 16) % 97 - 48 for d in range(64)]
    for p in range(SRP_PLANES)
]


def _srp_dot(emb_col: "F.Column", plane: list[int]) -> "F.Column":
    prods = F.zip_with(
        emb_col,
        F.array(*[F.lit(float(c)) for c in plane]),
        lambda x, y: x.cast("double") * y,
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _srp_bands(emb_col: "F.Column") -> "F.Column":
    """array<int> of SRP_BANDS packed sign-bit band values."""
    bits = [
        F.when(_srp_dot(emb_col, _SRP_H[p]) >= 0, F.lit(1)).otherwise(F.lit(0))
        for p in range(SRP_PLANES)
    ]
    bands = []
    for b in range(SRP_BANDS):
        val = None
        for r in range(SRP_BAND_BITS):
            term = bits[b * SRP_BAND_BITS + r] * F.lit(1 << r)
            val = term if val is None else val + term
        bands.append(val)
    return F.array(*bands)


def _v08_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % COPY_STRIDE == 0).select(
        (F.col("vec_id") + COPY_ID_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, (x.cast("double") + F.lit(0.05)).cast("float")).otherwise(x),
        ).alias("embedding"),
    )
    return emb.unionByName(copies)


V08_BUCKET_CAP = 128  # hot-bucket suppression: see build_bands below


def v08_neardup_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _stage_cached, suppress_hot_buckets

    # The SRP sketch table feeds three consumers (the band self-join's two
    # sides and the cosine verify) — persist it once per corpus, the t02
    # LSH staging-table discipline. Sketching is the dominant CPU (bands ×
    # bits 64-dim dot products per row); without the persist Spark
    # recomputes it per consumer.
    sk = _stage_cached(
        "v08",
        sf_dir,
        lambda: fan_out(_v08_corpus(spark, sf_dir), spark).select(
            "vec_id", "embedding", _srp_bands(F.col("embedding")).alias("bands")
        ),
    )

    # Bucket-capped band table, staged per corpus (the t02 discipline;
    # round-11 scale probe: uncapped, v08 ran 2.53x at 10x data — the
    # mildest of the band family, but the same quadratic shape). The cap
    # is 128: a 12-bit SRP band over clustered embeddings legitimately
    # buckets larger than text minhash (sf0.1's max bucket is 53), so
    # the cap must sit above every driver-SF bucket — tested outputs
    # are bit-identical with or without it.
    def build_bands() -> DataFrame:
        bands_all = sk.select(
            "vec_id", F.posexplode("bands").alias("band_id", "band_val")
        )
        return suppress_hot_buckets(
            bands_all, ["band_id", "band_val"], V08_BUCKET_CAP
        )

    bands = _stage_cached("v08_bands", sf_dir, build_bands)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_val"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = sk.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = sk.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cos")
    )


def _oracle_v08() -> str:
    from .dedup import sql_capped_bands as _sql_capped

    def sql_srp_dot(emb: str, plane: list[int]) -> str:
        coeffs = ", ".join(str(c) for c in plane)
        return (
            f"list_sum(list_transform(range(1, 65), "
            f"i -> CAST({emb}[i] AS DOUBLE) * ([{coeffs}]::DOUBLE[])[i]))"
        )

    band_exprs = []
    for b in range(SRP_BANDS):
        terms = " + ".join(
            f"(CASE WHEN {sql_srp_dot('embedding', _SRP_H[b * SRP_BAND_BITS + r])} >= 0 "
            f"THEN {1 << r} ELSE 0 END)"
            for r in range(SRP_BAND_BITS)
        )
        band_exprs.append(f"({terms}) AS band{b}")
    band_cols = ",\n         ".join(band_exprs)
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {b} AS band_id, band{b} AS band_val FROM sk"
        for b in range(SRP_BANDS)
    )
    return f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {COPY_ID_OFFSET} AS vec_id,
         list_transform(range(1, len(embedding) + 1),
            i -> CASE WHEN i = 1
                      THEN CAST(CAST(embedding[i] AS DOUBLE) + 0.05 AS FLOAT)
                      ELSE embedding[i] END) AS embedding
  FROM embeddings WHERE vec_id % {COPY_STRIDE} = 0
),
sk AS (
  SELECT vec_id, embedding,
         {band_cols}
  FROM corpus
),
bands_all AS (
{band_union}
),
bands AS (
  {_sql_capped('SELECT * FROM bands_all', 'band_id, band_val',
               'vec_id, band_id, band_val', V08_BUCKET_CAP)}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       {sql_cosine('sa.embedding', 'sb.embedding')} AS cos
FROM cand c
JOIN sk sa ON sa.vec_id = c.vec_a
JOIN sk sb ON sb.vec_id = c.vec_b
WHERE {sql_cosine('sa.embedding', 'sb.embedding')} >= {COSINE_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# v09 — int8 scalar-quantized ANN (SQ8): quantize once at ingest
# (q = floor(x * 127/max_abs + 0.5), a global max computed in one 1-row agg
# broadcast), score candidates with INTEGER dot products (exact in both
# engines — no FP determinism risk at all), keep a 4x candidate pool per
# query, then re-rank the pool with exact float cosine. At 100 TB this is
# the memory-bandwidth win (4x smaller vectors in the scan) plus the v02
# single-pass plan; the only extra cost is the tiny re-rank.
# ---------------------------------------------------------------------------
RERANK_FACTOR = 4


def v09_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    # Global quantization scale: one scalar, computed exactly (max is
    # order-independent), broadcast via crossJoin of a 1-row aggregate.
    max_abs = emb.agg(
        F.max(
            F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
        ).alias("max_abs")
    )
    # floor(v + 0.5), not ROUND(v, 0): round-half-up via exact floor — a
    # quantized value landing exactly on k.5 would round differently across
    # engines under ROUND (the t09 half-boundary class); floor of the same
    # double is exact on both. (Exact-half negatives floor to the upper
    # neighbor instead of away-from-zero — identical on both engines,
    # which is the property that matters.)
    quantize = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * (F.lit(127.0) / F.col("max_abs")) + F.lit(0.5)
        ).cast("long"),
    )
    q = emb.crossJoin(F.broadcast(max_abs)).select(
        "vec_id", "embedding", quantize.alias("qvec")
    )
    queries = q.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("qvec").alias("q_qvec"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("q_qvec"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = q.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id")).withColumn(
        "qdot", qdot
    )
    pool_w = Window.partitionBy("query_id").orderBy(F.col("qdot").desc(), F.col("vec_id").asc())
    pool = (
        scored.withColumn("qrank", F.row_number().over(pool_w))
        .filter(F.col("qrank") <= TOP_K * RERANK_FACTOR)
    )
    rank_w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pool.withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos", "qdot")
    )


ORACLE_V09 = f"""
WITH mx AS (
  SELECT MAX(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS max_abs
  FROM embeddings
),
q8 AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
            x -> CAST(FLOOR(CAST(x AS DOUBLE) * (127.0 / mx.max_abs) + 0.5) AS BIGINT)) AS qvec
  FROM embeddings, mx
),
qs AS (
  SELECT vec_id AS query_id, embedding AS q_emb, qvec AS q_qvec
  FROM q8 WHERE vec_id % {QUERY_STRIDE} = 0
),
scored AS (
  SELECT qs.query_id, q8.vec_id, q8.embedding, qs.q_emb,
         CAST(list_sum(list_transform(range(1, len(q8.qvec) + 1),
              i -> q8.qvec[i] * qs.q_qvec[i])) AS BIGINT) AS qdot
  FROM q8 JOIN qs ON q8.vec_id <> qs.query_id
),
pool AS (
  SELECT query_id, vec_id, embedding, q_emb, qdot FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY qdot DESC, vec_id ASC) AS qrank
    FROM scored
  ) WHERE qrank <= {TOP_K * RERANK_FACTOR}
),
ranked AS (
  SELECT query_id, vec_id, qdot,
         {sql_cosine('q_emb', 'embedding')} AS cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY {sql_cosine('q_emb', 'embedding')} DESC,
                                          vec_id ASC) AS INTEGER) AS rank
  FROM pool
)
SELECT query_id, rank, vec_id, cos, qdot FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# v05 — pandas-UDF cosine top-k: the Arrow-vectorized twin of v02, in the
# shape that scales — the pattern to reach for when the metric is not
# expressible in built-ins (learned distance, quantized codes):
#
#   1. The query matrix rides a SPARK BROADCAST VARIABLE (queries are the
#      bounded side — a user query batch; the harness synthesizes one by
#      stride-sampling). Corpus rows cross mapInPandas exactly ONCE — the
#      old form joined queries onto the corpus first, Arrow-shipping a
#      q_emb copy with every (corpus x query) pair, |Q|x the traffic.
#   2. Each Arrow batch scores against all queries in one BLAS GEMM.
#   3. Each PARTITION emits only its top-k per query (partial top-k under
#      the global (cos desc, vec_id asc) total order — associative, so
#      the union contains the global top-k). The final window ranks
#      n_partitions x |Q| x k candidate rows, not n x |Q| scored rows.
#
# For plain cosine the JVM expression path (v02) wins at small |Q|; both
# are kept so the bench shows the tradeoff.
# ---------------------------------------------------------------------------
_V05_QBC: dict = {}


def _seq_dot(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """All-pairs dot products accumulated dimension-by-dimension,
    left-to-right — the numpy twin of the JVM fold (F.aggregate) and
    DuckDB's list_sum, so the resulting doubles are bit-identical to the
    expression engines'. One vectorized (n_a x n_b) pass per dimension:
    same flop count as a matmul, deterministic order, no n_a*n_b*d
    intermediate."""
    acc = np.zeros((a.shape[0], b.shape[0]))
    for j in range(a.shape[1]):
        acc += a[:, j, None] * b[None, :, j]
    return acc


def _seq_self_dot(a: "np.ndarray") -> "np.ndarray":
    """Per-row self dot product with the same left-to-right fold."""
    acc = np.zeros(a.shape[0])
    for j in range(a.shape[1]):
        acc += a[:, j] * a[:, j]
    return acc


def v05_ann_pandas_udf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    # The query batch is collected once per corpus and reused across calls
    # (the staging-table discipline applied to the broadcast side): at
    # scale a query batch is user-supplied and bounded, not re-derived.
    cache_key = (sf_dir, spark.sparkContext.applicationId)  # bc dies with the context
    bc = _V05_QBC.get(cache_key)
    if bc is None:
        q_pdf = (
            emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
            .select(F.col("vec_id").alias("query_id"), "embedding")
            .toPandas()
        )
        qids = q_pdf["query_id"].to_numpy()
        Q = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
        q_norms = np.sqrt(_seq_self_dot(Q))
        bc = spark.sparkContext.broadcast((qids, Q, q_norms))
        _V05_QBC[cache_key] = bc

    def score_partial_topk(batches):
        b_qids, b_q, b_qn = bc.value
        nq = len(b_qids)
        frames = []
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
            # BIT-IDENTICAL op order to the expression form (round-8
            # conversion): a BLAS matmul accumulates in an unspecified
            # order, which was fine under round(6) (absorbs ulp noise off
            # the half boundary) but NOT under the engine-safe
            # floor(x*1e6)/1e6 publication — exact-duplicate vectors land
            # cosine exactly ON the 1e-6 grid, where a 1-ulp
            # accumulation difference flips the floor. _seq_dot folds
            # dimensions left-to-right, matching F.aggregate and DuckDB
            # list_sum exactly, so the published doubles are identical.
            cos = _seq_dot(A, b_q) / (
                np.sqrt(_seq_self_dot(A))[:, None] * b_qn[None, :]
            )
            np.floor(cos * 1e6, out=cos)
            cos /= 1e6
            nb = A.shape[0]
            vec = pdf["vec_id"].to_numpy()
            f = pd.DataFrame(
                {
                    "query_id": np.tile(b_qids, nb),
                    "vec_id": np.repeat(vec, nq),
                    "cos": cos.ravel(),
                }
            )
            f = f[f["vec_id"] != f["query_id"]]
            # per-batch prune bounds partition memory at |Q| x k x batches
            frames.append(
                f.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
                .groupby("query_id", sort=False)
                .head(TOP_K)
            )
        if not frames:
            return
        cand = pd.concat(frames, ignore_index=True)
        yield (
            cand.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
            .groupby("query_id", sort=False)
            .head(TOP_K)
        )

    partial = emb.mapInPandas(
        score_partial_topk, schema="query_id long, vec_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
    )


# Same semantics as v02 → same oracle.
ORACLE_V05 = ORACLE_V02


# ---------------------------------------------------------------------------
# v06 — L2 normalization: the preprocessing stage that turns cosine ANN
# into dot-product ANN (normalize once at ingest, save the per-query norm
# at 100 TB). Row form keeps the oracle comparison order-insensitive.
# ---------------------------------------------------------------------------
def v06_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import norm

    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    with_norm = emb.withColumn("l2", norm(F.col("embedding")))
    exploded = with_norm.select(
        "vec_id", "l2", F.posexplode(F.col("embedding")).alias("dim", "val")
    )
    return exploded.select(
        "vec_id",
        "dim",
        floor_scaled(F.col("val").cast("double") / F.col("l2"), 6).alias("unit_val"),
        floor_scaled(F.col("l2"), 6).alias("l2_norm"),
    )


from ..functions.vectors import sql_norm

ORACLE_V06 = f"""
SELECT vec_id,
       CAST(d.i - 1 AS INTEGER) AS dim,
       {sql_floor_scaled(f"CAST(embedding[d.i] AS DOUBLE) / {sql_norm('embedding')}")} AS unit_val,
       {sql_floor_scaled(sql_norm('embedding'))} AS l2_norm
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS d(i)
"""


# ---------------------------------------------------------------------------
# v10 — ANN quality evaluation in-engine: recall@k of the IVF path (v03)
# against the brute-force ground truth (v02), per query. This is the metric
# that justifies shipping an ANN index at 100 TB: the IVF plan touches
# ~N_PROBE/N_CELLS of the corpus, and this query prices that speedup in
# recall. Both inputs are deterministic DataFrame plans, so the whole
# evaluation is hash-checkable; the join is tiny (|queries| x k rows).
# Scale: both sides are already reduced to |queries| x k rows before the
# hit-join — the evaluation never touches the corpus again.
# ---------------------------------------------------------------------------
def _exact_topk_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged brute-force top-k ground truth (query_id, vec_id): the truth
    set every recall/accuracy eval joins against (v10/v15/v16). Production
    ANN evaluation computes this table ONCE per corpus and reuses it —
    the t02 staging discipline applied to the truth set. v02 itself stays
    unstaged so the bench still prices the raw brute-force scan."""
    from .dedup import _stage_cached

    return _stage_cached(
        "v02_truth",
        sf_dir,
        lambda: v02_ann_bruteforce_topk(spark, sf_dir).select(
            "query_id", "rank", "vec_id"
        ),
    )


def v10_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = _exact_topk_truth(spark, sf_dir)
    approx = v03_ann_ivf_topk(spark, sf_dir).select("query_id", "vec_id")
    hits = (
        approx.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_query = (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_returned"))
        .join(hits, "query_id", "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
    )
    return per_query.select(
        "query_id",
        F.col("n_returned").cast("long").alias("n_returned"),
        F.col("n_hits").cast("long").alias("n_hits"),
        # exact integer micros, not float ROUND (t09 half-boundary class):
        # same integer both engines -> same published double
        (F.expr(f"n_hits * 1000000 div {TOP_K}") / F.lit(1e6)).alias("recall_at_k"),
    )


ORACLE_V10 = f"""
WITH exact AS (SELECT query_id, vec_id FROM ({ORACLE_V02})),
approx AS (SELECT query_id, vec_id FROM ({ORACLE_V03})),
hits AS (
  SELECT a.query_id, COUNT(*) AS n_hits
  FROM approx a JOIN exact e ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY a.query_id
)
SELECT p.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_returned,
       CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
       COALESCE(ANY_VALUE(h.n_hits), 0) * 1000000 // {TOP_K} / 1e6 AS recall_at_k
FROM approx p LEFT JOIN hits h ON p.query_id = h.query_id
GROUP BY p.query_id
"""


# ---------------------------------------------------------------------------
# v11 — product-quantized ANN (PQ, Jégou et al. 2011): split the 64-dim
# vector into 8 subspaces of 8 dims; per subspace, encode each vector as
# the index of the nearest of 16 codebook centroids (argmin L2², ties to
# the lowest index). Search is asymmetric (ADC): the query stays exact and
# is scored against each candidate's RECONSTRUCTION (concatenation of its
# selected centroids) — mathematically identical to the per-subspace
# distance-table sum because L2² decomposes dimension-wise. A 4x candidate
# pool is then re-ranked with exact float cosine (v09's pattern).
#
# Codebooks here are a deterministic stride-sample of the corpus (v03's
# trick) so the DuckDB oracle can replicate encoding bit-for-bit; swap in
# per-subspace k-means (v07's Lloyd machinery) for production codebooks —
# the search plan does not change.
#
# Scale (100 TB): PQ stores 8 single-byte codes per vector — a 32x memory
# cut vs float32, which is THE reason ANN indexes fit in RAM at scale. The
# codebook (16 centroids × 64 dims) broadcasts; encoding is one map-side
# pass over the corpus (zero shuffle); search is the v02 single-pass shape
# with a 10x cheaper inner loop at the approx stage. The reconstruction
# column materialized here stands in for the code-array + table-lookup
# representation; the plan shape is identical.
# ---------------------------------------------------------------------------
PQ_NCODES = 16
PQ_SUB_DIM = 8
PQ_N_SUB = 8  # 64 dims / 8
PQ_CB_STRIDE = 31  # vec_ids 0,31,...,465: 16 codebook vectors at every SF


def _pq_sub_l2(vec, cvec, m):
    """L2² between subspace m of `vec` and `cvec` (both array<float> cols)."""
    def term(j):
        a = F.element_at(vec, m * PQ_SUB_DIM + j).cast("double")
        b = F.element_at(cvec, m * PQ_SUB_DIM + j).cast("double")
        return (a - b) * (a - b)

    out = term(1)
    for j in range(2, PQ_SUB_DIM + 1):
        out = out + term(j)
    return out


def _pq_codebook(emb):
    """One-row codebook: 16 stride-sampled vectors ordered by vec_id
    (array_sort on the struct pins collect_list order under any
    partitioning)."""
    return (
        emb.filter(
            (F.col("vec_id") % PQ_CB_STRIDE == 0)
            & (F.col("vec_id") < PQ_CB_STRIDE * PQ_NCODES)
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))),
                lambda s: s["embedding"],
            ).alias("cbs")
        )
    )


def _pq_encoded_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, cell_id, recon): the corpus with its IVF cell
    AND its PQ reconstruction, staged once per corpus — encoding is a
    map-side pass a production PQ index pays at BUILD time, not per
    query. Shared by v11 (ignores cell_id) and v14."""
    from .dedup import _stage_cached

    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)

    # round 12 (guide §7.3 — planning time IS a cost): the recon
    # expression tree is ~13k Column nodes (8 subspaces × 16 codebook
    # distances, each the unrolled 8-dim L2²); building it on every
    # consumer call cost ~1.3 s of driver-side Python per bench run and
    # was thrown away on every cache hit.  Constructing it INSIDE the
    # build closure makes a staged hit construction-free — no plan or
    # value change of any kind.
    def build() -> DataFrame:
        cb = _pq_codebook(emb)

        def code_of(m):
            dists = F.transform(
                F.col("cbs"), lambda c: _pq_sub_l2(F.col("embedding"), c, m)
            )
            return F.array_position(dists, F.array_min(dists)).cast("int")

        recon = F.flatten(
            F.array(
                *[
                    F.slice(
                        F.element_at(F.col("cbs"), code_of(m)),
                        m * PQ_SUB_DIM + 1,
                        PQ_SUB_DIM,
                    )
                    for m in range(PQ_N_SUB)
                ]
            )
        )
        return assigned.crossJoin(F.broadcast(cb)).select(
            "vec_id", "embedding", "cell_id", recon.alias("recon")
        )

    return _stage_cached("pq_encoded", sf_dir, build)


def v11_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    encoded = _pq_encoded_index(spark, sf_dir).select("vec_id", "embedding", "recon")
    queries = _query_rows(spark, sf_dir)  # unfanned — see _query_rows
    approx_l2 = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("recon"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = encoded.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).withColumn("approx_l2", floor_scaled(approx_l2, 6))
    pool_w = Window.partitionBy("query_id").orderBy(
        F.col("approx_l2").asc(), F.col("vec_id").asc()
    )
    pool = scored.withColumn("qrank", F.row_number().over(pool_w)).filter(
        F.col("qrank") <= TOP_K * RERANK_FACTOR
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        pool.withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos", "approx_l2")
    )


def _oracle_v11() -> str:
    sub_l2 = (
        "list_sum(list_transform(range(1, {sd} + 1), j -> "
        "(CAST({v}[m * {sd} + j] AS DOUBLE) - CAST(c[m * {sd} + j] AS DOUBLE))"
        " * (CAST({v}[m * {sd} + j] AS DOUBLE) - CAST(c[m * {sd} + j] AS DOUBLE))))"
    ).format(v="e.embedding", sd=PQ_SUB_DIM)
    dists = f"list_transform(cb.cbs, c -> {sub_l2})"
    code = f"list_position({dists}, list_min({dists}))"
    recon = (
        f"flatten(list_transform(range(0, {PQ_N_SUB}), m -> "
        f"cb.cbs[{code}][m * {PQ_SUB_DIM} + 1 : (m + 1) * {PQ_SUB_DIM}]))"
    )
    return f"""
WITH cb AS (
  SELECT list(embedding ORDER BY vec_id) AS cbs
  FROM embeddings
  WHERE vec_id % {PQ_CB_STRIDE} = 0 AND vec_id < {PQ_CB_STRIDE * PQ_NCODES}
),
encoded AS (
  SELECT e.vec_id, e.embedding, {recon} AS recon
  FROM embeddings e, cb
),
qs AS (
  SELECT vec_id AS query_id, embedding AS q_emb
  FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
),
scored AS (
  SELECT qs.query_id, en.vec_id, en.embedding, qs.q_emb,
         FLOOR(list_sum(list_transform(range(1, 65), i ->
             (CAST(qs.q_emb[i] AS DOUBLE) - CAST(en.recon[i] AS DOUBLE))
             * (CAST(qs.q_emb[i] AS DOUBLE) - CAST(en.recon[i] AS DOUBLE))))
           * 1000000.0) / 1000000.0 + 0.0 AS approx_l2
  FROM encoded en JOIN qs ON en.vec_id <> qs.query_id
),
pool AS (
  SELECT query_id, vec_id, embedding, q_emb, approx_l2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY approx_l2 ASC, vec_id ASC) AS qrank
    FROM scored
  ) WHERE qrank <= {TOP_K * RERANK_FACTOR}
),
ranked AS (
  SELECT query_id, vec_id, approx_l2,
         {sql_cosine('q_emb', 'embedding')} AS cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY {sql_cosine('q_emb', 'embedding')} DESC,
                                          vec_id ASC) AS INTEGER) AS rank
  FROM pool
)
SELECT query_id, rank, vec_id, cos, approx_l2 FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# v14 — IVF + PQ composed ANN: the full production index shape (FAISS's
# IVFPQ): IVF routing restricts the search to N_PROBE cells, PQ codes give
# the cheap in-cell distance, exact cosine re-ranks the small pool. The
# composition is exactly v03's routing plan feeding v11's scoring plan —
# both the centroid row and the codebook row are broadcast, the corpus is
# assigned+encoded in ONE map-side pass, and the only shuffle before the
# per-query rank is the probed-cell equi-join. Scanned fraction
# ~N_PROBE/N_CELLS with 8-byte codes per vector — the memory x compute
# product that makes billion-vector indexes serve online.
# ---------------------------------------------------------------------------
def v14_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    encoded = _pq_encoded_index(spark, sf_dir)
    queries = _query_rows(spark, sf_dir)  # unfanned — see _query_rows
    probes = _with_probe_cells(queries, packed, N_PROBE)
    approx_l2 = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("recon"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        encoded.join(probes, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("approx_l2", floor_scaled(approx_l2, 6))
    )
    pool_w = Window.partitionBy("query_id").orderBy(
        F.col("approx_l2").asc(), F.col("vec_id").asc()
    )
    pool = scored.withColumn("qrank", F.row_number().over(pool_w)).filter(
        F.col("qrank") <= TOP_K * RERANK_FACTOR
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        cosine(F.col("q_emb"), F.col("embedding")).desc(), F.col("vec_id").asc()
    )
    return (
        pool.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "rank",
            "vec_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
            "approx_l2",
        )
    )


def _oracle_v14() -> str:
    sub_l2 = (
        "list_sum(list_transform(range(1, {sd} + 1), j -> "
        "(CAST({v}[m * {sd} + j] AS DOUBLE) - CAST(c[m * {sd} + j] AS DOUBLE))"
        " * (CAST({v}[m * {sd} + j] AS DOUBLE) - CAST(c[m * {sd} + j] AS DOUBLE))))"
    ).format(v="a.embedding", sd=PQ_SUB_DIM)
    dists = f"list_transform(cb.cbs, c -> {sub_l2})"
    code = f"list_position({dists}, list_min({dists}))"
    recon = (
        f"flatten(list_transform(range(0, {PQ_N_SUB}), m -> "
        f"cb.cbs[{code}][m * {PQ_SUB_DIM} + 1 : (m + 1) * {PQ_SUB_DIM}]))"
    )
    return f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
cb AS (
  SELECT list(embedding ORDER BY vec_id) AS cbs
  FROM embeddings
  WHERE vec_id % {PQ_CB_STRIDE} = 0 AND vec_id < {PQ_CB_STRIDE * PQ_NCODES}
),
encoded AS (
  SELECT a.vec_id, a.embedding, a.cell_id, {recon} AS recon
  FROM assigned a, cb
),
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {QUERY_STRIDE} = 0),
probes AS (
  SELECT query_id, q_emb, cell_id FROM (
    SELECT q.query_id, q.q_emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cosine('q.q_emb', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS p_rank
    FROM q CROSS JOIN c
  ) WHERE p_rank <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, en.vec_id, en.embedding, p.q_emb,
         FLOOR(list_sum(list_transform(range(1, 65), i ->
             (CAST(p.q_emb[i] AS DOUBLE) - CAST(en.recon[i] AS DOUBLE))
             * (CAST(p.q_emb[i] AS DOUBLE) - CAST(en.recon[i] AS DOUBLE))))
           * 1000000.0) / 1000000.0 + 0.0 AS approx_l2
  FROM encoded en JOIN probes p ON en.cell_id = p.cell_id
  WHERE en.vec_id <> p.query_id
),
pool AS (
  SELECT query_id, vec_id, embedding, q_emb, approx_l2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY approx_l2 ASC, vec_id ASC) AS qrank
    FROM scored
  ) WHERE qrank <= {TOP_K * RERANK_FACTOR}
),
ranked AS (
  SELECT query_id, vec_id, approx_l2,
         {sql_cosine('q_emb', 'embedding')} AS cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY {sql_cosine('q_emb', 'embedding')} DESC,
                                          vec_id ASC) AS INTEGER) AS rank
  FROM pool
)
SELECT query_id, rank, vec_id, cos, approx_l2 FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# v12 — SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
# cluster the embedding space, then drop near-duplicates WITHIN each cluster.
# The all-pairs comparison is confined to single cells, so total work is
# sum(|cell|²) ≈ n²/k instead of n² — the knob (number of centroids) is
# chosen so cells stay small; the corpus shuffles exactly once (on cell_id)
# and centroids are broadcast (v03's map-side assignment).
#
# Kept/dropped rule (deterministic): within a cell, a vector is dropped if
# some lower-id vector in the same cell has cosine ≥ threshold; the emitted
# witness `dup_of` is the lowest such id. The reference engine has no
# embedding-space dedup — this extends the LLM-pipeline surface
# (BASELINE.json mandate), composing v03's cell assignment with t05's
# min-id keep discipline.
# ---------------------------------------------------------------------------
SEMDEDUP_THRESHOLD = 0.40


def v12_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, assigned = _stride_ivf_index(spark, sf_dir)
    a = assigned.select(
        "cell_id", F.col("vec_id").alias("keep_id"), F.col("embedding").alias("emb_a")
    )
    b = assigned.select(
        "cell_id", F.col("vec_id").alias("vec_id"), F.col("embedding").alias("emb_b")
    )
    # Within-cell pairs only: the equi-join key is cell_id, so no pair ever
    # crosses cells and the join is the single corpus shuffle.
    dup_pairs = (
        a.join(b, "cell_id")
        .filter(F.col("keep_id") < F.col("vec_id"))
        .withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= SEMDEDUP_THRESHOLD)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("keep_id").asc())
    return (
        dup_pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "cell_id",
            F.col("keep_id").alias("dup_of"),
            "cos",
        )
    )


ORACLE_V12 = f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
dup_pairs AS (
  SELECT b.vec_id, a.cell_id, a.vec_id AS dup_of,
         {sql_cosine('a.embedding', 'b.embedding')} AS cos
  FROM assigned a JOIN assigned b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  WHERE {sql_cosine('a.embedding', 'b.embedding')} >= {SEMDEDUP_THRESHOLD}
)
SELECT vec_id, cell_id, dup_of, cos FROM (
  SELECT vec_id, cell_id, dup_of, cos,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dup_of ASC) AS rn
  FROM dup_pairs
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# v13 — cluster representatives (medoid selection): after v12's cell
# assignment, elect the most central member of each cell — the vector with
# the highest mean cosine to its cell-mates. This is the selection step of
# coreset/prototype pipelines (pick one exemplar per semantic cluster to
# summarize or subsample a corpus).
#
# Scale: the pairwise mean is confined to cells exactly like v12 (Σ|cell|²
# work via one cell_id equi-join); singleton cells return the member with
# mean_cos = 1.0 (degenerate but well-defined). Ties break on vec_id.
# ---------------------------------------------------------------------------
def v13_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, assigned = _stride_ivf_index(spark, sf_dir)
    a = assigned.select(
        "cell_id", F.col("vec_id").alias("vec_id"), F.col("embedding").alias("emb_a")
    )
    b = assigned.select(
        "cell_id", F.col("vec_id").alias("other_id"), F.col("embedding").alias("emb_b")
    )
    centrality = (
        a.join(b, "cell_id")
        .filter(F.col("vec_id") != F.col("other_id"))
        .withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
        .groupBy("cell_id", "vec_id")
        # exact integer micros: published cosines are k/1e6 exact, so
        # recover k (ROUND fixes the *1e6 ulp), sum as BIGINT, truncating
        # DIV by the count — no float ROUND anywhere (t09 class)
        .agg(
            (
                F.expr("SUM(CAST(ROUND(cos * 1000000) AS BIGINT)) DIV COUNT(1)")
                / F.lit(1e6)
            ).alias("mean_cos")
        )
    )
    # Singleton cells have no pairs — re-attach so every cell elects a rep.
    singles = (
        assigned.groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("only_vec"))
        .filter(F.col("n") == 1)
        .select("cell_id", F.col("only_vec").alias("vec_id"), F.lit(1.0).alias("mean_cos"))
    )
    w = Window.partitionBy("cell_id").orderBy(
        F.col("mean_cos").desc(), F.col("vec_id").asc()
    )
    return (
        centrality.unionByName(singles)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cell_id", F.col("vec_id").alias("rep_vec_id"), "mean_cos")
    )


ORACLE_V13 = f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
centrality AS (
  SELECT a.cell_id, a.vec_id,
         SUM(CAST(ROUND(({sql_cosine('a.embedding', 'b.embedding')})
                        * 1000000) AS BIGINT)) // COUNT(*) / 1e6 AS mean_cos
  FROM assigned a JOIN assigned b
    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
  GROUP BY a.cell_id, a.vec_id
),
singles AS (
  SELECT cell_id, MIN(vec_id) AS vec_id, 1.0 AS mean_cos
  FROM assigned GROUP BY cell_id HAVING COUNT(*) = 1
),
unioned AS (
  SELECT * FROM centrality UNION ALL SELECT * FROM singles
)
SELECT cell_id, vec_id AS rep_vec_id, mean_cos FROM (
  SELECT cell_id, vec_id, mean_cos,
         ROW_NUMBER() OVER (PARTITION BY cell_id
                            ORDER BY mean_cos DESC, vec_id ASC) AS rk
  FROM unioned
) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# v15 — Matryoshka truncated-dimension recall (Kusupati et al. 2022, "
# Matryoshka Representation Learning"): brute-force top-k over only the
# FIRST MRL_DIM of the 64 dims, evaluated as recall against the full-dim
# exact top-k. The scale story: a 4x-shorter prefix is a 4x cheaper scan
# and a 4x smaller index — this query measures what that costs in recall.
# Plan: same single-pass broadcast-queries shape as v02, on sliced arrays
# (slice is a codegen array op; the parquet scan still reads the full
# column — a production deployment would materialize the prefix).
# ---------------------------------------------------------------------------
MRL_DIM = 16


def v15_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark
    )
    emb_t = emb.select(
        "vec_id", F.slice("embedding", 1, MRL_DIM).alias("e_t")
    )
    queries = emb_t.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e_t").alias("q_t")
    )
    scored = emb_t.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).withColumn("cos", cosine(F.col("q_t"), F.col("e_t")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    approx = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    exact = _exact_topk_truth(spark, sf_dir)
    hits = (
        approx.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_returned"))
        .join(hits, "query_id", "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .select(
            "query_id",
            F.col("n_returned").cast("long").alias("n_returned"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.expr(f"n_hits * 1000000 div {TOP_K}") / F.lit(1e6)).alias("recall_mrl"),
        )
    )


ORACLE_V15 = f"""
WITH t AS (SELECT vec_id, embedding[1:{MRL_DIM}] AS e_t FROM embeddings),
q AS (SELECT vec_id AS query_id, e_t AS q_t FROM t
      WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_id, t.vec_id, {sql_cosine('q.q_t', 't.e_t')} AS cos
  FROM t JOIN q ON t.vec_id <> q.query_id
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {TOP_K}
),
exact AS (SELECT query_id, vec_id FROM ({ORACLE_V02})),
hits AS (
  SELECT a.query_id, COUNT(*) AS n_hits
  FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY a.query_id
)
SELECT p.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_returned,
       CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
       COALESCE(ANY_VALUE(h.n_hits), 0) * 1000000 // {TOP_K} / 1e6 AS recall_mrl
FROM approx p LEFT JOIN hits h ON p.query_id = h.query_id
GROUP BY p.query_id
"""


# ---------------------------------------------------------------------------
# v16 — IVF probe-count sweep: recall@k for n_probe ∈ {{1, 2, 3}} against
# the exact brute-force top-k — the tuning curve every IVF deployment
# reads before picking its latency/recall point. All three probe levels
# ride the SAME staged cell-assignment table (one corpus pass total); the
# per-level cost is one probed-cell equi-join over a different slice of
# the broadcast centroid array.
# ---------------------------------------------------------------------------
V16_PROBES = (1, 2, 3)


def v16_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Probe sets are NESTED (probes(1) ⊂ probes(2) ⊂ probes(3)), so the
    # expensive work — scoring candidates in probed cells — happens ONCE
    # at the maximum level with each cell's probe rank kept; the per-level
    # results are then a filter (probe_rank <= p) + per-(level, query)
    # window over the already-scored candidates. One candidate equi-join
    # instead of |V16_PROBES| of them.
    max_p = max(V16_PROBES)
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored_cells = F.array_sort(
        F.transform(
            F.col("cells"),
            lambda c: F.struct(
                (-_cell_cos("q_emb", c)).alias("neg_cos"), c.cell_id.alias("cell_id")
            ),
        )
    )
    probes = (
        queries.crossJoin(F.broadcast(packed))
        .withColumn("_row_norm", norm(F.col("q_emb")))
        .select(
            "query_id",
            "q_emb",
            F.posexplode(F.slice(scored_cells, 1, max_p)).alias("pos0", "pc"),
        )
        .select(
            "query_id",
            "q_emb",
            (F.col("pos0") + 1).alias("probe_rank"),
            F.col("pc").cell_id.alias("cell_id"),
        )
    )
    scored = (
        assigned.join(probes, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
        .select("query_id", "probe_rank", "vec_id", "cos")
    )
    levels = scored.join(
        F.broadcast(
            spark.createDataFrame([(p,) for p in V16_PROBES], "n_probe int")
        ),
        F.col("probe_rank") <= F.col("n_probe"),
    )
    rank_w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    approx = (
        levels.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("n_probe", "query_id", "vec_id")
    )
    exact = _exact_topk_truth(spark, sf_dir)
    hits = (
        approx.join(exact, ["query_id", "vec_id"])
        .groupBy("n_probe", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        approx.groupBy("n_probe", "query_id")
        .agg(F.count(F.lit(1)).alias("n_returned"))
        .join(hits, ["n_probe", "query_id"], "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .select(
            F.col("n_probe").cast("int").alias("n_probe"),
            "query_id",
            F.col("n_returned").cast("long").alias("n_returned"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.expr(f"n_hits * 1000000 div {TOP_K}") / F.lit(1e6)).alias("recall"),
        )
    )


def _oracle_v16() -> str:
    blocks = []
    for p in V16_PROBES:
        blocks.append(
            f"""
SELECT CAST({p} AS INTEGER) AS n_probe, a.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_returned,
       CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
       COALESCE(ANY_VALUE(h.n_hits), 0) * 1000000 // {TOP_K} / 1e6 AS recall
FROM (SELECT query_id, vec_id FROM ({_oracle_v03_probe(p)})) a
LEFT JOIN (
  SELECT x.query_id, COUNT(*) AS n_hits
  FROM (SELECT query_id, vec_id FROM ({_oracle_v03_probe(p)})) x
  JOIN (SELECT query_id, vec_id FROM ({ORACLE_V02})) e
    ON x.query_id = e.query_id AND x.vec_id = e.vec_id
  GROUP BY x.query_id
) h ON a.query_id = h.query_id
GROUP BY a.query_id"""
        )
    return "\nUNION ALL\n".join(blocks)


# ---------------------------------------------------------------------------
# v17 — k-NN classification accuracy: every query vector is classified by
# the majority label of its exact top-k neighbours (ties → smaller
# label), scored against its own label, reported per true label. The
# standard embedding-quality probe: if k-NN can't recover labels, the
# space won't serve retrieval either. Plan: v02's single-pass scored
# top-k (queries broadcast, corpus streamed) + a per-(query, label) count
# and two small windows over query-grouped rows — nothing shuffles but
# (query_id, label) pairs.
# ---------------------------------------------------------------------------
def v17_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label"),
        spark,
    )
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("true_label"),
    )
    scored = emb.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "true_label", "label")
    )
    votes = topk.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    predicted = (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("label").alias("pred_label"))
    )
    return (
        predicted.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("long")
            ).alias("n_correct"),
        )
        .select(
            "true_label",
            F.col("n_queries").cast("long").alias("n_queries"),
            F.col("n_correct").cast("long").alias("n_correct"),
            (F.expr("n_correct * 1000000 div n_queries") / F.lit(1e6)).alias(
                "accuracy"
            ),
        )
    )


ORACLE_V17 = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb, label AS true_label
           FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_id, q.true_label, e.vec_id, e.label,
         {sql_cosine('q.q_emb', 'e.embedding')} AS cos
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
topk AS (
  SELECT query_id, true_label, label FROM (
    SELECT query_id, true_label, label,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {TOP_K}
),
votes AS (
  SELECT query_id, true_label, label, COUNT(*) AS n_votes
  FROM topk GROUP BY query_id, true_label, label
),
predicted AS (
  SELECT query_id, true_label, label AS pred_label FROM (
    SELECT query_id, true_label, label, n_votes,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY n_votes DESC, label ASC) AS vr
    FROM votes
  ) WHERE vr = 1
)
SELECT true_label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
         * 1000000 // COUNT(*) / 1e6 AS accuracy
FROM predicted GROUP BY true_label
"""



# ---------------------------------------------------------------------------
# v18 — binary-hash ANN (the third quantization tier after SQ8 and PQ):
# each vector is packed into a 48-bit SRP sign signature; candidate
# scoring is ONE xor + popcount per pair (Hamming distance approximates
# angular distance, Charikar 2002), and a 4x candidate pool is re-ranked
# with exact float cosine. 48 bits = 6 bytes/vector — a ~170x memory cut
# vs float32x64, THE tier that lets an index live in RAM when even PQ
# codes don't fit. The signature table stages once per corpus (build-time
# cost); queries broadcast; the corpus is never shuffled before the
# per-query top-k window.
# ---------------------------------------------------------------------------
V18_BITS = 48  # keeps the packed signature clear of the sign bit
_V18_H = [
    [((1103515245 * (p * 64 + d) + 12345) >> 16) % 97 - 48 for d in range(64)]
    for p in range(V18_BITS)
]


def _srp_sig48(emb_col: "F.Column") -> "F.Column":
    val = None
    for p in range(V18_BITS):
        term = (
            F.when(_srp_dot(emb_col, _V18_H[p]) >= 0, F.lit(1 << p).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        val = term if val is None else val + term
    return val


def v18_ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _stage_cached

    sigs = _stage_cached(
        "v18_sigs",
        sf_dir,
        lambda: fan_out(
            table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark
        ).select("vec_id", "embedding", _srp_sig48(F.col("embedding")).alias("sig")),
    )
    queries = sigs.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sig").alias("q_sig"),
    )
    scored = sigs.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).withColumn(
        "hamming", F.bit_count(F.col("sig").bitwiseXOR(F.col("q_sig"))).cast("int")
    )
    pool_w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    pool = scored.withColumn("qrank", F.row_number().over(pool_w)).filter(
        F.col("qrank") <= TOP_K * RERANK_FACTOR
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        pool.withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos", "hamming")
    )


def _oracle_v18() -> str:
    def sql_dot(plane: list[int]) -> str:
        coeffs = ", ".join(str(c) for c in plane)
        return (
            f"list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ([{coeffs}]::DOUBLE[])[i]))"
        )

    sig = " + ".join(
        f"(CASE WHEN {sql_dot(_V18_H[p])} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(V18_BITS)
    )
    return f"""
WITH sk AS (
  SELECT vec_id, embedding, CAST({sig} AS BIGINT) AS sig FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, sig AS q_sig FROM sk
      WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_id, s.vec_id, s.embedding, q.q_emb,
         CAST(bit_count(xor(s.sig, q.q_sig)) AS INTEGER) AS hamming
  FROM sk s JOIN q ON s.vec_id <> q.query_id
),
pool AS (
  SELECT query_id, vec_id, embedding, q_emb, hamming FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY hamming ASC, vec_id ASC) AS qrank
    FROM scored
  ) WHERE qrank <= {TOP_K} * {RERANK_FACTOR}
)
SELECT query_id, rank, vec_id, cos, hamming FROM (
  SELECT query_id, vec_id, hamming,
         {sql_cosine('q_emb', 'embedding')} AS cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY {sql_cosine('q_emb', 'embedding')} DESC,
                                          vec_id ASC) AS INTEGER) AS rank
  FROM pool
) WHERE rank <= {TOP_K}
"""



# ---------------------------------------------------------------------------
# v19 — filtered ANN: top-k restricted to corpus vectors sharing the
# query's label (the metadata-filtered search every production vector
# store exposes — "nearest items in MY category"). The filter composes
# BEFORE the ranking window, so k results are guaranteed from the
# filtered set (post-filtering an unfiltered top-k under-returns — the
# classic filtered-ANN bug). Same single-pass broadcast-queries plan as
# v02; the label predicate evaluates map-side next to the cosine.
# ---------------------------------------------------------------------------
def v19_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label"),
        spark,
    )
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    scored = (
        emb.join(
            F.broadcast(queries),
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") == F.col("q_label")),
        )
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("q_label").alias("label"), "rank", "vec_id", "cos")
    )


ORACLE_V19 = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
           FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_id, q.q_label, e.vec_id,
         {sql_cosine('q.q_emb', 'e.embedding')} AS cos
  FROM embeddings e JOIN q
    ON e.vec_id <> q.query_id AND e.label = q.q_label
)
SELECT query_id, q_label AS label, rank, vec_id, cos FROM (
  SELECT query_id, q_label, vec_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""



# ---------------------------------------------------------------------------
# v20 — quantization-tier recall table: macro recall@10 of the three
# compression tiers (SQ8 → PQ → binary Hamming) against the staged
# brute-force truth, in one query. This is the table a deployment reads
# to pick its memory/recall point: v09 keeps 64 bytes/vector, v11 keeps
# 8, v18 keeps 6 — and this query prices what each gives up. All three
# approx sides ride their staged index tables; the truth set is staged
# too, so the comparison never rescans the corpus.
# ---------------------------------------------------------------------------
def v20_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _stage_cached

    exact = _exact_topk_truth(spark, sf_dir)
    methods = (
        ("binary", v18_ann_hamming_topk),
        ("pq", v11_ann_pq_topk),
        ("sq8", v09_ann_sq8_topk),
    )
    parts = []
    for mname, fn in methods:
        # Each tier's top-k result stages once per corpus (the
        # _exact_topk_truth discipline: evaluation reads the MATERIALIZED
        # result table, it doesn't re-run the search); the tier queries
        # themselves stay unstaged so the bench still prices each search.
        approx = _stage_cached(
            f"v20_{mname}_topk",
            sf_dir,
            lambda fn=fn: fn(spark, sf_dir).select("query_id", "vec_id"),
        )
        nq = approx.agg(F.count_distinct("query_id").alias("n_queries"))
        hits = approx.join(exact, ["query_id", "vec_id"], "left_semi").agg(
            F.count(F.lit(1)).alias("total_hits")
        )
        parts.append(
            nq.crossJoin(hits).select(
                F.lit(mname).alias("method"),
                F.col("n_queries").cast("long").alias("n_queries"),
                F.col("total_hits").cast("long").alias("total_hits"),
                (
                    F.expr(f"total_hits * 1000000 div (n_queries * {TOP_K})")
                    / F.lit(1e6)
                ).alias("macro_recall"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def _oracle_v20() -> str:
    blocks = []
    for mname, oracle in (
        ("binary", _oracle_v18()),
        ("pq", _oracle_v11()),
        ("sq8", ORACLE_V09),
    ):
        blocks.append(
            f"""
SELECT '{mname}' AS method,
       CAST(COUNT(DISTINCT a.query_id) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS total_hits,
       SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         * 1000000 // (COUNT(DISTINCT a.query_id) * {TOP_K}) / 1e6 AS macro_recall
FROM (SELECT query_id, vec_id FROM ({oracle})) a
LEFT JOIN (SELECT query_id, vec_id FROM ({ORACLE_V02})) e
  ON a.query_id = e.query_id AND a.vec_id = e.vec_id"""
        )
    return "\nUNION ALL\n".join(blocks)


# ---------------------------------------------------------------------------
# v21 — mean-reciprocal-rank evaluation of the IVF path: where does each
# query's TRUE nearest neighbor (brute-force rank 1) land in v03's
# ranked list? Recall@k (v10) treats all k slots equally; MRR prices the
# ORDER — an index that buries the true neighbor at rank 9 scores 0.11,
# not 1.0. Both sides are already |queries|×k tables (the staged truth
# set and the staged IVF index), so the eval never rescans the corpus.
# ---------------------------------------------------------------------------
def v21_ann_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth1 = (
        _exact_topk_truth(spark, sf_dir)
        .filter(F.col("rank") == 1)
        .select("query_id", F.col("vec_id").alias("true_vec_id"))
    )
    approx = v03_ann_ivf_topk(spark, sf_dir).select(
        F.col("query_id").alias("a_query_id"),
        F.col("rank").alias("a_rank"),
        "vec_id",
    )
    joined = truth1.join(
        approx,
        (F.col("query_id") == F.col("a_query_id"))
        & (F.col("true_vec_id") == F.col("vec_id")),
        "left",
    )
    return joined.select(
        "query_id",
        "true_vec_id",
        F.coalesce(F.col("a_rank"), F.lit(0)).cast("int").alias("found_rank"),
        (
            F.coalesce(F.expr("1000000 div a_rank"), F.lit(0)) / F.lit(1e6)
        ).alias("reciprocal_rank"),
    )


ORACLE_V21 = f"""
WITH truth1 AS (
  SELECT query_id, vec_id AS true_vec_id FROM ({ORACLE_V02}) WHERE rank = 1
),
approx AS (SELECT query_id, rank, vec_id FROM ({ORACLE_V03}))
SELECT t.query_id, t.true_vec_id,
       CAST(COALESCE(a.rank, 0) AS INTEGER) AS found_rank,
       COALESCE(1000000 // a.rank, 0) / 1e6 AS reciprocal_rank
FROM truth1 t
LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.vec_id = t.true_vec_id
"""


# ---------------------------------------------------------------------------
# v22 — IVF cell quality (simplified silhouette): per cell, the mean
# cosine of members to their OWN centroid vs the best cosine to any OTHER
# centroid; separation = mean(own − best-other). Negative separation
# marks cells whose members mostly belong elsewhere — the diagnostic that
# says "retrain the codebook" before recall quietly degrades at scale.
#
# Plan: the staged assigned-corpus table crossed with the ONE broadcast
# packed-centroid row; own/other scores are array expressions inside a
# single projection (map-side, corpus never reshuffled); the only shuffle
# is the k-group aggregate. Decimal-exact means (the davg recipe).
# ---------------------------------------------------------------------------
def v22_ivf_cell_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    _emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    cos_arr = F.transform(
        F.col("cells"),
        lambda c: F.struct(
            _cell_cos("embedding", c).alias("cos"), c.cell_id.alias("cell_id")
        ),
    )
    scored = (
        assigned.crossJoin(F.broadcast(packed))
        .withColumn("_row_norm", norm(F.col("embedding")))
        .withColumn("arr", cos_arr)
        .select(
            "cell_id",
            F.element_at(
                F.filter(F.col("arr"), lambda s: s.cell_id == F.col("cell_id")), 1
            ).cos.alias("own_cos"),
            F.array_max(
                F.transform(
                    F.filter(F.col("arr"), lambda s: s.cell_id != F.col("cell_id")),
                    lambda s: s.cos,
                )
            ).alias("other_cos"),
        )
    )
    # exact integer micros: the 6dp cosines are k/1e6 exact, so recover
    # the integers, sum as BIGINT, truncating DIV (t09-safe — no float
    # ROUND in any checked column)
    return scored.groupBy("cell_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        (
            F.expr("SUM(CAST(ROUND(own_cos * 1000000) AS BIGINT)) DIV COUNT(1)")
            / F.lit(1e6)
        ).alias("avg_own_cos"),
        (
            F.expr("SUM(CAST(ROUND(other_cos * 1000000) AS BIGINT)) DIV COUNT(1)")
            / F.lit(1e6)
        ).alias("avg_other_cos"),
        (
            F.expr(
                "SUM(CAST(ROUND(own_cos * 1000000) AS BIGINT)"
                " - CAST(ROUND(other_cos * 1000000) AS BIGINT)) DIV COUNT(1)"
            )
            / F.lit(1e6)
        ).alias("separation"),
    )


ORACLE_V22 = f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
scored AS (
  SELECT e.vec_id, c.cell_id, {sql_cosine('e.embedding', 'c.c_emb')} AS cos
  FROM embeddings e CROSS JOIN c
),
assigned AS (
  SELECT vec_id, cell_id AS own_cell, cos AS own_cos FROM (
    SELECT vec_id, cell_id, cos,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cell_id ASC) AS r
    FROM scored
  ) WHERE r = 1
),
other AS (
  SELECT s.vec_id, MAX(s.cos) AS other_cos
  FROM scored s JOIN assigned a
    ON s.vec_id = a.vec_id AND s.cell_id <> a.own_cell
  GROUP BY s.vec_id
)
SELECT a.own_cell AS cell_id,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       SUM(CAST(ROUND(a.own_cos * 1000000) AS BIGINT))
         // COUNT(*) / 1e6 AS avg_own_cos,
       SUM(CAST(ROUND(o.other_cos * 1000000) AS BIGINT))
         // COUNT(*) / 1e6 AS avg_other_cos,
       SUM(CAST(ROUND(a.own_cos * 1000000) AS BIGINT)
           - CAST(ROUND(o.other_cos * 1000000) AS BIGINT))
         // COUNT(*) / 1e6 AS separation
FROM assigned a JOIN other o ON a.vec_id = o.vec_id
GROUP BY a.own_cell
"""


# ---------------------------------------------------------------------------
# v23 — per-dimension embedding statistics: mean, variance (exact decimal
# sums of x and x², the davg recipe), min/max, and the share of total
# variance each dimension carries. The index-design profile read before
# choosing PQ subspace splits or Matryoshka truncation points (a
# dimension with ~0 variance is free to drop; v15 prices the recall cost
# of the cut this table suggests).
#
# Scale: posexplode fans each vector into (dim, val) rows — heavier rows
# than the corpus scan but still one pass; the aggregate reduces to
# exactly 64 groups map-side, and the variance-share window runs over
# the 64-row result.
# ---------------------------------------------------------------------------
def v23_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings").select("embedding"), spark)
    dec = "decimal(28,12)"
    by_dim = (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .withColumn("val", F.col("val").cast("double"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("val").cast(dec)).alias("s1"),
            F.sum((F.col("val") * F.col("val")).cast(dec)).alias("s2"),
            floor_scaled(F.min("val"), 6).alias("min_val"),
            floor_scaled(F.max("val"), 6).alias("max_val"),
        )
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    stats = by_dim.select(
        "dim",
        floor_scaled(mean, 6).alias("mean_val"),
        floor_scaled(var, 6).alias("variance"),
        "min_val",
        "max_val",
    )
    # var_share as exact integer micros of the published 6dp variances:
    # recover each variance's integer k_i (ROUND fixes the *1e6 ulp),
    # micros = k_i * 1e6 DIV sum(k) — a float-free ratio (t09-safe)
    return (
        stats.withColumn("_k", F.expr("CAST(ROUND(variance * 1000000) AS BIGINT)"))
        .withColumn(
            "var_share",
            F.expr("_k * 1000000 div sum(_k) over ()") / F.lit(1e6),
        )
        .drop("_k")
    )


ORACLE_V23 = """
WITH vals AS (
  SELECT d.i - 1 AS dim, CAST(embedding[d.i] AS DOUBLE) AS val
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS d(i)
),
by_dim AS (
  SELECT dim, COUNT(*) AS n,
         SUM(CAST(val AS DECIMAL(28,12))) AS s1,
         SUM(CAST(val * val AS DECIMAL(28,12))) AS s2,
         FLOOR(MIN(val) * 1000000.0) / 1000000.0 + 0.0 AS min_val,
         FLOOR(MAX(val) * 1000000.0) / 1000000.0 + 0.0 AS max_val
  FROM vals GROUP BY dim
),
stats AS (
  SELECT CAST(dim AS INTEGER) AS dim,
         FLOOR((CAST(s1 AS DOUBLE) / n) * 1000000.0) / 1000000.0 + 0.0 AS mean_val,
         FLOOR((CAST(s2 AS DOUBLE) / n
                - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
               * 1000000.0) / 1000000.0 + 0.0 AS variance,
         min_val, max_val
  FROM by_dim
)
SELECT dim, mean_val, variance, min_val, max_val,
       CAST(ROUND(variance * 1000000) AS BIGINT) * 1000000
         // SUM(CAST(ROUND(variance * 1000000) AS BIGINT)) OVER () / 1e6
         AS var_share
FROM stats
"""


# ---------------------------------------------------------------------------
# v24 — embedding drift detection: split the corpus into two deterministic
# halves (vec_id parity — the stand-in for "last month vs this month"),
# compute per-label mean embeddings for each half (the v04 recipe:
# exact-decimal sums, 6-decimal rounding), and report per label the
# cosine between the two half-centroids plus the largest per-dimension
# shift. The monitoring query that catches a retrained/upgraded encoder
# silently rotating the space before ANN recall decays.
#
# Scale: one posexplode pass → a |labels|×2×dims aggregate (map-side
# combinable); everything after runs on that tiny table. No corpus
# re-shuffle, no pairwise work.
# ---------------------------------------------------------------------------
def v24_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings"), spark)
    exploded = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    means = exploded.groupBy("label", "half", "dim").agg(
        floor_scaled(
            F.sum(F.col("val").cast("double").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    h0 = means.filter(F.col("half") == 0).select(
        "label", "dim", F.col("m").alias("m0"), F.col("n").alias("n0")
    )
    h1 = means.filter(F.col("half") == 1).select(
        "label", "dim", F.col("m").alias("m1"), F.col("n").alias("n1")
    )
    dec = "decimal(28,14)"
    joined = h0.join(h1, ["label", "dim"])
    return (
        joined.groupBy("label")
        .agg(
            F.max("n0").cast("long").alias("n_half0"),
            F.max("n1").cast("long").alias("n_half1"),
            F.sum((F.col("m0") * F.col("m1")).cast(dec)).alias("dot"),
            F.sum((F.col("m0") * F.col("m0")).cast(dec)).alias("s0"),
            F.sum((F.col("m1") * F.col("m1")).cast(dec)).alias("s1"),
            F.max(
                F.abs(
                    F.expr("CAST(ROUND(m0 * 1000000) AS BIGINT)")
                    - F.expr("CAST(ROUND(m1 * 1000000) AS BIGINT)")
                )
            ).alias("max_shift_k"),
        )
        .select(
            "label",
            "n_half0",
            "n_half1",
            floor_scaled(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("s0").cast("double"))
                    * F.sqrt(F.col("s1").cast("double"))
                ),
                6,
            ).alias("centroid_cos"),
            # the means are 6dp grid doubles: recover integers, exact diff
            (F.col("max_shift_k") / F.lit(1e6)).alias("max_dim_shift"),
        )
    )


ORACLE_V24 = """
WITH means AS (
  SELECT label, vec_id % 2 AS half, CAST(d.i - 1 AS INTEGER) AS dim,
         FLOOR((CAST(SUM(CAST(CAST(embedding[d.i] AS DOUBLE) AS DECIMAL(18,12)))
                     AS DOUBLE) / COUNT(*)) * 1000000.0) / 1000000.0 + 0.0 AS m,
         COUNT(*) AS n
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS d(i)
  GROUP BY label, half, dim
),
joined AS (
  SELECT h0.label, h0.dim, h0.m AS m0, h1.m AS m1, h0.n AS n0, h1.n AS n1
  FROM means h0 JOIN means h1
    ON h0.label = h1.label AND h0.dim = h1.dim
  WHERE h0.half = 0 AND h1.half = 1
)
SELECT label,
       CAST(MAX(n0) AS BIGINT) AS n_half0,
       CAST(MAX(n1) AS BIGINT) AS n_half1,
       FLOOR((CAST(SUM(CAST(m0 * m1 AS DECIMAL(28,14))) AS DOUBLE)
              / (sqrt(CAST(SUM(CAST(m0 * m0 AS DECIMAL(28,14))) AS DOUBLE))
                 * sqrt(CAST(SUM(CAST(m1 * m1 AS DECIMAL(28,14))) AS DOUBLE))))
             * 1000000.0) / 1000000.0 + 0.0 AS centroid_cos,
       MAX(ABS(CAST(ROUND(m0 * 1000000) AS BIGINT)
               - CAST(ROUND(m1 * 1000000) AS BIGINT))) / 1e6 AS max_dim_shift
FROM joined GROUP BY label
"""


# ---------------------------------------------------------------------------
# v25 — label affinity matrix: cosine between every pair of label
# centroids (the v04 means) — the class-geometry table read before
# trusting v17's k-NN accuracy or choosing which labels can share an IVF
# cell. High off-diagonal affinity = labels the ANN index will confuse.
#
# Scale: centroids are a |labels|×dims aggregate (one corpus pass,
# map-side combinable); the pairwise step runs entirely on that tiny
# table. Decimal-exact dot/norm sums, one rounded division.
# ---------------------------------------------------------------------------
def v25_label_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.extended import v04_label_centroids

    cents = v04_label_centroids(spark, sf_dir).select("label", "dim", "mean_val")
    a = cents.select(
        F.col("label").alias("label_a"), "dim", F.col("mean_val").alias("ma")
    )
    b = cents.select(
        F.col("label").alias("label_b"), "dim", F.col("mean_val").alias("mb")
    )
    dec = "decimal(28,14)"
    return (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum((F.col("ma") * F.col("mb")).cast(dec)).alias("dot"),
            F.sum((F.col("ma") * F.col("ma")).cast(dec)).alias("sa"),
            F.sum((F.col("mb") * F.col("mb")).cast(dec)).alias("sb"),
        )
        .select(
            "label_a",
            "label_b",
            floor_scaled(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("sa").cast("double"))
                    * F.sqrt(F.col("sb").cast("double"))
                ),
                6,
            ).alias("centroid_cos"),
        )
    )


ORACLE_V25 = """
WITH cents AS (
  SELECT label, CAST(d.i - 1 AS INTEGER) AS dim,
         FLOOR((CAST(SUM(CAST(CAST(embedding[d.i] AS DOUBLE) AS DECIMAL(18,12)))
                     AS DOUBLE) / COUNT(*)) * 1000000.0) / 1000000.0 + 0.0 AS m
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS d(i)
  GROUP BY label, d.i
)
SELECT a.label AS label_a, b.label AS label_b,
       FLOOR((CAST(SUM(CAST(a.m * b.m AS DECIMAL(28,14))) AS DOUBLE)
              / (sqrt(CAST(SUM(CAST(a.m * a.m AS DECIMAL(28,14))) AS DOUBLE))
                 * sqrt(CAST(SUM(CAST(b.m * b.m AS DECIMAL(28,14))) AS DOUBLE))))
             * 1000000.0) / 1000000.0 + 0.0 AS centroid_cos
FROM cents a JOIN cents b ON a.dim = b.dim AND a.label < b.label
GROUP BY a.label, b.label
"""


# ---------------------------------------------------------------------------
# v26 — IVF cell balance: occupancy per cell plus the imbalance factor
# (max/mean occupancy). v22 grades cell QUALITY (cohesion); v26 grades
# cell BALANCE — a skewed cell re-quadratizes SemDeDup (v12's documented
# caveat) and makes probe latency unpredictable, so this is the
# retrain-trigger metric an index operator watches alongside recall.
#
# Scale: one count aggregate over the staged assigned-corpus table
# (k rows out); the summary stats are a second aggregate over those k
# rows. Imbalance is a ratio of exact integers, rounded once.
# ---------------------------------------------------------------------------
def v26_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    _emb, _packed, assigned = _stride_ivf_index(spark, sf_dir)
    occ = assigned.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_vectors"))
    return occ.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n_vectors").cast("long").alias("n_vectors_total"),
        F.min("n_vectors").cast("long").alias("min_occupancy"),
        F.max("n_vectors").cast("long").alias("max_occupancy"),
        (
            F.expr(
                "MAX(n_vectors) * COUNT(1) * 1000000 div SUM(n_vectors)"
            )
            / F.lit(1e6)
        ).alias("imbalance_factor"),
    )


ORACLE_V26 = f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS r
    FROM embeddings e CROSS JOIN c
  ) WHERE r = 1
),
occ AS (SELECT cell_id, COUNT(*) AS n_vectors FROM assigned GROUP BY cell_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n_vectors) AS BIGINT) AS n_vectors_total,
       CAST(MIN(n_vectors) AS BIGINT) AS min_occupancy,
       CAST(MAX(n_vectors) AS BIGINT) AS max_occupancy,
       MAX(n_vectors) * COUNT(*) * 1000000 // SUM(n_vectors) / 1e6
         AS imbalance_factor
FROM occ
"""


QUERIES = {
    "v01_neardup_cosine": v01_neardup_cosine,
    "v02_ann_bruteforce_topk": v02_ann_bruteforce_topk,
    "v03_ann_ivf_topk": v03_ann_ivf_topk,
    "v05_ann_pandas_udf_topk": v05_ann_pandas_udf_topk,
    "v06_l2_normalize": v06_l2_normalize,
    "v07_ann_kmeans_topk": v07_ann_kmeans_topk,
    "v08_neardup_srp_lsh": v08_neardup_srp_lsh,
    "v09_ann_sq8_topk": v09_ann_sq8_topk,
    "v10_ann_recall_at_k": v10_ann_recall_at_k,
    "v11_ann_pq_topk": v11_ann_pq_topk,
    "v12_semdedup": v12_semdedup,
    "v13_cluster_representatives": v13_cluster_representatives,
    "v14_ann_ivf_pq_topk": v14_ann_ivf_pq_topk,
    "v15_matryoshka_recall": v15_matryoshka_recall,
    "v16_nprobe_recall_curve": v16_nprobe_recall_curve,
    "v17_knn_label_accuracy": v17_knn_label_accuracy,
    "v18_ann_hamming_topk": v18_ann_hamming_topk,
    "v19_ann_filtered_topk": v19_ann_filtered_topk,
    "v20_quantization_recall": v20_quantization_recall,
    "v21_ann_mrr_eval": v21_ann_mrr_eval,
    "v22_ivf_cell_quality": v22_ivf_cell_quality,
    "v23_dim_stats": v23_dim_stats,
    "v24_embedding_drift": v24_embedding_drift,
    "v25_label_affinity": v25_label_affinity,
    "v26_ivf_cell_balance": v26_ivf_cell_balance,
}

ORACLES = {
    "v01_neardup_cosine": ORACLE_V01,
    "v02_ann_bruteforce_topk": ORACLE_V02,
    "v03_ann_ivf_topk": ORACLE_V03,
    "v05_ann_pandas_udf_topk": ORACLE_V05,
    "v06_l2_normalize": ORACLE_V06,
    "v07_ann_kmeans_topk": _oracle_v07(),
    "v08_neardup_srp_lsh": _oracle_v08(),
    "v09_ann_sq8_topk": ORACLE_V09,
    "v10_ann_recall_at_k": ORACLE_V10,
    "v11_ann_pq_topk": _oracle_v11(),
    "v12_semdedup": ORACLE_V12,
    "v13_cluster_representatives": ORACLE_V13,
    "v14_ann_ivf_pq_topk": _oracle_v14(),
    "v15_matryoshka_recall": ORACLE_V15,
    "v16_nprobe_recall_curve": _oracle_v16(),
    "v17_knn_label_accuracy": ORACLE_V17,
    "v18_ann_hamming_topk": _oracle_v18(),
    "v19_ann_filtered_topk": ORACLE_V19,
    "v20_quantization_recall": _oracle_v20(),
    "v21_ann_mrr_eval": ORACLE_V21,
    "v22_ivf_cell_quality": ORACLE_V22,
    "v23_dim_stats": ORACLE_V23,
    "v24_embedding_drift": ORACLE_V24,
    "v25_label_affinity": ORACLE_V25,
    "v26_ivf_cell_balance": ORACLE_V26,
}


# ---------------------------------------------------------------------------
# v27 — incremental IVF index maintenance: assign a NEW batch of vectors
# to the EXISTING staged index (centroids unchanged — the production
# incremental-add path; re-clustering is a separate, rarer event) and
# verify the invariant that makes incremental adds safe: merged per-cell
# counts must equal a from-scratch rebuild over base ∪ batch with the
# same centroids. The batch re-enters every 7th≡3 vector under new ids,
# so every cell's delta is deterministic.
#
# Scale: the new batch is assigned map-side against the broadcast packed
# centroid row (the v03 argmax — the batch is never shuffled, the BASE
# CORPUS is never rescanned: that is the point of incremental add); only
# per-cell count aggregates shuffle (≤ |cells| rows). The rebuild side
# exists as the verdict column — a real pipeline skips it.
# ---------------------------------------------------------------------------
V27_BATCH_MOD, V27_BATCH_REM, V27_ID_OFFSET = 7, 3, 100_000


def v27_ivf_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    base = emb.select("vec_id", "embedding")
    batch = base.filter(F.col("vec_id") % V27_BATCH_MOD == V27_BATCH_REM).select(
        (F.col("vec_id") + V27_ID_OFFSET).alias("vec_id"), "embedding"
    )
    new_assigned = _with_nearest_cell(batch, packed, "embedding").select(
        "vec_id", "cell_id"
    )
    before = assigned.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_before"))
    added = new_assigned.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_added"))
    merged = (
        before.join(added, "cell_id", "full_outer")
        .select(
            "cell_id",
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_added", F.lit(0)).alias("n_added"),
        )
        .withColumn("n_after", F.col("n_before") + F.col("n_added"))
    )
    rebuilt = (
        _with_nearest_cell(base.unionByName(batch), packed, "embedding")
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_rebuild"))
    )
    return merged.join(rebuilt, "cell_id", "full_outer").select(
        F.col("cell_id").cast("long").alias("cell_id"),
        F.col("n_before").cast("long").alias("n_before"),
        F.col("n_added").cast("long").alias("n_added"),
        F.col("n_after").cast("long").alias("n_after"),
        (F.col("n_after") == F.coalesce("n_rebuild", F.lit(0))).alias("rebuild_match"),
    )


def _oracle_v27() -> str:
    def assign(src: str) -> str:
        return f"""
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM {src} e CROSS JOIN c
  ) WHERE c_rank = 1"""

    return f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
base AS (SELECT vec_id, embedding FROM embeddings),
batch AS (SELECT vec_id + {V27_ID_OFFSET} AS vec_id, embedding FROM embeddings
          WHERE vec_id % {V27_BATCH_MOD} = {V27_BATCH_REM}),
unioned AS (SELECT * FROM base UNION ALL SELECT * FROM batch),
assign_base AS ({assign('base')}),
assign_batch AS ({assign('batch')}),
assign_all AS ({assign('unioned')}),
before AS (SELECT cell_id, COUNT(*) AS n_before FROM assign_base GROUP BY cell_id),
added AS (SELECT cell_id, COUNT(*) AS n_added FROM assign_batch GROUP BY cell_id),
merged AS (
  SELECT COALESCE(b.cell_id, a.cell_id) AS cell_id,
         COALESCE(b.n_before, 0) AS n_before,
         COALESCE(a.n_added, 0) AS n_added,
         COALESCE(b.n_before, 0) + COALESCE(a.n_added, 0) AS n_after
  FROM before b FULL OUTER JOIN added a ON b.cell_id = a.cell_id
),
rebuilt AS (SELECT cell_id, COUNT(*) AS n_rebuild FROM assign_all GROUP BY cell_id)
SELECT CAST(COALESCE(m.cell_id, r.cell_id) AS BIGINT) AS cell_id,
       CAST(COALESCE(m.n_before, 0) AS BIGINT) AS n_before,
       CAST(COALESCE(m.n_added, 0) AS BIGINT) AS n_added,
       CAST(COALESCE(m.n_after, 0) AS BIGINT) AS n_after,
       COALESCE(m.n_after, 0) = COALESCE(r.n_rebuild, 0) AS rebuild_match
FROM merged m FULL OUTER JOIN rebuilt r ON m.cell_id = r.cell_id
"""


QUERIES["v27_ivf_incremental_add"] = v27_ivf_incremental_add
ORACLES["v27_ivf_incremental_add"] = _oracle_v27()


# ---------------------------------------------------------------------------
# v28 — one distributed Lloyd iteration over the staged IVF index: the
# per-cell EXACT mean of member vectors (decimal-summed per dimension —
# the davg recipe, so Spark's and DuckDB's float addition order cannot
# diverge) and each centroid's drift to its recomputed mean. This is the
# k-means TRAINING step as a declarative plan — the update half of the
# assign/update loop (v03 owns assign), with drift as the convergence
# signal a re-clustering scheduler reads.
#
# Scale: posexplode fans members into (cell, dim, val) rows — one corpus
# pass; the aggregate reduces to |cells|×64 groups with map-side decimal
# partial sums; the drift sum runs over 64 rows per cell. No collect, no
# iteration here — a driver loop would chain this plan with localCheckpoint
# per round (the t45 PageRank discipline).
# ---------------------------------------------------------------------------
def v28_kmeans_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    dims = assigned.select(
        "cell_id", F.posexplode("embedding").alias("dim", "val")
    )
    means = dims.groupBy("cell_id", "dim").agg(
        (F.sum(F.col("val").cast("decimal(18,10)")).cast("double") / F.count(F.lit(1))).alias(
            "new_val"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    old = _staged_stride_centroids(sf_dir, emb).select(
        "cell_id",
        F.posexplode("c_emb").alias("dim", "old_val"),
    )
    per_dim = means.join(old, ["cell_id", "dim"]).select(
        "cell_id",
        "n",
        ((F.col("new_val") - F.col("old_val")) * (F.col("new_val") - F.col("old_val")))
        .cast("decimal(30,15)")
        .alias("sq"),
    )
    return (
        per_dim.groupBy("cell_id")
        .agg(
            F.max("n").alias("n_members"),
            floor_scaled(F.sqrt(F.sum("sq").cast("double")), 6).alias("centroid_drift"),
        )
        .select(
            F.col("cell_id").cast("long").alias("cell_id"),
            F.col("n_members").cast("long").alias("n_members"),
            "centroid_drift",
        )
    )


def _oracle_v28() -> str:
    return f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
dims AS (
  SELECT a.cell_id, CAST(d.i - 1 AS INTEGER) AS dim, a.embedding[d.i] AS val
  FROM assigned a, unnest(generate_series(1, len(a.embedding))) AS d(i)
),
means AS (
  SELECT cell_id, dim,
         CAST(SUM(CAST(val AS DECIMAL(18,10))) AS DOUBLE) / COUNT(*) AS new_val,
         COUNT(*) AS n
  FROM dims GROUP BY cell_id, dim
),
old AS (
  SELECT cell_id, CAST(d.i - 1 AS INTEGER) AS dim, c_emb[d.i] AS old_val
  FROM c, unnest(generate_series(1, len(c_emb))) AS d(i)
)
SELECT CAST(m.cell_id AS BIGINT) AS cell_id,
       CAST(MAX(m.n) AS BIGINT) AS n_members,
       FLOOR(SQRT(CAST(SUM(CAST((m.new_val - o.old_val) * (m.new_val - o.old_val)
                               AS DECIMAL(30,15))) AS DOUBLE))
             * 1000000.0) / 1000000.0 + 0.0 AS centroid_drift
FROM means m JOIN old o ON m.cell_id = o.cell_id AND m.dim = o.dim
GROUP BY m.cell_id
"""


QUERIES["v28_kmeans_iteration"] = v28_kmeans_iteration
ORACLES["v28_kmeans_iteration"] = _oracle_v28()


# ---------------------------------------------------------------------------
# v29 — embedding outlier worklist: the V29_K vectors FURTHEST from their
# own IVF centroid (lowest own-cell cosine) — the mislabeled/noise/OOD
# review queue an embedding-corpus curation pass works through (v12
# removes semantic DUPLICATES; v29 surfaces semantic ORPHANS).
#
# Scale: rides the staged assignment; own-cell cosine is a map-side
# broadcast lookup (v22's shape); the bottom-k compiles to
# TakeOrderedAndProject — per-partition partial top-k, never a global
# window sort (a percent_rank over the corpus would single-partition).
# ---------------------------------------------------------------------------
V29_K = 50


def v29_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    cents = _staged_stride_centroids(sf_dir, emb)
    scored = assigned.join(F.broadcast(cents), "cell_id").select(
        "vec_id",
        "cell_id",
        cosine(F.col("embedding"), F.col("c_emb")).alias("own_cos"),
    )
    order_cols = [F.col("own_cos").asc(), F.col("vec_id").asc()]
    bottom = scored.orderBy(*order_cols).limit(V29_K)
    w = Window.orderBy(*order_cols)
    return bottom.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("int").alias("rank"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cell_id").cast("long").alias("cell_id"),
        "own_cos",
    )


def _oracle_v29() -> str:
    return f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
scored AS (
  SELECT a.vec_id, a.cell_id,
         {sql_cosine('a.embedding', 'c.c_emb')} AS own_cos
  FROM assigned a JOIN c USING (cell_id)
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY own_cos ASC, vec_id ASC) AS INTEGER)
         AS rank,
       vec_id, CAST(cell_id AS BIGINT) AS cell_id, own_cos
FROM scored
ORDER BY own_cos ASC, vec_id ASC
LIMIT {V29_K}
"""


QUERIES["v29_embedding_outliers"] = v29_embedding_outliers
ORACLES["v29_embedding_outliers"] = _oracle_v29()


# ---------------------------------------------------------------------------
# v30 — cross-modal retrieval with quality annotation: IVF top-k over
# the embeddings, each hit joined to its DOCUMENT row (vec_id ↔ doc_id —
# the "embedding column alongside the text column" layout a training
# pipeline stores) and annotated with the t09 quality bucket and source.
# The RAG-curation view: is retrieval surfacing high-quality text, or do
# low-quality documents dominate the neighborhoods? Also the only
# operator exercising the embeddings ⋈ documents cross-table join.
#
# Scale: retrieval is the staged-IVF path (never all-pairs); the hit set
# reduces to |queries|×k rows BEFORE joining documents, so the text table
# is probed by a tiny equi-join (AQE broadcasts the hit side), never
# scanned per query.
# ---------------------------------------------------------------------------
def v30_retrieval_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import t09_quality_score

    hits = _ivf_topk(spark, sf_dir, N_PROBE)
    quality = t09_quality_score(spark, sf_dir).select(
        F.col("doc_id").alias("vec_id"), "quality_bucket"
    )
    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    return (
        hits.join(quality, "vec_id")
        .join(docs, "vec_id")
        .select(
            "query_id",
            "rank",
            F.col("vec_id").cast("long").alias("vec_id"),
            "cos",
            "quality_bucket",
            "source",
        )
    )


def _oracle_v30() -> str:
    from .textstats import _oracle_t09

    return f"""
SELECT h.query_id, h.rank, CAST(h.vec_id AS BIGINT) AS vec_id, h.cos,
       q.quality_bucket, d.source
FROM ({_oracle_v03_probe(N_PROBE)}) h
JOIN ({_oracle_t09()}) q ON q.doc_id = h.vec_id
JOIN documents d ON d.doc_id = h.vec_id
"""


QUERIES["v30_retrieval_quality"] = v30_retrieval_quality
ORACLES["v30_retrieval_quality"] = _oracle_v30()


# ---------------------------------------------------------------------------
# v31 — incremental DELETE maintenance for the IVF index: v27's sibling
# on the remove side. Tombstoned vectors (a deletes table, modeled as
# vec_id % 9 == 4) are removed from the STAGED cell assignment with one
# anti-join — the base corpus is never re-embedded or re-assigned — and
# the per-cell occupancy after the delete is verified against a
# rebuild-from-scratch of the shrunken corpus (the v27 rebuild-
# equivalence verdict: incremental maintenance must be
# indistinguishable from a full rebuild).
#
# Scale: the staged assignment is probed once (anti-join on vec_id, a
# fixed-width key); per-cell counts are a (cell_id) aggregate with
# map-side combine. The rebuild arm exists only to produce the verdict
# and rides the same broadcast packed-centroid assignment as v03.
# ---------------------------------------------------------------------------
V31_DELETE_MOD, V31_DELETE_REM = 9, 4


def v31_ivf_delete_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    tomb = F.col("vec_id") % V31_DELETE_MOD == V31_DELETE_REM
    before = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(tomb.cast("long")).alias("n_deleted"),
    )
    # Incremental arm: drop tombstones from the standing assignment.
    after = (
        assigned.filter(~tomb)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    # Rebuild arm: re-assign the shrunken corpus from scratch (same
    # packed centroids — deletes never move centroids in plain IVF).
    rebuilt = (
        _with_nearest_cell(emb.filter(~tomb), packed, "embedding")
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_rebuild"))
    )
    return (
        before.join(after, "cell_id", "left")
        .join(rebuilt, "cell_id", "left")
        .select(
            F.col("cell_id").cast("long").alias("cell_id"),
            F.col("n_before").cast("long").alias("n_before"),
            F.col("n_deleted").cast("long").alias("n_deleted"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            (
                F.coalesce("n_after", F.lit(0)) == F.coalesce("n_rebuild", F.lit(0))
            ).alias("rebuild_match"),
        )
    )


ORACLE_V31 = f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
flagged AS (
  SELECT cell_id, vec_id,
         vec_id % {V31_DELETE_MOD} = {V31_DELETE_REM} AS is_tomb
  FROM assigned
)
SELECT cell_id,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(SUM(CASE WHEN is_tomb THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
       CAST(COUNT(*) - SUM(CASE WHEN is_tomb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after,
       TRUE AS rebuild_match
FROM flagged GROUP BY cell_id
"""


QUERIES["v31_ivf_delete_maintenance"] = v31_ivf_delete_maintenance
ORACLES["v31_ivf_delete_maintenance"] = ORACLE_V31


# ---------------------------------------------------------------------------
# v32 — maximum-inner-product search (MIPS) via the augmented-vector
# reduction (Bachrach et al. '14 / Shrivastava-Li): append
# sqrt(M^2 - |x|^2) to every corpus vector (M = max corpus norm) and a 0
# to every query; every augmented corpus vector then has norm exactly M,
# so cosine ranking over the augmented space IS inner-product ranking —
# the trick that lets any cosine-ANN index (our IVF/LSH family) serve
# dot-product retrieval (recommenders, un-normalized embedding scores).
# Since |x'| = M identically, the augmented cosine reduces algebraically
# to dot(q, x) / (|q| * M); we compute that closed form and report, per
# result, whether the cosine-path rank agrees with direct dot ranking
# (it can differ only by float rounding on near-ties — the verdict is
# computed identically in both engines).
#
# Scale: 1-row max-norm aggregate broadcasts; scoring is map-side
# against the broadcast query set; one (query_id) window shuffle ranks.
# ---------------------------------------------------------------------------
def v32_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    mx = emb.agg(F.max(norm(F.col("embedding"))).alias("m_norm"))
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .crossJoin(F.broadcast(mx))
        .withColumn("ip", dot(F.col("q_emb"), F.col("embedding")))
        .withColumn(
            "cos_aug", F.col("ip") / (norm(F.col("q_emb")) * F.col("m_norm"))
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cos_aug").desc(), F.col("vec_id").asc()
    )
    w_dot = Window.partitionBy("query_id").orderBy(
        F.col("ip").desc(), F.col("vec_id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w_cos)).withColumn(
        "rank_direct", F.row_number().over(w_dot)
    )
    return ranked.filter(F.col("rank") <= TOP_K).select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        "vec_id",
        floor_scaled(F.col("ip"), 6).alias("inner_product"),
        (F.col("rank") == F.col("rank_direct")).alias("agrees_with_direct"),
    )


ORACLE_V32 = f"""
WITH mx AS (SELECT MAX({sql_norm('embedding')}) AS m_norm FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_id, e.vec_id,
         {sql_dot('q.q_emb', 'e.embedding')} AS ip,
         {sql_dot('q.q_emb', 'e.embedding')}
           / ({sql_norm('q.q_emb')} * m_norm) AS cos_aug
  FROM embeddings e CROSS JOIN q CROSS JOIN mx
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, ip,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_aug DESC, vec_id ASC) AS rank,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ip DESC, vec_id ASC) AS rank_direct
  FROM scored
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
       FLOOR(ip * 1000000.0) / 1000000.0 + 0.0 AS inner_product,
       rank = rank_direct AS agrees_with_direct
FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES["v32_mips_topk"] = v32_mips_topk
ORACLES["v32_mips_topk"] = ORACLE_V32


# ---------------------------------------------------------------------------
# v33 — kNN GRAPH construction: the k nearest neighbors of EVERY corpus
# vector (not just a query workload) via the staged stride-IVF index —
# the build step behind semantic-dedup clustering (v12 consumes exactly
# such neighbor lists), NN-descent seeding, and graph-ANN indexes.
#
# Every vector multi-probes its N_PROBE nearest cells (map-side against
# the broadcast packed centroids), then candidates come from ONE
# (cell_id) equi-join against the staged assignment: per cell the work
# is |members| x |probers of that cell| — bounded by cell occupancy
# (audited by v26), NEVER the all-pairs corpus square that the guarded
# v01 ground-truth computes. The per-point top-k is a window partitioned
# by the probing vector.
#
# Scale: one corpus scan for probes (centroids broadcast — fixed k), the
# staged assignment reused from v03/v12/v14, one cell equi-join, one
# (query_id)-partitioned window. Output is exactly K x corpus rows.
# ---------------------------------------------------------------------------
V33_K = 5


def v33_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    allq = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probes = _with_probe_cells(allq, packed, N_PROBE)
    scored = (
        assigned.join(probes, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= V33_K)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("nbr_id"),
            "cos",
        )
    )


ORACLE_V33 = f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
probes AS (
  SELECT query_id, q_emb, cell_id FROM (
    SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS p_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE p_rank <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id,
         {sql_cosine('p.q_emb', 'a.embedding')} AS cos
  FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id AS nbr_id, cos FROM ranked WHERE rank <= {V33_K}
"""


QUERIES["v33_knn_graph"] = v33_knn_graph
ORACLES["v33_knn_graph"] = ORACLE_V33


# ---------------------------------------------------------------------------
# v34 — RANGE (radius / epsilon) search: every probed neighbor with
# cosine >= V34_RADIUS for the fixed query workload — FAISS's
# range_search next to v03's top-k.  Retrieval filtering and dedup
# candidate generation want "everything at least this similar", not a
# fixed k: near-duplicate queries have hundreds of matches where a
# top-10 truncates, and isolated queries have none where a top-10
# fabricates neighbors.
#
# Same staged stride-IVF index as v03/v33 (built once, queried many
# times); the probe set is the identical broadcast argmax.  The plan is
# strictly LIGHTER than top-k: the threshold is a per-row filter, so no
# per-query window sort exists at all — candidates stream map-side out
# of the one (cell_id) equi-join.  Reference parity: the reference has
# no vector ops; this extends the training-data-pipeline surface
# (SURVEY §2.8).
#
# Scale: corpus scanned once at index build (staged), queries probe
# N_PROBE cells, join work bounded by cell occupancy (v26 audits it),
# output bounded by true matches.  100-TB shape: identical.
# ---------------------------------------------------------------------------
V34_RADIUS = 0.30


def v34_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, packed, assigned = _stride_ivf_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probes = _with_probe_cells(queries, packed, N_PROBE)
    return (
        assigned.join(probes, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
        .filter(F.col("cos") >= V34_RADIUS)
        .select("query_id", "vec_id", "cos")
    )


ORACLE_V34 = f"""
WITH c AS (SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
           WHERE {SQL_CENTROID_COND}),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.embedding', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS c_rank
    FROM embeddings e CROSS JOIN c
  ) WHERE c_rank = 1
),
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {QUERY_STRIDE} = 0),
probes AS (
  SELECT query_id, q_emb, cell_id FROM (
    SELECT q.query_id, q.q_emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cosine('q.q_emb', 'c.c_emb')} DESC,
                                       c.cell_id ASC) AS p_rank
    FROM q CROSS JOIN c
  ) WHERE p_rank <= {N_PROBE}
)
SELECT p.query_id, a.vec_id,
       {sql_cosine('p.q_emb', 'a.embedding')} AS cos
FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
WHERE a.vec_id <> p.query_id
  AND {sql_cosine('p.q_emb', 'a.embedding')} >= {V34_RADIUS}
"""


QUERIES["v34_range_search"] = v34_range_search
ORACLES["v34_range_search"] = ORACLE_V34


# ---------------------------------------------------------------------------
# v35 — TWO-STAGE Matryoshka retrieval: stage 1 scores every corpus
# vector on the cheap 16-dim PREFIX (MRL_DIM — 1/4 the arithmetic and
# 1/4 the bytes a real deployment keeps hot) and keeps V35_CAND
# candidates; stage 2 re-ranks ONLY those candidates with the full
# 64-dim cosine. This is how Matryoshka embeddings are actually
# deployed (coarse-to-fine funnel) — v15 measures what the prefix alone
# loses; v35 runs the production funnel and reports what the RERANK
# recovers (recall vs the exact top-k, per query).
#
# Scale: stage 1 is the v02 map-side shape on quarter-width vectors
# (queries broadcast, corpus streamed once); stage 2 touches
# queries × V35_CAND rows only. The full-dim corpus join for rerank is
# a (vec_id) equi-join against the candidate list — candidate-sized,
# never a second corpus scan beyond the column fetch.
# ---------------------------------------------------------------------------
V35_CAND = 30


def v35_matryoshka_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark
    )
    emb_t = emb.select("vec_id", F.slice("embedding", 1, MRL_DIM).alias("e_t"))
    queries_t = emb_t.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e_t").alias("q_t")
    )
    coarse = emb_t.join(
        F.broadcast(queries_t), F.col("vec_id") != F.col("query_id")
    ).withColumn("cos_t", cosine(F.col("q_t"), F.col("e_t")))
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("cos_t").desc(), F.col("vec_id").asc()
    )
    cand = (
        coarse.withColumn("crank", F.row_number().over(w1))
        .filter(F.col("crank") <= V35_CAND)
        .select("query_id", "vec_id")
    )
    qfull = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    rerank = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    final = (
        rerank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    exact = _exact_topk_truth(spark, sf_dir)
    hits = (
        final.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        final.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_returned"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_returned").cast("long").alias("n_returned"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (
                F.expr(f"COALESCE(n_hits, 0) * 1000000 div {TOP_K}") / F.lit(1e6)
            ).alias("recall_twostage"),
        )
    )


ORACLE_V35 = f"""
WITH t AS (SELECT vec_id, embedding[1:{{MRL}}] AS e_t FROM embeddings),
qt AS (SELECT vec_id AS query_id, e_t AS q_t FROM t
       WHERE vec_id % {QUERY_STRIDE} = 0),
coarse AS (
  SELECT qt.query_id, t.vec_id, {sql_cosine('qt.q_t', 't.e_t')} AS cos_t
  FROM t JOIN qt ON t.vec_id <> qt.query_id
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_t DESC, vec_id ASC) AS crank
    FROM coarse
  ) WHERE crank <= {V35_CAND}
),
qf AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
       WHERE vec_id % {QUERY_STRIDE} = 0),
rerank AS (
  SELECT c.query_id, c.vec_id,
         {sql_cosine('qf.q_emb', 'e.embedding')} AS cos
  FROM cand c
  JOIN embeddings e ON c.vec_id = e.vec_id
  JOIN qf ON c.query_id = qf.query_id
),
final AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, vec_id ASC) AS rank
    FROM rerank
  ) WHERE rank <= {TOP_K}
),
exact AS (SELECT query_id, vec_id FROM ({ORACLE_V02})),
hits AS (
  SELECT f.query_id, COUNT(*) AS n_hits
  FROM final f JOIN exact e
    ON f.query_id = e.query_id AND f.vec_id = e.vec_id
  GROUP BY f.query_id
)
SELECT p.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_returned,
       CAST(COALESCE(ANY_VALUE(h.n_hits), 0) AS BIGINT) AS n_hits,
       COALESCE(ANY_VALUE(h.n_hits), 0) * 1000000 // {TOP_K} / 1e6
         AS recall_twostage
FROM final p LEFT JOIN hits h ON p.query_id = h.query_id
GROUP BY p.query_id
"""
ORACLE_V35 = ORACLE_V35.replace("{MRL}", str(MRL_DIM))


QUERIES["v35_matryoshka_twostage"] = v35_matryoshka_twostage
ORACLES["v35_matryoshka_twostage"] = ORACLE_V35


# ---------------------------------------------------------------------------
# v36 — embedding dimension health audit: per vector dimension, exact
# moment statistics and a DEAD-DIMENSION verdict — the collapsed/dead-
# dimension screen every embedding pipeline runs before indexing: a
# dimension the encoder zeroed (or a normalization bug froze) wastes
# index bytes and silently distorts every cosine distance.
#
# Cross-engine determinism: each float32 component rounds ONCE into an
# exact e8 integer (CAST to DECIMAL(18,8) x 1e8 — the v28 davg family);
# sums of v and v^2 fold exactly in decimal; the VARIANCE never touches
# a float: var_e16 = (n*sq - s^2) DIV n^2 is an exact nonnegative
# integer in 1e-16 units (a first draft emitted a double variance and
# two of 64 dims diverged by one ulp across engines — the
# DECIMAL(38,20)->double cast is not bit-portable; integers are). The
# mean stays a double (one fixed-order division, portable).
#
# Scale: posexplode fans the corpus into (dim, val) rows once; the
# aggregate reduces to exactly |dims| groups with map-side decimal
# partials — the shuffle carries <= 64 partial rows per task. No join,
# no window. Bounds at 1e9 vectors: n*sq <= 1e34, s^2 <= 1e34, both
# inside DECIMAL(38,0); var_e16 <= ~2e15 fits BIGINT.
# ---------------------------------------------------------------------------
V36_DEAD_VAR_E16 = 10_000_000_000  # 1e-6 in 1e-16 units


def v36_dimension_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    dims = table(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "val")
    ).withColumn(
        "v8",
        (F.col("val").cast("decimal(18,8)") * 100_000_000)
        .cast("decimal(38,0)"),
    )
    agg = dims.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v8").alias("s8"),
        F.sum(F.col("v8") * F.col("v8")).alias("sq16"),
        F.min("val").alias("mn"),
        F.max("val").alias("mx"),
    )
    var_e16 = F.expr("(n * sq16 - s8 * s8) DIV (CAST(n AS DECIMAL(38,0)) * n)")
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("long").alias("n_vectors"),
        # s8 is an exact integer sum: truncating decimal DIV (== DuckDB
        # HUGEINT //) gives the e8-units mean exactly — no float quotient
        (
            F.expr("s8 DIV CAST(n AS DECIMAL(38,0))").cast("long") / F.lit(1e8)
        ).alias("mean_val"),
        var_e16.cast("long").alias("var_e16"),
        floor_scaled(F.col("mn").cast("double"), 6).alias("min_val"),
        floor_scaled(F.col("mx").cast("double"), 6).alias("max_val"),
        (var_e16 < F.lit(V36_DEAD_VAR_E16)).alias("is_dead"),
    )


ORACLE_V36 = f"""
WITH dims AS (
  SELECT CAST(d.i - 1 AS INTEGER) AS dim, e.embedding[d.i] AS val,
         -- widen to DOUBLE first: DuckDB's direct FLOAT->DECIMAL cast
         -- rounds in float32 and disagrees with Spark's double path
         CAST(CAST(CAST(e.embedding[d.i] AS DOUBLE) AS DECIMAL(18,8))
              * 100000000 AS HUGEINT) AS v8
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS d(i)
),
agg AS (
  SELECT dim, COUNT(*) AS n,
         SUM(v8) AS s8, SUM(v8 * v8) AS sq16,
         MIN(val) AS mn, MAX(val) AS mx
  FROM dims GROUP BY dim
)
SELECT CAST(dim AS INTEGER) AS dim,
       CAST(n AS BIGINT) AS n_vectors,
       CAST(s8 // CAST(n AS HUGEINT) AS BIGINT) / 1e8 AS mean_val,
       CAST((n * sq16 - s8 * s8) // (CAST(n AS HUGEINT) * n) AS BIGINT)
         AS var_e16,
       FLOOR(CAST(mn AS DOUBLE) * 1000000.0) / 1000000.0 + 0.0 AS min_val,
       FLOOR(CAST(mx AS DOUBLE) * 1000000.0) / 1000000.0 + 0.0 AS max_val,
       (n * sq16 - s8 * s8) // (CAST(n AS HUGEINT) * n) < {V36_DEAD_VAR_E16}
         AS is_dead
FROM agg
"""


QUERIES["v36_dimension_health"] = v36_dimension_health
ORACLES["v36_dimension_health"] = ORACLE_V36


# ---------------------------------------------------------------------------
# v37 — hubness audit: the k-occurrence distribution of the kNN graph
# (Radovanovic et al. 2010). High-dimensional ANN indexes degrade when a
# few "hub" vectors appear in everyone's top-k (they dominate retrieval)
# while "antihubs" are never returned at all (they become unsearchable)
# — THE standing data-quality check on an embedding corpus before
# semdedup / retrieval decisions. N_k(x) = how many other vectors list x
# in their k nearest; this emits the full k-occurrence histogram with
# hub (N_k >= 2k) and antihub (N_k = 0) verdicts per bucket.
#
# Plan: rides v33's staged IVF kNN edges verbatim (equi-join candidate
# generation — never all-pairs), then ONE count aggregate keyed on
# nbr_id, a left join against the vector list for the zero bucket
# (AQE-broadcast of the in-degree side at small SF; both sides keyed on
# vec_id at scale), and a bounded histogram aggregate.
#
# Determinism: in-degrees and bucket counts are exact integers; cosine
# values never leave v33's rank stage.
# ---------------------------------------------------------------------------
def v37_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = v33_knn_graph(spark, sf_dir)
    indeg = edges.groupBy(F.col("nbr_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("k_occ")
    )
    vecs = table(spark, sf_dir, "embeddings").select("vec_id")
    occ = vecs.join(indeg, "vec_id", "left").select(
        F.coalesce("k_occ", F.lit(0)).cast("long").alias("k_occurrence")
    )
    return (
        occ.groupBy("k_occurrence")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .select(
            "k_occurrence",
            "n_vectors",
            (F.col("k_occurrence") >= 2 * V33_K).alias("is_hub_bucket"),
            (F.col("k_occurrence") == 0).alias("is_antihub_bucket"),
        )
    )


ORACLE_V37 = f"""
WITH knn AS ({ORACLE_V33}),
indeg AS (
  SELECT nbr_id AS vec_id, COUNT(*) AS k_occ FROM knn GROUP BY nbr_id
),
occ AS (
  SELECT COALESCE(i.k_occ, 0) AS k_occurrence
  FROM embeddings e LEFT JOIN indeg i USING (vec_id)
)
SELECT CAST(k_occurrence AS BIGINT) AS k_occurrence,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       k_occurrence >= {2 * V33_K} AS is_hub_bucket,
       k_occurrence = 0 AS is_antihub_bucket
FROM occ GROUP BY k_occurrence
"""


QUERIES["v37_hubness_audit"] = v37_hubness_audit
ORACLES["v37_hubness_audit"] = ORACLE_V37


# ---------------------------------------------------------------------------
# v38 — reciprocal-rank fusion (Cormack et al. SIGIR'09): the standard
# way production retrieval combines rankings from DIFFERENT scorers
# (cosine vs raw inner product here — the two rankings genuinely differ
# whenever corpus norms vary) without score calibration:
#
#   RRF(d) = Σ_lists 1 / (60 + rank_list(d)),  summed over the lists
#            that returned d in their top-k.
#
# The v-family had the pieces (v02 cosine ranking, v32 dot ranking,
# v10/v21 rank-quality metrics) but not the fusion step every hybrid
# retrieval stack runs; this closes it.
#
# Cross-engine determinism: each 1/(60+r) term is published as the exact
# integer micro 1000000 DIV (60+r) — both engines truncate identically,
# so the fused score is an exact BIGINT sum, never a float. Both input
# rankings order by expressions the engines compute bit-identically
# (cosine() / dot(), vec_id tiebreak), per the v02/v32 contracts.
#
# Scale: ONE corpus scan scores both lists map-side against the
# broadcast query set; all three windows (cos rank, ip rank, fused
# rank) share the (query_id) partitioning, so the plan pays ONE
# shuffle; candidates shrink to ≤ 2k per query before the fused rank.
# ---------------------------------------------------------------------------
RRF_K = 60  # the SIGIR'09 constant


def v38_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(table(spark, sf_dir, "embeddings").select("vec_id", "embedding"), spark)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
        .withColumn("ip", dot(F.col("q_emb"), F.col("embedding")))
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    w_ip = Window.partitionBy("query_id").orderBy(
        F.col("ip").desc(), F.col("vec_id").asc()
    )
    ranked = (
        scored.withColumn("r_cos", F.row_number().over(w_cos))
        .withColumn("r_ip", F.row_number().over(w_ip))
        .filter((F.col("r_cos") <= TOP_K) | (F.col("r_ip") <= TOP_K))
    )
    fused = ranked.withColumn(
        "rrf_micro",
        (
            F.when(
                F.col("r_cos") <= TOP_K,
                F.expr(f"1000000 DIV ({RRF_K} + r_cos)"),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("r_ip") <= TOP_K,
                F.expr(f"1000000 DIV ({RRF_K} + r_ip)"),
            ).otherwise(F.lit(0))
        ).cast("long"),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("vec_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= TOP_K)
        .select(
            "query_id",
            F.col("fused_rank").cast("int").alias("fused_rank"),
            "vec_id",
            "rrf_micro",
            F.when(F.col("r_cos") <= TOP_K, F.col("r_cos"))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("cos_rank"),
            F.when(F.col("r_ip") <= TOP_K, F.col("r_ip"))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("ip_rank"),
        )
    )


ORACLE_V38 = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
           WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_id, e.vec_id,
         {sql_cosine('q.q_emb', 'e.embedding')} AS cos,
         {sql_dot('q.q_emb', 'e.embedding')} AS ip
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS r_cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ip DESC, vec_id ASC) AS r_ip
  FROM scored
),
cand AS (
  SELECT query_id, vec_id, r_cos, r_ip,
         CAST(CASE WHEN r_cos <= {TOP_K}
                   THEN 1000000 // ({RRF_K} + r_cos) ELSE 0 END
            + CASE WHEN r_ip <= {TOP_K}
                   THEN 1000000 // ({RRF_K} + r_ip) ELSE 0 END AS BIGINT)
           AS rrf_micro
  FROM ranked WHERE r_cos <= {TOP_K} OR r_ip <= {TOP_K}
),
fused AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_micro DESC, vec_id ASC)
              AS fused_rank
  FROM cand
)
SELECT query_id, CAST(fused_rank AS INTEGER) AS fused_rank, vec_id, rrf_micro,
       CAST(CASE WHEN r_cos <= {TOP_K} THEN r_cos ELSE 0 END AS INTEGER)
         AS cos_rank,
       CAST(CASE WHEN r_ip <= {TOP_K} THEN r_ip ELSE 0 END AS INTEGER)
         AS ip_rank
FROM fused WHERE fused_rank <= {TOP_K}
"""


QUERIES["v38_reciprocal_rank_fusion"] = v38_reciprocal_rank_fusion
ORACLES["v38_reciprocal_rank_fusion"] = ORACLE_V38
