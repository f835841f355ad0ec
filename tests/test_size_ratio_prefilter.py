"""Round-12 LSH verify-stage prefilter (dedup.size_ratio_ok): the prune
must be LOSSLESS for the published Jaccard thresholds — it may only drop
candidate pairs that provably cannot clear the threshold.

Two layers:
- an exhaustive arithmetic check of the implication
  jac_micros >= T  =>  min(|A|,|B|)*1e6 >= T*max(|A|,|B|)
  over the full small-size grid (the exact integer forms both engines
  publish), so the filter can never eat a qualifying pair;
- an engine-level identity: t02's output with the prefilter equals the
  unpruned form's output on real data (the filter is plan-only).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


def _jac_micros(inter: int, union: int) -> int:
    return inter * 1_000_000 // union


@pytest.mark.parametrize("t_ppm", [100_000, 500_000, D.JACCARD_PPM, D.T52_PPM])
def test_ratio_prune_is_implied_by_threshold(t_ppm):
    """Exhaustive over sizes 1..60 and every feasible intersection: any
    pair whose exact jac_micros clears the threshold also passes the
    size-ratio predicate — no qualifying pair can ever be pruned."""
    for n_a in range(1, 61):
        for n_b in range(1, 61):
            lo, hi = min(n_a, n_b), max(n_a, n_b)
            passes_ratio = lo * 1_000_000 >= t_ppm * hi
            # max feasible jaccard at these sizes: inter = lo (subset)
            best = _jac_micros(lo, n_a + n_b - lo)
            if best >= t_ppm:
                assert passes_ratio, (n_a, n_b, t_ppm, best)
            # and when the ratio fails, NO feasible intersection clears it
            if not passes_ratio:
                for inter in range(0, lo + 1):
                    assert _jac_micros(inter, n_a + n_b - inter) < t_ppm


def test_union_size_arithmetic_identity():
    """|A∪B| = |A|+|B|−|A∩B| for distinct-element arrays — the identity
    the round-12 verify stages rely on instead of materializing
    array_union per pair."""
    import itertools

    universe = list(range(6))
    for r_a in range(4):
        for r_b in range(4):
            for a in itertools.combinations(universe, r_a):
                for b in itertools.combinations(universe, r_b):
                    sa, sb = set(a), set(b)
                    assert len(sa | sb) == len(sa) + len(sb) - len(sa & sb)


def test_t02_prefilter_is_plan_only(spark):
    """t02's final output with the size-ratio prune == the unpruned
    form's output (row-for-row), on real data."""
    D.unpersist_lsh_cache()
    sig = D._stage_cached(
        "t02",
        SF,
        lambda: D._with_shingles(
            D.table(spark, SF, "documents").select("doc_id", "text"), spark
        ).withColumn("sig", D.H.minhash_signature("shingles")),
    )

    def verified(cand):
        sh = sig.select("doc_id", "shingles")
        pairs = (
            cand.join(
                sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
                "doc_a",
            ).join(
                sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
                "doc_b",
            )
        )
        jac = F.expr(
            "CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 1000000"
            " div (size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
        )
        out = (
            pairs.withColumn("jaccard", jac / F.lit(1e6))
            .filter(F.col("jaccard") >= D.JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard")
        )
        return sorted(map(tuple, out.collect()))

    pruned = verified(D._banded_candidates(SF, sig, threshold_ppm=D.JACCARD_PPM))
    unpruned = verified(D._banded_candidates(SF, sig))
    assert pruned == unpruned and pruned  # identical and non-trivial
    D.unpersist_lsh_cache()
