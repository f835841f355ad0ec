"""Semantic invariants for the round-4 operators — properties the value-hash
oracle comparison can't express (monotonicity, plan equivalence across
physical strategies, fixed-size guarantees)."""

from __future__ import annotations

from pyspark.sql import functions as F

from squonk2_fastapi_ws_event_stream_spark.operators import corpus, events, similarity

from .conftest import SMOKE_SF_DIR


def test_funnel_is_monotone(spark):
    rows = {
        r["stage_idx"]: r
        for r in corpus.t35_filter_funnel(spark, SMOKE_SF_DIR).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4]
    for i in rows:
        assert 0 <= rows[i]["n_pass"] <= rows[i]["n_in"]
    for i in (2, 3, 4):
        # cumulative: stage i's population is stage i-1's survivors
        assert rows[i]["n_in"] == rows[i - 1]["n_pass"]


def test_dsir_bucket_table_is_fixed_size(spark):
    """The broadcast-justifying property: bucket ids live in
    [0, DSIR_BUCKETS) no matter the corpus."""
    docs = spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w")).select(
        corpus._bucket_col(F.col("w")).alias("b")
    )
    mm = toks.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] < corpus.DSIR_BUCKETS


def test_v16_recall_monotone_in_nprobe(spark):
    """More probed cells can only add candidates → per-query recall is
    non-decreasing in n_probe, and the top level equals v03's recall."""
    curve = similarity.v16_nprobe_recall_curve(spark, SMOKE_SF_DIR).collect()
    by_q: dict[int, dict[int, float]] = {}
    for r in curve:
        by_q.setdefault(r["query_id"], {})[r["n_probe"]] = r["recall"]
    assert by_q, "empty recall curve"
    for q, probes in by_q.items():
        assert sorted(probes) == list(similarity.V16_PROBES)
        vals = [probes[p] for p in sorted(probes)]
        assert vals == sorted(vals), f"recall not monotone for query {q}: {vals}"


def test_v16_top_level_matches_v03(spark):
    v03 = {
        (r["query_id"], r["vec_id"])
        for r in similarity.v03_ann_ivf_topk(spark, SMOKE_SF_DIR).collect()
    }
    top = {
        (r["query_id"], r["vec_id"])
        for r in similarity._ivf_topk(
            spark, SMOKE_SF_DIR, similarity.N_PROBE
        ).collect()
    }
    assert v03 == top


def test_e16_bucketed_equals_naive_range_join(spark):
    """The bucket-decomposed interval join must return exactly what the
    naive inequality join returns (the plans differ, the relation can't)."""
    got = {
        (r["event_id"], r["n_views_5m"], r["sum_view_value"])
        for r in events.e16_interval_join(spark, SMOKE_SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SMOKE_SF_DIR}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", F.col("user_id").alias("c_user"), F.unix_micros("ts").alias("c_us")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.unix_micros("ts").alias("v_us"),
        F.col("value").alias("v_value"),
    )
    naive = (
        clicks.join(
            views,
            (F.col("c_user") == F.col("v_user"))
            & (F.col("v_us") >= F.col("c_us") - events.E16_WINDOW_US)
            & (F.col("v_us") < F.col("c_us")),
            "left",
        )
        .groupBy("event_id")
        .agg(
            F.count("v_user").alias("n"),
            F.round(
                F.coalesce(
                    F.sum(F.col("v_value").cast("decimal(18,2)")).cast("double"),
                    F.lit(0.0),
                ),
                4,
            ).alias("s"),
        )
    )
    want = {(r["event_id"], r["n"], r["s"]) for r in naive.collect()}
    assert got == want


def test_t33_dup_fraction_bounds(spark):
    df = corpus.t33_dup_ngram_spans(spark, SMOKE_SF_DIR)
    bad = df.filter(
        (F.col("n_dup_grams") < 0)
        | (F.col("n_dup_grams") > F.col("n_grams"))
        | (F.col("dup_frac") < 0)
        | (F.col("dup_frac") > 1)
    ).count()
    assert bad == 0


def test_t36_zipf_slope_is_negative(spark):
    """Natural-language corpora obey Zipf: count decays with rank, so the
    quantized regression slope must be negative."""
    row = corpus.t36_zipf_stats(spark, SMOKE_SF_DIR).collect()[0]
    assert row["zipf_slope"] < 0
    assert row["n_types"] <= row["n_tokens"]
    assert 0 < row["top1_share"] <= 1


def test_e16_bucket_boundaries(spark):
    """Adversarial timestamps at exact multiples of the 5-minute bucket:
    the bucket decomposition must agree with the naive range join on every
    boundary case (view exactly at window edge, same-microsecond events,
    click on a bucket line)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1, 0, 0, 0)
    W = events.E16_WINDOW_US  # 300s in micros
    us = lambda s, micro=0: base + timedelta(seconds=s, microseconds=micro)
    rows = [
        # click exactly on a bucket boundary (t=600s)
        (1, 1, "click", us(600)),
        (2, 1, "view", us(300)),        # exactly -300s: INCLUDED (>=)
        (3, 1, "view", us(299, 999999)),  # just beyond window: excluded
        (4, 1, "view", us(600)),        # same instant as click: excluded (<)
        (5, 1, "view", us(599, 999999)),  # 1 micro before click: included
        # click mid-bucket, views straddling its two candidate buckets
        (6, 2, "click", us(450)),
        (7, 2, "view", us(150)),        # exactly -300s: included
        (8, 2, "view", us(149, 999999)),  # excluded
        (9, 2, "view", us(449)),        # included
        # different user: never joins
        (10, 3, "view", us(599)),
    ]
    df = spark.createDataFrame(
        [(i, u, t, ts, 1.0, "{}") for i, u, t, ts in rows],
        "event_id long, user_id long, event_type string, ts timestamp, value double, props string",
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        "event_id", "user_id",
        F.col("ts").alias("c_ts"), F.unix_micros("ts").alias("c_us"),
    )
    views = df.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.unix_micros("ts").alias("v_us"),
        F.col("value").alias("v_value"),
    )
    views_exp = views.select(
        "v_user", "v_us", "v_value",
        F.explode(F.array(
            F.floor(F.col("v_us") / W), F.floor(F.col("v_us") / W) + 1,
        )).alias("bucket"),
    )
    matched = (
        clicks.withColumn("c_bucket", F.floor(F.col("c_us") / W))
        .join(views_exp,
              (F.col("user_id") == F.col("v_user")) & (F.col("c_bucket") == F.col("bucket")))
        .filter((F.col("v_us") >= F.col("c_us") - W) & (F.col("v_us") < F.col("c_us")))
    )
    got = {
        (r["event_id"], r["n"]) for r in
        matched.groupBy("event_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {(1, 2), (6, 2)}  # clicks 1 and 6 each see exactly 2 views


# --- round-4 late additions -------------------------------------------------

def test_markov_rows_are_probabilities(spark):
    """e22: per source type the transition probabilities partition the
    outgoing mass — they sum to ~1 (6-decimal rounding per cell)."""
    rows = events.e22_event_type_markov(spark, SMOKE_SF_DIR).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r["p_next"] <= 1.0
        by_src[r["event_type"]] = by_src.get(r["event_type"], 0.0) + r["p_next"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, f"{src}: Σp = {total}"


def test_mrr_rank_consistency(spark):
    """v21: rr == 1/found_rank when found, 0 when absent; ranks ≤ TOP_K."""
    for r in similarity.v21_ann_mrr_eval(spark, SMOKE_SF_DIR).collect():
        if r["found_rank"] == 0:
            assert r["reciprocal_rank"] == 0.0
        else:
            assert 1 <= r["found_rank"] <= similarity.TOP_K
            assert abs(r["reciprocal_rank"] - round(1 / r["found_rank"], 6)) < 1e-9


def test_ivf_cell_quality_separation(spark):
    """v22: separation ≈ avg_own − avg_other (per-cell rounding only) and
    cosine means stay in [−1, 1]."""
    rows = similarity.v22_ivf_cell_quality(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["avg_own_cos"] <= 1.0
        assert -1.0 <= r["avg_other_cos"] <= 1.0
        assert abs(r["separation"] - (r["avg_own_cos"] - r["avg_other_cos"])) < 1e-4
        assert r["n_vectors"] >= 1


def test_sketch_estimates_bracket_exact(spark):
    """x13/x14: both estimators land within 50% of the exact count at
    smoke scale (KMV with k=64 ≈ exact when n ≲ k; LC with m=4096 ≫ n)."""
    from squonk2_fastapi_ws_event_stream_spark.plans import pipeline as pl

    kmv = pl.x13_kmv_distinct(spark, SMOKE_SF_DIR).collect()[0]
    assert kmv["k_kept"] <= pl.X13_K
    assert 0.5 * kmv["exact_users"] <= kmv["kmv_estimate"] <= 1.5 * kmv["exact_users"]
    lc = pl.x14_linear_counting(spark, SMOKE_SF_DIR).collect()[0]
    assert lc["occupied"] <= pl.X14_M
    assert 0.5 * lc["exact_users"] <= lc["lc_estimate"] <= 1.5 * lc["exact_users"]


def test_canonical_selection_picks_cluster_best(spark):
    """t42: the kept doc is a member of its cluster with the maximal
    (avg_bits, −doc_id) key, and n_removed is cluster_size − 1."""
    from squonk2_fastapi_ws_event_stream_spark.operators import graph, quality

    kept = {
        r["cluster_id"]: r
        for r in corpus.t42_canonical_selection(spark, SMOKE_SF_DIR).collect()
    }
    scores = {
        r["doc_id"]: r["avg_bits"]
        for r in quality.t22_unigram_logprob(spark, SMOKE_SF_DIR).collect()
    }
    # Selection runs over SCORED members only: t07's synthetic duplicate
    # ids (doc_id+10000, no documents row) carry no quality score.
    members: dict[int, list[int]] = {}
    for r in graph.t07_dedup_cluster_cc(spark, SMOKE_SF_DIR).collect():
        if r["doc_id"] in scores:
            members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert set(kept) == set(members)
    for cid, row in kept.items():
        docs = members[cid]
        assert row["kept_doc_id"] in docs
        assert row["cluster_size"] == len(docs)
        assert row["n_removed"] == len(docs) - 1
        best = max(docs, key=lambda d: (scores[d], -d))
        assert row["kept_doc_id"] == best


def test_length_histogram_shares(spark):
    """t43: per-source shares sum to 1 and buckets bound their members."""
    rows = corpus.t43_length_histogram(spark, SMOKE_SF_DIR).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert 2 ** r["log2_bucket"] <= r["min_chars"] <= r["max_chars"]
        assert r["max_chars"] < 2 ** (r["log2_bucket"] + 1)
        by_src[r["source"]] = by_src.get(r["source"], 0.0) + r["share"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4


def test_magic_validation_flags_injected_faults(spark):
    """m07: only the three statuses appear; the injector's truncated and
    mislabeled slices are detected (nonzero counts at smoke scale)."""
    from squonk2_fastapi_ws_event_stream_spark.operators import multimodal

    rows = multimodal.m07_media_magic_validation(spark, SMOKE_SF_DIR).collect()
    statuses = {(r["mime_claimed"], r["status"]): r["n_docs"] for r in rows}
    assert set(s for _, s in statuses) <= {"ok", "mismatch", "truncated"}
    assert statuses.get(("image/bmp", "truncated"), 0) >= 1
    assert statuses.get(("audio/wav", "mismatch"), 0) >= 1


def test_ship_lag_bands_partition_lineitem(spark):
    """q39: the four bands partition the joined lineitem rows exactly."""
    from squonk2_fastapi_ws_event_stream_spark.plans import tpch

    rows = tpch.q39_ship_lag_priority(spark, SMOKE_SF_DIR).collect()
    total = sum(r["high_priority_lines"] + r["low_priority_lines"] for r in rows)
    li = spark.read.parquet(f"{SMOKE_SF_DIR}/lineitem.parquet").count()
    assert total == li


def test_temperature_mixture_weights(spark):
    """t44: weights are a distribution; α=0.5 upweights smaller sources
    (weight/size-share ratio decreases with source size)."""
    rows = corpus.t44_temperature_mixture(spark, SMOKE_SF_DIR).collect()
    assert rows
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    total = sum(r["n_tokens"] for r in rows)
    boosts = [
        (r["n_tokens"], r["mix_weight"] / (r["n_tokens"] / total)) for r in rows
    ]
    boosts.sort()
    assert all(a >= b - 1e-9 for (_, a), (_, b) in zip(boosts, boosts[1:]))


def test_dim_stats_variance_shares(spark):
    """v23: 64 dims, non-negative variances whose shares sum to 1, and
    min ≤ mean ≤ max per dimension."""
    rows = similarity.v23_dim_stats(spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 64
    assert abs(sum(r["var_share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["variance"] >= 0
        assert r["min_val"] <= r["mean_val"] <= r["max_val"]


def test_session_paths_consistent_with_sessionize(spark):
    """e24: total path-sessions equals e10's total session count, and no
    path exceeds the prefix cap."""
    top = events.e24_top_session_paths(spark, SMOKE_SF_DIR).collect()
    assert top
    for r in top:
        assert 1 <= len(r["path"].split(">")) <= events.E24_PREFIX
    n_sessions_e10 = sum(
        r["n_sessions"] for r in events.e10_sessionize(spark, SMOKE_SF_DIR).collect()
    )
    # top-20 can't exceed the universe; equality holds when paths ≤ 20
    assert sum(r["n_sessions"] for r in top) <= n_sessions_e10


def test_canary_scan_counts(spark):
    """t46: one row per canary, every count within [0, n_docs], and at
    least one canary hits at smoke scale (the phrases are drawn from the
    corpus vocabulary so the scan is exercised, not vacuous)."""
    rows = corpus.t46_canary_scan(spark, SMOKE_SF_DIR).collect()
    assert len(rows) == len(corpus.T46_CANARIES)
    assert {r["canary"] for r in rows} == set(corpus.T46_CANARIES)
    assert any(r["n_docs_hit"] > 0 for r in rows)
    for r in rows:
        assert 0.0 <= r["hit_frac"] <= 1.0


def test_weighted_median_crossing(spark):
    """q40: the reported price's cumulative share is the FIRST ≥ 0.5 per
    segment, and every segment appears exactly once."""
    from squonk2_fastapi_ws_event_stream_spark.plans import tpch

    rows = tpch.q40_weighted_median(spark, SMOKE_SF_DIR).collect()
    segs = [r["segment"] for r in rows]
    assert len(segs) == len(set(segs)) and segs
    for r in rows:
        assert r["cum_share_at_median"] >= 0.5
        assert r["weighted_median_price"] > 0


def test_session_cooccurrence_bounds(spark):
    """e25: support ∈ (0, 1]; lift > 0; n_both never exceeds either
    single count's session total; pairs are canonical (a < b)."""
    rows = events.e25_session_cooccurrence(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["support"] <= 1
        assert r["lift"] > 0


def test_source_similarity_matrix_shape(spark):
    """t47: one row per unordered source pair, cosine in [0, 1] (counts
    are non-negative)."""
    rows = corpus.t47_source_similarity(spark, SMOKE_SF_DIR).collect()
    n_sources = len(
        {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0.0 <= r["profile_cos"] <= 1.0


def test_quantile_sweep_monotone_exactness(spark):
    """x15: one row per accuracy level; exact percentiles identical
    across rows; p50 ≤ p95; all verdicts true at smoke scale."""
    from squonk2_fastapi_ws_event_stream_spark.plans import pipeline as pl

    rows = pl.x15_quantile_accuracy_sweep(spark, SMOKE_SF_DIR).collect()
    assert {r["accuracy"] for r in rows} == set(pl.X15_ACCS)
    assert len({(r["p50_exact"], r["p95_exact"]) for r in rows}) == 1
    for r in rows:
        assert r["p50_exact"] <= r["p95_exact"]
        assert r["p50_ok"] and r["p95_ok"]


def test_dedup_savings_tier_ordering(spark):
    """t48: three tiers; normalized catches at least what byte-exact
    catches (normalization is a many-to-one key map), and fractions stay
    in [0, 1]."""
    rows = {r["tier"]: r for r in corpus.t48_dedup_savings(spark, SMOKE_SF_DIR).collect()}
    assert set(rows) == {"exact", "normalized", "near_dup"}
    assert rows["normalized"]["docs_removed"] >= rows["exact"]["docs_removed"]
    for r in rows.values():
        assert 0.0 <= r["docs_removed_frac"] <= 1.0
        assert 0.0 <= r["chars_removed_frac"] <= 1.0


def test_label_affinity_pairs(spark):
    """v25: one row per unordered label pair, cosine within [-1, 1]."""
    rows = similarity.v25_label_affinity(spark, SMOKE_SF_DIR).collect()
    labels = {r["label_a"] for r in rows} | {r["label_b"] for r in rows}
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert -1.0 <= r["centroid_cos"] <= 1.0


def test_mad_anomalies_robustness(spark):
    """e26: MAD ≥ 0; anomalous hours never exceed total hours; the max
    count of a flagged type must exceed the median."""
    rows = events.e26_mad_anomalies(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_anomalous_hours"] <= r["n_hours"]
        if r["n_anomalous_hours"] > 0:
            assert r["max_count"] > r["median_count"]


def test_kmv_set_algebra_identities(spark):
    """x16: estimates obey set identities — Jaccard ∈ [0,1], union ≥
    both exact sides' sketch floor, intersection = jaccard·union, and
    exact columns satisfy inclusion-exclusion."""
    from squonk2_fastapi_ws_event_stream_spark.plans import pipeline as pl

    r = pl.x16_kmv_set_algebra(spark, SMOKE_SF_DIR).collect()[0]
    assert 0.0 <= r["est_jaccard"] <= 1.0
    assert r["shared_hashes"] <= r["k_kept"] <= pl.X13_K
    assert abs(r["est_intersection"] - round(r["est_jaccard"] * r["est_union"], 2)) < 0.02
    assert r["exact_intersection"] == r["exact_a"] + r["exact_b"] - r["exact_union"]


def test_ivf_cell_balance_invariants(spark):
    """v26: occupancies partition the corpus; imbalance ≥ 1 by
    construction (max ≥ mean)."""
    r = similarity.v26_ivf_cell_balance(spark, SMOKE_SF_DIR).collect()[0]
    assert r["min_occupancy"] <= r["max_occupancy"]
    assert r["imbalance_factor"] >= 1.0
    assert r["n_vectors_total"] >= r["n_cells"] * r["min_occupancy"]


def test_lsh_sweep_monotone_in_bands(spark):
    """t49: more bands (shorter rows) lowers the detection threshold, so
    candidate counts are non-decreasing as n_bands grows and thresholds
    strictly decrease."""
    from squonk2_fastapi_ws_event_stream_spark.operators import dedup

    rows = sorted(
        dedup.t49_lsh_band_sweep(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r["n_bands"],
    )
    assert [(r["n_bands"], r["rows_per_band"]) for r in rows] == list(dedup.T49_CONFIGS)
    cands = [r["n_candidate_pairs"] for r in rows]
    assert cands == sorted(cands)
    thresholds = [r["s50_threshold"] for r in rows]
    assert thresholds == sorted(thresholds, reverse=True)


def test_funnel_latency_bounds(spark):
    """e27: percentiles ordered (min ≤ p50 ≤ p90 ≤ max), all positive,
    and converting users never exceed e18's signup population."""
    r = events.e27_funnel_latency(spark, SMOKE_SF_DIR).collect()[0]
    assert 0 < r["min_minutes"] <= r["p50_minutes"] <= r["p90_minutes"] <= r["max_minutes"]
    assert r["n_converting_users"] >= 1


def test_t17_map_form_matches_counter_reference(spark):
    """The in-row run-length fold (top_word_n/top_bigram_n = longest equal
    run of the sorted array) must equal the Counter max the old
    explode+groupBy shape computed — exercised on adversarial docs the
    parquet corpus may not contain: leading/padded empty tokens (double
    spaces), an all-same-token doc, exact ties, and a single-word doc
    (which the old shape DROPPED via its inner join on the empty bigram
    aggregate — the filter keeps that contract)."""
    from collections import Counter

    from squonk2_fastapi_ws_event_stream_spark.operators.quality import (
        t17_repetition_stats,
    )

    texts = {
        1: "a b a b a",          # tie between words, repeated bigrams
        2: "x x x x",            # degenerate all-same
        3: "lone",               # single word -> must be dropped
        4: "a  b   a",           # double/triple spaces -> empty tokens
        5: "u v w",              # all distinct
    }
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="t17-unit-")
    spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    got = {r["doc_id"]: r for r in t17_repetition_stats(spark, tmp).collect()}

    assert 3 not in got  # single-word doc dropped (old inner-join contract)
    for doc_id, text in texts.items():
        if doc_id == 3:
            continue
        words = text.split(" ")
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        r = got[doc_id]
        assert r["n_words"] == len(words)
        assert r["n_distinct_words"] == len(set(words))
        wc, bc = Counter(words), Counter(bigrams)
        assert r["top_word_frac"] == (
            max(wc.values()) * 1_000_000 // len(words)
        ) / 1e6
        assert r["top_bigram_frac"] == (
            max(bc.values()) * 1_000_000 // len(bigrams)
        ) / 1e6
