"""Central query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

This is the single source the driver contract (__spark_entry__.py) reads.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    corpus,
    dedup,
    events,
    graph,
    multimodal,
    quality,
    similarity,
    textstats,
)
from .plans import extended, pipeline, relational2, tpch

_MODULES = (
    tpch,
    extended,
    pipeline,
    relational2,
    events,
    dedup,
    graph,
    quality,
    textstats,
    similarity,
    multimodal,
    corpus,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    overlap = QUERIES.keys() & _m.QUERIES.keys()
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

missing = QUERIES.keys() - ORACLES.keys()
# Queries without oracles get the driver's weaker rows-only check; keep the
# set empty unless an op is genuinely non-SQL-expressible.
NON_SQL_QUERIES = frozenset(missing)

# The driver checks at most ~50 queries per round, sampled in registry
# order. Front-load queries whose SEMANTICS or plans changed this round so
# CORRECTNESS_r05 records fresh hard rows for them first; the r4 tail
# (all already green) follows. Local oracle-parity tests still cover all
# queries regardless of this order.
_PRIORITY = (
    # round 5 head: the 10 queries that have NEVER had a driver row
    # (displaced by round-4 additions; VERDICT r4 "What's missing" #3).
    "e16_interval_join",
    "m05_media_downsample",
    "t33_dup_ngram_spans",
    "t34_dsir_importance",
    "t35_filter_funnel",
    "t36_zipf_stats",
    "v15_matryoshka_recall",
    "v16_nprobe_recall_curve",
    "v17_knn_label_accuracy",
    "x11_sample_error_bounds",
    # round 5 NEW operators (never driver-checked):
    "t50_fuzzy_blocking_match",
    "e28_asof_forward",
    "v27_ivf_incremental_add",
    "x17_sliding_hll_window",
    "t52_fuzzy_decontamination",
    "t53_ngram_novelty",
    "m08_perceptual_ahash",
    "v28_kmeans_iteration",
    "e29_decayed_trending",
    "e30_scd2_intervals",
    "x18_bloom_fpr_sweep",
    "m09_audio_features",
    "q42_disjunctive_predicates",
    "q43_cdc_merge",
    "v29_embedding_outliers",
    "t54_incremental_dedup",
    "v30_retrieval_quality",
    # round 5: plans/semantics changed this round (head/tail frequency
    # joins, staged percentile table, KMV hash overflow fix, shared
    # sessionizer, m05 NumPy vectorization, t47 common-token prune).
    "t30_bigram_lm",
    "t28_source_overlap",
    "x09_join_size_estimate",
    "t22_unigram_logprob",
    "t27_tfidf_top_terms",
    "x02_approx_percentiles",
    "x15_quantile_accuracy_sweep",
    "x13_kmv_distinct",
    "x14_linear_counting",
    "x16_kmv_set_algebra",
    "e24_top_session_paths",
    "e25_session_cooccurrence",
    "e10_sessionize",
    "t47_source_similarity",
    "m01_multimodal_decode",
    # round 4 late additions:
    "e27_funnel_latency",
    "q41_yoy_revenue_growth",
    "t49_lsh_band_sweep",
    "v26_ivf_cell_balance",
    "v25_label_affinity",
    "e26_mad_anomalies",
    "t48_dedup_savings",
    "q40_weighted_median",
    "v24_embedding_drift",
    "t46_canary_scan",
    "t45_pagerank",
    "v23_dim_stats",
    "t44_temperature_mixture",
    "q37_profit_by_nation_year",
    "q38_returned_items",
    "q39_ship_lag_priority",
    "e22_event_type_markov",
    "e23_interarrival_stats",
    "v21_ann_mrr_eval",
    "v22_ivf_cell_quality",
    "m07_media_magic_validation",
    "t42_canonical_selection",
    "t43_length_histogram",
    "t13_sentence_udtf",  # plan changed: Arrow-optimized UDTF stage
    # round 4, NEW queries first (never driver-checked):
    "q36_supplier_concentration",
    "t40_triangle_count",
    "t41_dedup_normalized",
    "q35_part_affinity",
    "e21_hourly_anomalies",
    "v20_quantization_recall",
    "v19_ann_filtered_topk",
    "t39_removal_priority",
    "e20_dau_mau_stickiness",
    "x12_hll_precision_sweep",
    "m06_media_manifest",
    "q34_order_count_distribution",
    "v18_ann_hamming_topk",
    "e19_gap_fill",
    "e18_conversion_funnel",
    "t38_shingle_containment",
    "q33_cohort_retention",
    "e17_out_of_order_stats",
    "t37_quality_bucket_stats",
    # round 4: changed schema/semantics and changed plans
    "e14_log_compaction",
    "t19_boilerplate_removal",
    "v05_ann_pandas_udf_topk",
    "v07_ann_kmeans_topk",
    "t07_dedup_cluster_cc",
    "t06_dedup_simhash_banded",
    "v10_ann_recall_at_k",
    # r3 order below (all green at their latest check)
    "v12_semdedup",
    "t25_mixture_sampling",
    "t26_leakage_safe_split",
    "q28_trade_flows",
    "q29_market_share",
    "q30_large_volume_customers",
    "q31_supplier_diversity",
    "q32_top_supplier",
    "e15_json_functions",
    "v13_cluster_representatives",
    "t29_quality_calibration",
    "v14_ann_ivf_pq_topk",
    "t31_minhash_estimate_eval",
    "x10_hll_set_intersection",
    "t32_langid_confusion",
    "t05_dedup_exact_sha2",
    "t17_repetition_stats",
    "t18_pii_redaction",
    "t20_decontamination",
    "t21_decontamination_removal",
    "t23_paragraph_dedup",
    "t24_sequence_packing",
    "v08_neardup_srp_lsh",
    "v09_ann_sq8_topk",
    "v11_ann_pq_topk",
    "m02_multimodal_resize",
    "m03_multimodal_frame_sample",
    "m04_media_content_dedup",
    "e12_sliding_window",
    "e13_windowed_topk",
    "e02_replay_from_timestamp",
    "e04_enrich_json",
    "e06_enrich_prototext",
)
_unknown = set(_PRIORITY) - QUERIES.keys()
if _unknown:
    raise RuntimeError(f"priority list names unknown queries: {_unknown}")
QUERIES = {
    **{k: QUERIES[k] for k in _PRIORITY},
    **{k: v for k, v in QUERIES.items() if k not in set(_PRIORITY)},
}
ORACLES = {
    **{k: ORACLES[k] for k in _PRIORITY if k in ORACLES},
    **{k: v for k, v in ORACLES.items() if k not in set(_PRIORITY)},
}
