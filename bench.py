#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

With ``--check [baseline.json]`` (default: the newest BENCH_r*.json in the
repo root) it additionally diffs per-query against the recorded baseline and
exits non-zero on a >2x regression — the driver-gate threshold — so a round
cannot silently regress. Queries absent from the baseline are reported as
new and not gated; sub-0.3s deltas are ignored as shared-host noise.

Headliners are the scale-path queries — the quadratic ground-truth baselines
(t04 all-pairs Jaccard, v01 all-pairs cosine) are deliberately excluded: at
sf0.1 they are O(n²) by construction and the LSH/IVF variants (t02, v03) are
their production twins.

Each query is forced with a noop-sink write (full materialization, no
driver-side collect — the honest distributed cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES
from squonk2_fastapi_ws_event_stream_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_customers",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_regional_revenue",
    "q06_forecast_revenue",
    "q07_rollup_sales",
    "q08_order_history_windows",
    "q11_quarter_range_join",
    "e04_enrich_json",
    "e07_message_stats",
    "e10_sessionize",
    "e11_asof_join",
    "t01_dedup_exact",
    "t02_dedup_minhash_lsh",
    "t03_simhash",
    "t09_quality_score",
    "t10_token_count",
    "t11_doc_fingerprint",
    "v02_ann_bruteforce_topk",
    "v03_ann_ivf_topk",
    "v05_ann_pandas_udf_topk",
    "v07_ann_kmeans_topk",
    "m01_multimodal_decode",
    "q13_pivot_daily_events",
    "q14_value_percentiles",
    "q16_distinct_users_daily",
    "t12_top_tokens",
    "v04_label_centroids",
    "t05_dedup_exact_sha2",
    "q19_promo_revenue",
    "x01_approx_distinct",
    "x02_approx_percentiles",
    "t06_dedup_simhash_banded",
    "v08_neardup_srp_lsh",
    "t15_pipeline_quality_dedup_stats",
    "q20_small_quantity_revenue",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "x03_hash_sample",
    "x04_skew_two_phase_agg",
    "q23_datetime_functions",
    "q24_conditional_functions",
    "t16_array_ops",
    "v09_ann_sq8_topk",
    "x05_hll_sketch_merge",
    "x06_cms_heavy_hitters",
    "t07_dedup_cluster_cc",
    "t17_repetition_stats",
    "t18_pii_redaction",
    "t19_boilerplate_removal",
    "q25_window_frames",
    "x07_bloom_join_pruning",
    "e12_sliding_window",
    "v10_ann_recall_at_k",
    "q26_lateral_topn",
    "q27_unpivot_metrics",
    "x08_stratified_hash_sample",
    "e13_windowed_topk",
    "m04_media_content_dedup",
    "t20_decontamination",
    "t21_decontamination_removal",
    "t22_unigram_logprob",
    "t23_paragraph_dedup",
    "v11_ann_pq_topk",
    "t24_sequence_packing",
    "v12_semdedup",
    "t25_mixture_sampling",
    "t26_leakage_safe_split",
    "e14_log_compaction",
    "q28_trade_flows",
    "q29_market_share",
    "q30_large_volume_customers",
    "q31_supplier_diversity",
    "q32_top_supplier",
    "e15_json_functions",
    "t27_tfidf_top_terms",
    "v13_cluster_representatives",
    "t28_source_overlap",
    "x09_join_size_estimate",
    "t29_quality_calibration",
    "t30_bigram_lm",
    "v14_ann_ivf_pq_topk",
    "t31_minhash_estimate_eval",
    "x10_hll_set_intersection",
    "t32_langid_confusion",
]

# Regression gate (--check): >2x the recorded baseline per query, matching
# BASELINE.md's qualitative bound; deltas under the floor are host noise.
CHECK_RATIO = 2.0
CHECK_FLOOR_SEC = 0.3


def check_against_baseline(result: dict, baseline_path: str) -> int:
    with open(baseline_path, encoding="utf-8") as f:
        base = json.load(f)
    base = base.get("parsed", base)  # driver wrapper or raw bench line
    base_q = base.get("queries", {})
    failures, news = [], []
    for name, sec in result["queries"].items():
        if name not in base_q:
            news.append(name)
            continue
        if sec > base_q[name] * CHECK_RATIO and sec - base_q[name] > CHECK_FLOOR_SEC:
            failures.append(f"{name}: {sec:.3f}s vs baseline {base_q[name]:.3f}s")
    for name in news:
        print(f"bench-check: NEW (not gated): {name}", file=sys.stderr)
    for line in failures:
        print(f"bench-check: REGRESSION >{CHECK_RATIO}x: {line}", file=sys.stderr)
    base_stream = base.get("streaming", {}).get("relay_msgs_per_sec")
    got_stream = result.get("streaming", {}).get("relay_msgs_per_sec")
    if base_stream and got_stream and got_stream < base_stream / CHECK_RATIO:
        failures.append(f"relay throughput {got_stream} < {base_stream}/{CHECK_RATIO}")
        print(f"bench-check: REGRESSION: {failures[-1]}", file=sys.stderr)
    print(
        f"bench-check vs {baseline_path}: {len(failures)} regressions, "
        f"{len(news)} new queries",
        file=sys.stderr,
    )
    return 1 if failures else 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("squonk2-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen and the Python UDF workers (one per core) so the
    # first query isn't charged session startup — long-lived executors are
    # the production reality being modeled.
    spark.range(1000).count()

    def _identity(batches):
        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_identity, schema="id long").count()

    def run_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        return timings

    # Pass 1 warms analysis/codegen caches (the steady state of a long-lived
    # cluster); the reported number is the per-query min of two warm passes
    # (damps interference from other load on a shared host).
    cold = run_pass()
    for name, t in cold.items():
        print(f"  cold {name}: {t:.3f}s", file=sys.stderr)
    warm1, warm2 = run_pass(), run_pass()
    timings = {name: min(warm1[name], warm2[name]) for name in warm1}
    for name, t in timings.items():
        print(f"  warm {name}: {t:.3f}s", file=sys.stderr)

    streaming = bench_streaming_relay(spark)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cold_total_sec": round(sum(cold.values()), 3),
        "streaming": streaming,
    }
    print(json.dumps(result))

    if "--check" in sys.argv:
        idx = sys.argv.index("--check")
        if idx + 1 < len(sys.argv):
            baseline = sys.argv[idx + 1]
        else:
            import glob

            candidates = sorted(glob.glob("BENCH_r*.json"))
            baseline = candidates[-1] if candidates else ""
        if baseline and os.path.exists(baseline):
            sys.exit(check_against_baseline(result, baseline))
        print("bench-check: no baseline file found, skipping", file=sys.stderr)


def bench_streaming_relay(spark) -> dict:
    """Relay throughput: messages/sec through source → enrichment → sink —
    the reference's own measurement design (A1/A2 counters, BASELINE.md).
    8 streams × 20k messages, one partition per stream (total order),
    8 concurrent StreamingQueries, availableNow trigger."""
    import shutil
    import tempfile

    from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
        EventLogWriter,
        EventStreamDataSource,
    )
    from squonk2_fastapi_ws_event_stream_spark.streaming.pipeline import relay_transform

    n_streams, per_stream = 8, 20_000
    root = tempfile.mkdtemp(prefix="es-bench-")
    try:
        for s in range(n_streams):
            w = EventLogWriter(root, f"s{s}")
            with open(w.path, "a", encoding="utf-8") as f:  # bulk append
                for i in range(per_stream):
                    f.write(
                        '{"offset": %d, "timestamp": %d, "value": "{\\"message_type\\": \\"bench\\", \\"message_body\\": {\\"sqn\\": %d}}"}\n'
                        % (i + 1, 1_700_000_000_000 + i, i)
                    )
        spark.dataSource.register(EventStreamDataSource)
        total_msgs = n_streams * per_stream

        def one_pass(tag: str) -> float:
            t0 = time.perf_counter()
            counts = []
            queries = []
            for s in range(n_streams):
                env = (
                    spark.readStream.format("eventstream")
                    .option("path", root)
                    .option("stream", f"s{s}")
                    .option("startingOrdinal", 0)
                    .load()
                )
                q = (
                    relay_transform(env)
                    .writeStream.foreachBatch(lambda df, _id: counts.append(df.count()))
                    .option("checkpointLocation", f"{root}/ckpt-{tag}-{s}")
                    .trigger(availableNow=True)
                    .start()
                )
                queries.append(q)
            for q in queries:
                q.awaitTermination(300)
            elapsed = time.perf_counter() - t0
            assert sum(counts) == total_msgs, (sum(counts), total_msgs)
            return elapsed

        # Best of two passes — the min-of-warm discipline applied to the
        # relay, damping shared-host interference (pass 1 also warms the
        # streaming machinery the way long-lived relays run warm).
        elapsed = min(one_pass("a"), one_pass("b"))
        return {
            "relay_messages": total_msgs,
            "relay_sec": round(elapsed, 3),
            "relay_msgs_per_sec": round(total_msgs / elapsed),
            "n_streams": n_streams,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
