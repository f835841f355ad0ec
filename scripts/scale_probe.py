"""10x scale-probe harness (round 11).

Builds a synthetic sf1-equivalent corpus (10 replicas of sf0.1) and
re-measures queries at both scales — the probe that found the t02/t31
hot-bucket quadratic (53x at 10x data) and the v33 stride-IVF
super-linearity, both invisible to every gate below sf0.1
(SCALING.md "round-11 band-family scale probe").

Corpus construction (deterministic, DuckDB):
- documents: per-replica word suffixes (`w -> w || '_r' || r`) —
  replicas share structure but not vocabulary, so frequency tables
  scale 10x without cross-replica duplication artifacts;
- embeddings/events/orders/lineitem/customer/supplier/part: key
  offsets per replica keep FK structure intact; region/nation copied.

Usage:
    python scripts/scale_probe.py --build            # corpus only
    python scripts/scale_probe.py q35 t02 ...        # probe named queries
    python scripts/scale_probe.py --band-family      # the r12 worklist set

A ratio far above ~3x for 10x data means super-linear plan behavior —
read the r12 worklist in SCALING.md before "fixing" a data-dependent
output growth (q35's 3.1x is real basket-pair mass, not plan shape).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_PROBE_BASE", "/root/testdata/sf0.1")
# round 12 (VERDICT r11 task #8): replica count is parameterized so the
# capped families can be probed one more decade out (e.g. REPLICAS=30).
# The default keeps the round-11 corpus name/location bit-compatible.
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))
OUT = os.environ.get(
    "SPARK_GRAFT_PROBE_DIR",
    "/tmp/sfsynth1" if REPLICAS == 10 else f"/tmp/sfsynth{REPLICAS}x",
)

BAND_FAMILY = [
    "t02_dedup_minhash_lsh", "t31_minhash_estimate_eval",
    "t38_shingle_containment", "t49_lsh_band_sweep",
    "t52_fuzzy_decontamination", "t55_incremental_neardup",
    "m10_image_neardup_bands", "v08_neardup_srp_lsh",
    "v33_knn_graph",
]


def build_corpus() -> None:
    import shutil

    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    rng = f"unnest(range(0, {REPLICAS})) AS t(r)"

    def copy(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )

    copy(
        "SELECT doc_id + 100000 * r AS doc_id, "
        "array_to_string(list_transform(string_split(text, ' '), "
        "w -> w || '_r' || r), ' ') AS text, lang, source, n_chars "
        f"FROM read_parquet('{BASE}/documents.parquet'), {rng}",
        "documents",
    )
    # Per-replica cyclic dimension rotation (round 12): verbatim copies
    # made every stride-sampled centroid identical across replicas, so
    # ties collapsed all assignments into replica-0's cells — 10 cells
    # held everything, 290 sat empty, and the v33 probe join degenerated
    # to ~1e9 pairs at 30x (measured 1,150 s; SCALING.md round-12).  A
    # rotation preserves norms and within-replica pairwise cosines (the
    # corpus structure) while making replicas directionally distinct,
    # matching the documents' per-replica vocabulary discipline.
    copy(
        "SELECT vec_id + 1000000 * r AS vec_id, "
        "list_transform(range(1, len(embedding) + 1), "
        "i -> embedding[((i - 1 + r) % len(embedding)) + 1]) AS embedding, "
        "label "
        f"FROM read_parquet('{BASE}/embeddings.parquet'), {rng}",
        "embeddings",
    )
    copy(
        "SELECT event_id + 10000000 * r AS event_id, ts, "
        "user_id + 1000000 * r AS user_id, event_type, value, props "
        f"FROM read_parquet('{BASE}/events.parquet'), {rng}",
        "events",
    )
    copy(
        "SELECT o_orderkey + 100000000 * r AS o_orderkey, "
        "o_custkey + 10000000 * r AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM read_parquet('{BASE}/orders.parquet'), {rng}",
        "orders",
    )
    copy(
        "SELECT l_orderkey + 100000000 * r AS l_orderkey, "
        "l_partkey + 10000000 * r AS l_partkey, "
        "l_suppkey + 1000000 * r AS l_suppkey, "
        "* EXCLUDE (l_orderkey, l_partkey, l_suppkey) "
        f"FROM read_parquet('{BASE}/lineitem.parquet'), {rng}",
        "lineitem",
    )
    copy(
        "SELECT c_custkey + 10000000 * r AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment "
        f"FROM read_parquet('{BASE}/customer.parquet'), {rng}",
        "customer",
    )
    copy(
        "SELECT s_suppkey + 1000000 * r AS s_suppkey, * EXCLUDE (s_suppkey) "
        f"FROM read_parquet('{BASE}/supplier.parquet'), {rng}",
        "supplier",
    )
    copy(
        "SELECT p_partkey + 10000000 * r AS p_partkey, * EXCLUDE (p_partkey) "
        f"FROM read_parquet('{BASE}/part.parquet'), {rng}",
        "part",
    )
    for t in ("region", "nation"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"built {OUT} ({REPLICAS}x {BASE})")


def main() -> int:
    argv = sys.argv[1:]
    if "--build" in argv or not os.path.exists(f"{OUT}/documents.parquet"):
        build_corpus()
        argv = [a for a in argv if a != "--build"]
        if not argv:
            return 0
    if "--band-family" in argv:
        argv = [a for a in argv if a != "--band-family"] + BAND_FAMILY

    from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES
    from squonk2_fastapi_ws_event_stream_spark.session import get_spark

    # Accept short prefixes like "t02" for convenience.
    names = []
    for a in argv:
        hits = [q for q in QUERIES if q == a or q.startswith(a + "_") or q.startswith(a)]
        if not hits:
            print(f"no query matches {a!r}", file=sys.stderr)
            return 2
        names.append(sorted(hits)[0])

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def run(name: str, sf: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"{'query':32s} {'base':>7s} {'10x':>8s} {'ratio':>6s}")
    worst = 0.0
    for n in dict.fromkeys(names):
        a, b = run(n, BASE), run(n, OUT)
        worst = max(worst, b / a)
        print(f"{n:32s} {a:7.3f} {b:8.3f} {b / a:6.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
