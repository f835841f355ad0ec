"""Round-11 optimization measurement harness (guide §1).

For each named query: warm noop-sink solo timing (min of N), the
formatted physical plan written to plans/r11/<query>_<tag>.txt, and a
plan-shape digest (Exchange count, join strategies, Python-eval nodes)
printed per query so before/after claims are mechanical, not eyeballed.

Usage:
    python scripts/opt_measure.py --tag before q1 q2 ...
    python scripts/opt_measure.py --tag before --slowest 20   # from BENCH_FULL.json
    python scripts/opt_measure.py --time-only q1 q2           # no plan files
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

PLANS_DIR = ROOT / "plans" / os.environ.get("SPARK_GRAFT_OPT_ROUND", "r12")


def plan_shape(formatted: str) -> str:
    """Compact digest of the plan features the optimization guide audits."""
    counts: dict[str, int] = {}
    for pat, label in (
        (r"\bExchange\b", "Exchange"),
        (r"\bBroadcastExchange\b", "BroadcastExchange"),
        (r"\bSortMergeJoin\b", "SortMergeJoin"),
        (r"\bShuffledHashJoin\b", "ShuffledHashJoin"),
        (r"\bBroadcastHashJoin\b", "BroadcastHashJoin"),
        (r"\bBroadcastNestedLoopJoin\b", "BNLJoin"),
        (r"\bCartesianProduct\b", "Cartesian"),
        (r"\bBatchEvalPython\b", "BatchEvalPython"),
        (r"\bArrowEvalPython\b", "ArrowEvalPython"),
        (r"\bMapInPandas\b", "MapInPandas"),
        (r"\bPythonMapInArrow\b", "MapInArrow"),
        (r"\bWindowGroupLimit\b", "WindowGroupLimit"),
        (r"\bWindow\b", "Window"),
        (r"\bSort\b", "Sort"),
        (r"\bExpand\b", "Expand"),
        (r"\bGenerate\b", "Generate"),
        (r"\bHashAggregate\b", "HashAggregate"),
        (r"\bObjectHashAggregate\b", "ObjHashAggregate"),
        (r"\bSortAggregate\b", "SortAggregate"),
        (r"\bInMemoryTableScan\b", "InMemoryScan"),
        (r"Scan parquet", "ParquetScan"),
    ):
        n = len(re.findall(pat, formatted))
        if n:
            counts[label] = n
    # Exchange includes BroadcastExchange in the regex above; split them.
    if "BroadcastExchange" in counts and "Exchange" in counts:
        counts["Exchange"] -= counts["BroadcastExchange"]
        if not counts["Exchange"]:
            del counts["Exchange"]
    return " ".join(f"{k}={v}" for k, v in sorted(counts.items()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default=None, help="plan file suffix (before/after)")
    ap.add_argument("--slowest", type=int, default=0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--time-only", action="store_true")
    args = ap.parse_args()

    from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES
    from squonk2_fastapi_ws_event_stream_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = list(args.queries)
    if args.slowest:
        with open(ROOT / "BENCH_FULL.json", encoding="utf-8") as f:
            rec = json.load(f)
        ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        names += [q for q, _ in ranked[: args.slowest] if q not in names]
    unknown = [n for n in names if n not in QUERIES]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def _identity(batches):
        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_identity, schema="id long").count()

    if args.tag and not args.time_only:
        PLANS_DIR.mkdir(parents=True, exist_ok=True)

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt-measure {name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plan_sec = time.perf_counter() - t0
        best = float("inf")
        timed = []
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timed.append(time.perf_counter() - t0)
            best = min(best, timed[-1])
        shape = plan_shape(formatted)
        results[name] = {
            "solo_min_sec": round(best, 3),
            "runs": [round(t, 3) for t in timed],
            "build_sec": round(build_sec, 3),
            "plan_sec": round(plan_sec, 3),
            "shape": shape,
        }
        print(f"{name}: min {best:.3f}s runs={results[name]['runs']} "
              f"build {build_sec:.2f}s plan {plan_sec:.2f}s\n  {shape}")
        if args.tag and not args.time_only:
            out = PLANS_DIR / f"{name}_{args.tag}.txt"
            out.write_text(formatted, encoding="utf-8")
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
