"""Round-open driver-record reconciliation (round-10 task #4).

Every round the grading driver overwrites ``BENCH_FULL.json`` with its
own run — often measured in a slower host window — and that record now
trips the non-rebasable best-ever gate (by design: the gate flags every
>1.5x mover).  Round 9's drop carried 15 flagged movers; deciding
"driver window vs tree" was per-round archaeology.  This script makes
it a procedure:

1. load a bench record (default: the working-tree ``BENCH_FULL.json``);
2. run the committed best-ever gate over it and collect the movers that
   would fail (same thresholds as ``bench.py --check``);
3. re-measure each mover SOLO on the CURRENT tree (3 warm passes in a
   fresh warmed session — the ``bench.py`` retry discipline);
4. write per-mover verdicts to ``BENCH_RECONCILE.json``:
   ``host_window`` (solo clears the gate → the record's number was the
   driver's window, not the tree) or ``tree_regression`` (solo stays
   slow → a real regression: fix or A/B-attribute it, never excuse it);
5. print a markdown ledger for SCALING.md.

``bench.check_against_baseline(..., reconcile=...)`` — and therefore
``tests/test_bench_gate.py`` — excuses a mover only when the committed
verdict's ``suite_sec`` matches the record's value exactly, so a
verdict can never excuse a future, different slow number.

Usage:
    python scripts/reconcile_driver_bench.py [record.json] [--round N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def movers_against_best(record: dict, best: dict[str, float]) -> list[tuple]:
    """(name, suite_sec, base_sec, ratio) for every query the committed
    gate would flag — same thresholds/attributions as ``--check``."""
    attrs = bench.load_attributions()
    out = []
    for name, sec in record["queries"].items():
        base_sec = best.get(name)
        if base_sec is None:
            continue
        if bench._gate_one(name, float(sec), base_sec, attrs.get(name)):
            out.append((name, float(sec), base_sec, float(sec) / base_sec))
    return out


def main() -> int:
    argv = sys.argv[1:]
    round_no = None
    if "--round" in argv:
        i = argv.index("--round")
        round_no = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    record_path = argv[0] if argv else bench.FULL_PATH

    with open(record_path, encoding="utf-8") as f:
        record = bench._usable_baseline(json.load(f))
    if not record:
        print(f"no usable per-query record in {record_path}", file=sys.stderr)
        return 2

    best = bench.best_ever_baseline(REPO)
    if not best:
        print("no committed best-ever baseline (git unavailable?)", file=sys.stderr)
        return 2

    movers = movers_against_best(record, best)
    print(f"{len(movers)} flagged movers in {record_path}", file=sys.stderr)
    if not movers:
        return 0

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES
    from squonk2_fastapi_ws_event_stream_spark.session import get_spark

    spark = get_spark("bench-reconcile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def _identity(batches):
        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_identity, schema="id long").count()

    attrs = bench.load_attributions()
    # Fold with any existing verdicts for the SAME record: solo evidence
    # is min-of-all-attempts — shared-host interference can only inflate
    # a solo number, never deflate it, so the fastest observed solo is
    # the honest one (the best-ever-gate monotonicity argument).
    prev: dict[str, dict] = {}
    try:
        with open(bench.RECONCILE_PATH, encoding="utf-8") as f:
            old = json.load(f)
        if old.get("record") == os.path.basename(record_path):
            prev = old.get("verdicts", {})
    except (OSError, json.JSONDecodeError):
        pass
    verdicts: dict[str, dict] = {}
    for name, suite_sec, base_sec, ratio in movers:
        solo = float("inf")
        p = prev.get(name)
        if isinstance(p, dict) and abs(p.get("suite_sec", -1.0) - suite_sec) < 5e-4:
            solo = float(p.get("solo_sec", float("inf")))
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            solo = min(solo, time.perf_counter() - t0)
        solo = round(solo, 3)
        still_fails = bench._gate_one(name, solo, base_sec, attrs.get(name))
        verdicts[name] = {
            "suite_sec": suite_sec,
            "solo_sec": solo,
            "best_ever_sec": round(base_sec, 3),
            "ratio_suite": round(ratio, 2),
            "ratio_solo": round(solo / base_sec, 2),
            "verdict": "tree_regression" if still_fails else "host_window",
        }
        print(
            f"  {name}: suite {suite_sec:.3f}s ({ratio:.2f}x) -> solo "
            f"{solo:.3f}s ({solo / base_sec:.2f}x) => "
            f"{verdicts[name]['verdict']}",
            file=sys.stderr,
        )

    out = {
        "_contract": (
            "Round-open driver-record reconciliation: each verdict solo-"
            "re-measured the flagged query on the current tree; "
            "host_window verdicts excuse EXACTLY the recorded suite_sec "
            "in the gate (value-matched). tree_regression verdicts excuse "
            "nothing - fix or A/B-attribute those."
        ),
        "record": os.path.basename(record_path),
        "record_total_sec": record.get("value"),
        "round": round_no,
        "verdicts": verdicts,
    }
    with open(bench.RECONCILE_PATH, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {bench.RECONCILE_PATH}", file=sys.stderr)

    # Markdown ledger for SCALING.md.
    print("\n| query | suite (x) | solo (x) | verdict |")
    print("|---|---|---|---|")
    for name, v in sorted(verdicts.items()):
        print(
            f"| {name} | {v['suite_sec']:.3f}s ({v['ratio_suite']}x) "
            f"| {v['solo_sec']:.3f}s ({v['ratio_solo']}x) "
            f"| {v['verdict']} |"
        )
    return 0 if all(v["verdict"] == "host_window" for v in verdicts.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
