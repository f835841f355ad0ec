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

Round-11 (VERDICT r10 task #5): the same procedure covers the STREAMING
number.  The record's relay msg/s is compared to the best-ever committed
relay (``bench.best_ever_stream``, max over the same non-rebasable
sources); a >1.25x dip gets a 1-stream + 8-stream solo re-probe on the
current tree and a value-matched ``_streaming`` verdict.  The outcome —
flagged or clear — is always written, so every round's reconcile is
committed evidence.

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
    # --keep-verdicts: merge this run's verdicts over the existing file's
    # (new wins) instead of replacing them — for round-opens that must
    # reconcile TWO driver records (the full BENCH_FULL.json and a
    # compact streaming-only BENCH_r*.json).  Each kept verdict is still
    # value-matched to its own record, so a merge can never excuse a
    # number it did not measure.
    keep = "--keep-verdicts" in argv
    argv = [a for a in argv if a != "--keep-verdicts"]
    record_path = argv[0] if argv else bench.FULL_PATH

    with open(record_path, encoding="utf-8") as f:
        raw = json.load(f)
    record = bench._usable_baseline(raw)
    if not record:
        # Streaming-only fallback (round-12 VERDICT task #3): the driver's
        # compact BENCH_r*.json records carry a relay number but no
        # per-query map — they must still be reconcilable, because the
        # relay headline the next judge reads can come from exactly such
        # a record (r11: 32.6k msg/s in BENCH_r11.json vs the 42.5k in
        # the full record).  Per-query movers are skipped (no data); the
        # streaming check below runs as usual, value-matched on the
        # compact record's relay number.
        inner = raw.get("parsed") if isinstance(raw, dict) and "parsed" in raw else raw
        if isinstance(inner, dict) and isinstance(inner.get("streaming"), dict):
            record = dict(inner)
            record["queries"] = {}
            print(
                f"{record_path}: no per-query map — streaming-only reconcile",
                file=sys.stderr,
            )
    if not record:
        print(f"no usable per-query record in {record_path}", file=sys.stderr)
        return 2

    best = bench.best_ever_baseline(REPO)
    if not best:
        print("no committed best-ever baseline (git unavailable?)", file=sys.stderr)
        return 2

    movers = movers_against_best(record, best)
    print(f"{len(movers)} flagged movers in {record_path}", file=sys.stderr)

    # Streaming side (round-10 verdict task #5): compare the record's relay
    # throughput to the best-ever COMMITTED relay (max over the same
    # non-rebasable sources as the query baseline). A >1.25x dip gets a
    # 1-stream + 8-stream solo re-probe on the current tree below.
    relay_best = bench.best_ever_stream(REPO)
    relay_got = record.get("streaming", {}).get("relay_msgs_per_sec")
    relay_flagged = bool(
        relay_best
        and relay_got
        and relay_got < relay_best / bench.STREAM_RETRY_RATIO
    )
    if relay_best and relay_got:
        print(
            f"relay: record {relay_got} msg/s vs best-ever {relay_best} "
            f"msg/s ({relay_best / relay_got:.2f}x under)"
            + (" — FLAGGED, solo re-probe" if relay_flagged else " — clear"),
            file=sys.stderr,
        )

    if not movers and not relay_flagged:
        # Nothing to re-measure: still write the ledgered outcome so the
        # round's reconcile (incl. the streaming check) is committed
        # evidence, not a silent early-exit.
        _write(record_path, record, round_no, {}, relay_got, relay_best, keep)
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

    if relay_flagged:
        verdicts["_streaming"] = _reprobe_relay(
            spark, relay_got, relay_best, prev.get("_streaming")
        )

    _write(record_path, record, round_no, verdicts, relay_got, relay_best, keep)

    # Markdown ledger for SCALING.md.
    print("\n| query | suite (x) | solo (x) | verdict |")
    print("|---|---|---|---|")
    for name, v in sorted(verdicts.items()):
        if name == "_streaming":
            print(
                f"| relay (msg/s) | {v['record_msgs_per_sec']} "
                f"| 1-stream {v['solo_1stream_msgs_per_sec']} / 8-stream "
                f"{v['solo_8stream_msgs_per_sec']} | {v['verdict']} |"
            )
            continue
        print(
            f"| {name} | {v['suite_sec']:.3f}s ({v['ratio_suite']}x) "
            f"| {v['solo_sec']:.3f}s ({v['ratio_solo']}x) "
            f"| {v['verdict']} |"
        )
    return 0 if all(v["verdict"] == "host_window" for v in verdicts.values()) else 1


def _reprobe_relay(spark, relay_got, relay_best, prev) -> dict:
    """Round-10 verdict task #5: the relay analog of the per-query solo
    re-measure.  Re-runs the relay SOLO on the current tree at 1 stream
    (pipeline cost with no scheduler contention) and 8 streams (the
    headline shape), min-of-2-passes each via bench's own harness, and
    folds with any prior verdict for the same recorded value (max —
    interference can only deflate throughput, never inflate it)."""
    import shutil
    import tempfile

    from squonk2_fastapi_ws_event_stream_spark.sources.eventstream import (
        EventStreamDataSource,
    )

    spark.dataSource.register(EventStreamDataSource)
    solo: dict[int, float] = {1: 0.0, 8: 0.0}
    if isinstance(prev, dict) and prev.get("record_msgs_per_sec") == relay_got:
        solo[1] = float(prev.get("solo_1stream_msgs_per_sec", 0) or 0)
        solo[8] = float(prev.get("solo_8stream_msgs_per_sec", 0) or 0)
    per_stream = 20_000
    for n in (1, 8):
        root = tempfile.mkdtemp(prefix=f"es-reconcile-{n}-")
        try:
            bench._publish_streams(root, n, per_stream)
            sec = min(
                bench._relay_pass(spark, root, n, per_stream, "ra"),
                bench._relay_pass(spark, root, n, per_stream, "rb"),
            )
            solo[n] = max(solo[n], n * per_stream / sec)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(
            f"  relay solo re-probe: {n} stream(s) -> {solo[n]:.0f} msg/s",
            file=sys.stderr,
        )
    # host_window iff the 8-stream (headline-shape) solo clears the hard
    # relay gate the record would otherwise fail.
    clears = solo[8] >= relay_best / bench.CHECK_RATIO
    entry = {
        "record_msgs_per_sec": relay_got,
        "best_ever_msgs_per_sec": relay_best,
        "ratio": round(relay_best / relay_got, 2),
        "solo_1stream_msgs_per_sec": round(solo[1]),
        "solo_8stream_msgs_per_sec": round(solo[8]),
        "verdict": "host_window" if clears else "tree_regression",
    }
    print(
        f"  relay: record {relay_got} msg/s ({entry['ratio']}x under "
        f"best-ever {relay_best}) -> solo 8-stream "
        f"{entry['solo_8stream_msgs_per_sec']} msg/s => {entry['verdict']}",
        file=sys.stderr,
    )
    return entry


def _write(
    record_path, record, round_no, verdicts, relay_got, relay_best, keep=False
) -> None:
    flagged_now = "_streaming" in verdicts  # THIS record's flag, pre-merge
    if keep:
        try:
            with open(bench.RECONCILE_PATH, encoding="utf-8") as f:
                old = json.load(f).get("verdicts", {})
            if isinstance(old, dict):
                verdicts = {**old, **verdicts}
        except (OSError, json.JSONDecodeError):
            pass
    out = {
        "_contract": (
            "Round-open driver-record reconciliation: each verdict solo-"
            "re-measured the flagged query on the current tree; "
            "host_window verdicts excuse EXACTLY the recorded suite_sec "
            "in the gate (value-matched). tree_regression verdicts excuse "
            "nothing - fix or A/B-attribute those. The _streaming verdict "
            "is the relay analog (1- and 8-stream solo re-probe), value-"
            "matched on record_msgs_per_sec."
        ),
        "record": os.path.basename(record_path),
        "record_total_sec": record.get("value"),
        "round": round_no,
        "streaming_check": {
            "record_msgs_per_sec": relay_got,
            "best_ever_msgs_per_sec": relay_best,
            "flagged": flagged_now,
        },
        "verdicts": verdicts,
    }
    with open(bench.RECONCILE_PATH, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {bench.RECONCILE_PATH}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
