"""Mechanical changed-plan detection (round-6 VERDICT task #2).

Round 6 shipped a real correctness regression because a perf commit
(d5cc579) rewrote a NEIGHBOR query's plan (t65's prefilter applied to
t38) and the hand-maintained ``registry._NEW_OR_CHANGED`` list missed
it — so neither the driver rotation nor the sf0.01 parity gate
re-checked t38. This module makes changed-plan detection mechanical:

- ``PLAN_FINGERPRINTS.json`` (repo root, committed) maps every
  registered query to a hash of its *analyzed* logical plan, normalized
  for expression ids / plan ids / scale-factor paths. The analyzed plan
  is pre-cache-substitution and pre-AQE, so the fingerprint is stable
  across cache state and data size — it changes exactly when the query's
  logical shape (or a shared helper it uses) changes.
- ``tests/test_plan_fingerprints.py`` recomputes all fingerprints and
  fails on ANY drift from the committed ledger — a shared-helper edit
  that silently rewrites a neighbor query's plan turns CI red even if
  that query's own code was never touched.
- Regenerating the ledger goes through THIS script, which refuses to
  update a fingerprint for any query not currently listed in
  ``registry._NEW_OR_CHANGED`` — so acknowledging a plan change forces
  the query into the driver's fresh-sampling head in the same commit.

Round-8 hardening: the refusal now also covers REMOVED ledger entries
(deleting or renaming a query must be acknowledged in
``registry._REMOVED``), and ``--snapshot N`` copies the verified ledger
to ``PLAN_FINGERPRINTS_r{N}.json`` at round close so
``tests/test_plan_fingerprints.py`` can diff the live ledger against the
prior round's committed state — a hand-edited ledger entry for an
unlisted query now goes red in pytest instead of bypassing the script.

Usage:
    python scripts/plan_fingerprints.py            # regenerate (guarded)
    python scripts/plan_fingerprints.py --check    # report drift, no write
    python scripts/plan_fingerprints.py --snapshot 8   # round-close copy
"""

from __future__ import annotations

import hashlib
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:  # allow running as `python scripts/...`
    sys.path.insert(0, str(ROOT))
LEDGER = ROOT / "PLAN_FINGERPRINTS.json"
# Fingerprints are always computed at the smallest SF: the analyzed plan
# is data-size-independent, and sf0.001 keeps driver-side builds (graph
# iterations, centroid collects) cheap.
FP_SF_DIR = "/root/testdata/sf0.001"

_NORMALIZERS = (
    (re.compile(r"#\d+"), "#"),  # expression ids
    # higher-order-function lambda variables (x_19, y_3, ...) draw from a
    # session-global counter: building OTHER queries first shifts them
    (re.compile(r"\blambda ([a-zA-Z]+)_\d+"), r"lambda \1"),
    # CTE / recursive-union relation ids are session-global counters too
    # (every sql() with a WITH clause increments them)
    (
        re.compile(
            r"\b(CTERelationDef|CTERelationRef|UnionLoopRef|UnionLoop) \d+"
        ),
        r"\1 ",
    ),
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"@[0-9a-fA-F]{6,}"), "@"),  # JVM object addresses
    (re.compile(r"/root/testdata/sf[0-9.]+"), "<SF>"),  # per-SF paths
    (re.compile(r"cachedName=[^,\]]+"), "cachedName="),
)


def normalize(plan: str) -> str:
    for pat, rep in _NORMALIZERS:
        plan = pat.sub(rep, plan)
    return plan


def fingerprint(df) -> str:
    plan = df._jdf.queryExecution().analyzed().toString()
    return hashlib.sha256(normalize(plan).encode()).hexdigest()[:16]


def compute_all(spark) -> dict[str, str]:
    from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES

    return {
        name: fingerprint(QUERIES[name](spark, FP_SF_DIR))
        for name in sorted(QUERIES)
    }


def diff_ledger(current: dict[str, str]) -> tuple[list[str], list[str], list[str]]:
    """Return (changed, added, removed) vs the committed ledger."""
    old: dict[str, str] = {}
    if LEDGER.exists():
        old = json.loads(LEDGER.read_text())
    changed = sorted(n for n in current if n in old and old[n] != current[n])
    added = sorted(current.keys() - old.keys())
    removed = sorted(old.keys() - current.keys())
    return changed, added, removed


def main(argv: list[str]) -> int:
    check_only = "--check" in argv
    if "--snapshot" in argv:
        # ADVICE r8: a snapshot is the next round's acknowledgment
        # baseline — never copy a ledger that drifts from the live plans,
        # and reject a missing/non-numeric round number with a usage
        # error instead of an IndexError.
        idx = argv.index("--snapshot")
        if idx + 1 >= len(argv) or not argv[idx + 1].isdigit():
            print(
                "usage: plan_fingerprints.py --snapshot <round-number>",
                file=sys.stderr,
            )
            return 2
        rnd = int(argv[idx + 1])
        if not LEDGER.exists():
            print(f"no ledger at {LEDGER} — regenerate first", file=sys.stderr)
            return 2
        from squonk2_fastapi_ws_event_stream_spark.session import get_spark

        spark = get_spark("plan-fingerprints")
        changed, added, removed = diff_ledger(compute_all(spark))
        if changed or added or removed:
            print(
                f"REFUSING snapshot: ledger drifts from live plans "
                f"({len(changed)} changed, {len(added)} added, "
                f"{len(removed)} removed) — regenerate first",
                file=sys.stderr,
            )
            for n in changed + added + removed:
                print(f"  drift: {n}", file=sys.stderr)
            return 1
        snap = ROOT / f"PLAN_FINGERPRINTS_r{rnd:02d}.json"
        snap.write_text(LEDGER.read_text())
        print(f"wrote {snap} (drift-free, verified)")
        return 0

    from squonk2_fastapi_ws_event_stream_spark.registry import (
        _NEW_OR_CHANGED,
        _REMOVED,
    )
    from squonk2_fastapi_ws_event_stream_spark.session import get_spark

    spark = get_spark("plan-fingerprints")
    current = compute_all(spark)
    changed, added, removed = diff_ledger(current)

    bootstrap = not LEDGER.exists()
    listed = set(_NEW_OR_CHANGED)
    unlisted_changed = [] if bootstrap else [n for n in changed if n not in listed]
    unlisted_added = [] if bootstrap else [n for n in added if n not in listed]
    # Deletions can't be acknowledged via _NEW_OR_CHANGED (registry import
    # rejects names absent from QUERIES) — they get their own ledger.
    unlisted_removed = (
        [] if bootstrap else [n for n in removed if n not in set(_REMOVED)]
    )

    print(
        f"{len(current)} queries; {len(changed)} changed, "
        f"{len(added)} added, {len(removed)} removed vs ledger"
    )
    if check_only:
        return 1 if (changed or added or removed) else 0

    if unlisted_changed or unlisted_added or unlisted_removed:
        print(
            "REFUSING to update fingerprints for queries not in "
            "registry._NEW_OR_CHANGED — add them there first (they need "
            "fresh driver rows) or revert the plan change; deletions must "
            "be acknowledged in registry._REMOVED:",
            file=sys.stderr,
        )
        for n in unlisted_changed:
            print(f"  changed-but-unlisted: {n}", file=sys.stderr)
        for n in unlisted_added:
            print(f"  new-but-unlisted:     {n}", file=sys.stderr)
        for n in unlisted_removed:
            print(f"  removed-but-unlisted: {n}", file=sys.stderr)
        return 1

    LEDGER.write_text(json.dumps(current, indent=1, sort_keys=True) + "\n")
    for n in changed:
        print(f"  updated: {n}")
    for n in added:
        print(f"  added:   {n}")
    for n in removed:
        print(f"  removed: {n}")
    print(f"wrote {LEDGER}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
