"""Mechanical changed-plan detection (round-6 VERDICT task #2).

Round 6's t38 regression shipped because a perf commit rewrote a
NEIGHBOR query's plan through a shared helper and the hand-maintained
``_NEW_OR_CHANGED`` list missed it. These tests make that class of miss
impossible to commit silently: every registered query's analyzed-plan
fingerprint must match the committed ``PLAN_FINGERPRINTS.json``; the
only way to update that ledger is ``scripts/plan_fingerprints.py``,
which refuses to update a query not listed in ``_NEW_OR_CHANGED``.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from squonk2_fastapi_ws_event_stream_spark.registry import (
    _NEW_OR_CHANGED,
    _REMOVED,
    QUERIES,
)

ROOT = Path(__file__).resolve().parent.parent
LEDGER_PATH = ROOT / "PLAN_FINGERPRINTS.json"


@pytest.fixture(scope="module")
def ledger() -> dict[str, str]:
    assert LEDGER_PATH.exists(), (
        "PLAN_FINGERPRINTS.json missing — run scripts/plan_fingerprints.py"
    )
    return json.loads(LEDGER_PATH.read_text())


def test_every_query_has_a_committed_fingerprint(ledger):
    missing = sorted(QUERIES.keys() - ledger.keys())
    stale = sorted(ledger.keys() - QUERIES.keys())
    assert not missing, f"queries without committed fingerprints: {missing}"
    assert not stale, f"ledger entries for deleted queries: {stale}"


def test_no_silent_plan_drift(spark, ledger):
    """Recompute every fingerprint and diff against the committed ledger.

    A mismatch means some commit changed a query's logical plan without
    regenerating the ledger (which in turn requires the query to be in
    _NEW_OR_CHANGED so the driver re-samples it). This is exactly the
    d5cc579/t38 failure mode, now red in CI instead of invisible.
    """
    from scripts.plan_fingerprints import compute_all

    current = compute_all(spark)
    drifted = sorted(
        n for n in current if n in ledger and ledger[n] != current[n]
    )
    assert not drifted, (
        f"plan changed without ledger update: {drifted} — if intended, add "
        "to registry._NEW_OR_CHANGED and run scripts/plan_fingerprints.py"
    )


def test_guard_canary_catches_the_d5cc579_class():
    """The regeneration script must REFUSE a changed fingerprint for a
    query absent from _NEW_OR_CHANGED (simulated here by tampering a
    copy of the committed ledger for a deliberately-unlisted query)."""
    from scripts.plan_fingerprints import diff_ledger

    committed = json.loads(LEDGER_PATH.read_text())
    victim = next(n for n in sorted(committed) if n not in set(_NEW_OR_CHANGED))
    tampered = dict(committed)
    tampered[victim] = "0" * 16
    changed, added, removed = diff_ledger(tampered)
    assert victim in changed and not added and not removed
    # the script's refusal predicate: changed and unlisted
    unlisted = [n for n in changed if n not in set(_NEW_OR_CHANGED)]
    assert victim in unlisted, "guard would not have refused the update"


def test_ledger_diff_vs_prior_round_snapshot_is_acknowledged(ledger):
    """Round-8 VERDICT task #2: close the ledger-bypass hole.

    The regeneration script refuses unlisted changes, but a commit that
    hand-edits PLAN_FINGERPRINTS.json directly (alongside the plan change)
    used to pass CI without the query entering the driver head. This test
    diffs the live ledger against the LATEST committed per-round snapshot
    (PLAN_FINGERPRINTS_r{N}.json, written at round close via
    ``scripts/plan_fingerprints.py --snapshot N``): every entry that
    changed or appeared since that snapshot must be in _NEW_OR_CHANGED,
    and every entry that disappeared must be in _REMOVED — no matter HOW
    the ledger file was produced.
    """
    snaps = sorted(ROOT.glob("PLAN_FINGERPRINTS_r*.json"))
    assert snaps, "no per-round fingerprint snapshot committed"
    prior = json.loads(snaps[-1].read_text())

    listed = set(_NEW_OR_CHANGED)
    unlisted_changed = sorted(
        n for n in ledger
        if n in prior and prior[n] != ledger[n] and n not in listed
    )
    unlisted_added = sorted(ledger.keys() - prior.keys() - listed)
    unlisted_removed = sorted(prior.keys() - ledger.keys() - set(_REMOVED))
    assert not unlisted_changed, (
        f"ledger entries changed since {snaps[-1].name} without "
        f"_NEW_OR_CHANGED acknowledgement: {unlisted_changed}"
    )
    assert not unlisted_added, (
        f"ledger entries added since {snaps[-1].name} without "
        f"_NEW_OR_CHANGED acknowledgement: {unlisted_added}"
    )
    assert not unlisted_removed, (
        f"ledger entries removed since {snaps[-1].name} without "
        f"_REMOVED acknowledgement: {unlisted_removed}"
    )


def test_normalizer_strips_session_noise():
    from scripts.plan_fingerprints import normalize

    a = normalize("sum(l_quantity#123) AS sum_qty#124, plan_id=7 @deadbeef12"
                  " parquet /root/testdata/sf0.001/lineitem.parquet")
    b = normalize("sum(l_quantity#955) AS sum_qty#991, plan_id=31 @cafebabe99"
                  " parquet /root/testdata/sf0.01/lineitem.parquet")
    assert a == b
