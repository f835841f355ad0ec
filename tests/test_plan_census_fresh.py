"""VERDICT r11 task #7: the committed plan census must match the final
tree.  The r11 census shipped stale (generated before the x25/x25b
Expand removal), so an auditor reading it saw operators the after-plans
prove gone.  Mechanical guard: every census stamps the sha256 of
PLAN_FINGERPRINTS.json it was generated against; the NEWEST committed
census must carry the CURRENT ledger's hash — any acknowledged plan
change therefore forces a census regeneration in the same commit
(`python scripts/plan_census.py`, analysis-only, ~3 min)."""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _newest_census() -> Path:
    cands = sorted(
        REPO.glob("plans/r*/PLAN_CENSUS.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.parent.name).group(1)),
    )
    assert cands, "no committed PLAN_CENSUS.json anywhere under plans/"
    return cands[-1]


def test_newest_census_matches_current_fingerprints():
    census = json.loads(_newest_census().read_text())
    got = census.get("_fingerprints_sha256")
    want = hashlib.sha256(
        (REPO / "PLAN_FINGERPRINTS.json").read_bytes()
    ).hexdigest()
    assert got == want, (
        f"{_newest_census()} was generated against a different "
        "PLAN_FINGERPRINTS.json - regenerate it "
        "(python scripts/plan_census.py) in the same commit as the "
        "acknowledged plan change"
    )


def test_census_covers_every_registered_query():
    from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES

    census = json.loads(_newest_census().read_text())
    names = {n for n in census if not n.startswith("_")}
    assert names == set(QUERIES), (
        sorted(set(QUERIES) - names),
        sorted(names - set(QUERIES)),
    )
