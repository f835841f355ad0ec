"""Round-11 full-registry plan census (guide §7.2, mechanized).

Explains EVERY registered query (analysis only — no execution) and
records a plan-shape digest per query: operator counts (Exchange,
join strategies, Window/Sort, Python-eval nodes, Generate/Expand) plus
the §7.2 red-flag list the optimization guide says to audit for:

- CartesianProduct / BroadcastNestedLoopJoin anywhere,
- row-at-a-time BatchEvalPython (non-Arrow Python UDF),
- a parquet scan with no ReadSchema pruning (reads every column).

Output: ``plans/r11/PLAN_CENSUS.json`` mapping query -> digest, and a
stdout summary of every red-flagged query. The census is the
examination checklist for OPTIMIZATION_r11.md — anomalies it surfaces
get a hand audit; queries it clears are cleared by evidence, not by
sampling.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from scripts.opt_measure import plan_shape  # noqa: E402

# round 12 (VERDICT r11 task #7): the census is round-parameterized and
# stamps the sha256 of PLAN_FINGERPRINTS.json it was generated against,
# so tests/test_plan_census_fresh.py can mechanically reject a census
# that predates the last acknowledged plan change (the r11 census
# shipped stale — generated before the x25/x25b Expand removal).
import hashlib
import os

ROUND = os.environ.get("SPARK_GRAFT_OPT_ROUND", "r12")
OUT = ROOT / "plans" / ROUND / "PLAN_CENSUS.json"
SF_DIR = "/root/testdata/sf0.001"


def fingerprints_sha() -> str:
    return hashlib.sha256((ROOT / "PLAN_FINGERPRINTS.json").read_bytes()).hexdigest()


def main() -> None:
    from squonk2_fastapi_ws_event_stream_spark.registry import QUERIES
    from squonk2_fastapi_ws_event_stream_spark.session import get_spark

    spark = get_spark("plan-census")
    spark.sparkContext.setLogLevel("ERROR")

    census: dict[str, dict] = {}
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF_DIR)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df.queryExecution() if hasattr(df, "queryExecution")
            else df._jdf.queryExecution(),
            "formatted",
        )
        shape = plan_shape(formatted)
        flags = []
        if "Cartesian" in shape:
            flags.append("cartesian")
        if "BNLJoin" in shape:
            flags.append("broadcast-nested-loop")
        if "BatchEvalPython" in shape:
            flags.append("pickled-python-udf")
        # Un-pruned scans: a ReadSchema that still carries every column
        # of a wide table (heuristic: >= 12 fields in one scan).
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted):
            n_cols = len([c for c in m.group(1).split(",") if ":" in c])
            if n_cols >= 12:
                flags.append(f"wide-scan:{n_cols}cols")
        census[name] = {"shape": shape, "flags": flags}

    census["_fingerprints_sha256"] = fingerprints_sha()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(census, indent=1, sort_keys=True))
    flagged = {
        n: c["flags"]
        for n, c in census.items()
        if not n.startswith("_") and c["flags"]
    }
    n_queries = len([n for n in census if not n.startswith("_")])
    print(f"{n_queries} queries; {len(flagged)} flagged")
    for n, fl in sorted(flagged.items()):
        print(f"  {n}: {', '.join(fl)}")


if __name__ == "__main__":
    main()
