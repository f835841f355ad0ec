"""Physical-plan invariance sweep (round 11).

The driver's correctness gate and the repo's parity tests run under the
tuned session (AQE on, 32 shuffle partitions). On a 1000-executor
cluster the PHYSICAL plan differs — AQE makes different runtime
decisions, shuffle partitioning differs, broadcast thresholds flip join
strategies. Results must not depend on any of that: every query's
output is pinned against the DuckDB oracle under deliberately-hostile
session conf, whole-registry.

Perturbations swept (one full registry pass each):
  aqe-off     — spark.sql.adaptive.* = false (no runtime re-planning,
                no partition coalescing, no skew splitting)
  shuffle-7   — spark.sql.shuffle.partitions = 7 (different aggregation
                grouping/arrival order everywhere; catches any hidden
                dependence on collect_list/first order that array_sort
                and explicit tiebreaks are supposed to remove)
  no-broadcast— spark.sql.autoBroadcastJoinThreshold = -1 (every
                hint-free join falls back to sort-merge; catches
                results that only hold under broadcast-hash plans)

Round-11 evidence (sf0.001): aqe-off 275/275 exact, shuffle-7 275/275
exact, no-broadcast run via this script (ROUND11.md). Re-run per round
or after plan-shape work:

    python scripts/physical_invariance_sweep.py [sweep ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SWEEPS: dict[str, dict[str, str]] = {
    "aqe-off": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    },
    "shuffle-7": {"spark.sql.shuffle.partitions": "7"},
    "no-broadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
}


def run_sweep(spark, con, registry, sf_dir: str, limit: int | None) -> list[str]:
    bad: list[str] = []
    names = list(registry.QUERIES)[: limit or None]
    for i, name in enumerate(names):
        if name not in registry.ORACLES:
            continue
        try:
            sdf = registry.QUERIES[name](spark, sf_dir).toPandas()
            odf = con.execute(registry.ORACLES[name]).fetchdf()
            sdf = (
                sdf[sorted(sdf.columns)]
                .sort_values(by=sorted(sdf.columns))
                .reset_index(drop=True)
            )
            odf = (
                odf[sorted(odf.columns)]
                .sort_values(by=sorted(odf.columns))
                .reset_index(drop=True)
            )
            ok = sdf.shape == odf.shape and all(
                str(a) == str(b) or (a != a and b != b)
                for c1, c2 in zip(sdf.columns, odf.columns)
                for a, b in zip(sdf[c1], odf[c2])
            )
        except Exception as ex:  # noqa: BLE001 — a crash IS a finding
            ok = False
            print(f"  {name} EXC {type(ex).__name__}: {str(ex)[:120]}", flush=True)
        if not ok:
            bad.append(name)
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{len(names)} done, {len(bad)} mismatches", flush=True)
    return bad


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    limit = None
    if "--limit" in argv:
        i = argv.index("--limit")
        limit = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    chosen = argv or list(SWEEPS)
    unknown = set(chosen) - set(SWEEPS)
    if unknown:
        print(f"unknown sweeps: {sorted(unknown)} (have {sorted(SWEEPS)})")
        return 2

    import duckdb

    from squonk2_fastapi_ws_event_stream_spark import registry
    from squonk2_fastapi_ws_event_stream_spark.session import get_spark

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("physical-invariance-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    baseline = {
        k: spark.conf.get(k) for s in chosen for k in SWEEPS[s]
    }
    rc = 0
    for sweep in chosen:
        for k, v in SWEEPS[sweep].items():
            spark.conf.set(k, v)
        print(f"sweep {sweep} @ {sf_dir}:", flush=True)
        bad = run_sweep(spark, con, registry, sf_dir, limit)
        n = len(list(registry.QUERIES)[: limit or None])
        print(f"sweep {sweep}: {n} queries, {len(bad)} mismatches: {bad}")
        if bad:
            rc = 1
        for k in SWEEPS[sweep]:
            spark.conf.set(k, baseline[k])
    return rc


if __name__ == "__main__":
    sys.exit(main())
