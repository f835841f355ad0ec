"""Query-runner CLI: run any registered query from the command line.

    python -m squonk2_fastapi_ws_event_stream_spark list
    python -m squonk2_fastapi_ws_event_stream_spark run q01_pricing_summary
    python -m squonk2_fastapi_ws_event_stream_spark run t02_dedup_minhash_lsh \
        --sf-dir /root/testdata/sf0.01 --limit 50
    python -m squonk2_fastapi_ws_event_stream_spark sql \
        "SELECT COUNT(*) FROM lineitem"
    python -m squonk2_fastapi_ws_event_stream_spark explain v03_ann_ivf_topk

`sql` registers every test table as a temp view first, so ad-hoc ANSI SQL
works against the same catalog the named queries use.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="squonk2_fastapi_ws_event_stream_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run_p = sub.add_parser("run", help="run a registered query")
    run_p.add_argument("name")
    run_p.add_argument("--sf-dir", default=None)
    run_p.add_argument("--limit", type=int, default=20)

    sql_p = sub.add_parser("sql", help="run ad-hoc SQL over the test tables")
    sql_p.add_argument("query")
    sql_p.add_argument("--sf-dir", default=None)
    sql_p.add_argument("--limit", type=int, default=20)

    exp_p = sub.add_parser("explain", help="print a query's optimized plan")
    exp_p.add_argument("name")
    exp_p.add_argument("--sf-dir", default=None)

    args = ap.parse_args(argv)

    from .registry import QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            print(name)
        return 0

    if args.cmd in ("run", "explain") and args.name not in QUERIES:
        print(f"unknown query: {args.name} (see `list`)", file=sys.stderr)
        return 2

    from .session import get_spark
    from .tables import DEFAULT_SF_DIR, register_views

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark("squonk2-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "sql":
        register_views(spark, sf_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
        return 0
    df = QUERIES[args.name](spark, sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
