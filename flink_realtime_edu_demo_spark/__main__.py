"""CLI for the engine — run/list/explain/bench without writing code.

    python -m flink_realtime_edu_demo_spark list
    python -m flink_realtime_edu_demo_spark run q_agg_basic --sf /root/testdata/sf0.01
    python -m flink_realtime_edu_demo_spark explain q_join_inner
    python -m flink_realtime_edu_demo_spark oracle q_agg_basic
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flink_realtime_edu_demo_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered query keys")
    p_run = sub.add_parser("run", help="run a query and show the result")
    p_run.add_argument("key")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("-n", type=int, default=20, help="rows to show")
    p_ex = sub.add_parser("explain", help="show a query's physical plan")
    p_ex.add_argument("key")
    p_ex.add_argument("--sf", default="/root/testdata/sf0.01")
    p_or = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_or.add_argument("key")

    args = ap.parse_args(argv)

    from .registry import ORACLE, QUERIES
    from .queries import load_all  # noqa: F401 (import side effect on pkg import)

    if args.cmd == "list":
        for k in sorted(QUERIES):
            print(f"{k}{'' if k in ORACLE else '  (rows-only)'}")
        return 0
    if args.cmd == "oracle":
        if args.key not in ORACLE:
            print(f"{args.key}: no oracle (rows-only query)", file=sys.stderr)
            return 1
        print(ORACLE[args.key])
        return 0

    if args.key not in QUERIES:
        print(f"unknown query: {args.key}", file=sys.stderr)
        return 1

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.key](spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(n=args.n, truncate=False)
        print(f"[{df.count()} rows total]")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
