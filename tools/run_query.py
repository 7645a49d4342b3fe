#!/usr/bin/env python
"""Run any registered query by name from the command line.

    python tools/run_query.py --list
    python tools/run_query.py q3_shipping_priority
    python tools/run_query.py llm_exact_dedup --sf-dir /root/testdata/sf0.1 \
        --limit 50 --output /tmp/out.parquet

Prints the result as a table (or writes parquet with --output). This is
the ad-hoc entry point for a user of the engine; programmatic access goes
through ``__spark_entry__.queries()``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20, help="rows to print")
    ap.add_argument("--output", help="write full result as parquet here")
    ap.add_argument("--explain", action="store_true", help="print the plan")
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    from sealnet_etl_spark.registry import all_queries

    queries = all_queries()
    if args.list or not args.query:
        from sealnet_etl_spark.registry import QUERIES

        for name, spec in sorted(QUERIES.items()):
            kind = "hash-oracled" if spec.oracle else "rows-only"
            print(f"{name:40s} {spec.survey_id:12s} {kind}")
        return 0
    if args.query not in queries:
        print(f"unknown query: {args.query!r} (use --list)", file=sys.stderr)
        return 2

    from sealnet_etl_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.query}")
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
