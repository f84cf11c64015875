"""CLI: run queries, the batch ETL, or the bench from the command line.

    python -m ecom_etl_proj_spark list
    python -m ecom_etl_proj_spark query pricing_summary [--sf-dir DIR] [-n 20]
    python -m ecom_etl_proj_spark etl --sf-dir DIR --out /tmp/lake
"""

from __future__ import annotations

import argparse
import sys

from ecom_etl_proj_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ecom_etl_proj_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    q = sub.add_parser("query", help="run one registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("-n", type=int, default=20, help="rows to show")

    e = sub.add_parser("etl", help="run the ODS→STG→DWH batch pipeline")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.add_argument("--out", required=True)

    args = p.parse_args(argv)

    from ecom_etl_proj_spark.plans import registry

    if args.cmd == "list":
        oracles = registry.oracle_sql()
        for name in sorted(registry.queries()):
            tag = "sql-oracle" if name in oracles else "rows-only"
            print(f"{name:32s} {tag}")
        return 0

    spark = get_spark("ecom-etl-proj-spark-cli")
    if args.cmd == "query":
        qs = registry.queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        qs[args.name](spark, args.sf_dir).show(args.n, truncate=False)
        return 0

    if args.cmd == "etl":
        from ecom_etl_proj_spark.pipelines import batch

        rep = batch.run_batch_etl(spark, args.sf_dir, args.out)
        print("ods:", rep.ods_counts)
        print("stg:", rep.stg_counts)
        print("dwh:", rep.dwh_counts)
        print("not-null violations:", rep.not_null_violations)
        return 0 if rep.ok else 1

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
