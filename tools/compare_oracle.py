"""Local stand-in for the driver's t2 correctness gate.

Runs every registry query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and
order-insensitive values (sorted rows, string-normalized). Run:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecom_etl_proj_spark.catalog import TABLES  # noqa: E402
from ecom_etl_proj_spark.plans import registry  # noqa: E402
from ecom_etl_proj_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_col(s: pd.Series) -> pd.Series:
        if pd.api.types.is_float_dtype(s):
            return s.round(6)
        if pd.api.types.is_datetime64_any_dtype(s):
            return s.astype("datetime64[us]")
        # DuckDB returns date as object(datetime.date); Spark as object too
        return s

    out = df.apply(norm_col)
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("compare-oracle")
    qs = registry.queries()
    oracles = registry.oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS" if len(sdf) >= 0 else "FAIL"
            print(f"{status}  {name}: rows={len(sdf)} (rows-only) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            s_n, o_n = normalize(sdf), normalize(odf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: normalize error: {e}")
            n_fail += 1
            continue
        if list(s_n.columns) != list(o_n.columns):
            print(f"FAIL  {name}: columns {list(s_n.columns)} vs {list(o_n.columns)}")
            n_fail += 1
            continue
        if len(s_n) != len(o_n):
            print(f"FAIL  {name}: rows {len(s_n)} vs {len(o_n)}")
            n_fail += 1
            continue
        s_str = s_n.astype(str)
        o_str = o_n.astype(str)
        if not s_str.equals(o_str):
            neq = (s_str != o_str).any(axis=0)
            bad_cols = list(neq[neq].index)
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                mask = s_str[c] != o_str[c]
                print("  spark:", s_n.loc[mask, c].head(3).tolist())
                print("  duck :", o_n.loc[mask, c].head(3).tolist())
            n_fail += 1
            continue
        print(f"PASS  {name}: rows={len(s_n)} [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    # certify-count sync (r16, r15 verdict item #7): a FULL sweep's
    # pass count must equal the registry size, so a round close-out
    # can never state a stale total (the r15 "225 queries" drift —
    # the certify sweep predated the last registration). CERTIFIED
    # prints only when the whole registry was swept and all passed.
    if not only:
        total = len(registry._REGISTRY)
        if n_pass == total and n_fail == 0:
            print(f"CERTIFIED: {n_pass}/{total} registry queries green")
        else:
            print(
                f"NOT CERTIFIED: {n_pass} green of {total} registered"
                f" ({n_fail} fail)"
            )
            sys.exit(1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
