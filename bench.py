"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a count() over its full plan (no collect of
wide results — we measure engine time, not driver materialization).

Methodology (TPC-style power run): one warm-up iteration runs the full
headline set first, then TWO timed iterations; the reported per-query
number is the min of the timed runs (the standard noise-robust
estimator, cf. timeit). The warm-up absorbs one-time JVM/whole-stage-
codegen compilation (~0.3-0.5s per stage locally) that is irrelevant at
the 100 TB target — on a long-lived cluster compiled plans amortize to
zero, so the steady-state number is the one that predicts scale
throughput. The warm-up's per-query times are still published under
"cold_queries"/"cold_value" so the compile overhead stays visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecom_etl_proj_spark.catalog import load_tables  # noqa: E402
from ecom_etl_proj_spark.plans import registry  # noqa: E402
from ecom_etl_proj_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "sales_master_join",
    "kpi_overview",
    "rfm_segments",
    "revenue_by_nation",
    "seller_performance",
    "events_minutely",
    "dedup_minhash_lsh",
    "embedding_knn",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    tables = load_tables(spark, sf_dir, register=False)
    # Warm the JVM + file listing once so per-query numbers measure the
    # query, not session startup.
    tables["lineitem"].count()

    qs = registry.queries()

    def one_pass(label: str) -> tuple[dict[str, float], float]:
        times: dict[str, float] = {}
        total = 0.0
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = round(time.time() - t0, 3)
            times[name] = dt
            total += dt
            print(f"# [{label}] {name}: {n} rows in {dt}s", file=sys.stderr)
        return times, round(total, 3)

    cold_times, cold_total = one_pass("cold")
    t1, _ = one_pass("warm1")
    t2, _ = one_pass("warm2")
    best = {name: min(t1[name], t2[name]) for name in HEADLINE}
    best_total = round(sum(best.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": best_total,
                "unit": "sec",
                "queries": best,
                "cold_queries": cold_times,
                "cold_value": cold_total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
