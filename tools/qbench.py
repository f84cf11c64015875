"""Time individual registry/prod queries: cold + 2 warm passes.

Usage: python tools/qbench.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Same methodology as bench.py's rings (build + count timed together,
warm = min of two post-cold passes, lloyd caches released between
passes) so numbers are comparable to BENCH_DETAIL entries measured on
the same host.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecom_etl_proj_spark.catalog import load_tables  # noqa: E402
from ecom_etl_proj_spark.plans import registry  # noqa: E402
from ecom_etl_proj_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qbench")
    tables = load_tables(spark, sf_dir, register=False)
    for tbl in ("lineitem", "documents", "embeddings"):
        tables[tbl].count()
    import bench as _bench

    qs = registry.queries()
    qs.update(_bench._llm_prod_queries())
    from ecom_etl_proj_spark.operators.similarity import release_lloyd_caches

    print(f"# loadavg={os.getloadavg()}", file=sys.stderr)
    for name in names:
        fn = qs[name]
        runs = []
        rows = None
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            rows = df.count()
            runs.append(round(time.time() - t0, 3))
            release_lloyd_caches()
        print(
            f"{name}: cold={runs[0]} warm={min(runs[1:])} all={runs} "
            f"rows={rows}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
