"""Attribute dedup_minhash_lsh's cold-run cost to codegen compilation.

Usage: python tools/profile_lsh.py [subplan ...]

Runs each named subplan (default: the full query) in ONE fresh session,
reporting wall time and the delta in Janino compilation time / generated
source size from org.apache.spark.metrics.source.CodegenMetrics.  Because
identical generated code hits the Janino cache, running subplans in
dependency order attributes compile cost incrementally.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecom_etl_proj_spark.catalog import load_tables  # noqa: E402
from ecom_etl_proj_spark.operators import dedup  # noqa: E402
from ecom_etl_proj_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def metrics(spark):
    jvm = spark.sparkContext._jvm
    cls = getattr(jvm, "org.apache.spark.metrics.source.CodegenMetrics$")
    obj = getattr(cls, "MODULE$")
    ct = obj.METRIC_COMPILATION_TIME()
    src = obj.METRIC_SOURCE_CODE_SIZE()
    return (
        ct.getCount(),
        sum(ct.getSnapshot().getValues()),
        src.getCount(),
        sum(src.getSnapshot().getValues()),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-lsh")
    t = load_tables(spark, sf_dir, register=False)
    t["documents"].count()  # warm scan

    n = 3
    n_bins = dedup.MINHASH_BANDS * dedup.MINHASH_ROWS

    def build(name):
        if name == "shingles":
            return dedup._doc_shingles(t, n)
        if name == "hashed":
            return (
                dedup._doc_shingles(t, n)
                .withColumn("h", dedup.md5_60(F.col("shingle")))
                .withColumn("bin", F.pmod("h", F.lit(n_bins)))
            )
        if name == "sets":
            return dedup.shingle_sets(t, n)
        if name == "full":
            return dedup.dedup_minhash_lsh(t, n, 0.1, hash_mode="md5")
        if name == "xxh":
            return dedup.dedup_minhash_lsh(t, n, 0.1, hash_mode="xxhash64")
        if name in ("bands", "bandsxxh"):
            mode = "md5" if name == "bands" else "xxhash64"
            df = dedup.dedup_minhash_lsh(t, n, 0.1, hash_mode=mode)
            # rebuild just the bands subplan via the module internals
            import pyspark.sql.functions as FF

            sets = dedup.shingle_sets(t, n)
            hs = FF.transform(FF.col("sh"), lambda s: dedup.hash64(s, mode))
            return sets.select("doc_id", FF.explode(hs).alias("h")).groupBy().count()
        raise SystemExit(f"unknown subplan {name}")

    names = sys.argv[1:] or ["full"]
    for name in names:
        before = metrics(spark)
        t0 = time.time()
        cnt = build(name).count()
        dt = time.time() - t0
        after = metrics(spark)
        print(
            f"{name}: rows={cnt} wall={dt:.2f}s "
            f"compiles={after[0] - before[0]} "
            f"compile_ms={after[1] - before[1]} "
            f"src_bytes={after[3] - before[3]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
