"""A/B for the PQ encode path (r12 regression, r13 judge task #1).

The r12 commit 434aac2 rewrote ``_pq_codes`` from a codegen'd
broadcast-join + struct-min groupBy into a row-local interpreted
higher-order-function fold, claiming a shuffle win but recording no
timing; the r12 judge measured the retrieval ring's ``pq_search`` warm
+79% and ``ann_ivfpq`` +37% against r11. This script decides the form
per regime in ONE session: both expression forms (bit-identical codes
and distances) plus the eager Arrow/BLAS twin, at the oracle config
(m=8 x k=16 — what the registered/ring queries run) and the production
config (m=16 x k=256 — what ``build_ann_state(pq_m=16)`` encodes), on
the sf0.1 corpus (2k x 64) and a 10x replica (20k x 64). Interleaved
A/B/A/B reps; warm-min and median per arm.

Result (r13 host, sf0.1, loadavg ~2, 3 interleaved reps per arm,
times = a pruning-proof hash-sum over (vec_id, sub, code) — a first
draft used bare count() and Catalyst PRUNED the argmin entirely,
"measuring" the fold flat at 0.25s for 80M lambda evals; seconds):

    config    corpus   join(min/med)   fold(min/med)   arrow(min/med)
    8x16      2k       0.755 / 0.773   0.722 / 0.732   0.286 / 0.303
    8x16      20k      4.639 / 4.930   4.446 / 5.002   0.927 / 0.983
    16x256    2k       8.356 /10.246   7.670 / 8.006   0.355 / 0.396
    16x256    20k     97.016 /102.36  81.390 /87.526   2.482 / 2.649

And the REGISTERED-ring context (pq_search / ann_ivfpq at sf0.1,
warm-min of 4, same session; the consumers prune `d`):

    pq_search   join 0.939 / fold 1.262   (join wins ~25%)
    ann_ivfpq   join 1.766 / fold 1.726   (tie)

Verdict, three parts:

  1. With the argmin forced, join ≈ fold at EVERY width — both L2
     distances are interpreted HOF folds (``_SQ_L2`` inside the join
     form is aggregate+zip_with too), so the r12 commit's premise
     ("kill the row-expansion shuffle") moved no real cost: the
     map-side partial min had already collapsed the expansion before
     the exchange. The ring regression came from the serving plans:
     with `d` pruned by the ADC consumer, the join+partial-min shape
     executes ~25% faster than the fold for pq_search.
  2. Default restored to the r11 JOIN form at small k
     (PQ_FOLD_MIN_CODES=64); wide codebooks keep the fold
     (marginally faster forced, no k-wide row buffering).
  3. NEITHER expression form is servable at the production 16x256
     config (81-97s vs 2.5s on 20k vectors): the Arrow/BLAS twin is
     23-35x faster and flat in k — production builds keep routing
     through ``_pq_assign_arrow`` (``build_ann_state`` already
     does); oracle rows keep the expression form for bit-exact
     DuckDB parity.

Run:  python tools/ab_pq_encode.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecom_etl_proj_spark.catalog import load_tables  # noqa: E402
from ecom_etl_proj_spark.operators import similarity as S  # noqa: E402
from ecom_etl_proj_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ab_pq_encode")
    emb = load_tables(spark, sf_dir, register=False)["embeddings"]
    n = emb.count()
    # 10x replica with distinct vec_ids — same distribution, bigger
    # corpus; materialized to parquet so every arm pays one scan, not
    # the replication plan.
    rep_path = "/tmp/ab_pq_encode_10x.parquet"
    emb.crossJoin(
        spark.range(10).select(F.col("id").alias("rep"))
    ).select(
        (F.col("vec_id") + F.col("rep") * F.lit(n)).alias("vec_id"),
        "embedding",
    ).write.mode("overwrite").parquet(rep_path)
    emb10 = spark.read.parquet(rep_path)
    emb10.count()

    configs = [("8x16", 8, 16), ("16x256", 16, 256)]
    corpora = [("base", emb), ("10x", emb10)]
    out: dict[str, dict[str, list[float]]] = {}

    def time_arm(fn) -> float:
        # Force the ARGMIN itself: a bare count() lets Catalyst prune
        # the code/d columns, and the fold form's row-local projection
        # then drops entirely (first draft of this tool measured the
        # fold "flat at 0.25s" for 80M lambda evals — column pruning,
        # not speed). Summing a hash of the code output defeats pruning
        # in every arm while collecting one row.
        t0 = time.time()
        fn().select(
            F.pmod(
                F.xxhash64("vec_id", "sub", "code"), F.lit(1_000_000)
            ).alias("h")
        ).agg(F.sum("h")).collect()
        return round(time.time() - t0, 3)

    for cname, m, k in configs:
        d_sub = 64 // m
        for label, corpus in corpora:
            cb = S._pq_codebook(corpus, m, k, d_sub)
            cb_rows = cb.collect()  # arrow arm is eager by contract
            arms = {
                "join": lambda c=corpus, cbb=cb: S._pq_codes(
                    c, m, k, d_sub, cb=cbb, encode_impl="join"
                ),
                "fold": lambda c=corpus, cbb=cb: S._pq_codes(
                    c, m, k, d_sub, cb=cbb, encode_impl="fold"
                ),
                "arrow": lambda c=corpus, r=cb_rows: S._pq_assign_arrow(
                    c, r, m, d_sub
                ),
            }
            key = f"{cname}/{label}"
            out[key] = {a: [] for a in arms}
            for a, fn in arms.items():  # one untimed warmup per arm
                time_arm(fn)
            for _ in range(reps):  # interleaved
                for a, fn in arms.items():
                    out[key][a].append(time_arm(fn))
            print(
                f"# {key}: "
                + "  ".join(
                    f"{a} min={min(v):.3f} med={statistics.median(v):.3f}"
                    for a, v in out[key].items()
                ),
                file=sys.stderr,
            )

    summary = {
        key: {
            a: {
                "min": round(min(v), 3),
                "median": round(statistics.median(v), 3),
            }
            for a, v in arms.items()
        }
        for key, arms in out.items()
    }
    print(json.dumps({"reps": reps, "sf_dir": sf_dir, "result": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
