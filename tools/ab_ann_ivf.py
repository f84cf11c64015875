"""Same-session A/B for the r7 ann_ivf warm drift (judge task r8.2).

BENCH_r07 showed the registered ``ann_ivf`` (expression assignment,
lloyd_iters=0) warm series at 2.19s normalized vs 1.80s in r6 (+22%).
The registered path is PLAN-IDENTICAL between the two rounds — the r7
commits (aa0c208, 2fc6d59) only added opt-in ``assign_impl``/``impl``
parameter plumbing around the unchanged expression code (diff of
``ann_ivf``/``_assign_cells``/``lloyd_refine`` non-comment lines r6 vs
r7: parameter threading only) — so a code regression is impossible;
the candidates are (a) host noise and (b) bench-context interference:
r7's bench runs the new Arrow variants (Python workers, driver
collects) in the prod ring BETWEEN the warm passes that produce the
ann_ivf warm-min.

This script decides it in ONE session: it times the r6 file's
``ann_ivf`` (checked out verbatim) against HEAD's interleaved A/B/A/B,
then re-times HEAD's after executing the Arrow variants, mimicking the
bench pass order.

Result (r8 host, loadavg 1.2-2.5, sf0.1, 5 interleaved reps each):

    r6-code    warm-min 1.752  median 1.983
    head       warm-min 1.792  median 2.012
    head after arrow ring ran in-session: warm-min 1.587 median 1.673

r6 vs HEAD code: equal within noise (as the diff predicts — min delta
2%, median delta 1.5%). Arrow interference: NEGATIVE — the registered
path got ~10% FASTER after the Arrow ring ran (more JVM warmup, no
Python-worker drag), ruling out bench-context interference. The
observed +22% round-over-round warm drift is therefore host variance:
the calibration_sec ratio is a mean correction, and per-query jitter
at loadavg > 1 routinely exceeds 20% on this query (the five
same-code reps above span 1.75-2.49s by themselves — a 42% spread
inside ONE session).
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecom_etl_proj_spark.catalog import load_tables  # noqa: E402
from ecom_etl_proj_spark.session import get_spark  # noqa: E402

R6_COMMIT = "e076796"


def load_r6_module(repo: str):
    src = subprocess.run(
        ["git", "-C", repo, "show",
         f"{R6_COMMIT}:ecom_etl_proj_spark/operators/similarity.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/_similarity_r6_ab.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("similarity_r6_ab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "5"))
    r6 = load_r6_module(repo)
    from ecom_etl_proj_spark.operators import similarity as head

    spark = get_spark("ab-ann-ivf")
    t = load_tables(spark, sf_dir, register=False)
    t["embeddings"].count()

    def time_fn(fn):
        t0 = time.time()
        fn(t, lloyd_iters=0).count()
        return round(time.time() - t0, 3)

    # interleave so host drift hits both arms equally
    a, b = [], []
    time_fn(head.ann_ivf)  # one discard rep to absorb first-run JIT
    for _ in range(reps):
        a.append(time_fn(r6.ann_ivf))
        b.append(time_fn(head.ann_ivf))
    print("r6-code  ", a, "min", min(a), "median", statistics.median(a))
    print("head     ", b, "min", min(b), "median", statistics.median(b))

    # bench-context probe: run the Arrow variants (Python workers spin
    # up, bounded driver collects) then re-time the registered path
    head.ann_ivf(t, lloyd_iters=2, assign_impl="arrow").count()
    head.embedding_knn(t, impl="arrow").count()
    c = [time_fn(head.ann_ivf) for _ in range(reps)]
    print("head+arrow", c, "min", min(c), "median", statistics.median(c))
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    spark.stop()


if __name__ == "__main__":
    main()
