"""Lake maintenance: small-file compaction.

At 100 TB the silent killer is file count, not byte count: streaming
sinks and per-batch appends leave thousands of KB-sized files per
partition, and every downstream scan pays per-file open/footer cost.
The fix is periodic rewrite at a target file size — this module is that
op, kept deliberately simple (read → repartition to ceil(bytes/target)
→ overwrite) so it composes with any table layout.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~target-sized files.

    Returns (files_before, files_after). The rewrite stages through a
    sibling directory then swaps, so a crash mid-compact never leaves
    the table truncated.

    Crash-recovery note: the swap is two renames (path →
    .__compact_old__, tmp → path); a crash between them leaves ``path``
    absent — recovery is renaming ``.__compact_old__`` back (compaction
    is idempotent and simply re-runs). On Delta/Iceberg this is an
    atomic snapshot commit; plain parquet directories have no atomic
    rename, so the recovery contract is documented instead.
    """
    before, total = dir_stats(path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    # swap
    import shutil

    old = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after, _ = dir_stats(path)
    return before, after


def cluster_table(
    spark: SparkSession,
    path: str,
    cluster_col: str,
    n_files: int = 8,
) -> int:
    """Range-cluster a table on a key: every output file owns a disjoint
    key range, written sorted within the file.

    This is the data-layout half of pruning. Partition pruning handles
    the directory level; WITHIN a partition, parquet min/max footer
    stats only skip files whose key ranges don't overlap the predicate
    — which random layout never achieves. repartitionByRange assigns
    disjoint ranges per output task (sampling the key distribution, so
    skew produces balanced files, not equal-width ranges), and the
    in-file sort tightens row-group stats too. At 100 TB a point/range
    predicate then reads ~1/n_files of the data instead of all of it
    (the single-key case of Z-ordering; multi-key locality needs a
    space-filling curve, same write pattern).

    Same staged-swap + recovery contract as ``compact``. Returns the
    number of data files written.
    """
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__cluster_tmp__"
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    import shutil

    old = path.rstrip("/") + ".__cluster_old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    n, _ = dir_stats(path)
    return n
