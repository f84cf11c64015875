"""ETL-layer cleaning operators.

Re-expresses the reference's warehouse-layer transforms
(/root/reference/staging_layer.py, /root/reference/spark_transform.py)
as composable DataFrame functions. Each is a pure logical-plan builder:
no actions, no collect, so Catalyst can fuse them with downstream plans.

Scale notes (100 TB):
- ``dedup_keep_first`` is a window over the dedup key — one shuffle on the
  key, map-side partial sort. AQE splits skewed keys.
- ``impute_mean`` computes the scalar means once and broadcast-joins them
  (the reference's ``CROSS JOIN product_means``, staging_layer.py:203-225)
  instead of a whole-table window, which would funnel into one partition.
- ``sentinel_timestamps`` and ``normalize_strings`` are pure row-local
  projections — stay inside WholeStageCodegen, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """Keep one row per key, deterministically.

    Mirrors the staging layer's ``QUALIFY ROW_NUMBER() OVER (PARTITION BY
    ... ORDER BY ...) = 1`` dedup (staging_layer.py:181-198) and the
    ingestion script's dropDuplicates (spark_transform.py:548-555), but
    with an explicit deterministic tiebreak instead of arbitrary pick.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def impute_mean(df: DataFrame, cols: list[str], ndigits: int = 2) -> DataFrame:
    """Replace NULLs in numeric columns with the column's global mean.

    The reference imputes product dims with table-wide AVGs via a
    cross-joined one-row means table (staging_layer.py:203-225). We do the
    same: a scalar aggregate (map-side partial, tiny shuffle) broadcast
    back onto the data — O(1) extra state per executor at any scale.
    """
    means = df.agg(
        *[F.avg(F.col(c)).alias(f"__mean_{c}") for c in cols]
    )
    out = df.crossJoin(F.broadcast(means))
    for c in cols:
        out = out.withColumn(
            c, F.round(F.coalesce(F.col(c), F.col(f"__mean_{c}")), ndigits)
        )
    return out.drop(*[f"__mean_{c}" for c in cols])


def sentinel_timestamps(
    df: DataFrame, cols: list[str], sentinel: str = "1900-01-01 00:00:00"
) -> DataFrame:
    """NULL timestamps → fixed sentinel (staging_layer.py:288-316)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.lit(sentinel).cast("timestamp"))
        )
    return out


def normalize_strings(df: DataFrame, cols: list[str]) -> DataFrame:
    """lower+trim string normalization (spark_transform.py:534-546)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.lower(F.trim(F.col(c))))
    return out


def dim_key_map(
    df: DataFrame, key: str, value: str, order_by: list[str]
) -> DataFrame:
    """Deterministic key → single representative value mapping.

    Mirrors the zip→geolocation_id map with min-latitude tiebreak
    (staging_layer.py:228-233, spark_transform.py:359-392). Output is one
    row per key — small enough to broadcast into downstream joins.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key, value)
    )


def audit_columns(df: DataFrame, snapshot_date: str) -> DataFrame:
    """Append warehouse audit columns (target_layer.py:36-154).

    The reference uses CURRENT_DATE() defaults; we take an explicit
    snapshot date so loads are reproducible/idempotent.
    """
    d = F.lit(snapshot_date).cast("date")
    return df.withColumn("insertion_date", d).withColumn("modification_date", d)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Change-data-capture diff between two snapshots of a table.

    The reference reloads warehouse tables wholesale (truncate-reload,
    ods_layer.py); at 100 TB the incremental alternative is this diff:
    full outer join on the business key, classify each row as
    insert / delete / update / unchanged by comparing the compare
    columns as a null-safe struct. A hash compare is NOT safe here:
    Spark's hash expressions pass the seed through unchanged for NULL
    inputs, so ('a', NULL) and (NULL, 'a') hash identically and a real
    update would be silently classified unchanged. The struct compare
    is exact; Catalyst prunes the unused compare columns after the
    join, so the extra shuffle payload vs a hash is just the struct of
    compare columns (for very wide dims, hash each column WITH a typed
    null sentinel before combining).
    """
    def with_cmp(df: DataFrame, side: str) -> DataFrame:
        cols = [F.col(c).alias(f"{side}_{c}") for c in keys + compare_cols]
        cmp_s = F.struct(*[F.col(c) for c in compare_cols]).alias(f"{side}_cmp")
        return df.select(*cols, cmp_s)

    o = with_cmp(old, "old")
    n = with_cmp(new, "new")
    cond = None
    for k in keys:
        eq = o[f"old_{k}"] == n[f"new_{k}"]
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    first_key = keys[0]
    change = (
        F.when(F.col(f"old_{first_key}").isNull(), F.lit("insert"))
        .when(F.col(f"new_{first_key}").isNull(), F.lit("delete"))
        .when(~F.col("old_cmp").eqNullSafe(F.col("new_cmp")), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    key_out = [
        F.coalesce(F.col(f"new_{k}"), F.col(f"old_{k}")).alias(k) for k in keys
    ]
    return joined.select(*key_out, change.alias("change_type"))


def try_parse_timestamps(
    df: DataFrame, col: str, fmt: str = "yyyy-MM-dd HH:mm:ss"
) -> DataFrame:
    """Permissive timestamp parse: bad strings → NULL, never a job abort.

    The reference loads every raw timestamp through TRY_TO_TIMESTAMP
    (ods_layer.py:328-355) so one malformed row can't fail a COPY. The
    Spark twin is ``try_to_timestamp`` — same contract under ANSI mode,
    where a plain cast would throw. Row-local, stays in codegen.
    """
    return df.withColumn(col + "_ts", F.try_to_timestamp(F.col(col), F.lit(fmt)))


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data-quality profile: rows of
    (column, n_rows, n_null, n_distinct, min_str, max_str).

    The pre-load profiling step a warehouse runs before trusting a feed
    (the reference only counts rows post-load; this is strictly more).
    ONE aggregation pass computes every column's stats side by side
    (4 x |cols| aggregate buffers), then the wide row is unpivoted
    row-locally. At 100 TB swap count_distinct for
    approx_count_distinct — same plan, bounded state.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    stacked = ", ".join(
        f"'{c}', __total - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        "__total AS n_rows",
        f"stack({len(cols)}, {stacked}) AS (column_name, n_null, n_distinct, min_str, max_str)",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
