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


def constraint_audit(t: dict[str, DataFrame]) -> DataFrame:
    """Warehouse constraint-audit suite (the Deequ / Great-Expectations
    shape): one verdict row per declared expectation — primary-key
    uniqueness per table, referential integrity along every FK edge of
    the star schema, NOT NULL on load-bearing columns, and domain
    ranges on money/quantity/discount. The report a data platform
    gates its loads on; the reference's target layer trusts Snowflake
    constraints (target_layer.py), which parquet lakes don't have —
    so the checks become an explicit, schedulable query.

    Scale shape: every check is ONE aggregate over its table (count +
    conditional sum fused into a single scan; PK checks are
    count-distinct with map-side partials), FK checks are a left join
    against the parent's distinct key (AQE picks broadcast for dims,
    sort-merge for fact-fact; a NULL or dangling FK both count as
    orphans), and the result is a ~23-row literal-width union —
    nothing funnels through one task. All counts are exact integers;
    composite keys compare via a STRUCT key (injective, NULL-safe per
    component) so both engines count the same tuples even on keys with
    NULLs or delimiter-like values.

    Output: (entity, check_name, n_rows, n_violations, ok) ordered by
    (entity, check_name). On the driver corpus every check passes
    except lineitem's composite PK — the synthetic generator reuses
    (l_orderkey, l_linenumber) pairs (14168 dup tuples at sf0.01),
    which is exactly the kind of silent data defect the audit exists
    to surface (both engines agree on the count, so the verdict row is
    oracle-verified rather than asserted away).
    """
    from functools import reduce

    def row(entity: str, check: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(entity).alias("entity"),
            F.lit(check).alias("check_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("viol").cast("bigint").alias("n_violations"),
            F.when(F.col("viol") == 0, 1).otherwise(0).alias("ok"),
        )

    def pk(entity: str, *cols: str) -> DataFrame:
        # Distinct over a STRUCT of the raw columns, not a concat_ws
        # string: concat_ws skips NULL components and a delimiter
        # inside a value can collide ('a|b','c') with ('a','b|c'),
        # so the string key is not injective. A struct with NULL
        # fields is itself non-NULL, so the count is NULL-safe per
        # component and injective (DuckDB's (a, b) row value has the
        # same semantics — verified both engines count identically on
        # NULL/delimiter-bearing keys).
        key = F.struct(*[F.col(c) for c in cols])
        return row(
            entity,
            "pk_unique:" + "+".join(cols),
            t[entity].agg(
                F.count("*").alias("n_rows"),
                (F.count("*") - F.count_distinct(key)).alias("viol"),
            ),
        )

    def fk(entity: str, col: str, parent: str, pcol: str) -> DataFrame:
        child = t[entity].select(F.col(col))
        keys = t[parent].select(F.col(pcol).alias("__pk")).distinct()
        joined = child.join(keys, F.col(col) == F.col("__pk"), "left")
        return row(
            entity,
            f"fk:{col}->{parent}",
            joined.agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    F.when(F.col("__pk").isNull(), 1).otherwise(0)
                ).alias("viol"),
            ),
        )

    def cond(entity: str, check: str, ok_expr) -> DataFrame:
        return row(
            entity,
            check,
            t[entity].agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(ok_expr, 0).otherwise(1)).alias("viol"),
            ),
        )

    from ecom_etl_proj_spark.catalog import FOREIGN_KEYS, PRIMARY_KEYS

    checks = [
        pk(entity, *cols) for entity, cols in PRIMARY_KEYS.items()
    ] + [
        fk(*edge) for edge in FOREIGN_KEYS
    ] + [
        cond("orders", "not_null:o_orderdate", F.col("o_orderdate").isNotNull()),
        cond("lineitem", "not_null:l_shipdate", F.col("l_shipdate").isNotNull()),
        cond("documents", "not_null:text", F.col("text").isNotNull()),
        cond(
            "lineitem",
            "range:0<=l_discount<=1",
            (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
        ),
        cond("lineitem", "range:l_quantity>0", F.col("l_quantity") > 0),
        cond("orders", "range:o_totalprice>=0", F.col("o_totalprice") >= 0),
    ]
    return reduce(DataFrame.unionByName, checks).orderBy(
        "entity", "check_name"
    )


def _is_missing(c: str) -> F.Column:
    """The reference's missing-value definition: pandas' na_values
    ('', 'null', 'NULL' — ingestion_script.py:248-252) plus
    whitespace-only, applied to raw all-string CSV columns."""
    col = F.col(c)
    t = F.trim(col)
    return col.isNull() | (t == "") | (F.lower(t) == "null")


def validation_errors(
    df: DataFrame,
    required: list[str],
    typed: dict[str, str] | None = None,
    key: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Row-level ingest validation: the reference's vectorized
    pandas checks (ingestion_script.py:230-340 process_csv_file) as
    ONE engine pass over a raw all-string frame. Appends ``_error``:
    NULL for loadable rows, else the FIRST failing rule in
    declaration order (the reference's error_series.fillna keeps the
    first error written) —

    1. required fields, in order: NULL/blank/'null' →
       'Missing required field: X';
    2. typed fields, in order: present but not castable to the
       declared type (``try_cast``, the engine twin of pd.to_numeric/
       to_datetime errors='coerce') → 'Field X should be <type>';
    3. duplicates among VALID rows on ``key`` (keep-first like
       pandas .duplicated(keep='first'), made deterministic by
       ``order_by`` instead of file order) → 'Duplicate record'.

    Scale shape: rules 1-2 are a row-local CASE chain (whole-stage
    codegen, zero shuffle). Rule 3 is one window on the key — the
    single shuffle this costs; invalid rows sort AFTER all valid rows
    in the window, so a valid row's row_number counts only the valid
    rows ahead of it and no separate valid-subset pass is needed.
    """
    typed = dict(typed or {})
    conds: list[tuple[F.Column, str]] = []
    for c in required:
        conds.append((_is_missing(c), f"Missing required field: {c}"))
    for c, typ in typed.items():
        conds.append(
            (
                ~_is_missing(c)
                & F.expr(f"try_cast({c} AS {typ})").isNull(),
                f"Field {c} should be {typ}",
            )
        )
    chain = F.lit(None).cast("string")
    for cond, msg in reversed(conds):
        chain = F.when(cond, F.lit(msg)).otherwise(chain)
    out = df.withColumn("_error", chain)
    if key:
        order_cols = [
            F.col(c)
            for c in (
                order_by
                or [c for c in df.columns if c not in set(key)]
            )
        ]
        w = Window.partitionBy(*[F.col(k) for k in key]).orderBy(
            F.col("_error").isNotNull().cast("int").asc(), *order_cols
        )
        out = out.withColumn(
            "_error",
            F.coalesce(
                F.col("_error"),
                F.when(
                    F.row_number().over(w) > 1, F.lit("Duplicate record")
                ),
            ),
        )
    return out


def quarantine_report(
    df: DataFrame,
    required: list[str],
    typed: dict[str, str] | None = None,
    key: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """(status, reason, n_rows): the load/quarantine split a
    validate-and-route ingest (``sources.ingest.ingest_validated``)
    would commit, as a report — counts by rejection reason, 'loaded'/
    'valid' for the clean rows. One scan + the key window + a tiny
    groupBy."""
    marked = validation_errors(df, required, typed, key, order_by)
    return (
        marked.select(
            F.when(F.col("_error").isNull(), F.lit("loaded"))
            .otherwise(F.lit("quarantined"))
            .alias("status"),
            F.coalesce(F.col("_error"), F.lit("valid")).alias("reason"),
        )
        .groupBy("status", "reason")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("status", "reason")
    )
