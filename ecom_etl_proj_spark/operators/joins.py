"""Specialized join operators Spark lacks as built-ins: as-of joins and
range(band) joins, expressed in their scale-safe forms.

- ``asof_join``: each left row picks the LATEST right row at-or-before
  its timestamp per key. The naive formulation is a theta join
  (left.ts >= right.ts) + argmax — quadratic per key. The scale-safe
  form is union-and-carry: tag both sides, union, ONE window pass per
  key ordered by time carrying the last-seen right payload forward. No
  join operator appears in the plan at all; cost is one shuffle on the
  key (the same trick operators/events.event_attribution uses for its
  concrete attribution case — this is the reusable generalization).
- ``range_band_join``: joining a fact value into non-overlapping bands
  is a range (theta) join in SQL; at scale the rewrite is a row-local
  band assignment (a generated CASE chain over the broadcast-small band
  list), after which any band attributes attach by equi-join. The range
  predicate never reaches the planner, so no nested-loop join exists to
  blow up. The DuckDB oracle runs the honest range join, proving the
  rewrite equivalent on non-overlapping, covering bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload`` columns
    (right-name → output-name) from the latest ``right`` row with
    right_ts <= left_ts for the same ``by`` key, NULL when none exists
    (or when the match is older than ``tolerance_seconds``).

    Union-and-carry: right rows sort before left rows on timestamp ties
    so an exactly-simultaneous right row matches (ASOF ... >= semantics).
    One window shuffle on the key; state carried is one struct per row.
    """
    carry = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(src).alias(dst) for src, dst in payload.items()],
    )
    # Build each side's real struct first, then stamp the OTHER side's
    # null placeholder with that exact DataType so the union lines up.
    lu_core = left.select(
        F.col(by).alias("__by"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
    )
    ru_core = right.select(
        F.col(by).alias("__by"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        carry.alias("__r"),
    )
    lu = lu_core.withColumn(
        "__r", F.lit(None).cast(ru_core.schema["__r"].dataType)
    )
    ru = ru_core.withColumn(
        "__l", F.lit(None).cast(lu_core.schema["__l"].dataType)
    )
    u = lu.unionByName(ru)
    w = (
        Window.partitionBy("__by")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1)
    match = F.col("__match")
    if tolerance_seconds is not None:
        lag_ok = (
            F.unix_timestamp("__ts") - F.unix_timestamp(match["__rts"])
        ) <= tolerance_seconds
        match = F.when(lag_ok, F.col("__match"))
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        match["__rts"].alias("asof_ts"),
        *[match[dst].alias(dst) for dst in payload.values()],
    )


def band_expr(value_col: str, bands: list[tuple[str, float, float]]) -> Column:
    """Row-local band assignment: a generated CASE chain over
    non-overlapping [lo, hi) bands — the scale-safe rewrite of the
    range join (the band list is metadata-small; the fact side never
    meets a theta-join operator)."""
    expr: Column | None = None
    v = F.col(value_col)
    for label, lo, hi in bands:
        cond = (v >= F.lit(lo)) & (v < F.lit(hi))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(F.lit(None))


def range_band_join(
    df: DataFrame, value_col: str, bands: list[tuple[str, float, float]]
) -> DataFrame:
    """Attach the matching band label to every row (NULL if uncovered)."""
    return df.withColumn("band", band_expr(value_col, bands))
