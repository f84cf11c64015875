"""Sketch-based approximate operators — the 100 TB fast path.

Every exact operator here has a sketch twin whose state is O(sketch),
not O(distinct values):

- HyperLogLog (``approx_count_distinct``): distinct counting in ~KB of
  state per group instead of a distinct-shuffle of every key. This is
  how kpi_overview's "unique customers" survives a 100 TB fact table.
- KLL/GK quantiles (``approx_percentile``): bounded-state percentiles
  replacing exact ``percentile``'s per-group value buffer.
- Count-min sketch (``count_min_sketch``): heavy-hitter frequency
  estimation in fixed memory.

All are mergeable, so partial aggregation works map-side exactly like
sum/count — the shuffle carries sketches, not raw values.

Raw sketch OUTPUTS are not oracle-checkable value-for-value (DuckDB's
approx algorithms differ), so each sketch is registered through its
``*_audit`` twin below: Spark computes the approx AND the exact answer
in one plan and emits deterministic rows carrying the exact anchors
plus a ``within_bound`` boolean; the DuckDB oracle recomputes the exact
anchors and emits literal-TRUE bounds. A sketch drifting outside its
error bound therefore hash-MISMATCHES the oracle — the meaningful
contract for an approximate operator, now driver-verifiable instead of
rows-only. (``term_heavy_hitters`` needs no audit form: the KSP
candidate superset + exact recount + support threshold makes its output
exactly the deterministic heavy-hitter set.) Production callers use the
raw sketch functions; relative-error bounds are additionally
pytest-asserted in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kpi_overview_approx(t: dict[str, DataFrame], rsd: float = 0.02) -> DataFrame:
    """The dashboard KPI tile computed with HLL distinct counts.

    Same shape as analytics.kpi_overview (run_analytics.py:84-93) with
    approx_count_distinct at relative standard deviation ``rsd``.
    """
    return t["orders"].agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
        F.approx_count_distinct("o_orderkey", rsd).alias("approx_orders"),
        F.approx_count_distinct("o_custkey", rsd).alias("approx_customers"),
    )


def delay_quantiles_approx(t: dict[str, DataFrame], accuracy: int = 10000) -> DataFrame:
    """Ship-delay p50/p90/p99 per nation via approx_percentile —
    bounded state per group (the exact twin is
    analytics.delivery_delay_percentiles)."""
    d = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
        )
    )
    pct = F.expr(
        f"approx_percentile(delay_days, array(0.5, 0.9, 0.99), {accuracy})"
    )
    return d.groupBy("nation").agg(
        F.count("*").alias("n_items"),
        pct.getItem(0).alias("p50_delay"),
        pct.getItem(1).alias("p90_delay"),
        pct.getItem(2).alias("p99_delay"),
    )


def term_heavy_hitters(t: dict[str, DataFrame], support: float = 0.004) -> DataFrame:
    """Exact heavy hitters over the token stream, sketch-accelerated.

    ``DataFrame.stat.freqItems`` runs the Karp/Shenker/Papadimitriou
    single-pass frequent-items algorithm: fixed state (~1/support
    counters) per partition, merged associatively — no vocabulary-sized
    shuffle, which is what kills the exact top-terms groupBy at 100 TB.
    The candidate set is a GUARANTEED superset of every term with true
    frequency above ``support`` x total (the KSP invariant holds under
    any partition merge order), so after an exact broadcast-semi-join
    recount, filtering at that same threshold yields EXACTLY the
    deterministic heavy-hitter set with exact counts — sketch-dependent
    false-positive candidates are recounted and dropped, never
    reported. That determinism is what gives this sketch query a full
    DuckDB oracle (plain GROUP BY + HAVING over the same threshold);
    only candidate terms ever shuffle.
    """
    from ecom_etl_proj_spark.functions import text as X

    toks = t["documents"].select(F.explode(X.tokens()).alias("term"))
    candidates = (
        toks.stat.freqItems(["term"], support)
        .select(F.explode("term_freqItems").alias("term"))
    )
    total = toks.agg(F.count("*").alias("total"))
    return (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(total))
        # double-typed threshold on BOTH engines (the oracle casts its
        # literal to DOUBLE) so the boundary comparison is bit-identical
        .filter(F.col("freq") > F.lit(support) * F.col("total"))
        .select("term", "freq")
        .orderBy(F.col("freq").desc(), F.col("term").asc())
    )


def rfm_segments_approx(t: dict[str, DataFrame], accuracy: int = 10000) -> DataFrame:
    """RFM segmentation with sketch quantile boundaries — the scale
    default: the exact twin's boundary reduce buffers every customer
    value in one aggregation buffer; approx_percentile holds
    O(accuracy) state regardless of customer count. Boundaries come
    from corpus elements instead of interpolated values, so only
    boundary-tied customers can shift one segment — the twin test
    bounds that movement."""
    from ecom_etl_proj_spark.operators import analytics

    return analytics.rfm_segments(t, approx=True, accuracy=accuracy)


def customer_value_deciles_approx(
    t: dict[str, DataFrame], accuracy: int = 10000
) -> DataFrame:
    """LTV deciles with sketch quantile boundaries (see
    rfm_segments_approx for the state argument)."""
    from ecom_etl_proj_spark.operators import analytics

    return analytics.customer_value_deciles(t, approx=True, accuracy=accuracy)


# --------------------------------------------------------------------------
# Audit twins: deterministic within-bound outputs, registered under the
# sketch query names so the driver hash-verifies the sketches against
# DuckDB. Spark computes approx AND exact in one plan; the oracle
# recomputes the exact anchor columns and emits literal-TRUE bounds, so
# any sketch drifting outside its bound becomes a hash mismatch. These
# run the exact twin alongside the sketch by construction (that's what
# an audit is) — production pipelines call the raw sketch functions
# above, whose state stays O(sketch).
# --------------------------------------------------------------------------


def kpi_overview_audit(
    t: dict[str, DataFrame], rsd: float = 0.02, bound: float = 0.1
) -> DataFrame:
    """(metric, exact_value, within_bound) rows for the KPI-tile HLL
    counts: the exact revenue/distinct anchors plus a boolean asserting
    each ``approx_count_distinct`` landed within ``bound`` relative
    error of the exact count. ``bound`` is 5x the requested rsd — HLL++
    at rsd=0.02 is virtually always within 3 sigma (6%), so 10% flags a
    broken sketch, not an unlucky one."""
    agg = t["orders"].agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
        F.count_distinct("o_orderkey").alias("ex_orders"),
        F.count_distinct("o_custkey").alias("ex_customers"),
        F.approx_count_distinct("o_orderkey", rsd).alias("ap_orders"),
        F.approx_count_distinct("o_custkey", rsd).alias("ap_customers"),
    )

    def check(ap: str, ex: str):
        return F.abs(F.col(ap) - F.col(ex)) <= F.lit(bound) * F.col(ex)

    rows = F.array(
        F.struct(
            F.lit("total_revenue").alias("metric"),
            F.col("total_revenue").cast("double").alias("exact_value"),
            F.lit(True).alias("within_bound"),
        ),
        F.struct(
            F.lit("unique_orders").alias("metric"),
            F.col("ex_orders").cast("double").alias("exact_value"),
            check("ap_orders", "ex_orders").alias("within_bound"),
        ),
        F.struct(
            F.lit("unique_customers").alias("metric"),
            F.col("ex_customers").cast("double").alias("exact_value"),
            check("ap_customers", "ex_customers").alias("within_bound"),
        ),
    )
    return agg.select(F.explode(rows).alias("m")).select(
        "m.metric", "m.exact_value", "m.within_bound"
    )


def delay_quantiles_audit(
    t: dict[str, DataFrame], accuracy: int = 10000, eps: float = 0.01
) -> DataFrame:
    """(nation, metric, n_items, within_bound): each approx_percentile
    delay quantile must lie between the EXACT percentiles at p -/+
    ``eps``. approx_percentile guarantees rank error <= 1/accuracy
    (1e-4 here); ``eps`` = 0.01 adds interpolation slack (the exact
    bound interpolates, the sketch returns corpus elements) while still
    flagging any sketch that drifts a hundredth of rank mass. The p99
    upper bound saturates at 1.0 (the group max)."""
    d = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
        )
    )
    ps = [0.5, 0.9, 0.99]
    los = [max(0.0, p - eps) for p in ps]
    his = [min(1.0, p + eps) for p in ps]
    g = d.groupBy("nation").agg(
        F.count("*").alias("n_items"),
        F.expr(
            f"approx_percentile(delay_days, array({', '.join(map(str, ps))}),"
            f" {accuracy})"
        ).alias("ap"),
        F.expr(
            f"percentile(delay_days, array({', '.join(map(str, los))}))"
        ).alias("lo"),
        F.expr(
            f"percentile(delay_days, array({', '.join(map(str, his))}))"
        ).alias("hi"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(f"p{int(p * 100)}").alias("metric"),
                (
                    (F.col("ap")[i] >= F.col("lo")[i])
                    & (F.col("ap")[i] <= F.col("hi")[i])
                ).alias("within_bound"),
            )
            for i, p in enumerate(ps)
        ]
    )
    return g.select("nation", "n_items", F.explode(rows).alias("m")).select(
        "nation", F.col("m.metric").alias("metric"), "n_items",
        F.col("m.within_bound").alias("within_bound"),
    )


def rfm_segments_audit(
    t: dict[str, DataFrame], accuracy: int = 10000
) -> DataFrame:
    """One (metric, n_customers, within_bound) row asserting the
    sketch-boundary RFM segmentation moved at most
    max(1% of customers, 27) members vs the exact-boundary
    segmentation. Only customers between an interpolated exact boundary
    and its corpus-element sketch counterpart can shift (one score
    point); 27 = 3 members per boundary across the 9 r/f/m quartile
    boundaries absorbs small-corpus granularity, 1% takes over at
    scale. Empirically the shift is 0 at sf0.001-0.1."""
    from ecom_etl_proj_spark.operators import analytics

    ex = analytics.rfm_scored(t, approx=False).select(
        "o_custkey", F.col("segment").alias("seg_e")
    )
    ap = analytics.rfm_scored(t, approx=True, accuracy=accuracy).select(
        "o_custkey", F.col("segment").alias("seg_a")
    )
    j = ex.join(ap, "o_custkey")
    return j.agg(
        F.lit("rfm_segment_shift").alias("metric"),
        F.count("*").alias("n_customers"),
        (
            F.sum(F.when(F.col("seg_e") != F.col("seg_a"), 1).otherwise(0))
            <= F.greatest(F.ceil(F.count("*") * 0.01), F.lit(27))
        ).alias("within_bound"),
    )


def customer_value_deciles_audit(
    t: dict[str, DataFrame], accuracy: int = 10000
) -> DataFrame:
    """One (metric, n_customers, within_bound) row asserting the
    sketch-boundary LTV decile assignment moved at most
    max(1% of customers, 18) members vs exact boundaries (2 per decile
    boundary of small-corpus slack; see rfm_segments_audit)."""
    from ecom_etl_proj_spark.operators import analytics

    ex = analytics.ltv_deciled(t, approx=False).select(
        "o_custkey", F.col("decile").alias("dec_e")
    )
    ap = analytics.ltv_deciled(t, approx=True, accuracy=accuracy).select(
        "o_custkey", F.col("decile").alias("dec_a")
    )
    j = ex.join(ap, "o_custkey")
    return j.agg(
        F.lit("ltv_decile_shift").alias("metric"),
        F.count("*").alias("n_customers"),
        (
            F.sum(F.when(F.col("dec_e") != F.col("dec_a"), 1).otherwise(0))
            <= F.greatest(F.ceil(F.count("*") * 0.01), F.lit(18))
        ).alias("within_bound"),
    )
