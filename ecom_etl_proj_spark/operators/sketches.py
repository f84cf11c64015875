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

These are deliberately NOT oracle-checked value-for-value (DuckDB's
approx algorithms differ); tests assert relative-error bounds against
the exact operators instead, which is the meaningful contract for a
sketch.
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
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
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
    """Sketch-based heavy hitters over the token stream.

    ``DataFrame.stat.freqItems`` runs the Karp/Shenker/Papadimitriou
    single-pass frequent-items algorithm: fixed state (~1/support
    counters) per partition, merged associatively — no vocabulary-sized
    shuffle, which is what kills the exact top-terms groupBy at 100 TB.
    The candidate set (guaranteed superset of everything above
    ``support``) is then re-counted exactly with a broadcast semi-join,
    so reported frequencies are exact and only candidates shuffle.
    """
    from ecom_etl_proj_spark.functions import text as X

    toks = t["documents"].select(F.explode(X.tokens()).alias("term"))
    candidates = (
        toks.stat.freqItems(["term"], support)
        .select(F.explode("term_freqItems").alias("term"))
    )
    return (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
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
