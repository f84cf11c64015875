"""Dashboard analytics queries.

Each function re-expresses one metric family from the reference's
analytics surface (/root/reference/run_analytics.py,
/root/reference/streamlit/utils.py) as a declarative DataFrame plan on
the testdata star schema. All computed columns are aliased and rounded
identically to the DuckDB oracle SQL in ``__spark_entry__.py``.

Scale notes (100 TB):
- Aggregations are hash aggregates with map-side partial combine — the
  shuffle moves only (group key, partial state), never raw rows.
- Leaderboards (top-N) aggregate first, then take a global N: the sort
  input is |distinct keys|, not |fact rows|.
- RFM/decile scoring uses broadcast quantile BOUNDARIES (one scalar
  reduce), never a global NTILE window — no single-task sort at any
  scale. The unbounded-window totals for percentage distributions are
  computed on an already-aggregated handful of rows, never on facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kpi_overview(t: dict[str, DataFrame]) -> DataFrame:
    """Headline KPIs (run_analytics.py:84-93): revenue, orders, customers."""
    return t["orders"].agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("total_revenue"),
        F.count_distinct("o_orderkey").alias("total_orders"),
        F.count_distinct("o_custkey").alias("unique_customers"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double") / F.count("o_totalprice"), 2).alias("avg_order_value"),
    )


def daily_sales(t: dict[str, DataFrame]) -> DataFrame:
    """Daily revenue trend with status filter (utils.py:208-230).

    The reference excludes 'unavailable'/'canceled' statuses; the analog
    here excludes in-process ('P') orders.
    """
    # Decimal summation: double sums depend on add order, and a rounded
    # double within an ulp of a half-cent boundary flips between
    # engines (observed at sf0.1). Exact decimal accumulation makes the
    # per-day total order-independent; cast back to double for output.
    return (
        t["orders"]
        .filter(F.col("o_orderstatus") != "P")
        .groupBy(F.to_date("o_orderdate").alias("sales_date"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_sales"),
            F.count_distinct("o_orderkey").alias("number_of_orders"),
        )
    )


def sales_by_geography(t: dict[str, DataFrame]) -> DataFrame:
    """Revenue rollup by customer nation+region (utils.py:233-265)."""
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("total_sales"),
            F.count_distinct("o_orderkey").alias("num_orders"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


def nation_coords() -> list[tuple[int, float, float]]:
    """Deterministic nation→(lat, lng) centroid dimension.

    The reference enriches state-level revenue with geolocation
    centroids for its map view (streamlit/utils.py:233-265 — avg
    lat/lng per city joined onto sales-by-state). This testdata has no
    geolocation table, so the centroids are a fixed deterministic
    literal dimension keyed by nationkey (LCG, 3-decimal coordinates —
    exactly representable the same way in both engines) — same join
    shape, same output contract as the reference's merge-with-coords.
    """
    out = []
    state = 98765
    for k in range(25):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        lat = round((state % 180000) / 1000.0 - 90.0, 3)
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        lng = round((state % 360000) / 1000.0 - 180.0, 3)
        out.append((k, lat, lng))
    return out


def sales_geolocation(t: dict[str, DataFrame]) -> DataFrame:
    """Nation revenue enriched with map coordinates (the reference's
    geolocation view, streamlit/utils.py:233-265).

    The fact side aggregates FIRST (orders⋈customer shuffled on
    custkey, then one nation-grain rollup — bounded output), and the
    25-row coordinate dimension broadcast-joins onto the aggregate:
    the display-layer enrichment costs nothing at any corpus size.
    """
    spark = t["nation"].sparkSession
    dim = spark.createDataFrame(
        nation_coords(), "coord_nationkey int, latitude double, longitude double"
    )
    per_nation = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("total_sales"),
            F.count_distinct("o_orderkey").alias("num_orders"),
        )
    )
    return (
        per_nation.join(
            F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(dim), F.col("c_nationkey") == F.col("coord_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "total_sales",
            "num_orders",
            "latitude",
            "longitude",
        )
    )


def rfm_scored(
    t: dict[str, DataFrame], approx: bool = False, accuracy: int = 10000
) -> DataFrame:
    """Per-customer RFM scores + segment (the shared core of
    ``rfm_segments`` and the boundary-shift audit in
    operators/sketches.py): one row per customer with recency/
    frequency/monetary, r/f/m scores against broadcast quartile
    boundaries, and the CASE-mapped segment name."""
    per_cust_base = t["orders"].groupBy("o_custkey").agg(
        F.to_date(F.max("o_orderdate")).alias("last_order"),
        F.count_distinct("o_orderkey").alias("frequency"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("monetary"),
    )

    # Quartile BOUNDARIES (one scalar aggregate) broadcast back, score =
    # 1 + number of boundaries exceeded. A global NTILE window would
    # funnel every customer into a single task — unusable at 100 TB;
    # the boundary form is one tiny reduce + a row-local comparison,
    # and differs from rank-ntile only on boundary ties.
    def score(col, q: str):
        col = F.col(col) if isinstance(col, str) else col
        s = F.lit(1)
        for i in range(3):
            s = s + F.when(col > F.col(q)[i], 1).otherwise(0)
        return s

    if approx:
        # approx path (the audit twin's sketch side): snapshot reduce +
        # sketch-boundary reduce, exactly the r15 shape — the mirrored
        # single-reduce rewrite below does NOT apply because GK/KLL
        # sketches return corpus ELEMENTS, for which the affine-mirror
        # percentile identity does not hold element-for-element.
        pexpr = f"approx_percentile({{c}}, array(0.25, 0.5, 0.75), {accuracy})"
        snapshot = t["orders"].agg(
            F.date_add(F.to_date(F.max("o_orderdate")), 1).alias("snap")
        )
        per_cust = per_cust_base.crossJoin(F.broadcast(snapshot)).withColumn(
            "recency", F.datediff("snap", "last_order")
        )
        bounds = per_cust.agg(
            F.expr(pexpr.format(c="recency")).alias("rq"),
            F.expr(pexpr.format(c="frequency")).alias("fq"),
            F.expr(pexpr.format(c="monetary")).alias("mq"),
        )
        scored = (
            per_cust.crossJoin(F.broadcast(bounds))
            .withColumn("r_score", F.lit(5) - score("recency", "rq"))
            .withColumn("f_score", score("frequency", "fq"))
            .withColumn("m_score", score("monetary", "mq"))
        )
    else:
        # Exact path (the registered headline query): the r15 shape
        # built the snapshot reduce, the quartile reduce and the scoring
        # pass all from t["orders"], and per-branch column pruning makes
        # each branch's Exchange different, so ReuseExchange never fires
        # — 4 orders scans + 8 exchanges + TWO sequential broadcast
        # barriers (bounds consumes recency, recency consumes snapshot;
        # an r16 localCheckpoint experiment fixed the scans but measured
        # SLOWER warm, 1.21 -> 1.66, pure barrier latency). This form
        # folds snapshot AND all three quartile boundaries into ONE
        # reduce over per_cust by scoring recency through its mirror:
        #
        #   recency = S - d  (S = days(snap), d = unix_date(last_order))
        #   percentile(S - d, p) = S - percentile(d, 1 - p)
        #
        # The identity is EXACT here, not just algebraic: p and 1-p are
        # dyadic (.25/.5/.75), so the interpolation fraction is an exact
        # quarter, and d is integer days — every intermediate is an
        # exact multiple of 0.25 in double, so  recency > rq[i]  flips
        # bit-identically to  unix_date(last_order) < dq[i].  (snap =
        # 1 + max(last_order) over per_cust equals the global-orders
        # form because to_date is monotonic over timestamps.)
        stats = per_cust_base.agg(
            F.date_add(F.max("last_order"), 1).alias("snap"),
            F.expr(
                "percentile(unix_date(last_order), array(0.75, 0.5, 0.25))"
            ).alias("dq"),
            F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias(
                "fq"
            ),
            F.expr("percentile(monetary, array(0.25, 0.5, 0.75))").alias(
                "mq"
            ),
        )
        r_exceed = F.lit(1)
        for i in range(3):
            r_exceed = r_exceed + F.when(
                F.unix_date("last_order") < F.col("dq")[i], 1
            ).otherwise(0)
        scored = (
            per_cust_base.crossJoin(F.broadcast(stats))
            .withColumn("recency", F.datediff("snap", "last_order"))
            .withColumn("r_score", F.lit(5) - r_exceed)
            .withColumn("f_score", score("frequency", "fq"))
            .withColumn("m_score", score("monetary", "mq"))
        )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "Champions")
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "Loyal Customers")
        .when((F.col("r_score") >= 3) & (F.col("f_score") < 3), "Potential Loyalists")
        .when((F.col("r_score") < 3) & (F.col("f_score") >= 4), "Cannot Lose")
        .when((F.col("r_score") >= 2) & (F.col("f_score") >= 2), "At Risk")
        .when((F.col("r_score") < 2) & (F.col("f_score") < 2), "Hibernating")
        .otherwise("Needs Attention")
    )
    return scored.withColumn("segment", seg)


def rfm_segments(
    t: dict[str, DataFrame], approx: bool = False, accuracy: int = 10000
) -> DataFrame:
    """RFM segmentation (utils.py:446-504, run_analytics.py:119-158).

    Recency/Frequency/Monetary per customer, quartile-scored against
    broadcast percentile boundaries (the scalable replacement for the
    reference's rank-then-qcut, identical except on boundary ties),
    CASE-mapped to the reference's segment names, then summarized per
    segment.

    ``approx=True`` swaps the exact ``percentile`` boundary reduce for
    ``approx_percentile`` (KLL/GK, bounded state): the exact reduce
    buffers every customer's value in one aggregation buffer, which is
    fine at bench scale but not at billions of customers. At the 100 TB
    target ``sketches.rfm_segments_approx`` IS the production path;
    this exact form is the oracle-comparable baseline.
    """
    return (
        rfm_scored(t, approx=approx, accuracy=accuracy)
        .groupBy("segment")
        .agg(
            F.count("*").alias("customer_count"),
            F.round(F.avg("recency"), 1).alias("avg_recency"),
            F.round(F.avg("frequency"), 1).alias("avg_frequency"),
            F.round(F.sum(F.col("monetary").cast("decimal(18,6)")).cast("double") / F.count("monetary"), 1).alias("avg_monetary"),
        )
    )


def seller_performance(t: dict[str, DataFrame]) -> DataFrame:
    """Per-supplier scorecard (utils.py:509-525): revenue, orders, delay.

    Revenue accumulates in DECIMAL, not double: a double sum is
    add-order-dependent, and at sf0.1 row counts the rounded cent
    landed on opposite sides of the half-boundary in Spark vs DuckDB
    for 4 of 1000 suppliers (invisible at the sf0.01 gate). Each
    per-row revenue is a <= 4-decimal value, so the decimal(18,6) cast
    is exact and identical in both engines; the exact sum then rounds
    identically everywhere.
    """
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
            F.count_distinct("l_orderkey").alias("total_orders"),
            F.round(F.avg(F.datediff("l_shipdate", "o_orderdate")), 2).alias(
                "avg_ship_delay_days"
            ),
        )
    )


def delivery_performance(t: dict[str, DataFrame], on_time_days: int = 30) -> DataFrame:
    """On-time vs late shipping buckets (utils.py:427-442).

    The reference derives 'On-Time'/'Late' from delivered-vs-estimated
    dates; the analog is ship delay (l_shipdate - o_orderdate) against a
    fixed SLA window.
    """
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "delivery_status",
            F.when(delay <= on_time_days, "On-Time").otherwise("Late"),
        )
        .withColumn("ship_delay_days", delay)
        .groupBy("delivery_status")
        .agg(
            F.count("*").alias("num_items"),
            F.round(F.avg("ship_delay_days"), 2).alias("avg_delay_days"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / F.count("l_extendedprice"), 2).alias("avg_item_price"),
        )
    )


def _pct_distribution(df: DataFrame, key: str, alias: str) -> DataFrame:
    """Shared value_counts(normalize=True)*100 shape (run_analytics.py:203-213).

    The unbounded window runs over the already-aggregated per-key rows
    (a handful), not over the fact table.
    """
    counts = df.groupBy(F.col(key).alias(alias)).agg(F.count("*").alias("cnt"))
    total = Window.partitionBy()
    return counts.select(
        alias,
        "cnt",
        F.round(F.lit(100.0) * F.col("cnt") / F.sum("cnt").over(total), 2).alias("pct"),
    )


def order_status_distribution(t: dict[str, DataFrame]) -> DataFrame:
    return _pct_distribution(t["orders"], "o_orderstatus", "order_status")


def event_type_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """Payment-method-popularity analog on the event stream."""
    return _pct_distribution(t["events"], "event_type", "event_type")


def quantity_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """Installments-distribution analog (run_analytics.py:211-213)."""
    return _pct_distribution(
        t["lineitem"].withColumn("quantity", F.col("l_quantity").cast("int")),
        "quantity",
        "quantity",
    )


def top_categories_by_revenue(t: dict[str, DataFrame], n: int = 10) -> DataFrame:
    """Category revenue leaderboard (run_analytics.py:195-197).

    Aggregate-then-topN: the global sort sees |categories| rows.
    Deterministic (revenue, name) tiebreak keeps the cut stable.
    """
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("category"))
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("category").asc())
        .limit(n)
    )


def top_seller_nations(t: dict[str, DataFrame], n: int = 10) -> DataFrame:
    """Seller-state revenue leaderboard analog (run_analytics.py:199-201)."""
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("seller_nation"))
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("seller_nation").asc())
        .limit(n)
    )


def category_avg_discount(t: dict[str, DataFrame]) -> DataFrame:
    """Category score table (review-score-by-category analog,
    run_analytics.py:183-190)."""
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("category"))
        .agg(
            F.round(F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count("l_discount"), 4).alias("avg_discount"),
            F.count("*").alias("num_items"),
        )
    )


def pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """Flagship lineitem aggregate (engine headline, TPC-H Q1 shape).

    Pure scan → filter (pushed to parquet) → hash agg on a 2-value key.
    This is the whole-stage-codegen showcase: no joins, no UDFs.
    """
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_base_price"),
        F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias(
            "sum_disc_price"
        ),
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ).cast("decimal(18,6)")
            ),
            2,
        )
        .cast("double")
        .alias("sum_charge"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / F.count("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def top_revenue_orders(t: dict[str, DataFrame], n: int = 10) -> DataFrame:
    """Top unshipped-revenue orders (TPC-H Q3 shape) for one segment."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"), "o_orderpriority")
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(n)
    )


def revenue_by_nation(t: dict[str, DataFrame]) -> DataFrame:
    """Full-star revenue rollup by customer nation (TPC-H Q5 shape)."""
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias(
                "revenue"
            )
        )
    )


def revenue_forecast(t: dict[str, DataFrame]) -> DataFrame:
    """Promotion-revenue what-if (TPC-H Q6 shape): pure scan+filter+agg.

    Every predicate is pushable; at 100 TB this reads only the shipdate
    partitions and the three referenced columns.
    """
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")), 2).cast("double").alias(
            "forecast_revenue"
        ),
        F.count("*").alias("n_items"),
    )


def order_priority_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Priority counts for orders with late-shipped items (TPC-H Q4
    shape). The EXISTS becomes a left-semi join: no fan-out, the fact
    table is only probed."""
    late = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.datediff("l_shipdate", "o_orderdate") > 60)
        .select(F.col("l_orderkey").alias("late_orderkey"))
        .distinct()
    )
    return (
        t["orders"]
        .join(late, F.col("o_orderkey") == F.col("late_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def monthly_sales(t: dict[str, DataFrame]) -> DataFrame:
    """Monthly revenue trend (the dashboard's daily trend, coarser)."""
    return (
        t["orders"]
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("total_sales"),
            F.count_distinct("o_orderkey").alias("number_of_orders"),
            F.count_distinct("o_custkey").alias("active_customers"),
        )
    )


def market_segment_share(t: dict[str, DataFrame]) -> DataFrame:
    """Revenue share per market segment (status-distribution shape on
    the customer dimension)."""
    seg = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("revenue"))
    )
    total = Window.partitionBy()
    return seg.select(
        "mktsegment",
        "revenue",
        F.round(F.lit(100.0) * F.col("revenue") / F.sum("revenue").over(total), 2).alias(
            "revenue_pct"
        ),
    )


def top_customers(t: dict[str, DataFrame], n: int = 20) -> DataFrame:
    """Customer lifetime-value leaderboard."""
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("lifetime_value"),
            F.count_distinct("o_orderkey").alias("num_orders"),
        )
        .orderBy(F.col("lifetime_value").desc(), F.col("o_custkey").asc())
        .limit(n)
    )


def part_size_histogram(t: dict[str, DataFrame]) -> DataFrame:
    """Size histogram with fixed-width buckets (pure int arithmetic)."""
    return (
        t["part"]
        .groupBy((F.floor(F.col("p_size") / 10) * 10).cast("int").alias("size_bucket"))
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum(F.col("p_retailprice").cast("decimal(18,6)")).cast("double") / F.count("p_retailprice"), 2).alias("avg_price"),
        )
    )


# Partial category → english translation dim, mirroring the reference's
# product_category_name_translation table (staging_layer.py:193-224):
# COALESCE(translated, original) with untranslated categories passing
# through.
CATEGORY_TRANSLATION = {
    "ECONOMY": "economy_class",
    "LARGE": "large_format",
    "PROMO": "promotional",
}


def category_translation(t: dict[str, DataFrame]) -> DataFrame:
    """Translation-dim left join + COALESCE fallback chain."""
    spark = t["part"].sparkSession
    trans = spark.createDataFrame(
        list(CATEGORY_TRANSLATION.items()), ["cat", "cat_english"]
    )
    return (
        t["part"]
        .join(F.broadcast(trans), F.col("p_type") == F.col("cat"), "left")
        .select(
            "p_partkey",
            F.coalesce(F.col("cat_english"), F.col("p_type"), F.lit("others")).alias(
                "category_final"
            ),
            F.col("cat_english").isNotNull().alias("was_translated"),
        )
    )


def geo_fallback_join(t: dict[str, DataFrame]) -> DataFrame:
    """Dimension join with an explicit fallback record.

    Mirrors the staging layer's unknown-geolocation handling
    (staging_layer.py:237-269): keys missing from the dim map get the
    sentinel -1 "Unknown" record instead of NULL, keeping the DWH
    NOT NULL contract. Here the partial dim map covers only regions 0-2.
    """
    partial_map = (
        t["nation"]
        .filter(F.col("n_regionkey") < 3)
        .select(F.col("n_nationkey").alias("map_key"), F.col("n_name").alias("geo_name"))
    )
    return (
        t["customer"]
        .join(F.broadcast(partial_map), F.col("c_nationkey") == F.col("map_key"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("map_key"), F.lit(-1)).cast("int").alias("geo_key"),
            F.coalesce(F.col("geo_name"), F.lit("Unknown")).alias("geo_name"),
        )
    )


def daily_sales_7d_ma(t: dict[str, DataFrame]) -> DataFrame:
    """Daily sales with a 7-day trailing moving average.

    The dashboard's daily trend (utils.py:208-230) smoothed the way every
    sales chart is. Two-level plan: daily hash-agg first (shuffle carries
    one row per day), then a range window over days — the window input is
    already tiny, so the single-partition window is safe at any scale.
    """
    daily = (
        t["orders"]
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("daily_sales"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.orderBy(F.unix_date(F.col("day"))).rangeBetween(-6, 0)
    return daily.select(
        "day",
        "daily_sales",
        "n_orders",
        F.round(F.avg("daily_sales").over(w), 6).alias("sales_7d_ma"),
    )


def top_parts_per_category(t: dict[str, DataFrame], n: int = 3) -> DataFrame:
    """Top-N revenue parts within each category (rank window per group).

    The reference's top/bottom category leaderboards (run_analytics.py:
    183-197) at part grain. Rank is over the ROUNDED revenue with the
    part key as tiebreak so ordering is engine-independent.
    """
    rev = (
        t["lineitem"]
        .join(t["part"].select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("category"), "p_partkey")
        .agg(F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("category").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .select("category", "p_partkey", "revenue", "rnk")
    )


def status_month_pivot(t: dict[str, DataFrame]) -> DataFrame:
    """Order counts per month pivoted on status (P/O/F columns).

    Spark's pivot with an explicit value list — no extra pass to discover
    pivot values, and deterministic output columns.
    """
    p = (
        t["orders"]
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .pivot("o_orderstatus", ["P", "O", "F"])
        .count()
    )
    return p.select(
        "month",
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
    )


def repeat_customer_rate(t: dict[str, DataFrame]) -> DataFrame:
    """Share of customers with more than one order (retention KPI)."""
    per_cust = t["orders"].groupBy("o_custkey").agg(F.count("*").alias("n"))
    return per_cust.agg(
        F.count("*").alias("n_customers"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_repeat"),
        F.round(
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)) / F.count("*"), 6
        ).alias("repeat_rate"),
    )


def delivery_delay_percentiles(t: dict[str, DataFrame]) -> DataFrame:
    """p50/p90/p99 ship delay per customer nation.

    The reference's delivery-performance analysis (utils.py:427-442) as
    percentiles instead of buckets. Exact percentile: the per-nation
    value lists fit an aggregation buffer fine at bench SF; the 100 TB
    variant swaps in approx_percentile (same plan shape, bounded state —
    noted here because exact percentile state grows with group size).
    """
    d = (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"),
                F.datediff("l_shipdate", "o_orderdate").alias("delay_days"))
    )
    return d.groupBy("nation").agg(
        F.count("*").alias("n_items"),
        F.round(F.expr("percentile(delay_days, 0.5)"), 4).alias("p50_delay"),
        F.round(F.expr("percentile(delay_days, 0.9)"), 4).alias("p90_delay"),
        F.round(F.expr("percentile(delay_days, 0.99)"), 4).alias("p99_delay"),
    )


def revenue_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Revenue at nation, region, and grand-total levels in one pass
    (ROLLUP — the geography drilldown's three dashboard tiles computed
    as one partial-agg tree instead of three scans)."""
    geo = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    joined = t["orders"].join(
        geo.select("c_custkey", "n_name", "r_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        joined.rollup(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def ltv_deciled(
    t: dict[str, DataFrame], approx: bool = False, accuracy: int = 10000
) -> DataFrame:
    """Per-customer (o_custkey, ltv, decile) — the shared core of
    ``customer_value_deciles`` and the boundary-shift audit in
    operators/sketches.py. Decile boundaries come from one broadcast
    percentile reduce (exact or KLL/GK approx per ``approx``)."""
    # (r16 note: a localCheckpoint here — to share the ltv aggregation
    # between the bounds reduce and the scoring pass — measured SLOWER
    # warm at sf0.1, 0.93 -> 1.05: the materialization barrier costs
    # more than the saved duplicate scan+agg, which Spark runs as
    # parallel branches of one job. Left as-is; see OPTIMIZATION_r16.md.)
    ltv = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("ltv"))
    )
    qs = [round(i / 10, 1) for i in range(1, 10)]
    qarr = ", ".join(str(q) for q in qs)
    bexpr = (
        f"approx_percentile(ltv, array({qarr}), {accuracy})"
        if approx
        else f"percentile(ltv, array({qarr}))"
    )
    bounds = ltv.agg(F.expr(bexpr).alias("b"))
    dec = F.lit(1)
    for i in range(9):
        dec = dec + F.when(F.col("ltv") > F.col("b")[i], 1).otherwise(0)
    return (
        ltv.crossJoin(F.broadcast(bounds))
        .withColumn("decile", dec)
        .select("o_custkey", "ltv", "decile")
    )


def customer_value_deciles(
    t: dict[str, DataFrame], approx: bool = False, accuracy: int = 10000
) -> DataFrame:
    """Customer lifetime value cut into deciles — the RFM monetary axis
    at finer grain.

    Decile BOUNDARIES from one percentile reduce, broadcast back,
    bucket = 1 + boundaries exceeded. (A global NTILE window is the
    rank-exact alternative but serializes all customers into one task —
    the boundary form is the 100 TB shape and differs only on ties.)
    ``approx=True`` computes the boundaries with bounded-state
    approx_percentile. At the 100 TB target the registered
    ``customer_value_deciles_approx`` twin
    (sketches.customer_value_deciles_approx) IS the production path —
    the exact ``percentile`` reduce here buffers every customer value
    in one aggregation buffer and exists as the oracle-comparable
    baseline.
    """
    return (
        ltv_deciled(t, approx=approx, accuracy=accuracy)
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("ltv"), 2).alias("min_ltv"),
            F.round(F.max("ltv"), 2).alias("max_ltv"),
            F.round(F.sum(F.col("ltv").cast("decimal(18,6)")).cast("double") / F.count("ltv"), 2).alias("avg_ltv"),
        )
    )


def inactive_customers(t: dict[str, DataFrame]) -> DataFrame:
    """Customers with no orders at all (anti join — probe-only, the
    orders side is reduced to its distinct keys before the join)."""
    return (
        t["customer"]
        .join(
            t["orders"].select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    )


def satisfaction_by_delivery(t: dict[str, DataFrame], on_time_days: int = 30) -> DataFrame:
    """Satisfaction vs delivery outcome (run_analytics.py:174-178).

    The reference averages review_score per On-Time/Late bucket; the
    testdata's satisfaction analog is the discount granted (SURVEY §4 —
    higher discount ~ compensation ~ lower satisfaction) plus the share
    of urgent-priority orders.
    """
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "delivery_status",
            F.when(delay <= on_time_days, "On-Time").otherwise("Late"),
        )
        .groupBy("delivery_status")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count("l_discount"), 6).alias("avg_discount"),
            F.round(
                F.avg(
                    F.when(
                        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
                    ).otherwise(0.0)
                ),
                6,
            ).alias("urgent_share"),
        )
    )


def sales_grouping_sets(t: dict[str, DataFrame]) -> DataFrame:
    """Revenue by region, by market segment, and grand total in ONE pass
    (GROUPING SETS): three dashboard tiles share a single scan +
    partial-agg tree instead of three queries."""
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region_name"),
            F.col("c_mktsegment").alias("mktsegment"),
            "o_totalprice",
        )
    )
    joined.createOrReplaceTempView("__gs_sales")
    return joined.sparkSession.sql(
        """
        SELECT region_name, mktsegment,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM __gs_sales
        GROUP BY GROUPING SETS ((region_name), (mktsegment), ())
        """
    )


def copurchase_pairs(t: dict[str, DataFrame], min_count: int = 2, n: int = 50) -> DataFrame:
    """Frequently-bought-together part pairs (market-basket affinity).

    Self-join of lineitem on the order key with p_a < p_b: fan-out per
    order is C(lines, 2) with lines bounded by order size (~7), so the
    join output is linear in orders — never |parts|^2. Shuffle key is
    the order key both sides (co-partitioned).
    """
    li = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "ok").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= min_count)
        .orderBy(
            F.col("n_orders_together").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(n)
    )


def cohort_retention(t: dict[str, DataFrame], max_offset: int = 6) -> DataFrame:
    """Monthly cohort retention matrix.

    Cohort = month of a customer's first order; each later order lands
    in (cohort_month, months_since) with distinct-customer counts — the
    classic retention triangle. Two aggregations: first-order month per
    customer (one shuffle on custkey), then the matrix rollup.
    """
    first = t["orders"].groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    joined = t["orders"].join(first, "o_custkey")
    offset = (
        (F.year(F.date_trunc("month", "o_orderdate")) - F.year("cohort_month")) * 12
        + (F.month(F.date_trunc("month", "o_orderdate")) - F.month("cohort_month"))
    ).cast("int")
    return (
        joined.withColumn("months_since", offset)
        .filter(F.col("months_since") <= max_offset)
        .groupBy("cohort_month", "months_since")
        .agg(F.count_distinct("o_custkey").alias("active_customers"))
    )


def discount_elasticity(t: dict[str, DataFrame]) -> DataFrame:
    """Discount→quantity elasticity per category: corr, OLS slope, R².

    The "does discounting move volume" question every pricing dashboard
    asks, answered with the built-in regression aggregates — one
    hash-aggregate pass, constant state per group at any scale.
    """
    j = (
        t["lineitem"]
        .join(t["part"].select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("p_type").alias("category"), "l_discount", "l_quantity")
    )
    # "+ 0.0" collapses IEEE negative zero (round(-1e-9, 4) → -0.0,
    # which string-compares unequal to the oracle's 0.0)
    return j.groupBy("category").agg(
        F.count("*").alias("n_items"),
        (F.round(F.corr("l_discount", "l_quantity"), 4) + 0.0).alias("corr_disc_qty"),
        (F.round(F.expr("regr_slope(l_quantity, l_discount)"), 4) + 0.0).alias("ols_slope"),
        (F.round(F.expr("regr_r2(l_quantity, l_discount)"), 4) + 0.0).alias("r2"),
    )


def weekly_sales_pattern(t: dict[str, DataFrame]) -> DataFrame:
    """Day-of-week sales seasonality (0=Monday): revenue, orders, and
    each day's share of weekly revenue — the dashboard's seasonality
    strip. Two tiny aggregations; the share window runs over 7 rows."""
    daily = (
        t["orders"]
        .groupBy(F.weekday("o_orderdate").alias("dow"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )
    total = Window.partitionBy()
    return daily.select(
        "dow",
        "revenue",
        "n_orders",
        F.round(F.lit(100.0) * F.col("revenue") / F.sum("revenue").over(total), 4).alias(
            "revenue_pct"
        ),
    )


def sales_cube(t: dict[str, DataFrame]) -> DataFrame:
    """Full region × segment CUBE: every drilldown combination (cell,
    row totals, column totals, grand total) in ONE scan + one
    aggregation tree — the interactive-pivot backing query. Dims
    broadcast; the cube expansion multiplies aggregate ROWS (4x here),
    never input rows."""
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region_name"),
            F.col("c_mktsegment").alias("mktsegment"),
            "o_totalprice",
        )
    )
    return joined.cube("region_name", "mktsegment").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_orders"),
    )


def nation_trade_volume(t: dict[str, DataFrame]) -> DataFrame:
    """Cross-nation trade volume per year (TPC-H Q7 shape).

    Supplier nation → customer nation revenue flows. Two fact-fact
    joins shuffle on their keys; both nation dims broadcast (twice,
    under different aliases). Unlike Q7's two-nation filter we keep
    every asymmetric pair — the full trade matrix the dashboard heatmap
    wants — which is still only nations² output rows.
    """
    supp_nation = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("sn_suppkey"), F.col("n_name").alias("supp_nation"))
    )
    cust_nation = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("c_custkey").alias("cn_custkey"), F.col("n_name").alias("cust_nation"))
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("sn_suppkey"))
        .join(F.broadcast(cust_nation), F.col("o_custkey") == F.col("cn_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            # Decimal accumulation: the per-year group sums here land on
            # half-cent boundaries where order-dependent double summation
            # rounds differently across engines (observed at sf0.001).
            # Exact decimal sums are order-invariant (daily_sales pattern).
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("volume"),
            F.count("*").alias("n_items"),
        )
    )


def returned_items_ranking(t: dict[str, DataFrame], n: int = 20) -> DataFrame:
    """Revenue lost to returns per customer (TPC-H Q10 shape).

    Returned lineitems (l_returnflag = 'R') in a one-year window,
    aggregated per customer, top-N by lost revenue. The returnflag +
    date filters push to the scan; nation dim broadcasts.
    """
    li = t["lineitem"].filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias(
                "revenue_lost"
            ),
            F.count("*").alias("n_returned_items"),
        )
        .orderBy(F.col("revenue_lost").desc(), F.col("c_custkey").asc())
        .limit(n)
    )


def ship_priority_buckets(t: dict[str, DataFrame], late_days: int = 60) -> DataFrame:
    """Priority mix per shipping-delay bucket (TPC-H Q12 shape).

    The reference has no l_shipmode, so the Q12 axis becomes the
    ship-delay bucket; the payload stays Q12's conditional priority
    counts (urgent/high vs other). One fact-fact join then a 2-row agg
    — the conditional counts are map-side partial aggregates.
    """
    bucket = F.when(
        F.datediff("l_shipdate", "o_orderdate") > late_days, F.lit("LATE")
    ).otherwise(F.lit("ON_TIME"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_items"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_items"),
        )
    )


def customer_order_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """Order-count frequency distribution (TPC-H Q13 shape).

    Left join keeps never-ordered customers (order_count 0). Two
    aggregations: per-customer count (shuffles on custkey), then the
    tiny count-of-counts histogram.
    """
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count("*").alias("n_customers"))


def promo_revenue_share(t: dict[str, DataFrame]) -> DataFrame:
    """Promo revenue share per month (TPC-H Q14 shape).

    part⋈lineitem with the part dim broadcast; the promo flag becomes a
    conditional sum so the share is one aggregation, not two queries.
    """
    joined = t["lineitem"].join(
        F.broadcast(t["part"].select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    # revenue quantizes exactly to decimal(18,6) (<= 4-decimal values),
    # so both sums are exact and the share is ONE double division of
    # exact operands — partition-order independent (see
    # seller_performance for the failure mode this prevents)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        joined.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_share_pct"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
    )


def top_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """Max-revenue supplier(s) for a quarter (TPC-H Q15 shape).

    Per-supplier revenue (shuffle on suppkey, supplier-count rows out),
    then the global max is a 1-row aggregate broadcast back — no
    single-partition window over the full fact table.
    """
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2).cast("double").alias(
                "total_revenue"
            )
        )
    )
    max_rev = per_supp.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        per_supp.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            "total_revenue",
        )
    )


def small_qty_avg_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Small-lot revenue per brand (TPC-H Q17 shape).

    The correlated "below half this part's average quantity" subquery
    becomes a per-part aggregate joined back to the fact — both sides
    shuffle on partkey, so AQE can pick a sort-merge or shuffled-hash
    join; the brand dim broadcasts for the final rollup.
    """
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pp_partkey"))
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        t["lineitem"]
        .join(per_part, F.col("l_partkey") == F.col("pp_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count("*").alias("n_small_lots"),
        )
    )


def large_volume_customers(t: dict[str, DataFrame], min_qty: float = 250.0) -> DataFrame:
    """Large-volume orders and their customers (TPC-H Q18 shape).

    The HAVING-subquery becomes: per-order quantity agg → filter →
    join back to orders/customer. The filtered order set is small, so
    at scale it broadcasts into the orders probe (AQE sizes it).
    """
    big_orders = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("bo_orderkey"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        t["orders"]
        .join(big_orders, F.col("o_orderkey") == F.col("bo_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.to_date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


def brand_supplier_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Distinct suppliers per brand × size (TPC-H Q16 shape).

    The NOT-IN complaint-supplier exclusion becomes an anti-join on a
    derived low-balance supplier set (broadcast — it's dim-sized).
    count_distinct shuffles on the (brand, size) group key only.
    """
    excluded = (
        t["supplier"]
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("ex_suppkey"))
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(excluded), F.col("l_suppkey") == F.col("ex_suppkey"), "left_anti")
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def market_share_by_nation(
    t: dict[str, DataFrame], region: str = "ASIA", ptype: str = "ECONOMY"
) -> DataFrame:
    """Supplier-nation market share inside one customer region (TPC-H
    Q8 shape).

    Revenue restricted to customers of ``region`` and parts of
    ``ptype``: lineitem⋈orders shuffles on orderkey; the part filter
    and supplier→nation name are broadcast (genuinely bounded
    dimensions). The region-customer key set is CUSTOMER-cardinality —
    it scales with the corpus, so it carries NO broadcast hint: AQE
    broadcasts it when its runtime size is under the threshold and
    falls back to a shuffle join on custkey otherwise (a forced
    broadcast would OOM at billions of customers). The share divides
    each (year, supplier-nation) volume by its year total via a window
    over the AGGREGATED frame (years × nations rows, bounded regardless
    of corpus size — the window never sees fact rows).
    """
    from pyspark.sql import Window

    region_custs = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == region)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("rc_custkey"))
    )
    supp_nation = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("sn_suppkey"), F.col("n_name").alias("supp_nation"))
    )
    # decimal accumulation: double sums are add-order-dependent and a
    # rounded share near a 5e-5 boundary would flip between engines
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    vol = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == ptype).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(region_custs, F.col("o_custkey") == F.col("rc_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("sn_suppkey"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"), "supp_nation"
        )
        .agg(F.sum(rev).alias("vol"))
    )
    year_total = Window.partitionBy("order_year")
    return vol.select(
        "order_year",
        "supp_nation",
        F.round("vol", 2).cast("double").alias("volume"),
        F.round(
            F.lit(100.0)
            * F.col("vol").cast("double")
            / F.sum("vol").over(year_total).cast("double"),
            4,
        ).alias("share_pct"),
    )


def disjunctive_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Revenue under OR-of-conjunct predicates (TPC-H Q19 shape,
    adapted to this schema's columns: brand × part size × quantity
    bands instead of containers/shipmode).

    The point of the shape: the three AND-blocks OR together across
    BOTH sides of the part⋈lineitem join. Catalyst pushes the
    part-only conjuncts (brand, size) into the broadcast side's scan
    and the derivable l_quantity range into the fact scan, so the join
    only sees survivors — the naive plan filters after the join.
    """
    p = F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size"))
    j = t["lineitem"].join(p, F.col("l_partkey") == F.col("p_partkey"))
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#13") & sz.between(1, 10) & q.between(1, 15))
        | ((br == "Brand#20") & sz.between(1, 20) & q.between(10, 30))
        | ((br == "Brand#9") & sz.between(1, 30) & q.between(20, 45))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return j.filter(cond).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


def idle_high_balance_customers(
    t: dict[str, DataFrame], since: str = "2000-01-01"
) -> DataFrame:
    """High-balance customers with no recent orders (TPC-H Q22 shape).

    The two classic sub-shapes: the global positive-balance average is
    ONE scalar row broadcast back (never a per-row correlated
    subquery), and "no order since X" is an anti-join against the
    distinct recent-customer keys. That key set is customer-cardinality
    — unbounded at scale — so it carries NO broadcast hint: AQE
    broadcasts it only when its runtime size allows, else the anti-join
    shuffles on custkey. Output is one row per nation — bounded.
    """
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select(F.col("o_custkey").alias("rk"))
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("rk"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_balance"),
        )
    )


def sole_supplier_orders(t: dict[str, DataFrame], top_n: int = 20) -> DataFrame:
    """Suppliers ranked by orders they fulfilled alone (TPC-H Q21's
    multi-supplier-order machinery on this schema — no commit/receipt
    dates exist, so "kept waiting" becomes "sole supplier on the
    order", the same count-distinct-per-order + semi-join skeleton).

    Per-order supplier cardinality is one fact aggregation on
    l_orderkey; sole orders semi-join back to lineitem on the same key
    (no second shuffle of the fact — AQE broadcasts the sole-order key
    list when it is small, else it is a co-partitioned shuffle join).
    Top-N is a TakeOrdered on the supplier-grain aggregate.
    """
    per_order = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supps"))
        .filter(F.col("n_supps") == 1)
        .select(F.col("l_orderkey").alias("so_orderkey"))
    )
    sole = (
        t["lineitem"]
        .join(per_order, F.col("l_orderkey") == F.col("so_orderkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.count_distinct("l_orderkey").alias("sole_orders"))
    )
    return (
        sole.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "sole_orders")
        .orderBy(F.col("sole_orders").desc(), F.col("s_suppkey").asc())
        .limit(top_n)
    )


def cheapest_supplier_per_part(
    t: dict[str, DataFrame], region: str = "EUROPE"
) -> DataFrame:
    """Groupwise-argmin: the supplier selling each part cheapest within
    a region (TPC-H Q2's min-cost-supplier skeleton; this schema has no
    partsupp/supplycost, so observed avg unit sell price from lineitem
    stands in for the supply cost).

    Per-(part, supplier) unit price is one fact aggregation; the
    region membership filter joins BEFORE aggregation so non-region
    rows never reach the shuffle. The argmin is a row_number window
    partitioned by partkey over the aggregate — parallel across parts,
    never a global sort; ties break on rounded price then suppkey so
    both engines pick the same row.
    """
    from pyspark.sql import Window

    members = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    # Ratio sums accumulate in DECIMAL (a double avg is add-order-
    # dependent), and the final 4-digit rounding happens in EXACT
    # integer arithmetic: round(sum/count, 4) on a double quotient
    # still flipped at half-boundaries at sf0.1 (the decimal-exact sum
    # divided by the count lands exactly on x.xxxx5 whenever the micros
    # divide evenly — 37 of 4000 parts), and Spark's BigDecimal HALF_UP
    # vs DuckDB's multiply-round-divide disagree precisely there. The
    # half-up quotient ((2a + b) div 2b) is computed on integers, so
    # there is no floating-point tie to disagree about; the final /1e4
    # double division of a 4-decimal value is exact in both engines.
    ratio = (F.col("l_extendedprice") / F.col("l_quantity")).cast("decimal(18,6)")
    per_pair = (
        t["lineitem"]
        .join(F.broadcast(members), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "supp_nation")
        .agg(
            (F.sum(ratio) * 1000000).cast("long").alias("um"),
            F.count("*").alias("cnt"),
        )
        .withColumn(
            "avg_unit_price",
            F.expr(
                "cast((2 * um * 10000 + cnt * 1000000) "
                "div (2 * cnt * 1000000) as double) / 10000"
            ),
        )
        .drop("um", "cnt")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("avg_unit_price").asc(), F.col("s_suppkey").asc()
    )
    return (
        per_pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "supp_nation",
            "avg_unit_price",
        )
    )


def important_parts(
    t: dict[str, DataFrame], min_share_pct: float = 0.05
) -> DataFrame:
    """Parts whose revenue exceeds a fixed share of GLOBAL revenue
    (TPC-H Q11's value-concentration shape: per-group total compared
    against a scalar fraction of the grand total).

    Both totals accumulate in DECIMAL (exact, associative — the share
    comparison is then engine-independent). The grand total is ONE
    scalar row broadcast back over the per-part aggregate; the
    per-part aggregate itself is the only fact shuffle.
    """
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    per_part = t["lineitem"].groupBy("l_partkey").agg(F.sum(rev).alias("part_rev"))
    total = t["lineitem"].agg(F.sum(rev).alias("total_rev"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_rev").cast("double")
            > F.col("total_rev").cast("double") * min_share_pct / 100.0
        )
        .select(
            "l_partkey",
            F.round(F.col("part_rev"), 2).cast("double").alias("revenue"),
            F.round(
                F.col("part_rev").cast("double")
                / F.col("total_rev").cast("double")
                * 100.0,
                6,
            ).alias("share_pct"),
        )
    )


def dominant_suppliers(t: dict[str, DataFrame]) -> DataFrame:
    """Suppliers shipping MORE THAN TWICE the mean per-supplier share of
    some part's total quantity (TPC-H Q20's excess-stock shape
    re-expressed: a correlated per-group aggregate comparison, then a
    supplier-grain rollup; the relative threshold — supp_qty × n_supps
    > 2 × part_qty — stays meaningful as supplier counts per part grow
    with the corpus, where a fixed ">50%" empties out).

    Per-(part, supplier) and per-part quantities are two aggregations
    over the SAME partkey shuffle key (the exchange is reused); the
    comparison joins them on partkey — co-partitioned, no extra
    shuffle. Quantities accumulate in DECIMAL so the threshold test
    is exact in both engines (no float boundary flips).
    """
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_pair = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty).alias("supp_qty"))
    )
    per_part = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(
            F.sum(qty).alias("part_qty"),
            F.count_distinct("l_suppkey").alias("n_supps"),
        )
    )
    dominated = (
        per_pair.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") * F.col("n_supps") > F.col("part_qty") * 2)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("parts_dominated"))
    )
    return (
        dominated.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "parts_dominated")
    )


def suppliers_kept_waiting(t: dict[str, DataFrame]) -> DataFrame:
    """Suppliers who were the UNIQUE last shipper on multi-supplier
    orders — TPC-H Q21's blame-assignment shape (EXISTS another
    supplier on the order / NOT EXISTS another supplier who shipped
    as late) adapted to this schema's shipdate grain.

    Spark-first formulation: the correlated EXISTS pair collapses into
    ONE order-grain aggregation — per (order, supplier) latest
    shipdate, then per order the max, the count of suppliers tied at
    the max, and the supplier count. Blame attaches iff the order has
    >= 2 suppliers and exactly ONE supplier achieved the latest date
    (a tie exonerates everyone, exactly like Q21's NOT EXISTS
    l3.l_receiptdate > l1.l_receiptdate). Two aggregations over the
    same l_orderkey shuffle key (exchange reused, as in
    dominant_suppliers) replace the self-join-twice EXISTS plan a
    row-store would run; the supplier/nation decoration is a
    broadcast. Order-grain state is a date + two small counts — never
    a per-order row buffer.

    Output: top 20 (s_name, nation, n_orders_blamed) by blame count
    (ref analysis parity: run_analytics.py's seller-performance family;
    TPC-H Q21 for the shape).
    """
    per_supp = t["lineitem"].groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.max("supp_last").alias("order_last"),
        F.count("*").alias("n_supps"),
    )
    blamed = (
        per_supp.join(per_order, "l_orderkey")
        .filter(F.col("n_supps") >= 2)
        .withColumn(
            "n_at_max",
            F.count(
                F.when(F.col("supp_last") == F.col("order_last"), 1)
            ).over(Window.partitionBy("l_orderkey")),
        )
        .filter(
            (F.col("supp_last") == F.col("order_last"))
            & (F.col("n_at_max") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_orders_blamed"))
    )
    return (
        blamed.join(
            F.broadcast(
                t["supplier"].select("s_suppkey", "s_name", "s_nationkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            "n_orders_blamed",
        )
        .orderBy(F.col("n_orders_blamed").desc(), F.col("s_name").asc())
        .limit(20)
    )


def copurchase_pagerank(
    t: dict[str, DataFrame], iters: int = 3, top: int = 20
) -> DataFrame:
    """PageRank over the co-purchase product graph — which products sit
    at the center of basket co-occurrence (the 'customers also bought'
    centrality signal).

    Iterative weighted graph algorithm as a REGISTERED, hash-verified
    query: ranks use ALL-INTEGER arithmetic (scale 1e6, truncating
    integer division at every step), so the iteration is bit-exact and
    associative — no float summation-order noise between engines — and
    the DuckDB oracle unrolls the same ``iters`` steps as chained CTEs.
    Damping 0.85 in rational form: r' = (15·SCALE + 85·Σ contrib) div
    100, contrib(v) = r(v) div deg(v).

    Scale shape: co-purchase edges come from a basket-grain self-join
    (fan-out ≤ basket² per order — baskets are bounded, so edge count
    is linear in orders at any corpus size); each iteration is one
    edge⋈rank join plus one bounded (dst) aggregation, both on the same
    partkey-derived shuffle keys. Edges and degrees are ``persist``-ed
    ONCE before the loop — without loop-invariant state every
    iteration's plan re-derives the whole edge subtree (the audited
    static plan showed 14 lineitem scans for 3 iterations; Catalyst's
    exchange reuse doesn't fire across the re-aliased iterations, but
    the cache manager DOES match each iteration's identical edge
    subtree to the one InMemoryRelation), the same state discipline as
    ``dedup.connected_components``. Unlike the earlier
    ``localCheckpoint`` form, the cached frames are RELEASED before
    returning: the final top-``top`` ranks are materialized eagerly
    into their own (≤ ``top``-row) checkpoint, then edges/deg are
    unpersisted — repeated invocations of the registered query no
    longer accumulate executor storage blocks for the session lifetime.
    Fixed small ``iters`` keeps the rank-chain plan depth static.

    Output: top ``top`` (l_partkey, rank) by rank desc, partkey asc.
    """
    items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).persist()
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("c"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr("(15000000 + 85 * s) div 100").cast("long").alias("r"),
            )
        )
    result = (
        ranks.select(F.col("node").alias("l_partkey"), F.col("r").alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("l_partkey").asc())
        .limit(top)
        .localCheckpoint()  # eager: ≤ top rows, severs lineage from the caches
    )
    edges.unpersist()
    deg.unpersist()
    return result


def yoy_nation_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Year-over-year revenue growth per nation — the standard
    trend-dashboard shape (TPC-DS's YoY comparisons): per (nation,
    year) revenue in exact DECIMAL, previous year via one lag window
    PARTITIONED BY nation (25-row partitions — the window runs over the
    aggregated frame, never the fact table), growth as a rounded
    double. Fact rows shuffle once into the bounded (nation, year)
    aggregation; dimensions broadcast.

    Output: (nation, order_year, revenue, prev_revenue, yoy_pct) —
    prev_revenue/yoy_pct are null for a nation's first year AND for any
    year whose predecessor year has no revenue rows (the lag is gated
    on lagged_year == order_year - 1, so a gap never masquerades as
    one-year growth).
    """
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    agg = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(rev).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy("order_year")
    adjacent = F.lag("order_year").over(w) == F.col("order_year") - 1
    prev = F.when(adjacent, F.lag("rev").over(w))
    return agg.select(
        "nation",
        F.col("order_year").cast("bigint").alias("order_year"),
        F.round(F.col("rev"), 2).cast("double").alias("revenue"),
        F.round(prev, 2).cast("double").alias("prev_revenue"),
        F.round(
            (F.col("rev") - prev).cast("double")
            / prev.cast("double")
            * 100.0,
            6,
        ).alias("yoy_pct"),
    )


def order_fulfillment_span(t: dict[str, DataFrame]) -> DataFrame:
    """Order-lifecycle latency distribution: days from order placement
    to the LAST line shipment, bucketed by week and split by order
    priority — the fulfillment-SLA view next to delivery_performance's
    per-line stats.

    Per-order span is one (orderkey) aggregation (max shipdate), the
    histogram is a bounded (priority, week-bucket) rollup over integer
    datediff arithmetic — no windows, no float accumulation anywhere.
    Ship-before-order anomaly rows land in negative week buckets
    (both engines' integer division truncates toward zero, verified
    value-identical) — a data-quality signal, not filtered away.

    Output: (o_orderpriority, span_week_bucket, n_orders, pct_of_priority).
    """
    spans = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.expr("datediff(last_ship, o_orderdate) div 7")
            .cast("bigint")
            .alias("span_week_bucket"),
        )
    )
    agg = spans.groupBy("o_orderpriority", "span_week_bucket").agg(
        F.count("*").alias("n_orders")
    )
    total = Window.partitionBy("o_orderpriority")
    return agg.select(
        "o_orderpriority",
        "span_week_bucket",
        "n_orders",
        F.round(
            F.col("n_orders") / F.sum("n_orders").over(total).cast("double"), 6
        ).alias("pct_of_priority"),
    ).orderBy("o_orderpriority", "span_week_bucket")


def nation_profit(t: dict[str, DataFrame]) -> DataFrame:
    """Product-type profit by supplier nation and order year — the
    TPC-H Q9 shape, the one classic star-join the catalog still lacked
    a counterpart for. The corpus has no partsupp table, so supply
    cost is the deterministic 0.6 * p_retailprice proxy; the part
    filter (name LIKE '%widget%') plays Q9's '%green%' role.

    Scale shape: the filtered part list prunes the fact join first
    (smallest selectivity earliest); nation broadcasts; supplier and
    orders join on their keys with map-side pruned columns. Profit
    terms are pure double IEEE arithmetic in the SAME operation order
    both engines run, then quantize to DECIMAL(18,6) per row and sum
    exactly — the money-sum discipline.
    """
    parts = (
        t["part"]
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )
