"""Event-stream analytics, batch form.

The reference's Kafka consumer maintains Redis counters row-at-a-time
(/root/reference/kafka_scripts/consumer.py:192-357): minutely counts &
revenue per topic, per-product/per-user counters, running totals, and
recent-N activity lists. These are the batch-checkable equivalents on
the ``events`` table; ``streaming/pipeline.py`` runs the same logic as a
real Structured Streaming job.

Scale notes: minutely aggregation keys are (minute, type) — high
cardinality but uniformly distributed, so the shuffle is balanced.
``running_totals`` uses a single cumulative window over the minutely
aggregate; ``running_totals_scalable`` is the two-level form (per-day
parallel cumulative + per-day-total offsets) for fine-grain backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def events_minutely(t: dict[str, DataFrame]) -> DataFrame:
    """Minutely event counts + value sums per type (consumer.py:199-213)."""
    return (
        t["events"]
        .groupBy(
            F.date_trunc("minute", "ts").alias("minute"),
            "event_type",
        )
        .agg(
            F.count("*").alias("num_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("total_value"),
        )
    )


def user_activity(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user activity counters (consumer.py:214-216), pivoted wide."""
    e = t["events"]
    cnt = lambda typ: F.sum(F.when(F.col("event_type") == typ, 1).otherwise(0))
    return e.groupBy("user_id").agg(
        cnt("view").alias("views"),
        cnt("click").alias("clicks"),
        cnt("purchase").alias("purchases"),
        cnt("signup").alias("signups"),
        cnt("error").alias("errors"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0)
                .cast("decimal(18,6)")
            ),
            2,
        )
        .cast("double")
        .alias("purchase_value"),
    )


def running_totals(t: dict[str, DataFrame]) -> DataFrame:
    """Cumulative purchase revenue by minute (consumer.py:346-357).

    The cumulative window here has no partition key, so the final sum
    funnels through ONE task. It runs over the minutely AGGREGATE
    (≈526K rows/year — grain-bounded, fine at any corpus size), but a
    multi-year backfill at fine grain should use
    ``running_totals_scalable`` below, which keeps the same output
    while computing the cumulative in parallel.
    """
    per_min = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("minute_revenue"))
    )
    w = Window.orderBy("minute").rowsBetween(Window.unboundedPreceding, 0)
    return per_min.select(
        "minute",
        "minute_revenue",
        F.round(F.sum("minute_revenue").over(w), 2).alias("cumulative_revenue"),
    )


def running_totals_scalable(t: dict[str, DataFrame]) -> DataFrame:
    """Two-pass cumulative purchase revenue by minute — the
    parallel form of ``running_totals``.

    The classic distributed prefix-sum: (1) bucket each minute into its
    UTC DAY — a partition key that is DETERMINISTIC IN THE DATA and
    monotone in time, so every evaluation of every plan branch agrees
    on it; (2) each day computes its LOCAL cumulative sum in parallel
    (the window partitions by day — no single-task global sort); (3)
    the per-day totals (one row per day — 36.5K rows PER CENTURY, a
    bounded frame at any corpus size) go through a tiny offset window
    and broadcast-join back.

    An earlier form derived the key from ``spark_partition_id()`` after
    ``repartitionByRange`` — range boundaries come from sampling, and
    both the within-window and the totals aggregate branched off that
    node, so correctness silently depended on Catalyst reusing one
    exchange for both branches (ADVICE r4). A calendar bucket removes
    the whole hazard: re-evaluation cannot disagree.

    Sums accumulate in DECIMAL so the split-and-recombine is exact —
    bit-identical to the sequential window regardless of how the
    timeline splits (double addition is order-dependent; decimal is
    associative).
    """
    per_min = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("minute_revenue"))
    )
    ranged = per_min.withColumn(
        "part", F.floor(F.unix_timestamp("minute") / F.lit(86400)).cast("long")
    )
    dec = F.col("minute_revenue").cast("decimal(18,2)")
    w_in = (
        Window.partitionBy("part")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = ranged.withColumn("cum_in", F.sum(dec).over(w_in))
    totals = ranged.groupBy("part").agg(F.sum(dec).alias("part_total"))
    w_off = Window.orderBy("part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("offset", F.sum("part_total").over(w_off)).select(
        "part", "offset"
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        within.join(F.broadcast(offsets), "part")
        .select(
            "minute",
            "minute_revenue",
            (F.col("cum_in") + F.coalesce(F.col("offset"), zero))
            .cast("double")
            .alias("cumulative_revenue"),
        )
    )


def recent_events(t: dict[str, DataFrame], n: int = 100) -> DataFrame:
    """Recent-N activity feed (consumer.py:219-226: lpush + ltrim 0..99)."""
    return (
        t["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(n)
    )


def recent_events_by_family(
    t: dict[str, DataFrame], n: int = 100, n_salts: int = 32
) -> DataFrame:
    """Per-family recent-N feeds — one top-N list PER event_type,
    mirroring the consumer's four separate recent:* lists
    (consumer.py:225,261,292,340: recent:views / cart_adds /
    wishlist_adds / orders), where ``recent_events`` above is the
    combined feed (consumer.py:219-226).

    Scale shape: a rank window partitioned only by event_type would
    funnel the WHOLE corpus through one task per family (family
    cardinality is ~5 — the classic low-cardinality window trap, and
    AQE cannot split a rank window). Two-level top-N instead: a salt
    derived from event_id splits each family into ``n_salts`` groups
    that each keep their local top-N in parallel; the final window
    re-ranks only the n_salts*N survivors per family — bounded rows
    through the single-task stage regardless of corpus size.
    """
    e = t["events"].select("event_id", "ts", "user_id", "event_type", "value")
    order = [F.col("ts").desc(), F.col("event_id").desc()]
    w_local = Window.partitionBy(
        "event_type", F.pmod("event_id", F.lit(n_salts))
    ).orderBy(*order)
    survivors = (
        e.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )
    w_final = Window.partitionBy("event_type").orderBy(*order)
    return (
        survivors.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def sessionization(t: dict[str, DataFrame], gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts after a quiet gap.

    The standard streaming-session operator expressed as two windows
    over (user_id, ts): a lag marks session starts, a running sum
    assigns session indexes. Both windows partition by user_id, so the
    shuffle key is the user — state per task is one user's history, and
    skewed users are split by AQE. (In streaming form this is
    ``session_window``/``applyInPandasWithState``; the batch form here
    is the oracle-checkable equivalent.)
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond epoch on both engines (second-truncation vs fractional
    # epoch() disagrees at gap boundaries)
    us = F.unix_micros(F.col("ts"))
    marked = t["events"].withColumn(
        "new_session",
        F.when(
            (us - F.lag(us).over(w_user)) > gap_minutes * 60 * 1_000_000, 1
        )
        .otherwise(0)
        .cast("int"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = marked.withColumn("session_idx", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 1000000").alias(
            "duration_secs"
        ),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("total_value"),
    )


def event_value_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-type value statistics incl. exact median (dashboard KPI tiles)."""
    return t["events"].groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("value"), 2).alias("avg_value"),
        F.round(F.expr("percentile(value, 0.5)"), 2).alias("median_value"),
        F.round(F.stddev_samp("value"), 2).alias("stddev_value"),
    )


def event_attribution(t: dict[str, DataFrame]) -> DataFrame:
    """As-of join: each purchase attributed to the user's latest prior view.

    Spark has no ASOF JOIN operator; the scalable formulation is the
    union-and-carry trick: tag views and purchases, sort within user by
    (ts, kind), and carry the last seen view forward with an
    ignore-nulls last() window. One shuffle on user_id (which the
    catalog's event partitioning already satisfies), no range-join
    fan-out, no per-row lookup — this is how as-of joins stay linear at
    100 TB. Purchases sort BEFORE views at equal ts so the match is
    strictly earlier (v.ts < p.ts), matching ASOF JOIN semantics.
    """
    ev = t["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), F.lit(1).alias("is_view")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), F.col("value")
    )
    unioned = views.select(
        "user_id", "ts", "is_view", "view_id",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("view_ts"),
    ).unionByName(
        purchases.select(
            "user_id", "ts", F.lit(0).alias("is_view"),
            F.lit(None).cast("long").alias("view_id"),
            "purchase_id", "value",
            F.lit(None).cast("timestamp").alias("view_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_view", "view_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = unioned.select(
        "user_id", "ts", "purchase_id", "value",
        F.last("view_id", ignorenulls=True).over(w).alias("attr_view_id"),
        F.last("view_ts", ignorenulls=True).over(w).alias("attr_view_ts"),
    )
    return (
        carried.filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "value",
            "attr_view_id",
            F.expr(
                "(unix_micros(ts) - unix_micros(attr_view_ts)) div 1000000"
            ).alias("secs_since_view"),
        )
    )


def event_funnel(t: dict[str, DataFrame]) -> DataFrame:
    """view → click → purchase funnel: users reaching each stage.

    One conditional-aggregation pass per user (bool_or flags), then one
    scalar rollup — two tiny shuffles, no self-joins per stage.
    """
    flags = t["events"].groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("has_view"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("has_click"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("has_purchase"),
    )
    return flags.agg(
        F.sum("has_view").alias("n_view_users"),
        F.sum(F.col("has_view") * F.col("has_click")).alias("n_view_click_users"),
        F.sum(F.col("has_view") * F.col("has_click") * F.col("has_purchase")).alias(
            "n_full_funnel_users"
        ),
    )


def hourly_activity(t: dict[str, DataFrame]) -> DataFrame:
    """Weekday × hour activity heatmap (0=Monday, hours 0-23)."""
    return (
        t["events"]
        .groupBy(
            F.weekday("ts").alias("dow"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("total_value"),
        )
    )


def event_props_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-type stats over a JSON payload field (props.k).

    JSON extraction stays JVM-side (get_json_object) — the standard
    semi-structured-column pattern; at scale the extraction cost is the
    scan itself, no shuffle added beyond the final tiny agg.
    """
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def minutely_anomalies(t: dict[str, DataFrame], z_threshold: float = 3.0) -> DataFrame:
    """Traffic-spike detection: minutes whose event count is a z-score
    outlier against their event type's own distribution.

    Two aggregations: minutely counts (the streaming counter shape,
    consumer.py:199-213), then per-type mean/stddev broadcast back via
    a window over the type — the window input is |types| x |minutes|
    aggregate rows, never raw events. This is the realtime dashboard's
    spike tile computed batch-side.
    """
    per_min = (
        t["events"]
        .groupBy(
            F.date_trunc("minute", "ts").alias("minute"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type")
    stats = per_min.select(
        "minute",
        "event_type",
        "n",
        F.avg("n").over(w).alias("mean_n"),
        F.stddev_samp("n").over(w).alias("sd_n"),
    )
    z = (F.col("n") - F.col("mean_n")) / F.col("sd_n")
    return (
        stats.filter(F.col("sd_n") > 0)
        .withColumn("z_score", F.round(z, 4))
        .filter(F.abs(F.col("z_score")) >= z_threshold)
        .select("event_type", "minute", "n", F.round("mean_n", 4).alias("mean_n"), "z_score")
    )


def rolling_active_users(t: dict[str, DataFrame], window_days: int = 7) -> DataFrame:
    """Daily active users + trailing-N-day active users, exactly.

    Sliding DISTINCT counts can't use a running window (distinct state
    isn't subtractable). The scalable exact form is contribution
    explode: each (user, day) activity contributes itself to the N
    window-end days it falls in, then one groupBy(day) count-distinct.
    Shuffle volume is N x |user-days| key pairs — linear, bounded by the
    window length, no per-day rescan of history.
    """
    user_days = (
        t["events"]
        .select(
            F.col("user_id"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .distinct()
    )
    contributions = user_days.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {window_days - 1}), interval 1 day)"
            )
        ).alias("window_end"),
        "day",
    )
    rolling = contributions.groupBy("window_end").agg(
        F.count_distinct("user_id").alias("active_users_7d")
    )
    dau = user_days.groupBy(F.col("day").alias("window_end")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    # keep only window ends that are real activity days (tail windows
    # beyond the last day would otherwise appear)
    return (
        dau.join(rolling, "window_end")
        .select(F.col("window_end").alias("day"), "dau", "active_users_7d")
    )


def _product_key() -> F.Column:
    """Entity key from the JSON payload (props.k — the product id the
    reference's consumer keys its Redis hashes on, consumer.py:207-212).
    get_json_object stays JVM-side; at scale extraction cost is the scan
    itself."""
    return F.get_json_object("props", "$.k").cast("bigint")


def counter_aggs() -> list[F.Column]:
    """The per-entity counter aggregate set, shared verbatim by the
    batch queries and the streaming twin so both compute the same
    state."""
    return [
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))),
                F.lit(0.0),
            ),
            2,
        ).alias("purchase_revenue"),
    ]


def product_counters(t: dict[str, DataFrame]) -> DataFrame:
    """Per-product realtime counter set (ref consumer.py:207-212: the
    product:views / product:cart_adds Redis hashes, plus revenue).

    One conditional aggregation pass keyed on the product id — partial
    aggregation map-side, |products| final rows; no shuffle beyond the
    counter groupBy. The streaming twin
    (streaming/pipeline.py::product_counters_stream) runs the identical
    plan incrementally."""
    return (
        t["events"]
        .select(_product_key().alias("product_id"), "event_type", "value")
        .groupBy("product_id")
        .agg(*counter_aggs())
    )


def product_leaderboard(t: dict[str, DataFrame], n: int = 10) -> DataFrame:
    """Top-N products by views (ref streamlit/utils.py:143-150 realtime
    leaderboard).

    orderBy().limit(n) over the counter aggregates plans as
    TakeOrderedAndProject — per-partition top-N then a driver merge of
    N-row heaps, never a global sort; rank is assigned on the N
    surviving rows only."""
    top = (
        product_counters(t)
        .orderBy(F.col("n_views").desc(), F.col("product_id").asc())
        .limit(n)
    )
    w = Window.orderBy(F.col("n_views").desc(), F.col("product_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def category_counters(t: dict[str, DataFrame]) -> DataFrame:
    """Per-category counters: the product key joined to the part
    dimension for its category (ref consumer.py:210: category:views).

    The dimension side (p_partkey → p_type) broadcasts; the event scan
    never shuffles before the counter aggregation."""
    ev = t["events"].select(
        _product_key().alias("product_id"), "event_type", "value"
    )
    cat = t["part"].select(
        F.col("p_partkey").alias("product_id"), F.col("p_type").alias("category")
    )
    return (
        ev.join(F.broadcast(cat), "product_id")
        .groupBy("category")
        .agg(*counter_aggs())
    )


def product_decay_revenue(
    t: dict[str, DataFrame], half_life_days: float = 7.0
) -> DataFrame:
    """Exponentially time-decayed purchase revenue per product — the
    trending-products score (recent purchases count ~2x a
    half-life-old one).

    The decay anchor (max event ts) is one scalar aggregate broadcast
    back; the weighted sum is then a single partial-aggregated pass, so
    the whole query is two scans of nothing but the purchase slice.
    Integer-second age arithmetic keeps the oracle byte-identical.
    """
    purchases = t["events"].filter(F.col("event_type") == "purchase")
    anchor = purchases.agg(F.max("ts").alias("mx"))
    age_days = (
        F.unix_timestamp("mx") - F.unix_timestamp("ts")
    ) / F.lit(86400.0)
    weighted = F.col("value") * F.pow(F.lit(0.5), age_days / F.lit(half_life_days))
    return (
        purchases.select(_product_key().alias("product_id"), "ts", "value")
        .crossJoin(F.broadcast(anchor))
        .groupBy("product_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum(weighted), 2).alias("decayed_revenue"),
        )
    )


def topic_counters(t: dict[str, DataFrame]) -> DataFrame:
    """Per-topic counter families under the reference's FOUR Kafka topic
    names (consumer.py:231-297 keeps cart-add and wishlist-add counters
    as distinct families, not one generic event counter).

    The testdata's five event types map deterministically onto the four
    topics (extending SURVEY §4): view→product_views,
    click→cart_additions, signup→wishlist_additions, purchase→orders;
    error events carry no topic in the reference and are dropped. One
    conditional aggregation pass — the same bounded shape as
    event_type_distribution, keyed by the reference's names so a
    consumer of the reference's Redis counter families can read this
    output unchanged.
    """
    topic = (
        F.when(F.col("event_type") == "view", "product_views")
        .when(F.col("event_type") == "click", "cart_additions")
        .when(F.col("event_type") == "signup", "wishlist_additions")
        .when(F.col("event_type") == "purchase", "orders")
    )
    return (
        t["events"]
        .withColumn("topic", topic)
        .filter(F.col("topic").isNotNull())
        .groupBy("topic")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


def event_transition_matrix(t: dict[str, DataFrame]) -> DataFrame:
    """Markov transition structure of the clickstream: for every
    (event_type -> next event_type) pair within a user's timeline, the
    transition count and the row-normalized probability.

    The behavioral-flow query behind funnel diagnostics (which step
    follows which, where sessions leak) — the reference's event
    analytics stop at per-type counts (consumer.py counters); this adds
    the first-order chain. The successor comes from a ``lead`` window
    PARTITIONED BY user (user-grain bounded — never a global window;
    ties at identical timestamps break deterministically by event_id).
    Counts aggregate on the bounded (type, next_type) key — at most
    |event_types|² rows — and the per-source normalizer is a broadcast
    of the tiny per-type totals, so the corpus shuffles once for the
    user window and once into a bounded aggregation.

    Output: (event_type, next_type, n_transitions, prob), prob summing
    to 1 per event_type over its outgoing transitions.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        t["events"]
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("n_transitions").alias("total")
    )
    return (
        counts.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "next_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("total"), 6).alias("prob"),
        )
    )


def top_event_paths(t: dict[str, DataFrame], top: int = 20) -> DataFrame:
    """Most common 3-step event sequences across user timelines — the
    path-analysis companion to ``event_transition_matrix`` (second-order
    where the matrix is first-order).

    Two ``lead`` hops over the same user-partitioned window (one sort,
    user-grain bounded, identical-timestamp ties broken by event_id),
    then a bounded (step1, step2, step3) aggregation — at most
    |event_types|³ keys. Output: top ``top``
    (step1, step2, step3, n_paths), deterministic tie-break on the
    steps.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        t["events"]
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("step2", F.lead("event_type", 1).over(w))
        .withColumn("step3", F.lead("event_type", 2).over(w))
        .filter(F.col("step3").isNotNull())
    )
    return (
        paths.groupBy(
            F.col("event_type").alias("step1"), "step2", "step3"
        )
        .agg(F.count("*").alias("n_paths"))
        .orderBy(
            F.col("n_paths").desc(),
            F.col("step1").asc(),
            F.col("step2").asc(),
            F.col("step3").asc(),
        )
        .limit(top)
    )


def session_duration_histogram(
    t: dict[str, DataFrame], gap_minutes: int = 30, bucket_minutes: int = 5
) -> DataFrame:
    """Distribution of session lengths: gap-based sessions bucketed
    into fixed ``bucket_minutes`` duration bins — the engagement-shape
    report next to ``sessionization``'s per-session detail.

    All-integer bucketing (duration_secs div bucket seconds) on top of
    the sessionization aggregate; the histogram itself is a bounded
    (bucket) rollup with event/session volumes and the share of
    sessions per bin. Single-event sessions land in bucket 0.

    Output: (bucket_start_min, n_sessions, n_events, pct_sessions)
    ordered by bucket.
    """
    sess = sessionization(t, gap_minutes)
    bucket = F.expr(f"duration_secs div {bucket_minutes * 60}").cast("bigint")
    agg = sess.groupBy(
        (bucket * bucket_minutes).alias("bucket_start_min")
    ).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )
    total = Window.partitionBy()
    return agg.select(
        "bucket_start_min",
        "n_sessions",
        "n_events",
        F.round(
            F.col("n_sessions") / F.sum("n_sessions").over(total).cast("double"),
            6,
        ).alias("pct_sessions"),
    ).orderBy("bucket_start_min")


def covisitation_pairs(
    t: dict[str, DataFrame],
    gap_minutes: int = 30,
    cap: int = 50,
    top: int = 20,
) -> DataFrame:
    """Session-based product co-visitation: the top product pairs seen
    together inside one browsing session — the clickstream complement
    to ``analytics.copurchase_pairs`` (baskets say what sells together;
    sessions say what is CONSIDERED together, the signal behind
    'people who viewed this also viewed').

    Shape: gap-based sessionization (same two user-keyed windows as
    ``sessionization``), then each session collapses to its SORTED
    DISTINCT product set capped at ``cap`` entries — pair expansion is
    row-local over that bounded array (<= cap²/2 structs per session,
    the term_cooccurrence discipline: an uncapped crawler session would
    otherwise emit its whole catalog squared), and the count is a
    bounded (a, b)-keyed aggregation with map-side combine. No
    self-join on the event table anywhere.

    Output: top ``top`` (product_a, product_b, n_sessions) by session
    count, then product ids.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    marked = t["events"].withColumn(
        "new_session",
        F.when(
            (us - F.lag(us).over(w_user)) > gap_minutes * 60 * 1_000_000, 1
        )
        .otherwise(0)
        .cast("int"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.withColumn("session_idx", F.sum("new_session").over(w_cum))
    prods = (
        sess.select(
            "user_id", "session_idx", _product_key().alias("product_id")
        )
        .filter(F.col("product_id").isNotNull())
        .groupBy("user_id", "session_idx")
        .agg(
            F.slice(F.array_sort(F.collect_set("product_id")), 1, cap).alias(
                "ps"
            )
        )
        .filter(F.size("ps") > 1)
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        prods.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("product_a"), F.col("p.b").alias("product_b"))
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(
            F.col("n_sessions").desc(),
            F.col("product_a").asc(),
            F.col("product_b").asc(),
        )
        .limit(top)
    )


def purchase_view_window(t: dict[str, DataFrame]) -> DataFrame:
    """Interval join, scalably: for every purchase, how many views the
    same user made in the PRECEDING HOUR and what they were worth —
    the conversion-window attribution query (event_attribution's as-of
    join takes only the LATEST prior view; this aggregates the whole
    window). Spark has no interval-join operator for batch; the naive
    formulation (self-join on user + range predicate) fans out
    per-user-density². The scalable form used here is a RANGE window
    over the unioned stream: one exchange on user_id, a numeric range
    frame over epoch-microseconds, zero fan-out — each row is touched
    once, exactly how Structured Streaming's stream-stream interval
    join bounds its state.

    The frame is [ts - 1h, ts) EXCLUSIVE of the purchase instant
    (upper bound -1 microsecond), so a view stamped at the purchase's
    own microsecond does not count — strictly-earlier semantics, like
    the as-of join.

    Only view and purchase rows enter the window: clicks / signups /
    errors contribute zero to both framed sums (is_view = 0,
    view_value = 0.0) and are dropped by the post-window purchase
    filter, so pre-filtering is output-identical under the RANGE
    frame (a numeric frame keys on ts_us values, not row positions)
    while cutting the user_id exchange and window-sort input ~2.5x
    on this event mix. Identity proven in tests/test_operators.py::
    test_purchase_view_window_prefilter_identity on a mix with clicks
    at purchase-adjacent timestamps.

    Output: (purchase_id, user_id, ts, n_prior_views, prior_view_value).
    """
    ev = t["events"].filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.when(F.col("event_type") == "view", 1)
        .otherwise(0)
        .alias("is_view"),
        F.when(F.col("event_type") == "view", F.col("value"))
        .otherwise(F.lit(0.0))
        .alias("view_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, -1)
    )
    return (
        ev.withColumn("n_prior_views", F.sum("is_view").over(w))
        .withColumn(
            "prior_view_value", F.round(F.sum("view_value").over(w), 4)
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts",
            F.coalesce(F.col("n_prior_views"), F.lit(0)).cast(
                "bigint"
            ).alias("n_prior_views"),
            F.coalesce(F.col("prior_view_value"), F.lit(0.0)).alias(
                "prior_view_value"
            ),
        )
    )


def key_skew_profile(t: dict[str, DataFrame], top: int = 20) -> DataFrame:
    """The pre-flight skew diagnostic for a join/aggregation key: the
    ``top`` heaviest user_ids with their row share and cumulative
    share — the numbers that decide whether a fact-fact join on this
    key needs salting or AQE skew handling before it ships. (The
    engine also has the runtime answers — skew_salted_join, AQE skew
    join — this is the PLANNING query run first.)

    Scale shape: one map-side-combined count per key, a distributed
    TakeOrdered for the top block, and rank/cumulative windows over
    the already-limited ``top`` rows (bounded, whitelisted like
    bm25_search).

    Output: (user_id, n_events, share, cum_share, rank).
    """
    counts = t["events"].groupBy("user_id").agg(
        F.count("*").alias("n_events")
    )
    total = t["events"].agg(F.count("*").alias("n_total"))
    top_keys = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(top)
    )
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    cum = Window.orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top_keys.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "share", F.round(F.col("n_events") / F.col("n_total"), 6)
        )
        .withColumn(
            "cum_share",
            F.round(F.sum("n_events").over(cum) / F.col("n_total"), 6),
        )
        .select("user_id", "n_events", "share", "cum_share", "rank")
    )
