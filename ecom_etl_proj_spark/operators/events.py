"""Event-stream analytics, batch form.

The reference's Kafka consumer maintains Redis counters row-at-a-time
(/root/reference/kafka_scripts/consumer.py:192-357): minutely counts &
revenue per topic, per-product/per-user counters, running totals, and
recent-N activity lists. These are the batch-checkable equivalents on
the ``events`` table; ``streaming/pipeline.py`` runs the same logic as a
real Structured Streaming job.

Scale notes: minutely aggregation keys are (minute, type) — high
cardinality but uniformly distributed, so the shuffle is balanced.
Running totals use a range-unbounded window ordered by minute; at 100 TB
the cumulative window would be computed per day-partition then offset by
per-day totals (two-level scan) — noted here, single window locally.
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
            F.round(F.sum("value"), 2).alias("total_value"),
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
        F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 2).alias(
            "purchase_value"
        ),
    )


def running_totals(t: dict[str, DataFrame]) -> DataFrame:
    """Cumulative purchase revenue by minute (consumer.py:346-357)."""
    per_min = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.round(F.sum("value"), 2).alias("minute_revenue"))
    )
    w = Window.orderBy("minute").rowsBetween(Window.unboundedPreceding, 0)
    return per_min.select(
        "minute",
        "minute_revenue",
        F.round(F.sum("minute_revenue").over(w), 2).alias("cumulative_revenue"),
    )


def recent_events(t: dict[str, DataFrame], n: int = 100) -> DataFrame:
    """Recent-N activity feed (consumer.py:219-226: lpush + ltrim 0..99)."""
    return (
        t["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(n)
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
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def event_value_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-type value statistics incl. exact median (dashboard KPI tiles)."""
    return t["events"].groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.avg("value"), 2).alias("avg_value"),
        F.round(F.expr("percentile(value, 0.5)"), 2).alias("median_value"),
        F.round(F.stddev_samp("value"), 2).alias("stddev_value"),
    )
