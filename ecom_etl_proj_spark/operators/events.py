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
