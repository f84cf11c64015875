"""Synthetic event generation — the reference's Kafka producer, Spark-side.

The reference's producer (kafka_scripts/producer.py) fabricates
view/cart/wishlist/order events with random products and prices and
pushes them to 4 topics. The Spark twin derives a deterministic event
stream from the ``rate`` source: every micro-batch row becomes an event
whose type/user/value are pure hash functions of the sequence number —
reproducible, unbounded, no broker needed.

Scale note: the rate source is per-partition monotonic, so generation
parallelizes linearly; hashes are codegen expressions. Use
``rowsPerSecond``/``numPartitions`` to size load tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def synthetic_events(df_rate: DataFrame, n_users: int = 1000) -> DataFrame:
    """Map a rate-source frame (timestamp, value) to the events schema."""
    seq = F.col("value")
    h = F.xxhash64(seq)
    etype = F.element_at(
        F.array(*[F.lit(t) for t in EVENT_TYPES]),
        (F.pmod(h, F.lit(len(EVENT_TYPES))) + 1).cast("int"),
    )
    return df_rate.select(
        seq.alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.xxhash64(seq, F.lit(1)), F.lit(n_users)).alias("user_id"),
        etype.alias("event_type"),
        F.round(F.pmod(F.xxhash64(seq, F.lit(2)), F.lit(10000)) / 100.0, 2).alias(
            "value"
        ),
        F.concat(
            F.lit('{"k": '), F.pmod(F.xxhash64(seq, F.lit(3)), F.lit(100)), F.lit("}")
        ).alias("props"),
    )


def rate_stream(
    spark: SparkSession, rows_per_second: int = 1000, n_partitions: int = 4
) -> DataFrame:
    """Unbounded rate source sized for load testing."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", n_partitions)
        .load()
    )


def batch_events(spark: SparkSession, n: int, n_users: int = 1000) -> DataFrame:
    """Bounded deterministic event batch (spark.range-driven) — the
    batch twin of the stream, for tests and backfills."""
    base = spark.range(n).select(
        F.col("id").alias("value"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_dt_interval(secs=F.col("id") / 10.0)
        ).alias("timestamp"),
    )
    return synthetic_events(base, n_users)
