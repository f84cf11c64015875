"""Kafka producer twin — the write side of the broker seam.

The reference's producer (/root/reference/kafka_scripts/producer.py)
generates events row-at-a-time and sends JSON payloads keyed by
user_id to four topics (producer.py:209-254). This twin is the
Spark-native form: a DataFrame of events becomes (topic, key, value)
records and lands through Spark's Kafka sink — batch
(``produce_events``) or streaming (``produce_events_stream``) — so a
broker-equipped deployment can stand up the WHOLE realtime path
(producer → engine → serving store) from the engine's own generator,
with no external data dependency.

The payload contract is the engine's own events schema: what
``to_kafka_records`` encodes, ``pipeline.parse_event_payload`` decodes
back byte-for-byte — asserted batch-side in tests/test_streaming.py
(no broker needed), while the live round-trip test runs wherever
``$SPARK_GRAFT_KAFKA_BOOTSTRAP`` points at a real broker (the same
env gate as the consumer seam; this container has neither broker nor
connector jar).

Scale notes: the sink is a plain per-partition Kafka write — no
shuffle is introduced (records go out from whatever partitioning the
upstream plan produced), keys partition the topics by user so
per-user ordering survives, exactly like the reference's
key=user_id sends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# event_type → reference topic (producer.py:242-254 via consumer.py
# defaults); error events carry no topic and are dropped, mirroring
# operators.events.topic_counters.
TOPIC_OF = {
    "view": "ecommerce.product.views",
    "click": "ecommerce.cart.add",
    "signup": "ecommerce.wishlist.add",
    "purchase": "ecommerce.orders.completed",
}


def to_kafka_records(events: DataFrame) -> DataFrame:
    """Project typed event rows to the Kafka sink contract
    (topic, key, value):

    - topic: per-family reference topic name
    - key:   user_id string (the reference's key=user_id sends —
             per-user ordering within a topic partition)
    - value: JSON of the full events schema, the exact payload
             ``parse_event_payload`` decodes (ts serialized with
             microsecond precision so the round trip is lossless)
    """
    topic = F.lit(None).cast("string")
    for et, tp in TOPIC_OF.items():
        topic = F.when(F.col("event_type") == et, tp).otherwise(topic)
    value = F.to_json(
        F.struct(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias(
                "ts"
            ),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    return (
        events.withColumn("topic", topic)
        .filter(F.col("topic").isNotNull())
        .select(
            "topic",
            F.col("user_id").cast("string").alias("key"),
            value.alias("value"),
        )
    )


def produce_events(events: DataFrame, bootstrap: str) -> None:
    """Batch-produce an events DataFrame to the four reference topics
    (the ``send_sample_events`` analog, producer.py:281-299)."""
    (
        to_kafka_records(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .save()
    )


def produce_events_stream(
    events: DataFrame, bootstrap: str, checkpoint: str
):
    """Continuously produce an events STREAM to the reference topics —
    the long-running producer loop (producer.py:230-260). Pair with
    ``sources.generator`` for a self-contained load generator:
    ``produce_events_stream(events_stream_source(spark), ...)``."""
    return (
        to_kafka_records(events)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
        .start()
    )
