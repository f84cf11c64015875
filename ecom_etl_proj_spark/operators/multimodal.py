"""Multimodal column plumbing.

Treats media as opaque ``binary`` payloads with typed metadata, the way
a 100 TB multimodal training pipeline stores image/audio/video next to
text. The Spark-side plumbing (schema, batch shape, partitioning, Arrow
transfer) is real and tested; the actual decode is stubbed because no
image/audio libraries exist in this container — the stub is a
deterministic fake so tests can assert the full pipeline shape.

The testdata has no binary column, so ``with_payload`` materializes one
by encoding the document text; in production this column would come
straight from parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def with_payload(t: dict[str, DataFrame]) -> DataFrame:
    """Attach an opaque binary payload column + typed metadata."""
    d = t["documents"]
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.length(payload).alias("payload_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def multimodal_meta(t: dict[str, DataFrame]) -> DataFrame:
    """Payload metadata projection — the oracle-checkable part."""
    return with_payload(t).select("doc_id", "payload_bytes", "payload_sha256")


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: derives fake (width, height, frames)
    from payload length. Replace with a real decoder (PIL/ffmpeg) where
    available.

    Raising path kept explicit so callers know this is a stub:
    a real deployment sets ``ALLOW_FAKE_DECODE = False``.
    """
    if not ALLOW_FAKE_DECODE:
        raise NotImplementedError("media decode requires image/audio libs")
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 30 + 1)


ALLOW_FAKE_DECODE = True


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one Python worker per partition.

    This is the canonical shape for CPU-bound media work on Spark: the
    binary column arrives as a pandas Series of bytes per batch; the UDF
    is free to call native decoders. Partition count (not row count)
    bounds Python-process parallelism, so upstream ``repartition`` sizes
    the decode stage.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )
