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


# Deterministic fake decode geometry: (len % 640 + 1, len % 480 + 1,
# len % 30 + 1). The stub is the ORACLE TWIN — the registry pins it so
# the Arrow plumbing stays hash-verified; the real decoder rides the
# same mapInPandas seam behind a runtime probe (below).
ALLOW_FAKE_DECODE = True


def real_decoder_available() -> bool:
    """Runtime probe for a real image decoder. No image library ships
    in this container, so the probe reports False here and
    ``decode_media(mode='real')`` raises — but in a richer environment
    the SAME seam upgrades to real decoding with no plan/schema change.
    This mirrors the lakehouse probe pattern (tests/test_pipeline.py):
    document the environmental gap with an executable check instead of
    a comment, so the moment the environment changes the upgrade path
    is already wired and tested."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_media(df: DataFrame, mode: str = "stub") -> DataFrame:
    """mapInPandas decode: Arrow-batched, one Python worker per partition.

    This is the canonical shape for CPU-bound media work on Spark: the
    binary column arrives as a pandas Series of bytes per batch; the UDF
    is free to call native decoders. Partition count (not row count)
    bounds Python-process parallelism, so upstream ``repartition`` sizes
    the decode stage.

    ``mode``:
      - ``"stub"`` (default, registry/oracle-pinned): deterministic
        length-derived geometry — the hash-verifiable twin;
      - ``"real"``: decode with PIL on the executors; raises
        ``NotImplementedError`` at build time when the probe says no
        decoder exists (this container). Undecodable payloads yield
        NULL geometry — the production behavior for corrupt media (a
        raise inside the worker would kill the whole job for one bad
        file at 100 TB);
      - ``"auto"``: ``real`` when available, else the stub.
    """
    if mode == "auto":
        mode = "real" if real_decoder_available() else "stub"
    if mode == "real" and not real_decoder_available():
        raise NotImplementedError(
            "decode_media(mode='real') needs an image decoder (PIL); "
            "the runtime probe reports none in this environment"
        )

    # Capture everything the worker needs as CLOSURE-LOCAL values: a
    # module-level reference (e.g. ALLOW_FAKE_DECODE) would be
    # cloudpickled by module name and the executor Python worker would
    # have to import this package — which fails whenever the driver
    # process didn't launch from the repo root (exactly how the round
    # driver runs). Nested defs + captured plain values pickle by value
    # and need nothing importable but pandas (and PIL in real mode,
    # imported lazily INSIDE the worker fn — a plain installed package,
    # not this repo).
    allow_fake = ALLOW_FAKE_DECODE
    use_real = mode == "real"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stub(payload: bytes) -> tuple[int | None, int | None, int | None]:
            if not allow_fake:
                raise NotImplementedError(
                    "media decode requires image/audio libs"
                )
            n = len(payload)
            return (n % 640 + 1, n % 480 + 1, n % 30 + 1)

        def real(payload: bytes) -> tuple[int | None, int | None, int | None]:
            import io

            import PIL.Image

            try:
                with PIL.Image.open(io.BytesIO(payload)) as img:
                    return (
                        int(img.width),
                        int(img.height),
                        int(getattr(img, "n_frames", 1)),
                    )
            except Exception:
                return (None, None, None)

        decode = real if use_real else stub
        for pdf in batches:
            decoded = [decode(p) for p in pdf["payload"]]
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


# The three ops below keep the same mapInPandas/Arrow shape as
# decode_media but their stub math is chosen to be EXPRESSIBLE IN SQL
# (hashes + arithmetic over payload bytes), so each gets a full DuckDB
# oracle: the driver hash-checks that the Python/Arrow round trip is
# value-exact, a strictly stronger signal than the rows-only check the
# opaque decode stub gets. Swapping the stub for PIL/ffmpeg changes the
# lambda body only — schema, batching, and partitioning stay as tested.

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_width", T.IntegerType()),
        T.StructField("orig_height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Fit-in-box resize plan for every image payload (aspect preserved,
    never upscaled) — the standard pre-training normalization pass.
    Stub geometry derives from payload length exactly like
    the decode stub; integer math only, so the oracle reproduces it.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n = len(p)
                w, h = n % 640 + 1, n % 480 + 1
                # integer-scaled fit: scale = min(max_w/w, max_h/h, 1)
                # expressed as exact integer arithmetic (floor divisions)
                if w <= max_w and h <= max_h:
                    nw, nh = w, h
                elif w * max_h >= h * max_w:  # width-bound
                    nw, nh = max_w, max(1, (h * max_w) // w)
                else:
                    nw, nh = max(1, (w * max_h) // h), max_h
                rows.append((doc_id, w, h, nw, nh))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "orig_width", "orig_height",
                    "new_width", "new_height",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_key", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 5) -> DataFrame:
    """Every ``every_n``-th frame of each video payload — the 1→N fanout
    shape (one input row yields a variable number of frame rows inside
    the Arrow batch). Frame count is the stub decode's n_frames; the
    frame key is md5 over (payload sha256, frame index), so the oracle
    can rebuild every row."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, str]] = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(p) % 30 + 1
                sha = hashlib.sha256(p).hexdigest()
                for idx in range(0, n_frames, every_n):
                    key = hashlib.md5(f"{sha}-{idx}".encode()).hexdigest()
                    out.append((doc_id, idx, key))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_key"])

    return df.select("doc_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Fixed-dimension feature vector per payload (the featurizer slot —
    CLIP/ResNet in production). Stub embedding = the first ``dim`` bytes
    of the payload's sha256 scaled to [0, 1]; deterministic, dense, and
    SQL-reproducible, so the oracle verifies the Arrow float round trip
    bit-for-bit (the output feeds the similarity operators'
    array<double> contract)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [b / 255.0 for b in hashlib.sha256(p).digest()[:dim]]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)
