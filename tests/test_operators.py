"""Unit tests on tiny literal frames — edge semantics (nulls, dupes, ties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_etl_proj_spark.functions import text as X
from ecom_etl_proj_spark.functions import vectors as V
from ecom_etl_proj_spark.operators import cleaning, multimodal


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 2, "b"), (1, 1, "a"), (2, 5, "c"), (1, 1, "z")],
        ["k", "ord", "val"],
    )
    out = cleaning.dedup_keep_first(df, ["k"], ["ord", "val"]).collect()
    got = {r["k"]: (r["ord"], r["val"]) for r in out}
    assert got == {1: (1, "a"), 2: (5, "c")}


def test_impute_mean_fills_nulls_only(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0)], ["id", "v"]
    )
    out = {r["id"]: r["v"] for r in cleaning.impute_mean(df, ["v"]).collect()}
    assert out == {1: 10.0, 2: 15.0, 3: 20.0}


def test_sentinel_timestamps(spark):
    df = spark.createDataFrame([(1,), (2,)], ["id"]).withColumn(
        "ts", F.when(F.col("id") == 1, F.lit("2020-01-02").cast("timestamp"))
    )
    out = {r["id"]: str(r["ts"]) for r in cleaning.sentinel_timestamps(df, ["ts"]).collect()}
    assert out[2] == "1900-01-01 00:00:00"
    assert out[1].startswith("2020-01-02")


def test_dim_key_map_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 100, 5.0), (1, 200, 5.0), (1, 300, 1.0), (2, 400, 9.0)],
        ["k", "v", "ord"],
    )
    out = {
        r["k"]: r["v"]
        for r in cleaning.dim_key_map(df, "k", "v", ["ord", "v"]).collect()
    }
    assert out == {1: 300, 2: 400}


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], ["text"])
    out = df.select(X.word_shingles(3).alias("s")).collect()
    assert out[0]["s"] == []
    assert out[1]["s"] == ["a b c", "b c d"]


def test_cosine_identity(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"])
    out = df.select(F.round(V.cosine("a", "b"), 6).alias("c")).collect()
    assert [r["c"] for r in out] == [1.0, 0.0]


def test_multimodal_decode_shape(spark, tables):
    df = multimodal.with_payload(tables)
    decoded = multimodal.decode_media(df)
    rows = decoded.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["payload_bytes"] > 0
        assert 1 <= r["width"] <= 640
        assert 1 <= r["n_frames"] <= 30


def test_minhash_agrees_with_exact_jaccard(spark, tables):
    """LSH candidates re-scored exactly must be a subset of (and at these
    thresholds equal to) the exact Jaccard pairs."""
    from ecom_etl_proj_spark.operators import dedup

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_ngram_jaccard(tables, threshold=0.2).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_minhash_lsh(tables, threshold=0.2).collect()
    }
    assert lsh.issubset(exact)
