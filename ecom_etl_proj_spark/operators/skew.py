"""Skew-mitigation utilities: salted joins and bucketed co-location.

Policy at 100 TB: AQE's skew-join splitting (on in session.py) is the
first line of defense — it needs no code changes and splits oversized
post-shuffle partitions at runtime. Salting is the explicit fallback
for the pathological case AQE can't fix: a join key so hot that ONE key
exceeds a task's memory. The reference never needed this (Snowflake
hides it), but its event stream — 4 topics × a handful of hot products
(kafka_scripts/producer.py) — is exactly the shape that produces hot
keys at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed fact against a dimension with key salting.

    The fact side gets a deterministic salt in [0, n_salts); the dim
    side is replicated n_salts times (explode of a literal range — the
    dim grows by the salt factor, which is why this is for dims, not
    fact-fact joins). The join key becomes (key, salt), so one hot key
    spreads over n_salts shuffle partitions instead of one.

    Salt must be deterministic (a hash of stable row identity, never
    rand()) so retries and speculative tasks agree row-by-row.
    """
    # spread rows of the SAME key across salts: hash the row identity,
    # not the key (hashing only the key would put the hot key in one
    # salt again). xxhash64 over all columns is stable row identity.
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact["__salt"] == salted_dim["__salt"]
    )
    return salted_fact.join(salted_dim, cond, how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key,
    n_buckets: int = 32,
    location: str | None = None,
) -> None:
    """Persist a table bucketed by its join key(s).

    Two tables bucketed by the same key with the same bucket count join
    with ZERO exchanges — the physical plan reads pre-hashed files and
    sort-merge-joins in place. This is the lake-layout answer to the
    orders⋈lineitem fact-fact shuffle; asserted in tests/test_plans.py.
    A bucketed table joined against an UNbucketed probe still saves its
    own exchange (only the probe side shuffles) — the incremental-dedup
    state-table layout. ``bucket_key`` may be one column name or a list
    (Spark requires the bucket spec to cover ALL join keys for exchange
    elimination — spark.sql.requireAllClusterKeysForCoPartition).

    ``location`` makes the table EXTERNAL at ``{location}/{table_name}``
    instead of managed-in-warehouse: registry-registered state builds
    use it with a temp dir so they never depend on the session's
    warehouse dir (= the caller's cwd under a vanilla driver session)
    being writable. Caller owns the files (DROP TABLE won't delete
    them — remove the directory when retiring the state).
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if location is not None:
        writer = writer.option("path", f"{location}/{table_name}")
    writer.saveAsTable(table_name)
