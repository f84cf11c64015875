"""Table catalog: schema contracts + parquet loading.

The reference ingests CSVs with hand-written explicit StructType schemas
(/root/reference/spark_transform.py:96-208) to avoid inferSchema drift.
We keep that contract idea: each table has a declared schema, loads are
validated against it, and readers select only declared columns so column
pruning reaches the parquet scan.

Scale notes (100 TB): parquet scans here are plain ``spark.read.parquet``
so Catalyst handles predicate pushdown / column pruning / partition
pruning for free. On a real lake the fact tables (orders, lineitem,
events) would be written partitioned by date (see ``write_partitioned``)
and bucketed by join key to make the fact-fact join shuffle-free.
"""

from __future__ import annotations

import logging
import os
import weakref
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Key declarations — the single source of truth shared by the
# constraint-audit expectation suite (operators/cleaning.py +
# plans/registry.py oracle) and the warehouse DDL generator
# (sources/ingest.py), so the engines and the DDL can never drift on
# which keys exist (the reference declares these in its target DDL,
# local/create_schema_tables.py:1-140 / target_layer.py:36-154).
PRIMARY_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}

# (table, fk_column, parent_table, parent_column) — the star schema's
# seven FK edges.
FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are bounded by geography; supplier/part grow but stay
# orders of magnitude below the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier")

# Tables whose downstream operators do heavy per-row fan-out work
# (shingle/token explodes) + the partitioning key those operators
# reuse. A parquet file with a single row group cannot be split, so a
# single-file table runs its scan stage — including any explode fused
# into it — on one task; when that happens we hash-repartition on the
# natural key so the explode+aggregate work spreads across cores, and
# the doc_id key makes the per-doc aggregations shuffle-free on top.
# Everything else is deliberately NOT listed (measured, not guessed):
# window/groupBy queries already get parallelism from their own
# shuffle, and for light scan+agg tables the parse cost dominates, so
# an extra exchange only adds latency. On a real lake files are
# many/bucketed and this path never triggers.
SPLIT_KEYS = {
    "documents": "doc_id",
}

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def _enable_nanos_read(spark: SparkSession) -> None:
    """The testdata parquet stores TIMESTAMP(NANOS); Spark needs this
    legacy flag to accept it (runtime-settable, so it also works under a
    driver-owned SparkSession)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception as exc:  # pragma: no cover - static conf builds
        logging.getLogger(__name__).debug(
            "nanosAsLong not settable at runtime: %s", exc
        )


# Row-count hints read from parquet FOOTERS at load time (metadata
# only, no Spark job), keyed weakly on the DataFrame handle. Operators
# that auto-scale parameters from the corpus size (similarity's ANN
# family) consult this before ever firing a count() action, so a
# registered plan build on a fresh handle triggers zero Spark jobs.
# Weak keys: entries die with the handle; a re-load after an append
# re-reads the footers, so the hint is as fresh as the handle itself.
ROW_HINTS: "weakref.WeakKeyDictionary[DataFrame, int]" = (
    weakref.WeakKeyDictionary()
)


def _tree_mtime(path: str) -> float:
    """Newest mtime across the path, its symlink (a generation swap
    renames a fresh link into place), and every non-system DIRECTORY
    under it — the cache key component that invalidates footer memos
    after an append/copy_into/compaction touches the table (r11
    ADVICE #2: a bare path-keyed lru_cache served stale counts after
    appends). Directory mtimes suffice: every writer here CREATES,
    renames, or deletes files — which bumps the containing dir's
    mtime — or swaps the generation pointer; nothing rewrites a data
    file in place (immutable-generation discipline). Statting dirs
    only keeps a repeat load_table at O(dirs) driver work instead of
    the r12 per-file walk's O(files) (r12 ADVICE #5)."""
    try:
        newest = os.lstat(path).st_mtime
        newest = max(newest, os.stat(path).st_mtime)
        if os.path.isdir(path):
            for root, dirs, _files in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                try:
                    newest = max(newest, os.stat(root).st_mtime)
                except OSError:
                    pass
        return newest
    except OSError:
        return -1.0


@lru_cache(maxsize=256)
def _footer_rows_at(path: str, mtime: float) -> int | None:
    del mtime  # cache-key component only
    try:
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        total = 0
        seen = False
        for root, dirs, files in os.walk(path):
            # match Spark's InMemoryFileIndex visibility rules: '_'/'.'
            # prefixed paths (e.g. the copy_into _load_history ledger
            # inside a table generation) are NOT data and must not
            # inflate the hint above the live count(*)
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in files:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    seen = True
                    total += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
        # No parquet anywhere under the dir: unknown, NOT zero — a 0
        # hint would make auto-scaled params (n_centroids etc.) diverge
        # from the oracle's live count(*).
        return total if seen else None
    except Exception:  # pragma: no cover - remote/odd layouts
        return None


def _footer_rows(path: str) -> int | None:
    """Total row count from parquet footer metadata (file or dir;
    recursive, mtime-keyed so appends invalidate the memo)."""
    return _footer_rows_at(path, _tree_mtime(path))


@lru_cache(maxsize=256)
def _few_splits_at(path: str, mtime: float) -> bool:
    del mtime  # cache-key component only
    try:
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            return pq.ParquetFile(path).num_row_groups < 8
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        return len(files) < 8
    except Exception:  # pragma: no cover - remote/odd layouts: assume fine
        return False


def _few_splits(path: str) -> bool:
    """True if the parquet path can't parallelize a scan (fewer than 8
    row groups / files). Checked from file metadata (milliseconds,
    mtime-keyed cache) — never by resolving the Spark plan."""
    return _few_splits_at(path, _tree_mtime(path))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, projecting to its declared schema columns."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}")
    _enable_nanos_read(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    # Explicit projection keeps the read schema pinned to the contract so
    # downstream column pruning is exact even if the files gain columns.
    # Nano timestamps arrive as TIMESTAMP_NTZ; cast to the contract's
    # TimestampType (session tz is UTC, so this is a pure reinterpret).
    cols = []
    actual = dict(df.dtypes)
    for f in SCHEMAS[name].fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.TimestampType):
            if actual.get(f.name) == "bigint":
                # TIMESTAMP(NANOS) read as raw nanos under nanosAsLong:
                # integer-divide to micros (floor, matching DuckDB's
                # ns→us truncation) and rebuild the timestamp.
                c = F.timestamp_micros(F.expr(f"{f.name} div 1000"))
            elif actual.get(f.name) != "timestamp":
                c = c.cast("timestamp")
        cols.append(c.alias(f.name))
    out = df.select(*cols)
    # one stat-walk serves both memo keys (the walk IS the key
    # computation, so each helper would otherwise repeat it)
    mt = _tree_mtime(path)
    key = SPLIT_KEYS.get(name)
    if key is not None and _few_splits_at(path, mt):
        out = out.repartition(spark.sparkContext.defaultParallelism, key)
    n = _footer_rows_at(path, mt)
    if n is not None:
        try:
            ROW_HINTS[out] = n
        except TypeError:  # pragma: no cover - unhashable handle
            pass
    return out


# Handle cache: loading all 10 tables costs ~1s of py4j round trips +
# parquet footer reads, and every consumer (bench warmup, the registry's
# tables_for, tools) was paying it separately — the first registry query
# of a process was absorbing a full reload inside its own timed window
# (misattributed as that query's "compile overhead" through r9).
# DataFrames are immutable plan handles, so sharing is safe. Keyed by
# session id + dir + register flag; the cached handles keep the session
# reachable, which is fine for this engine's long-lived-session usage.
_TABLES_CACHE: dict[tuple[int, str, bool], dict[str, DataFrame]] = {}


def _session_stopped(frames: dict[str, DataFrame]) -> bool:
    """True if the session backing these cached handles is stopped."""
    try:
        df = next(iter(frames.values()))
        sc = df.sparkSession.sparkContext
        return sc._jsc is None or sc._jsc.sc().isStopped()
    except Exception:
        return True


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True
) -> dict[str, DataFrame]:
    """Load every catalog table; optionally register temp views for SQL."""
    # Evict entries whose session has been stopped: id(spark) can be
    # reused by a new session object, and a stale hit would hand out
    # handles bound to a dead JVM-side plan.
    for k in [k for k, v in _TABLES_CACHE.items() if _session_stopped(v)]:
        del _TABLES_CACHE[k]
    key = (id(spark), sf_dir, register)
    if key in _TABLES_CACHE:
        cached = dict(_TABLES_CACHE[key])
        if register:
            # Temp views are session state the cache can't see: a view
            # dropped or overwritten since the first call must be
            # restored (10 cheap py4j calls, no re-read).
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
        return cached
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    _TABLES_CACHE[key] = dict(out)
    return out


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write a fact table date-partitioned, the layout the reference's lake
    uses (raw/<dataset>/<date>/file) re-expressed as hive-style partitions
    so partition pruning works at 100 TB."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def validate_catalog(spark: SparkSession, sf_dir: str) -> dict[str, list[str]]:
    """Schema-contract validation: missing tables / missing columns /
    unexpected types per table (the reference's pre-dashboard
    check_tables_exist, streamlit/utils.py:64-105, and check.py).

    Metadata-only: reads parquet footers, never data.
    """
    problems: dict[str, list[str]] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            problems[name] = ["missing table"]
            continue
        issues: list[str] = []
        actual = dict(load_table(spark, sf_dir, name).dtypes)
        for f in SCHEMAS[name].fields:
            if f.name not in actual:
                issues.append(f"missing column {f.name}")
            elif actual[f.name] != f.dataType.simpleString():
                issues.append(
                    f"column {f.name}: {actual[f.name]} != {f.dataType.simpleString()}"
                )
        if issues:
            problems[name] = issues
    return problems
