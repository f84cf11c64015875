"""Key-value serving store behind the streaming sinks.

The reference's realtime READ path is Redis: the Kafka consumer
maintains hash counters, recent-N lists and a totals hash row-at-a-time
(/root/reference/kafka_scripts/consumer.py:195-360 — hincrby /
hincrbyfloat / lpush+ltrim / hmset / set), and the dashboard reads them
back with hgetall / lrange / get (/root/reference/streamlit/utils.py:
108-130).  This module is that serving layer re-expressed for Spark:

- ``KVStore`` — the minimal store interface those two sides need:
  atomic per-epoch batches of hash-increment / hash-set /
  list-push-trim / set-value writes, and hash/list/value snapshot
  reads.
- ``EmbeddedKVStore`` — in-process, thread-safe implementation (the
  default; no external service required). Numeric increments
  accumulate ``decimal.Decimal`` exactly, so totals match the batch
  queries' DECIMAL(18,6) accumulation bit-for-bit.
- ``RedisKVStore`` — optional redis-py binding behind the
  ``SPARK_GRAFT_REDIS_URL`` env gate (same seam pattern as the Kafka
  source): the identical op stream lands in a real Redis via a
  MULTI/EXEC pipeline, so the reference's dashboard could read it
  unchanged.
- ``serve_consumer_metrics`` — the foreachBatch sink that maintains
  the consumer's full key surface from the events stream.

Exactly-once: foreachBatch is at-least-once, and INCREMENTS are not
idempotent — a replayed epoch would double-count.  The store therefore
applies each epoch's ops ATOMICALLY together with an applied-epoch
marker (``apply_batch``): a replayed epoch sees its marker and becomes
a no-op.  Embedded: one lock around (check, apply, mark).  Redis: a
SISMEMBER check + MULTI/EXEC pipeline that includes the SADD — safe
for the single-writer-per-sink topology Structured Streaming
guarantees (one driver runs the foreachBatch of a given query).

Scale notes (100 TB/day): every op list is built from PER-BATCH
AGGREGATES (groupBy over the micro-batch — partial aggregation
map-side), never raw events, so the driver handles |distinct keys in
batch| rows per family — the same bounded-key contract the reference's
Redis already imposes on the serving tier.  The heavy state (full
per-product history) lives in the streaming aggregation / state store;
this layer only ships deltas.
"""

from __future__ import annotations

import json
import os
import threading
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REDIS_URL_ENV = "SPARK_GRAFT_REDIS_URL"

# op tuples understood by KVStore.apply_batch:
#   ("hincr", key, {field: number})          — numeric field increments
#   ("hset",  key, {field: value})           — absolute field writes
#   ("lpush_trim", key, [items...], maxlen)  — newest-first push + trim
#   ("set",   key, value)                    — plain value write
Op = tuple


class KVStore:
    """Minimal serving-store interface (write: atomic epoch batches;
    read: snapshots). Concrete stores implement ``_apply`` plus the
    reads; ``apply_batch`` adds the epoch-marker idempotency contract
    shared by every implementation."""

    def apply_batch(self, sink_id: str, epoch: int, ops: list[Op]) -> bool:
        """Apply ``ops`` exactly once for (sink_id, epoch): returns
        False (no-op) if this epoch was already applied — the
        at-least-once replay path."""
        raise NotImplementedError

    # -- snapshot reads (the dashboard surface: utils.py fetch_data) --
    def hgetall(self, key: str) -> dict:
        raise NotImplementedError

    def lrange(self, key: str, n: int = 100) -> list:
        raise NotImplementedError

    def get(self, key: str):
        raise NotImplementedError


class EmbeddedKVStore(KVStore):
    """In-process store: dicts + a lock. Increment arithmetic is exact
    (ints stay ints; floats/Decimals accumulate as Decimal), so
    snapshot reads agree with the engine's DECIMAL-exact batch
    aggregates to the last bit."""

    def __init__(self) -> None:
        self._hashes: dict[str, dict] = {}
        self._lists: dict[str, list] = {}
        self._values: dict[str, object] = {}
        self._applied: dict[str, set[int]] = {}
        self._lock = threading.Lock()

    def apply_batch(self, sink_id: str, epoch: int, ops: list[Op]) -> bool:
        with self._lock:
            seen = self._applied.setdefault(sink_id, set())
            if epoch in seen:
                return False
            for op in ops:
                self._apply(op)
            seen.add(epoch)
            return True

    def _apply(self, op: Op) -> None:
        kind = op[0]
        if kind == "hincr":
            h = self._hashes.setdefault(op[1], {})
            for field, amt in op[2].items():
                cur = h.get(field, 0)
                if isinstance(amt, float):
                    amt = Decimal(str(amt))
                if isinstance(cur, float):
                    cur = Decimal(str(cur))
                h[field] = cur + amt
        elif kind == "hset":
            self._hashes.setdefault(op[1], {}).update(op[2])
        elif kind == "lpush_trim":
            lst = self._lists.setdefault(op[1], [])
            # newest-first, like LPUSH of items in order then LTRIM
            lst[:0] = list(reversed(op[2]))
            del lst[op[3]:]
        elif kind == "set":
            self._values[op[1]] = op[2]
        else:  # pragma: no cover - programming error
            raise ValueError(f"unknown op {kind!r}")

    def hgetall(self, key: str) -> dict:
        with self._lock:
            return dict(self._hashes.get(key, {}))

    def lrange(self, key: str, n: int = 100) -> list:
        with self._lock:
            return list(self._lists.get(key, [])[:n])

    def get(self, key: str):
        with self._lock:
            return self._values.get(key)


class RedisKVStore(KVStore):
    """redis-py binding: the same op stream into a real Redis so the
    reference's dashboard (streamlit/utils.py fetch_data) reads the
    engine's counters unchanged. Requires the ``redis`` package and a
    reachable server — both env-gated (``SPARK_GRAFT_REDIS_URL``),
    exactly like the Kafka seam; this container has neither, so the
    binding is covered by the env-gated test and the op-stream contract
    is proven against EmbeddedKVStore (one ``_OPS``-level test keeps
    the two implementations honest on the same op list).

    Caveat vs embedded: HINCRBYFLOAT is long-double arithmetic, so
    float totals can differ from the DECIMAL-exact embedded store in
    the last ulp — read with a 1e-6 tolerance, as any Redis consumer
    already must."""

    def __init__(self, url: str) -> None:
        import redis  # gated import: optional dependency

        self._r = redis.Redis.from_url(url, decode_responses=True)
        self._r.ping()

    def apply_batch(self, sink_id: str, epoch: int, ops: list[Op]) -> bool:
        marker = f"_applied:{sink_id}"
        if self._r.sismember(marker, epoch):
            return False
        pipe = self._r.pipeline(transaction=True)
        for op in ops:
            kind = op[0]
            if kind == "hincr":
                for field, amt in op[2].items():
                    if isinstance(amt, (float, Decimal)):
                        pipe.hincrbyfloat(op[1], field, float(amt))
                    else:
                        pipe.hincrby(op[1], field, amt)
            elif kind == "hset":
                pipe.hset(
                    op[1],
                    mapping={k: str(v) for k, v in op[2].items()},
                )
            elif kind == "lpush_trim":
                if op[2]:
                    pipe.lpush(op[1], *op[2])
                pipe.ltrim(op[1], 0, op[3] - 1)
            elif kind == "set":
                pipe.set(op[1], str(op[2]))
        pipe.sadd(marker, epoch)
        pipe.execute()
        return True

    def hgetall(self, key: str) -> dict:
        return self._r.hgetall(key)

    def lrange(self, key: str, n: int = 100) -> list:
        return self._r.lrange(key, 0, n - 1)

    def get(self, key: str):
        return self._r.get(key)


def get_store() -> KVStore:
    """The env-gated store factory: a real Redis when
    ``$SPARK_GRAFT_REDIS_URL`` is set (and redis-py importable), else
    a fresh embedded store."""
    url = os.environ.get(REDIS_URL_ENV)
    if url:
        return RedisKVStore(url)
    return EmbeddedKVStore()


# event_type → the reference consumer's key-family names
# (consumer.py:199-340: views / cart / wishlist / orders). ``error``
# events carry no topic in the reference and are dropped, mirroring
# operators.events.topic_counters.
FAMILY = {
    "view": "views",
    "click": "cart_adds",
    "signup": "wishlist_adds",
    "purchase": "orders",
}
# the consumer's minutely hash key per family (cart/wishlist drop the
# plural: cart:minutely / wishlist:minutely, consumer.py:241,278)
MINUTELY_KEY = {
    "views": "views:minutely",
    "cart_adds": "cart:minutely",
    "wishlist_adds": "wishlist:minutely",
    "orders": "orders:minutely",
}

_MINUTE_FMT = "yyyy-MM-dd-HH-mm"  # consumer.py strftime("%Y-%m-%d-%H-%M")


def consumer_metric_ops(batch_df: DataFrame, recent_n: int = 100) -> list[Op]:
    """Compute one micro-batch's serving-store op list — the
    vectorized twin of the consumer's per-message handlers
    (consumer.py:195-360). Every op amount comes from a per-batch
    AGGREGATE (count / DECIMAL sum), so applying the batches in any
    epoch order yields exactly the batch queries' totals.

    Ops emitted per batch (reference key for each):
    - ``<fam>:minutely`` count hashes + ``revenue:minutely`` /
      ``cart:value:minutely`` value hashes (consumer.py:202,241,278,309)
    - ``product:<fam>`` per-product counters (consumer.py:206,246,283,320)
    - ``user:views`` per-user view counts (consumer.py:214)
    - ``metrics:totals`` family totals + revenue (consumer.py:348-357)
    - ``recent:<fam>`` newest-first JSON lists (consumer.py:219-340)
    - ``metrics:last_activity`` — max event ts in the batch (event
      time, not wall clock, so replays and backfills are
      deterministic; consumer.py:360 uses now()).

    Timestamps are EVENT time (the stream's ts column): the reference
    buckets by consumer wall clock, which double-counts on replay and
    misplaces late events — event time is the watermark-friendly
    semantics every batch twin (events_minutely) already uses.
    """
    fam_col = F.col("event_type")
    fam_expr = F.when(fam_col == "view", "views")
    for et, fam in FAMILY.items():
        fam_expr = fam_expr.when(fam_col == et, fam)
    e = (
        batch_df.withColumn("fam", fam_expr)
        .filter(F.col("fam").isNotNull())
        .withColumn(
            "minute", F.date_format(F.date_trunc("minute", "ts"), _MINUTE_FMT)
        )
        .withColumn(
            "product_id", F.get_json_object("props", "$.k").cast("bigint")
        )
    )

    dec_val = F.col("value").cast("decimal(18,6)")
    minutely = e.groupBy("fam", "minute").agg(
        F.count("*").alias("n"), F.sum(dec_val).alias("v")
    ).collect()
    per_product = e.groupBy("fam", "product_id").agg(
        F.count("*").alias("n")
    ).collect()
    user_views = (
        e.filter(F.col("fam") == "views")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # per-FAMILY recent-N (a global top-N could starve a quiet family):
    # the same salted two-level top-N shape as the batch twin
    # recent_events_by_family — local top-N per (fam, salt) in
    # parallel, final re-rank over the bounded survivors.
    from pyspark.sql import Window

    order = [F.col("ts").desc(), F.col("event_id").desc()]
    w_local = Window.partitionBy(
        "fam", F.pmod("event_id", F.lit(32))
    ).orderBy(*order)
    w_final = Window.partitionBy("fam").orderBy(*order)
    recent = (
        e.select("fam", "event_id", "ts", "user_id", "value")
        .withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= recent_n)
        .withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= recent_n)
        .orderBy("fam", *order)
        .collect()
    )

    ops: list[Op] = []
    totals: dict[str, object] = {}
    max_ts = None
    for r in minutely:
        fam, v = r["fam"], r["v"] or Decimal(0)
        ops.append(("hincr", MINUTELY_KEY[fam], {r["minute"]: r["n"]}))
        if fam == "orders":
            ops.append(("hincr", "revenue:minutely", {r["minute"]: v}))
            totals["total_revenue"] = totals.get("total_revenue", Decimal(0)) + v
        elif fam == "cart_adds":
            ops.append(("hincr", "cart:value:minutely", {r["minute"]: v}))
        totals[f"total_{fam}"] = totals.get(f"total_{fam}", 0) + r["n"]
    for r in per_product:
        if r["product_id"] is not None:
            ops.append(
                ("hincr", f"product:{r['fam']}", {str(r["product_id"]): r["n"]})
            )
    for r in user_views:
        ops.append(("hincr", "user:views", {str(r["user_id"]): r["n"]}))
    if totals:
        ops.append(("hincr", "metrics:totals", totals))
    by_fam: dict[str, list[str]] = {}
    for r in recent:
        max_ts = max(max_ts, r["ts"]) if max_ts else r["ts"]
        item = json.dumps(
            {
                "event_id": r["event_id"],
                "timestamp": r["ts"].isoformat(),
                "user_id": r["user_id"],
                "value": r["value"],
            }
        )
        by_fam.setdefault(r["fam"], []).append(item)
    for fam, items in by_fam.items():
        # items are newest-first; lpush_trim re-reverses so the stored
        # list stays newest-first like the consumer's LPUSH stream
        ops.append(
            ("lpush_trim", f"recent:{fam}", list(reversed(items[:recent_n])),
             recent_n)
        )
    if max_ts is not None:
        ops.append(
            ("hset", "metrics:totals", {"last_updated": max_ts.isoformat()})
        )
        ops.append(("set", "metrics:last_activity", max_ts.isoformat()))
    return ops


def timeseries(store: KVStore, key: str) -> list[tuple[str, float]]:
    """Minutely hash → chronologically sorted (minute, value) series —
    the dashboard's ``create_timeseries_df`` (streamlit/utils.py:
    131-141) without the pandas dependency. The fixed
    ``%Y-%m-%d-%H-%M`` field format sorts lexicographically ==
    chronologically, exactly why the reference chose it."""
    return [
        (minute, float(v)) for minute, v in sorted(store.hgetall(key).items())
    ]


def leaderboard(
    store: KVStore, key: str, n: int = 10
) -> list[tuple[str, float]]:
    """Counter hash → top-n (entity, value) rows, value-descending with
    a deterministic entity tie-break — the dashboard's
    ``create_leaderboard_df`` (streamlit/utils.py:143-150)."""
    items = [(k, float(v)) for k, v in store.hgetall(key).items()]
    items.sort(key=lambda kv: (-kv[1], kv[0]))
    return items[:n]


def serve_consumer_metrics(
    events: DataFrame,
    store: KVStore,
    checkpoint: str,
    sink_id: str = "consumer_metrics",
    recent_n: int = 100,
):
    """Start the serving sink: every micro-batch's aggregate deltas are
    applied to ``store`` exactly once (epoch-marker idempotency — see
    module docstring). The streaming face of the whole consumer.py
    Redis surface; parity with the oracle'd batch queries
    (topic_counters / events_minutely / product_counters /
    recent_events_by_family / running_totals) is asserted in
    tests/test_streaming.py, including across restarts and a forced
    epoch replay."""

    def process(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        store.apply_batch(
            sink_id, epoch, consumer_metric_ops(batch_df, recent_n)
        )

    return (
        events.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
