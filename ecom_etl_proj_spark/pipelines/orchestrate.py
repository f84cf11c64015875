"""Dependency-ordered pipeline orchestration.

The reference schedules its layers with Airflow DAGs
(/root/reference/airflow/dags/etl_dag.py, ingestion_dag.py,
kafka_data_pipeline.py): ingestion >> ods >> stg >> dwh, task retries,
and teardown DAGs (drop_all_dag.py, drop_ods/stg/target.py). This
module is that operational surface without the scheduler dependency: a
topological task runner with per-task retries, and layer teardown.

The DAG body stays thin on purpose — every task is a plain callable so
the same graph runs under Airflow/Dagster by mapping tasks 1:1 to that
scheduler's operators. Spark-side: tasks share one SparkSession; each
task's work is a full Spark job (the parallelism lives inside Spark,
the DAG only sequences layer boundaries).
"""

from __future__ import annotations

import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Task:
    name: str
    fn: Callable[[], object]
    upstream: list[str] = field(default_factory=list)
    retries: int = 1
    retry_delay_s: float = 0.0


@dataclass
class TaskResult:
    name: str
    state: str  # success | failed | skipped
    attempts: int
    result: object = None
    error: str | None = None


def run_dag(tasks: list[Task]) -> dict[str, TaskResult]:
    """Run tasks in dependency order with retries.

    Failure semantics mirror Airflow defaults: a failed task (after
    retries) marks every transitive downstream task ``skipped``; the
    rest of the graph still runs.
    """
    by_name = {t.name: t for t in tasks}
    for t in tasks:
        for up in t.upstream:
            if up not in by_name:
                raise ValueError(f"{t.name}: unknown upstream {up!r}")
    results: dict[str, TaskResult] = {}
    pending = list(tasks)
    while pending:
        progressed = False
        for t in list(pending):
            if any(up not in results for up in t.upstream):
                continue
            progressed = True
            pending.remove(t)
            if any(results[up].state != "success" for up in t.upstream):
                results[t.name] = TaskResult(t.name, "skipped", 0)
                continue
            attempts, err = 0, None
            while attempts <= t.retries:
                attempts += 1
                try:
                    out = t.fn()
                    results[t.name] = TaskResult(t.name, "success", attempts, out)
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 - task errors are data
                    err = f"{type(e).__name__}: {e}"
                    if attempts <= t.retries and t.retry_delay_s:
                        time.sleep(t.retry_delay_s)
            if err is not None:
                results[t.name] = TaskResult(t.name, "failed", attempts, None, err)
        if not progressed:
            raise ValueError(
                "dependency cycle among: " + ", ".join(t.name for t in pending)
            )
    return results


@dataclass(frozen=True)
class Schedule:
    """The reference DAG's scheduling contract (etl_dag.py:11,22-23:
    ``start_date``, ``schedule_interval=timedelta(days=1)``,
    ``catchup=False``) as data. ``interval_s`` is the window length;
    ``catchup`` decides whether missed windows backfill (Airflow
    semantics) or collapse to the latest one (the reference's
    setting)."""

    start: "datetime"
    interval_s: float
    catchup: bool = False


def due_windows(schedule: Schedule, last_run, now) -> list:
    """PURE scheduling function: which logical window starts are due at
    ``now`` given the last fired window ``last_run`` (None = never).

    Airflow's data-interval model: the window [T, T+interval) becomes
    runnable AT T+interval, with logical date T — a daily job running
    on the 8th processes the 7th's data. With ``catchup=False`` only
    the LATEST completed window fires after a gap (the reference's
    mode: a weekend outage Monday-morning run processes Sunday, not
    Sat+Sun); with ``catchup=True`` every missed window fires oldest
    first, each exactly once.

    Pure in (schedule, last_run, now) — no wall clock, no state — so
    the engine stays scheduler-independent: cron, a while-loop, or a
    real Airflow deployment can all drive it, and every policy branch
    is unit-testable with plain datetimes.
    """
    from datetime import timedelta

    step = timedelta(seconds=schedule.interval_s)
    if now < schedule.start + step:
        return []  # first window not complete yet
    # latest window whose interval has fully elapsed
    n_complete = int((now - schedule.start) / step)
    latest = schedule.start + (n_complete - 1) * step
    if last_run is not None and latest <= last_run:
        return []
    if not schedule.catchup:
        return [latest]
    first = (
        schedule.start if last_run is None else last_run + step
    )
    out = []
    t = first
    while t <= latest:
        out.append(t)
        t = t + step
    return out


def run_scheduled(
    tasks_for: Callable[[object], list[Task]],
    schedule: Schedule,
    last_run,
    now,
) -> tuple[list[tuple[object, dict[str, TaskResult]]], object]:
    """Fire every due window through the topological runner: for each
    due logical date ``T``, run ``tasks_for(T)`` (the caller binds the
    window into its tasks — e.g. the daily snapshot_date). Returns
    ([(logical_date, results), ...], new_last_run); the caller persists
    ``new_last_run`` wherever its state lives (a file, a table row —
    deliberately not this module's concern)."""
    fired = []
    for t in due_windows(schedule, last_run, now):
        fired.append((t, run_dag(tasks_for(t))))
        last_run = t
    return fired, last_run


def backfill(
    tasks_for: Callable[[object], list[Task]],
    schedule: Schedule,
    from_date,
    to_date,
) -> list[tuple[object, dict[str, TaskResult]]]:
    """Explicit re-run of every window start in [from_date, to_date],
    oldest first, IGNORING last_run — Airflow's ``dags backfill``.
    Window starts are aligned to the schedule grid (start + k*interval)
    so a backfill and the regular cadence name identical logical
    dates."""
    from datetime import timedelta

    import math

    step = timedelta(seconds=schedule.interval_s)
    if to_date < from_date:
        raise ValueError("backfill: to_date before from_date")
    # first grid point >= from_date
    k = max(0, math.ceil((from_date - schedule.start) / step))
    t = schedule.start + k * step
    out = []
    while t <= to_date:
        out.append((t, run_dag(tasks_for(t))))
        t = t + step
    return out


def etl_dag(spark, sf_dir: str, out_dir: str, snapshot_date: str = "2026-01-01") -> list[Task]:
    """The reference's etl_dag as a task list: ods >> stg >> dwh >> validate."""
    from ecom_etl_proj_spark.pipelines import batch

    return [
        Task("ods", lambda: batch.run_ods(spark, sf_dir, out_dir)),
        Task("stg", lambda: batch.run_stg(spark, out_dir), upstream=["ods"]),
        Task(
            "dwh",
            lambda: batch.run_dwh(spark, out_dir, snapshot_date),
            upstream=["stg"],
        ),
        Task(
            "validate",
            lambda: batch.validate_dwh(spark, out_dir),
            upstream=["dwh"],
        ),
    ]


def drop_layer(out_dir: str, layer: str) -> None:
    """Teardown one layer (the drop_ods/drop_stg/drop_target scripts)."""
    if layer not in ("ods", "stg", "dwh"):
        raise ValueError(f"unknown layer {layer!r}")
    shutil.rmtree(f"{out_dir.rstrip('/')}/{layer}", ignore_errors=True)


def drop_all(out_dir: str) -> None:
    """The drop_all_dag: tear down every layer."""
    for layer in ("dwh", "stg", "ods"):
        drop_layer(out_dir, layer)
