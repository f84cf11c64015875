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
