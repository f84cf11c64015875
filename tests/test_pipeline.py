"""End-to-end layered batch ETL: ODS → STG → DWH on sf0.001.

Mirrors the reference's own validation style (row-count checks post-load,
ods_layer.py end-of-run) plus the NOT NULL key contract the target DDL
declares (target_layer.py:36-154)."""

from __future__ import annotations

import os

import pytest

from ecom_etl_proj_spark.pipelines import batch
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def report(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lake"))
    rep = batch.run_batch_etl(spark, SF_DIR, out)
    return rep, out


def test_layers_materialized(report):
    _, out = report
    for layer, table in [
        ("ods", "orders"),
        ("stg", "customer"),
        ("dwh", "fact_sales"),
    ]:
        assert os.path.isdir(os.path.join(out, layer, table))


def test_counts_flow(report, spark):
    rep, out = report
    # STG keeps exactly one row per dedup key (the testdata lineitem has
    # genuine duplicate (orderkey, linenumber) pairs — dedup must drop them)
    ods = {
        n: spark.read.parquet(os.path.join(out, "ods", n))
        for n in ("orders", "lineitem", "customer")
    }
    assert rep.stg_counts["orders"] == ods["orders"].select("o_orderkey").distinct().count()
    assert (
        rep.stg_counts["lineitem"]
        == ods["lineitem"].select("l_orderkey", "l_linenumber").distinct().count()
    )
    # fact is a LEFT join from the deduped lineitem grain: no rows lost
    assert rep.dwh_counts["fact_sales"] == rep.stg_counts["lineitem"]
    # dim_geo = nations + the -1 fallback record
    assert rep.dwh_counts["dim_geo"] == rep.ods_counts["nation"] + 1
    assert (
        rep.dwh_counts["dim_customer"]
        == ods["customer"].select("c_custkey").distinct().count()
    )


def test_not_null_contract(report):
    rep, _ = report
    assert rep.ok, rep.not_null_violations


def test_audit_columns_stamped(report, spark):
    _, out = report
    df = spark.read.parquet(os.path.join(out, "dwh", "dim_customer"))
    assert "insertion_date" in df.columns and "modification_date" in df.columns
    assert df.filter(df.insertion_date.isNull()).count() == 0


def test_fact_partitioned_by_ship_month(report):
    _, out = report
    parts = os.listdir(os.path.join(out, "dwh", "fact_sales"))
    assert any(p.startswith("ship_month=") for p in parts)


def test_idempotent_rerun(report, spark):
    """Truncate-reload semantics: re-running a layer leaves counts equal."""
    rep, out = report
    again = batch.run_dwh(spark, out, "2026-01-02")
    assert again == rep.dwh_counts


def test_compaction_reduces_file_count(spark, tables, tmp_path):
    from ecom_etl_proj_spark.pipelines import maintenance

    path = str(tmp_path / "frag")
    tables["orders"].repartition(64).write.mode("overwrite").parquet(path)
    before, after = maintenance.compact(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert before >= 64
    assert after <= 2
    # contents survive byte-identical
    assert spark.read.parquet(path).count() == tables["orders"].count()


def test_fact_partition_pruning(report, spark):
    """A ship_month filter on the DWH fact must prune partitions at plan
    time (PartitionFilters in the scan, not a full-table read)."""
    import os

    from pyspark.sql import functions as F

    from tests.test_plans import plan_of

    _, out = report
    fact = spark.read.parquet(os.path.join(out, "dwh", "fact_sales"))
    one_month = fact.filter(F.col("ship_month") == "1995-06-01")
    plan = plan_of(one_month.groupBy().agg(F.sum("l_quantity")))
    assert "PartitionFilters" in plan and "ship_month" in plan


def test_orchestrated_dag_runs_layers(spark, tmp_path):
    from ecom_etl_proj_spark.pipelines import orchestrate

    out = str(tmp_path / "dag_lake")
    results = orchestrate.run_dag(orchestrate.etl_dag(spark, SF_DIR, out))
    assert [r.state for r in results.values()] == ["success"] * 4
    assert results["validate"].result == {
        t: 0 for t in ("dim_geo", "dim_customer", "dim_part", "dim_supplier", "fact_sales")
    }
    orchestrate.drop_all(out)
    assert not os.path.exists(os.path.join(out, "dwh"))


def test_dag_failure_skips_downstream():
    from ecom_etl_proj_spark.pipelines import orchestrate

    calls = []

    def ok(name):
        return lambda: calls.append(name)

    def boom():
        raise RuntimeError("nope")

    tasks = [
        orchestrate.Task("a", ok("a")),
        orchestrate.Task("b", boom, upstream=["a"], retries=2),
        orchestrate.Task("c", ok("c"), upstream=["b"]),
        orchestrate.Task("d", ok("d"), upstream=["a"]),
    ]
    res = orchestrate.run_dag(tasks)
    assert res["a"].state == "success"
    assert res["b"].state == "failed" and res["b"].attempts == 3
    assert res["c"].state == "skipped"
    assert res["d"].state == "success"
    assert "d" in calls and "c" not in calls
