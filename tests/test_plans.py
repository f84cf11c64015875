"""Physical-plan assertions — the scale contract.

Checks that what we claim in docstrings is what Catalyst actually does:
filters reach the parquet scan, dimensions broadcast, no cartesian
products sneak in.
"""

from __future__ import annotations

from ecom_etl_proj_spark.operators import analytics, similarity, star


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pricing_summary_pushdown(tables):
    plan = plan_of(analytics.pricing_summary(tables))
    assert "PushedFilters" in plan
    assert "IsNotNull(l_shipdate)" in plan or "LessThanOrEqual" in plan
    # Partial (map-side) aggregation + final aggregation around one
    # exchange: the shuffle carries per-key state, not raw lineitem rows.
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_pricing_summary_prunes_columns(tables):
    plan = plan_of(analytics.pricing_summary(tables))
    # ReadSchema must not include columns the query never touches.
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "l_partkey" not in read[0] and "l_suppkey" not in read[0]


def test_master_join_broadcasts_dims(tables):
    plan = plan_of(star.sales_master(tables))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_revenue_by_nation_broadcasts(tables):
    plan = plan_of(analytics.revenue_by_nation(tables))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_knn_broadcasts_queries(tables):
    plan = plan_of(similarity.embedding_knn(tables))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_no_python_udfs_in_analytics(tables):
    for fn in (
        analytics.pricing_summary,
        analytics.rfm_segments,
        analytics.seller_performance,
    ):
        plan = plan_of(fn(tables))
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_revenue_forecast_pushdown(tables):
    from ecom_etl_proj_spark.operators import analytics as an

    plan = plan_of(an.revenue_forecast(tables))
    assert "PushedFilters" in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    # only the three referenced columns + shipdate should be read
    assert read and "l_orderkey" not in read[0] and "l_returnflag" not in read[0]


def test_event_attribution_no_cartesian(tables):
    from ecom_etl_proj_spark.operators import events as ev

    plan = plan_of(ev.event_attribution(tables))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union-and-carry: exactly window exchanges, no join at all
    assert "SortMergeJoin" not in plan


def test_ivf_bounded_by_cells(tables):
    from ecom_etl_proj_spark.operators import similarity as sim

    plan = plan_of(sim.ann_ivf(tables))
    # centroid joins broadcast; the only non-broadcast join key is the cell
    assert "CartesianProduct" not in plan
