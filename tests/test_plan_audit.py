"""Physical-plan audits: the plans we'd want at 100 TB, pinned as tests.

Wall-clock at sf0.001 proves nothing about scale; these assertions do.
Each checks the optimizer artifact that makes the query viable on a
1000-executor cluster: filters reaching the parquet scan, scans pruned
to the referenced columns, dimensions broadcast, partial aggregation
before the shuffle.
"""

from __future__ import annotations

from end_to_end_database_pipeline_project_spark.plans import QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_rollup_scan_is_pruned_and_pushed(spark):
    plan = _plan(spark, "daily_weather_rollup")
    # the not-null measure filter reaches the parquet reader...
    assert "PushedFilters: [IsNotNull(value)]" in plan
    # ...and the scan reads only the two referenced columns
    assert "ReadSchema: struct<ts:bigint,value:double>" in plan


def test_rollup_has_partial_aggregation(spark):
    plan = _plan(spark, "daily_weather_rollup")
    assert "partial_avg" in plan, "map-side combine missing from rollup"


def test_star_join_broadcasts_dims_and_merges_facts(spark):
    plan = _plan(spark, "regional_revenue")
    # dimensions ride broadcast joins; the fact-fact join must be a
    # shuffle join (facts can't be broadcast at scale)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan, (
        "lineitem⋈orders should merge-join, never broadcast a fact:\n" + plan
    )


def test_pure_dim_join_is_broadcast_only(spark):
    plan = _plan(spark, "nation_region_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "dim⋈dim should broadcast, not shuffle both sides:\n" + plan
    )


def test_date_filters_push_to_both_fact_scans(spark):
    plan = _plan(spark, "shipping_priority")
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_topk_uses_take_ordered_not_full_sort(spark):
    plan = _plan(spark, "top_orders_global")
    assert "TakeOrderedAndProject" in plan, (
        "top-k should plan TakeOrderedAndProject, not a global sort:\n" + plan
    )
