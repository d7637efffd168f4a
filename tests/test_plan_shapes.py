"""Plan-shape regression tests: every scale claim a query's description
makes is asserted against the actual physical plan, so a refactor that
silently loses a pushdown, a broadcast, or a top-k/rank-limit
optimization fails CI — not a 100 TB production run.

Plans are built at sf0.001 (plan shape is data-size independent here;
AQE runtime re-planning is exercised separately in
test_scale_posture.py).
"""

from __future__ import annotations

import pytest

from spotify_tracks_etl_portfolio_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_pushes_every_predicate_to_scan(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert plan.count("FileScan parquet") == 1
    # all three predicate families reach the parquet reader
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed
    # no join anywhere — filter + two-phase agg only
    assert "Join" not in plan


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = plan_of(spark, "top10_customers_by_revenue")
    assert "TakeOrderedAndProject" in plan
    # top-k must never be planned as a global range-partitioned sort
    assert "rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_per_group_topn_has_no_global_sort(spark):
    plan = plan_of(spark, "top3_customers_per_nation")
    # rank runs within hash partitions of the group key; a global sort
    # (range partitioning) would serialize the whole table
    assert "rangepartitioning" not in plan
    assert plan.count("BroadcastHashJoin") == 2
    # rank-limit pushdown prunes each group to its top rows before the
    # final window evaluation (Spark 3.5+ WindowGroupLimit)
    assert "WindowGroupLimit" in plan


def test_window_dedup_gets_rank_limit_pushdown(spark):
    plan = plan_of(spark, "dedup_window_events")
    # rn=1 dedup must engage WindowGroupLimit (partial before the
    # shuffle, final after) so each map task forwards one row per key
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_funnel_and_asof_never_plan_nested_loops(spark):
    for name in ("click_purchase_funnel", "asof_click_purchase"):
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_global_windows_run_on_aggregated_input(spark):
    """cumulative/moving-average queries: the unpartitioned ordered
    window must sit above a hash aggregation (daily rollup), so the
    single-partition stage sees one row per day, not the fact table."""
    for name in ("cumulative_daily_revenue", "weekly_moving_avg_events"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, name
        # partial+final agg pair below the window
        assert plan.count("HashAggregate") >= 2, name
        window_pos = plan.index("Window")
        agg_pos = plan.rindex("HashAggregate")
        assert window_pos < agg_pos, (
            f"{name}: window must consume the aggregate's output "
            "(appear above it in the plan tree)"
        )


def test_broadcast_hints_survive_in_snowflake_join(spark):
    plan = plan_of(spark, "regional_revenue")
    # every dimension (customer, nation, region) broadcasts; the fact
    # side joins orders via shuffle — at most one non-broadcast join
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "hourly_event_rollup",
        "daily_active_users",
        "top50_tokens",
    ],
)
def test_single_pass_aggregations_scan_once(spark, name):
    plan = plan_of(spark, name)
    assert plan.count("FileScan parquet") == 1, name
