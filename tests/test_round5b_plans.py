"""Plan assertions for the round-5b TPC-H completions (Q1, Q5, Q6, Q7,
Q8, Q9, Q10, Q11, Q13, Q16, Q20): the shapes the notes claim —
broadcast dims, pushed-down scans, single fact shuffles, window
decorrelation — must hold in the actual physical plan, not just prose.
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    from banksy_spark.suite import REGISTRY

    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_single_scan_pushed_filter(spark):
    plan = _plan(spark, "a_q1_pricing_summary")
    # one lineitem scan, the shipdate filter reaches it, zero joins
    assert len(re.findall(r"FileScan parquet", plan)) == 1
    assert "PushedFilters: [" in plan
    assert "Join" not in plan
    # partial + final hash aggregate (map-side combine before exchange)
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_q6_pushdown_and_column_pruning(spark):
    plan = _plan(spark, "a_q6_forecast_revenue")
    assert "Join" not in plan
    # discount/quantity predicates are parquet-pushable (the printed
    # PushedFilters list is elided, so assert on DataFilters + a
    # non-empty pushed list)
    assert "PushedFilters: [IsNotNull" in plan
    assert re.search(r"DataFilters: \[.*l_discount", plan)
    assert re.search(r"DataFilters: \[.*l_quantity", plan)
    # projection pruned: the scan must NOT read returnflag/linestatus
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "l_returnflag" not in m.group(1)


def test_q5_one_fact_shuffle_rest_broadcast(spark):
    plan = _plan(spark, "j_q5_regional_volume")
    # customer/supplier/nation/region all broadcast; the only
    # sort-merge-eligible join is lineitem⋈orders (may itself be BHJ
    # at smoke scale, but never cartesian)
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 4
    assert len(re.findall(r"SortMergeJoin", plan)) <= 1


def test_q7_nation_filter_below_fact_shuffle(spark):
    plan = _plan(spark, "a_q7_nation_volume")
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2
    assert "CartesianProduct" not in plan
    # the nation IN-filter reaches both dimension scans
    assert re.search(r"PushedFilters: \[.*n_name", plan) or re.search(
        r"PushedFilters: \[.*In\(n_name", plan
    )


def test_q8_single_aggregate_no_self_join(spark):
    plan = _plan(spark, "a_q8_market_share")
    # numerator CASE lives inside the one aggregate — lineitem scanned once
    assert len(re.findall(r"FileScan parquet [^\n]*lineitem", plan)) == 1
    assert "CartesianProduct" not in plan


def test_q9_broadcast_only_no_fact_shuffle_join(spark):
    plan = _plan(spark, "a_q9_product_profit")
    # part + supplier-nation broadcast; no SMJ anywhere (orders unused)
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"FileScan parquet [^\n]*orders", plan)) == 0


def test_q10_topk_after_aggregate(spark):
    plan = _plan(spark, "j_q10_returned_items")
    # returnflag filter reaches the lineitem scan
    assert re.search(r"PushedFilters: \[.*l_returnflag", plan)
    # round 6: the deterministic top-20 is TakeOrderedAndProject over
    # the customer-grain aggregate — per-partition heaps, no rank window
    assert "TakeOrderedAndProject" in plan and "HashAggregate" in plan
    assert "Window" not in plan


def test_q11_threshold_joins_broadcast_scalar(spark):
    plan = _plan(spark, "a_q11_important_parts")
    # the 1-row total joins as a broadcast nested-loop (scalar), never
    # a shuffled cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q13_preaggregates_orders_before_outer_join(spark):
    plan = _plan(spark, "a_q13_order_distribution")
    # the per-custkey count aggregate must sit BELOW the left join
    # (aggregate-then-join, not join-then-aggregate)
    join_pos = plan.find("Join")
    aggs = [m.start() for m in re.finditer(r"HashAggregate", plan)]
    assert join_pos >= 0 and any(p > join_pos for p in aggs), (
        "orders aggregation should appear below the outer join in the "
        "plan tree (printed after the join operator)"
    )


def test_q16_anti_join_before_distinct(spark):
    plan = _plan(spark, "a_q16_supplier_variety")
    assert "LeftAnti" in plan
    # distinct-count expands to the two-phase aggregate
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_q20_single_lineitem_scan_window_decorrelation(spark):
    plan = _plan(spark, "j_q20_dominant_suppliers")
    # the oracle's two lineitem scans collapse to ONE + a window
    assert len(re.findall(r"FileScan parquet [^\n]*lineitem", plan)) == 1
    assert "Window" in plan
    assert "SortMergeJoin" not in plan
    assert "LeftSemi" in plan
