"""Plan assertions for the round-4 continuation operators: the TPC-H
completions, graph ops, and pipeline metrics keep the scale posture
(broadcast dims, shared exchanges, no cartesians, semi/anti forms).
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    from banksy_spark.suite import REGISTRY

    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_is_semi_join(spark):
    plan = _plan(spark, "a_q4_priority_exists")
    assert "LeftSemi" in plan
    # the quarter filter must reach the orders scan
    assert "PushedFilters: [" in plan


def test_q15_max_row_and_dim_broadcast(spark):
    plan = _plan(spark, "j_q15_top_supplier")
    # both the 1-row MAX and the supplier dim join as broadcasts
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2
    assert "SortMergeJoin" not in plan


def test_q21_window_shares_groupby_exchange(spark):
    plan = _plan(spark, "j_q21_waiting_suppliers")
    # one exchange for the orderkey join/agg/window chain; supplier
    # broadcasts. No exchange between the grouped agg and the window.
    assert "Window" in plan
    n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exch <= 2, f"expected <=2 exchanges, saw {n_exch}"


def test_q22_anti_join_and_broadcast_scalar(spark):
    plan = _plan(spark, "a_q22_idle_customers")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_triangle_count_no_cartesian(spark):
    plan = _plan(spark, "graph_triangle_count")
    assert "CartesianProduct" not in plan


def test_langid_profile_broadcasts(spark):
    plan = _plan(spark, "llm_langid_trained")
    # the learned profile must broadcast into the scoring join
    assert "BroadcastHashJoin" in plan


def test_basket_pairs_single_input_exchange(spark):
    plan = _plan(spark, "j_basket_pairs")
    # no self-join: the pair explode is map-side after one orderkey agg
    assert "Join" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_new_vs_returning_shares_exchange(spark):
    plan = _plan(spark, "a_new_vs_returning")
    # repartition(user_id) feeds both the (user, day) agg and the window
    n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exch <= 2, f"expected <=2 exchanges, saw {n_exch}"
    assert "Window" in plan


def test_interval_left_join_keeps_outer_side(spark):
    plan = _plan(spark, "stream_interval_left_join")
    assert "LeftOuter" in plan
