"""Plan assertions for the round-5h..5l operators: single fact scans,
fused pipeline exchanges, no quadratic joins."""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    from banksy_spark.suite import REGISTRY

    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_survival_km_single_events_scan(spark):
    plan = _plan(spark, "a_survival_km")
    assert len(re.findall(r"FileScan parquet [^\n]*events", plan)) == 1
    assert "Generate" in plan  # fold explodes back to rows


def test_gini_split_one_pass_over_orders(spark):
    plan = _plan(spark, "ml_gini_split")
    # all nine thresholds from ONE orders scan (broadcast cross of the
    # 9-row literal is the only duplication)
    assert len(re.findall(r"FileScan parquet [^\n]*orders", plan)) == 1
    assert "CartesianProduct" not in plan


def test_roc_auc_no_join(spark):
    # round 6 (in-plan ordinals): the offsets directory aggregates
    # in-plan, so the orders scan appears in up to 3 STATIC subtrees
    # (main + the directory self-join's two sides) — but all three sit
    # above the SAME bucket exchange, which AQE reuses at runtime
    # (ReusedExchange below). No shuffle join, no single-partition
    # window.
    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    df = REGISTRY["ml_roc_auc"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"FileScan parquet [^\n]*orders", plan)) <= 3
    assert not re.search(
        r"Window[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*Exchange SinglePartition", plan
    )
    df.collect()  # finalize the adaptive plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final  # one exchange feeds all branches


def test_changepoint_binseg_one_window_pass(spark):
    plan = _plan(spark, "a_changepoint_binseg")
    # all n-1 candidate splits from one series exchange; no rescans
    assert len(re.findall(r"FileScan parquet [^\n]*orders", plan)) == 1
    assert "Join" not in plan


def test_sequence_ab_collapses_before_pair_join(spark):
    plan = _plan(spark, "a_sequence_ab")
    # the per-user pair join must sit ABOVE the (user, type) aggregate
    join_pos = plan.find("Join")
    aggs = [m.start() for m in re.finditer(r"HashAggregate", plan)]
    assert join_pos >= 0 and any(p > join_pos for p in aggs)


def test_e2e_prepare_single_scan_three_keyed_exchanges(spark):
    plan = _plan(spark, "llm_e2e_prepare")
    assert len(re.findall(r"FileScan parquet [^\n]*documents", plan)) == 1
    # source-cap, content-hash, and lang-split windows: one hash
    # exchange each, nothing more
    n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exch == 3, f"expected 3 keyed exchanges, saw {n_exch}"
    assert "Join" not in plan


def test_ddsketch_single_scan_small_agg(spark):
    plan = _plan(spark, "a_ddsketch_log2")
    assert len(re.findall(r"FileScan parquet [^\n]*orders", plan)) == 1
    assert "Join" not in plan
    # map-side partial agg before the bucket exchange
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_calibration_and_lift_single_scan(spark):
    for name in ("ml_calibration_bins", "ml_lift_gains"):
        plan = _plan(spark, name)
        # in-plan ordinals: <=4 static subtrees (main + directory
        # self-join sides + grand total) over ONE reused bucket
        # exchange (see test_roc_auc_no_join), broadcast-only joins
        assert len(re.findall(r"FileScan parquet [^\n]*orders", plan)) <= 4
        assert "SortMergeJoin" not in plan


def test_2hop_thinned_filter_reaches_scan(spark):
    plan = _plan(spark, "j_graph_2hop_recs")
    # the 1-in-23 thinning must prune at the orders scan, not post-join
    assert re.search(r"DataFilters: \[.*o_orderkey", plan)
    assert "CartesianProduct" not in plan
