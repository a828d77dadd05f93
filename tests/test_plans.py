"""Physical-plan assertions (SURVEY §5.2 item 5; BASELINE.md targets).

These pin the scale posture: dimension joins broadcast, nothing
degenerates to a cartesian product, the arbitrage core needs exactly
one shuffle, and parquet scans receive pushed filters / pruned schemas.
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    from banksy_spark.suite import REGISTRY

    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_chain_broadcasts(spark):
    plan = _plan(spark, "j_broadcast_dim_chain")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_cartesian_products_anywhere(spark):
    from banksy_spark.suite import REGISTRY

    for name in REGISTRY:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_arbitrage_core_single_shuffle(spark):
    plan = _plan(spark, "odds_arbitrage_core")
    # one Exchange for the groupBy(game_id); partial agg happens map-side
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "partial_max" in plan or "partial" in plan.lower()


def test_window_not_selfjoin_has_no_join(spark):
    plan = _plan(spark, "j_window_not_selfjoin")
    assert "Join" not in plan  # window aggregate, not merge-back join
    assert "Window" in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "p_project_rename")
    assert "PushedFilters: [" in plan
    assert re.search(r"PushedFilters: \[.*LessThan\(l_quantity", plan)


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "p_project_rename")
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, "no FileScan in plan"
    cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    # only the 4 projected columns + the filter column are read
    assert cols == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag", "l_quantity"}


def test_ann_broadcasts_query_set(spark):
    # the similarity-search scale contract: the small query side
    # broadcasts; candidates never shuffle
    plan = _plan(spark, "llm_ann_bruteforce")
    assert "Broadcast" in plan
    plan2 = _plan(spark, "llm_ann_lsh_bucketed")
    assert "Broadcast" in plan2


def test_decorrelated_avg_scans_lineitem_once(spark):
    # the Q17 shape must decorrelate to a window, never a lineitem
    # self-join: one lineitem FileScan, a Window, and a broadcast part dim
    plan = _plan(spark, "a_decorrelated_avg")
    assert len(re.findall(r"FileScan parquet[^\n]*lineitem", plan)) == 1
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontam_broadcasts_eval_grams(spark):
    # the eval-side n-gram set is the small side: it must broadcast so
    # the train corpus streams map-side through the contamination join
    plan = _plan(spark, "llm_decontam_overlap")
    assert "BroadcastHashJoin" in plan


def test_span_dedup_two_exchanges(spark):
    # span dedup = one shuffle on span_text (the dedup window) + one on
    # doc_id (reassembly); anything more means a redundant exchange
    plan = _plan(spark, "llm_dedup_spans")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_pq_broadcasts_codebook_and_lut(spark):
    # PQ scale contract: codebook and the (query, subspace, code)
    # distance LUT broadcast; candidates ship codes, never vectors
    plan = _plan(spark, "llm_ann_pq")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_salted_join_is_shuffle_not_broadcast(spark):
    # the whole point of the salted join: the small side does NOT
    # broadcast, and the join keys on (custkey, _salt)
    plan = _plan(spark, "j_salted_skew_join")
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "_salt" in plan


def test_double_exists_decorrelates_to_single_scan(spark):
    # Q21 shape: both correlated EXISTS subqueries must fold into one
    # window pass — exactly one lineitem scan and no Join in the plan
    plan = _plan(spark, "j_decorrelated_exists")
    assert len(re.findall(r"FileScan parquet[^\n]*lineitem", plan)) == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_scd2_history_is_single_exchange(spark):
    # the explicit custkey repartition must serve both the day-grain agg
    # and the window — exactly one exchange in the whole history build
    plan = _plan(spark, "w_scd2_intervals")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_funnel_is_single_exchange_no_join(spark):
    # all windows + final agg share one partition key: exactly one
    # exchange and no self-joins
    plan = _plan(spark, "stream_funnel_steps")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan


def test_mad_outliers_bucket_bounded(spark):
    # round-7 rewrite: both rank passes ride grouped_ordinals — every
    # fact-side window partitions on (flag, bucket, sub), the per-flag
    # median/MAD picks join back as broadcasts, and nothing plans a
    # single-partition or flag-only window
    plan = _plan(spark, "a_mad_outliers")
    assert "Exchange SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("_gob" in s for s in specs), plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_argmin_supplier_is_single_exchange(spark):
    # Q2 shape: the explicit l_partkey repartition must serve both the
    # (l_partkey, l_suppkey) grouped agg and the per-part MIN window
    plan = _plan(spark, "j_argmin_supplier")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan


def test_cms_probe_side_broadcasts_grid(spark):
    # the 256-cell sketch grid must broadcast to the probe join; the
    # fact-side update path is a single map-side-combinable aggregation
    plan = _plan(spark, "a_heavy_hitters_cms")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_audio_frames_no_shuffle(spark):
    # frame windowing is a pure map-side explode — no exchange at all
    plan = _plan(spark, "llm_audio_frames")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_global_rownum_avoids_global_sort_window(spark):
    # the decomposition's contract: 2 bounded exchanges + broadcast of
    # the 64-row offset table — never a full-data single-partition sort
    plan = _plan(spark, "o_global_rownum")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert "BroadcastHashJoin" in plan
    # the only SinglePartition exchange allowed is the 64-row offset agg
    assert plan.count("Exchange SinglePartition") <= 1


def test_image_patches_map_only(spark):
    plan = _plan(spark, "llm_image_patches")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bpe_merge_rounds_broadcast_argmax(spark):
    # each round's argmax pair must enter as a broadcast 1-row relation;
    # the merge application itself must never shuffle the vocab again
    plan = _plan(spark, "llm_bpe_merges")
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_temporal_lookup_has_no_inequality_join(spark):
    # the asof-as-union contract: one equi-join (orderkey -> custkey
    # enrichment), zero range/nested-loop joins, balance fill by window
    plan = _plan(spark, "j_temporal_scd2_lookup")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1
    assert "Window" in plan


# --- global-window (single-partition) elimination: round-6 contract --------

_GLOBAL_WINDOW_RE = re.compile(
    r"Window[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*Exchange SinglePartition"
)

# the nine queries the round-5 verdict flagged as single-partition
# global windows, now riding operators/ordinals.py (or, for q10, a
# TakeOrderedAndProject top-k)
_ORDINAL_REWRITES = [
    "ml_roc_auc",
    "ml_calibration_bins",
    "a_rfm_segmentation",
    "a_abc_classification",
    "a_lorenz_curve_points",
    "dq_skew_report",
    "j_skyline_pareto",
    "j_q10_returned_items",
]


def _global_windows(plan: str) -> int:
    return len(_GLOBAL_WINDOW_RE.findall(plan))


def test_no_global_window_in_rank_family(spark):
    for name in _ORDINAL_REWRITES:
        plan = _plan(spark, name)
        assert _global_windows(plan) == 0, (
            f"{name}: single-partition window re-entered the plan"
        )


def test_lift_gains_global_windows_only_post_agg(spark):
    # the fact-grain NTILE is decomposed; the only global windows left
    # run over the 10 POST-AGGREGATION decile rows (bounded by
    # construction, allowlisted in tools/plan_audit.py)
    plan = _plan(spark, "ml_lift_gains")
    assert _global_windows(plan) <= 2
    # and the aggregate producing those 10 rows sits below them
    assert "HashAggregate" in plan


def test_q10_top_k_is_take_ordered(spark):
    plan = _plan(spark, "j_q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
