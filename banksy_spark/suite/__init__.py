"""The query suite: one named query per implemented operator.

Each SURVEY.md §2 operator (and each driver-mandated extension) is
exposed as a named query ``(spark, sf_dir) -> DataFrame`` plus, when
SQL-expressible, a DuckDB oracle producing identical columns/values.
``__spark_entry__.py`` re-exports this registry to the driver.
"""

from banksy_spark.suite.registry import REGISTRY, query

# Importing the modules populates REGISTRY via the @query decorator.
# Registration order = the driver's verification order, and the driver
# caps its per-round check (~50 queries, CORRECTNESS_r02 recorded
# exactly the first 50). Highest-value first: the flagship + the
# extension families (llm dedup/ANN, pipelines, streaming semantics)
# lead; core's 49 — all driver-verified green in round 2 — trail.
from banksy_spark.suite import odds  # noqa: E402,F401
from banksy_spark.suite import llm  # noqa: E402,F401
from banksy_spark.suite import stream  # noqa: E402,F401
from banksy_spark.suite import pipe  # noqa: E402,F401
from banksy_spark.suite import llm_extra  # noqa: E402,F401
from banksy_spark.suite import corpus  # noqa: E402,F401
from banksy_spark.suite import train  # noqa: E402,F401
from banksy_spark.suite import core  # noqa: E402,F401
from banksy_spark.suite import scale_ops  # noqa: E402,F401
from banksy_spark.suite import round4  # noqa: E402,F401
from banksy_spark.suite import round4c  # noqa: E402,F401
from banksy_spark.suite import round4d  # noqa: E402,F401
from banksy_spark.suite import round4e  # noqa: E402,F401
from banksy_spark.suite import round4f  # noqa: E402,F401
from banksy_spark.suite import round4g  # noqa: E402,F401
from banksy_spark.suite import round5  # noqa: E402,F401
from banksy_spark.suite import round5b  # noqa: E402,F401
from banksy_spark.suite import round5c  # noqa: E402,F401
from banksy_spark.suite import round5d  # noqa: E402,F401
from banksy_spark.suite import round5e  # noqa: E402,F401
from banksy_spark.suite import round5f  # noqa: E402,F401
from banksy_spark.suite import round5g  # noqa: E402,F401
from banksy_spark.suite import round5h  # noqa: E402,F401
from banksy_spark.suite import round5i  # noqa: E402,F401
from banksy_spark.suite import round5j  # noqa: E402,F401
from banksy_spark.suite import round5k  # noqa: E402,F401
from banksy_spark.suite import round5l  # noqa: E402,F401
from banksy_spark.suite import round5m  # noqa: E402,F401
from banksy_spark.suite import round5n  # noqa: E402,F401
from banksy_spark.suite import round5o  # noqa: E402,F401
from banksy_spark.suite import round5p  # noqa: E402,F401
from banksy_spark.suite import round5q  # noqa: E402,F401
from banksy_spark.suite import round5r  # noqa: E402,F401
from banksy_spark.suite import round5s  # noqa: E402,F401
from banksy_spark.suite import round6  # noqa: E402,F401
from banksy_spark.suite import pipe_scrape  # noqa: E402,F401
from banksy_spark.suite import round7  # noqa: E402,F401
from banksy_spark.suite import round7b  # noqa: E402,F401
from banksy_spark.suite import round8  # noqa: E402,F401
from banksy_spark.suite import round8b  # noqa: E402,F401
from banksy_spark.suite import round9  # noqa: E402,F401
from banksy_spark.suite import round10  # noqa: E402,F401

# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 10 = backlog-retirement window 2 of 3: the pre-committed R10
# rotation (tools/rotation_plan.py, round-8 verdict item 2), executed
# with two adjustments pinned by tests/test_contract.py:
#   * ml_brier_score re-enters FIRST — round 9's single red row
#     (driver HUGEINT hash-rendering on a >int64 DECIMAL output,
#     adjudicated value-exact; now string-routed per the suite's
#     DECIMAL->VARCHAR discipline) must show a green row this round.
#   * ml_zscore_scaling (mechanical shape, lowest residual risk of the
#     planned 50) moves to the R11 window to make room.
# Every name below passed the vanilla-ANSI driver-simulation probe
# (tools/ansi_check.py) AND the tuned-session three-SF sweep at the
# round-9 close; ml_brier_score re-passed both after the VARCHAR fix.
# Ordering within the window is by residual risk: the re-entry first,
# then newly-oracled trainers / round-9 additions, multimodal Arrow
# decode paths, converged iterative ops, sketches, streaming twins,
# temporal/interval/spatial joins, CDC, windows, ANN variants, skew
# machinery, dedup/decontam/retrieval, hand-rolled statistics.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation. Round 11 (tools/rotation_plan.py R11) retires the final 50.
_FRONT = [
    "ml_brier_score",
    "ml_kmeans_converged",
    "llm_ann_ivf_trained",
    "stream_rolling_corr_stateful",
    "j_similarity_ppjoin_pos",
    "llm_audio_frames",
    "llm_image_patches",
    "llm_video_keyframes",
    "j_ancestry_converged",
    "graph_bfs_converged",
    "graph_bfs_distance",
    "a_heavy_hitters_cms",
    "llm_kmv_algebra",
    "llm_distinct_sketch_hll",
    "a_bitmap_distinct",
    "stream_markov_transitions",
    "stream_attribution",
    "stream_top_paths",
    "stream_interval_left_join",
    "stream_hopping_window",
    "stream_session_window_native",
    "stream_funnel_steps",
    "j_asof_tolerance",
    "j_interval_overlap",
    "j_spatial_grid_join",
    "j_temporal_scd2_lookup",
    "llm_cdc_chunks",
    "llm_dedup_cdc",
    "o_cdc_merge_apply",
    "w_rank_family",
    "w_scd2_intervals",
    "w_distinct_over_window",
    "w_ewma",
    "w_time_weighted_avg",
    "w_capped_running_sum",
    "w_rolling_range",
    "llm_ann_pq",
    "llm_ann_recall_pq",
    "llm_ann_ivf_multiprobe",
    "llm_ann_recall_multiprobe",
    "j_salted_skew_join",
    "j_bloom_prune_join",
    "llm_dedup_incremental",
    "llm_dedup_lsh_recall",
    "llm_dedup_spans",
    "llm_decontam_overlap",
    "llm_bm25_topk",
    "a_mad_outliers",
    "a_histogram_quantiles",
    "stream_bollinger_stateful",
]
_rest = [n for n in REGISTRY if n not in set(_FRONT)]
_reordered = {n: REGISTRY[n] for n in _FRONT + _rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "query"]
