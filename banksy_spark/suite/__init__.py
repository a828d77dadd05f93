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
from banksy_spark.suite import round11  # noqa: E402,F401
from banksy_spark.suite import round12  # noqa: E402,F401

# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 12 = gap-closing window: every post-plan addition that has
# never been in a driver window (rotation_plan.R12), padded to 50 with
# the highest-residual-risk re-checks (rotation_plan.R12_RECHECK_FILL).
# After this window the driver-verified union covers the FULL registry
# including all post-plan additions. Applied by tools/rotate.py once
# CORRECTNESS_r11.json landed.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation.
_FRONT = [
    "stream_capped_balance_stateful",
    "stream_markov_stateful",
    "llm_dedup_containment_g5",
    "graph_kcore",
    "o_file_skipping_stats",
    "w_ohlc_resample",
    "llm_audio_silence_segments",
    "j_knn_grid_join",
    "f_array_hof",
    "f_point_in_polygon",
    "o_manifest_prune",
    "a_geofence_dwell",
    "a_tile_pyramid",
    "j_polygon_grid_join",
    "ml_cuped_adjustment",
    "ml_brier_score",
    "ml_kmeans_converged",
    "llm_ann_ivf_trained",
    "llm_langid_trained",
    "stream_rolling_corr_stateful",
    "stream_bollinger_stateful",
    "j_similarity_ppjoin_pos",
    "graph_pagerank",
    "j_ancestry_converged",
    "graph_bfs_converged",
    "llm_dedup_lsh_recall",
    "llm_dedup_cdc",
    "llm_ann_pq",
    "llm_ann_recall_pq",
    "llm_ann_ivf_multiprobe",
    "llm_ann_recall_multiprobe",
    "a_heavy_hitters_cms",
    "llm_kmv_algebra",
    "llm_distinct_sketch_hll",
    "a_bitmap_distinct",
    "stream_markov_transitions",
    "stream_attribution",
    "stream_session_window_native",
    "stream_interval_left_join",
    "j_asof_tolerance",
    "j_temporal_scd2_lookup",
    "j_salted_skew_join",
    "j_bloom_prune_join",
    "j_fuzzy_edit1_join",
    "j_similarity_prefix_join",
    "llm_dedup_incremental",
    "llm_dedup_spans",
    "llm_decontam_overlap",
    "llm_bm25_topk",
    "a_mad_outliers",
]
_rest = [n for n in REGISTRY if n not in set(_FRONT)]
_reordered = {n: REGISTRY[n] for n in _FRONT + _rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "query"]
