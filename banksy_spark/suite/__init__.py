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

# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).  The
# flagship odds family stays in front; the round-6/7 ordinal rewrites
# (bucketed global windows — the code that changed most recently) come
# next so the EXTERNAL oracle covers them, displacing long-stable
# round-2/3 entries toward the tail.  Python dicts preserve insertion
# order, so rebuilding the dict IS the rotation.
_FRONT = [
    "odds_arbitrage_core",
    "odds_decimal_conversion",
    "odds_stake_equalize",
    "odds_sign_audit",
    "odds_rate_limit",
    "odds_message_build",
    # the ordinal (bucketed global window) family, rewritten rounds 6-7
    "a_rfm_segmentation",
    "j_skyline_pareto",
    "llm_length_batching",
    "ml_lift_gains",
    "ml_roc_auc",
    "ml_calibration_bins",
    "a_lorenz_curve_points",
    "dq_skew_report",
    "a_abc_classification",
    "o_global_ntile",
    "o_global_rownum",
    "ml_pr_auc",
    "ml_ks_statistic",
    "a_trimmed_mean",
    "a_weighted_percentiles_global",
    "a_pareto_8020",
    "a_gini_concentration",
    "ml_quantile_binning",
    "ml_winsorize",
    "llm_stratified_split",
    "pipe_scrape_table",
    # round-7 session 2: convergence-loop rework (CC driver union-find
    # fast path, lazy checkpoints), PageRank n-carry, hash-agg k-means
    # assignment, hashed similarity-join candidate keys
    "llm_dedup_clusters",
    "llm_dedup_canonical",
    "llm_corpus_clean",
    "graph_pagerank",
    "ml_kmeans_step",
    "j_fuzzy_edit1_join",
    "j_similarity_prefix_join",
    # round-7 session 3: corpus-lifecycle additions (new code → into
    # the external-oracle window)
    "llm_dedup_semantic",
    "llm_shuffle_shards",
    "llm_chunk_fixed_overlap",
]
_rest = [n for n in REGISTRY if n not in set(_FRONT)]
_reordered = {n: REGISTRY[n] for n in _FRONT + _rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "query"]
