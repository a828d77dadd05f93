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
from banksy_spark.suite import round13  # noqa: E402,F401
from banksy_spark.suite import round13b  # noqa: E402,F401
from banksy_spark.suite import round13c  # noqa: E402,F401
from banksy_spark.suite import round13d  # noqa: E402,F401

# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 14 = round-13-born queries first (rotation_plan.R14 — every
# query registered during round 13, never driver-verified), padded to
# 50 with the highest-residual-risk re-checks not covered by the R12
# or R13 windows (rotation_plan.R14_RECHECK_FILL). Applied by
# tools/rotate.py once CORRECTNESS_r13.json landed.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation.
_FRONT = [
    "ml_cuped_stratified",
    "ml_srm_check",
    "ml_diff_in_diff",
    "ml_group_sequential",
    "j_trajectory_fence_crossing",
    "a_hex_rollup",
    "j_polygon_overlap_join",
    "ml_experiment_power",
    "a_hex_smoothing",
    "graph_label_propagation",
    "j_nearest_edge_join",
    "graph_connected_components",
    "dq_t_closeness",
    "ml_permutation_test",
    "ml_bootstrap_poisson_ci",
    "ml_tost_equivalence",
    "a_kde_epanechnikov",
    "graph_jaccard_linkpred",
    "ml_auc_delong_ci",
    "a_esd_outliers",
    "llm_sample_reservoir",
    "stream_reservoir_stateful",
    "llm_dedup_canonical",
    "a_q1_pricing_summary",
    "a_q14_promo_share",
    "llm_dsir_importance",
    "llm_dedup_clusters",
    "j_basket_pairs",
    "dq_constraint_report",
    "a_xyz_classification",
    "a_ols_slope",
    "a_seasonal_strength",
    "ml_psi_drift",
    "a_skew_kurtosis",
    "a_autocorr_lag1",
    "a_weighted_median",
    "a_benford_deviation",
    "ml_roc_auc",
    "ml_pr_auc",
    "ml_ks_statistic",
    "ml_mcc",
    "ml_cohen_kappa",
    "a_runs_test",
    "a_mann_kendall_trend",
    "a_wilson_ci",
    "a_ab_test_ztest",
    "a_gini_concentration",
    "a_trimmed_mean",
    "a_ddsketch_log2",
    "a_largest_remainder",
]
_rest = [n for n in REGISTRY if n not in set(_FRONT)]
_reordered = {n: REGISTRY[n] for n in _FRONT + _rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "query"]
