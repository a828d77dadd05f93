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

# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 9 = backlog-retirement window 1 of 3 (per the round-8 verdict):
# all 50 names below have NEVER been inside a driver CORRECTNESS
# window (union r01-r08 = 173 of 319).  Ordered by arithmetic risk:
# (a) the round-8/8b hand-rolled statistics family first (moment/rank
# algebra, SPRT likelihoods, information theory), then (b) the 19
# remaining TPC-H query shapes, then (c) the highest-risk remaining
# percentile/moment/graph queries.  Python dicts preserve insertion
# order, so rebuilding the dict IS the rotation.
#
# Pre-committed rotation plan for the ~96 left after this round
# (tools/backlog.py prints the live diff union(CORRECTNESS_r*) vs
# registry; every name is green in the builder's full sf0.001 AND
# sf0.01 sweeps):
#   round 10: the 50 riskiest of the remainder — ml_kmeans_converged +
#             llm_ann_ivf_trained (newly literal-centroid-oracled this
#             round), round4 multimodal (audio frames, image patches,
#             video keyframes), rank/SCD2/heavy-hitter families,
#             graph bfs/degree, stream twins (hopping, session native,
#             markov, attribution, funnel, top_paths, interval join),
#             sketches (CMS, KMV, HLL, bitmap), asof tolerance,
#             interval overlap, spatial grid join, basket pairs/lift.
#   round 11: the tail — llm corpus ops (BM25 topk, decontam overlap,
#             DSIR, PMI, tokenize/BPE, span corruption, chunking),
#             ANN pq/multiprobe variants, o_* table ops (CDC merge,
#             zorder, compaction, snapshot diff, union evolved),
#             remaining a_/w_/j_/dq_ singles.
_FRONT = [
    # (a) round-8b one-pass statistics family (round8b.py) + the
    # round-8 scoring/encoding quartet (round8.py) — hand-rolled
    # moment/rank/likelihood algebra, the highest residual risk
    "ml_linreg_normal",
    "a_theil_sen_monthly",
    "w_rolling_corr",
    "ml_spearman_corr",
    "ml_mutual_info",
    "ml_kendall_tau",
    "ml_sprt_sequential",
    "llm_self_bleu",
    "llm_ann_ndcg",
    "a_seasonal_strength",
    "a_hhi_concentration",
    "dq_l_diversity",
    "llm_dedup_tau_curve",
    "a_tail_risk_var_es",
    "a_neyman_allocation",
    "ml_brier_score",
    "ml_psi_drift",
    "ml_woe_encoding",
    "llm_dedup_containment",
    "llm_dedup_containment_k3",
    # (b) the 19 never-driver-checked TPC-H query shapes
    "a_q1_pricing_summary",
    "j_q3_shipping_priority",
    "a_q4_priority_exists",
    "j_q5_regional_volume",
    "a_q6_forecast_revenue",
    "a_q7_nation_volume",
    "a_q8_market_share",
    "a_q9_product_profit",
    "j_q10_returned_items",
    "a_q11_important_parts",
    "a_q13_order_distribution",
    "a_q14_promo_share",
    "j_q15_top_supplier",
    "a_q16_supplier_variety",
    "a_q18_having_semijoin",
    "j_q19_disjunctive_pred",
    "j_q20_dominant_suppliers",
    "j_q21_waiting_suppliers",
    "a_q22_idle_customers",
    # (c) remaining high-arithmetic-risk first-timers: chi-square,
    # higher moments, autocorrelation, OLS, Benford, CUSUM,
    # percentile/median/mode interpolation, triangle counting
    "a_chi2_contingency",
    "a_skew_kurtosis",
    "a_autocorr_lag1",
    "a_ols_slope",
    "a_benford_deviation",
    "w_cusum_changepoint",
    "a_weighted_median",
    "a_grouped_mode",
    "a_interpolated_percentiles",
    "a_exact_percentiles",
    "graph_triangle_count",
]
_rest = [n for n in REGISTRY if n not in set(_FRONT)]
_reordered = {n: REGISTRY[n] for n in _FRONT + _rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "query"]
