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
# Round 13 = pure re-check window: the R12 gap-closing window completed
# driver coverage of the FULL registry, so all 50 slots re-verify the
# highest-residual-risk names not already re-checked inside the R12
# window (rotation_plan.R13 states the risk ranking). Applied by
# tools/rotate.py once CORRECTNESS_r12.json landed.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation.
_FRONT = [
    "llm_sample_pps",
    "llm_e2e_prepare",
    "w_scd2_intervals",
    "o_cdc_merge_apply",
    "llm_corpus_clean",
    "llm_dedup_semantic",
    "j_basket_lift",
    "llm_dedup_minhash_lsh",
    "llm_dedup_containment",
    "llm_dedup_containment_k3",
    "llm_dedup_ngram_jaccard",
    "llm_simhash",
    "llm_embed_near_dup",
    "llm_dedup_tau_curve",
    "llm_ann_recall",
    "llm_ann_ndcg",
    "llm_bpe_pairs",
    "llm_bpe_merges",
    "llm_self_bleu",
    "llm_boilerplate_ngrams",
    "o_global_rownum",
    "o_global_ntile",
    "a_exact_median",
    "a_exact_percentiles",
    "a_weighted_percentiles_global",
    "a_interpolated_percentiles",
    "ml_mutual_info",
    "ml_spearman_corr",
    "ml_kendall_tau",
    "ml_sprt_sequential",
    "ml_linreg_normal",
    "a_theil_sen_monthly",
    "w_rolling_corr",
    "a_chi2_contingency",
    "a_tail_risk_var_es",
    "a_neyman_allocation",
    "w_ewma",
    "w_holt_linear",
    "w_cusum_changepoint",
    "w_capped_sessions",
    "w_max_drawdown",
    "a_changepoint_binseg",
    "a_survival_km",
    "stream_rate_limit_stateful",
    "stream_sessionize",
    "stream_asof_join",
    "stream_rollup_cascade",
    "graph_triangle_count",
    "o_compaction_plan",
    "o_zorder_key",
]
_rest = [n for n in REGISTRY if n not in set(_FRONT)]
_reordered = {n: REGISTRY[n] for n in _FRONT + _rest}
REGISTRY.clear()
REGISTRY.update(_reordered)

__all__ = ["REGISTRY", "query"]
