"""Partitioning-invariance: suite results must be bit-identical under
different shuffle-partition counts. This is the local stand-in for the
100 TB claim that AQE may retune reducer counts freely — DECIMAL sums,
deterministic tie-breaks, and hash-derived keys make the result a pure
function of the data, not of the physical split.
"""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_SMOKE

# One representative per risk class: grouped decimal sums, global-ish
# windows, sampling, banded fuzzy dedup, calendar gap fill, IVM merge.
PROBES = [
    "a_grouped_sum",
    "llm_sample_pps",
    "llm_dedup_minhash_lsh",
    "w_gap_fill_resample",
    "a_incremental_view",
    "w_time_weighted_avg",
    # round-4 order-sensitive classes: bucketed global ordinals, epoch
    # permutations, fixed-point graph iteration, fold-based EWMA
    "o_global_rownum",
    "llm_epoch_shuffle",
    "graph_pagerank",
    "w_ewma",
    # round-5: ordered chunk reassembly, fold-based CUSUM, partial-agg
    # ordering of the fixed-point k-means sums
    "llm_cdc_chunks",
    "w_cusum_changepoint",
    "ml_kmeans_step",
    # round-5b/c/d/e order-sensitive classes: prefix-filtered candidate
    # generation (distinct over shuffled pairs), two-state Holt fold,
    # anchor-fed session fold, trailing-frame rolling median
    "j_similarity_prefix_join",
    "w_holt_linear",
    "w_capped_sessions",
    "w_rolling_median_7",
    # round-5h: scalar product fold, wedge-join top-k
    "a_survival_km",
    "j_graph_2hop_recs",
    # round-5o: rolling decimal moments, quadratic pair-sign aggregate
    "w_bollinger_bands",
    "a_mann_kendall_trend",
    # round-8: reference-period binning, min-hash-bucketed containment
    # (distinct over shuffled shingle pairs), corpus-scaled SemDeDup
    "ml_psi_drift",
    "llm_dedup_containment",
    "llm_dedup_semantic",
    # round-8b: lower-median pick over double-ordered pairs (integer
    # tie-break must pin the row under any split), rank spans from a
    # near-unique value histogram's bucketed ordinal pass
    "a_theil_sen_monthly",
    "ml_spearman_corr",
    # first-crossing pick over a grouped running LLR (min-struct agg
    # over an ordinal cumsum — both must be split-invariant)
    "ml_sprt_sequential",
    # gram-keyed clip joins over persisted histograms + ordinal pairing;
    # windowed ANN ranks feeding a pivoted fixed-order float tree
    "llm_self_bleu",
    "llm_ann_ndcg",
    # round-11 order-sensitive classes: arg-min/max candidate merge
    # across partial aggregates (the picked row must be split-invariant),
    # float-dist rank with integer tie-break, prefix-offset cumsum over
    # fixed hash buckets
    "w_ohlc_resample",
    "j_knn_grid_join",
    "llm_sample_pps",
]


def _digest(df) -> str:
    cols = sorted(df.columns)
    lines = sorted(
        "\x1f".join(repr(r[c]) for c in cols) for r in df.collect()
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", PROBES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    from banksy_spark.suite import REGISTRY

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        d3 = _digest(REGISTRY[name].fn(spark, SF_SMOKE))
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        d17 = _digest(REGISTRY[name].fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.catalog.clearCache()
    assert d3 == d17, f"{name} result depends on shuffle partitioning"
