#!/usr/bin/env python
"""Benchmark harness: runs the headline suite queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full evaluation, no
driver-side collect), after a small warm-up to exclude JVM startup from
per-query numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries: one per workload family, heaviest variants included.
HEADLINE = [
    "a_grouped_sum",          # TPC-H Q1-shaped grouped decimal sums
    "j_broadcast_dim_chain",  # dimension-chain broadcast joins + agg
    "j_window_not_selfjoin",  # window aggregate over 600k rows
    "odds_arbitrage_core",    # flagship: pivot agg + odds math
    "o_melt",                 # wide→long unpivot
    "p_positional_slice",     # partitioned row_number
    "stream_sessionize",      # lag + running-sum sessionization
    "stream_tumbling_daily",  # event-time tumbling window agg
    "llm_dedup_minhash_lsh",  # minhash sigs + LSH band join
    "llm_dedup_ngram_jaccard",# blocked shingle-set jaccard join
    "llm_ann_bruteforce",     # cosine top-k, broadcast queries
    "llm_ann_ivf",            # IVF: centroid train + cell-local rerank
    "llm_simhash",            # 16-bit simhash over token hashes
    "llm_term_freq",          # explode + term-keyed aggregate
    "stream_asof_join",       # union + forward-fill asof composition
    "stream_rollup_multigrain", # GROUPING SETS day+month one-pass
    "a_exact_median",         # rank-form exact grouped median
    "j_anti_subquery",        # anti-join vs derived key set
    "a_salted_sum",           # two-stage salted aggregation
    "llm_ann_recall",         # recall@3 of IVF+LSH vs brute-force truth
    "stream_rate_limit_stateful",  # applyInPandas per-key quota replay
    "llm_dedup_spans",        # C4-style span dedup: global window + reassembly
    "llm_decontam_overlap",   # 13-gram eval-overlap decontamination
    "llm_bm25_topk",          # BM25 retrieval: tf/df agg + top-k window
    "a_decorrelated_avg",     # TPC-H Q17 shape, window-decorrelated
    "llm_ann_pq",             # PQ-ADC: codebook train + code join + LUT scoring
    "j_salted_skew_join",     # salted shuffle join, broadcast hinted off
    "a_exact_percentiles",    # nearest-rank p25/p50/p95 per group
    "w_rolling_range",        # trailing 1h RANGE frame per user
    "stream_hopping_window",  # 1h/15min hopping event-time windows
    "stream_session_window_native",  # native session_window, 30min gap
    "j_decorrelated_exists",  # Q21 double-EXISTS folded to one window pass
    "llm_ann_recall_pq",      # PQ ADC recall vs exact cosine truth
    "llm_dsir_importance",    # hashed-bigram DSIR importance weighting
    "llm_lm_fluency",         # in-engine bigram-LM fluency scoring
    "llm_pmi_cooc",           # skip-gram PMI lift, top-k associations
    "o_cdc_merge_apply",      # MERGE-semantics changelog apply
    "w_scd2_intervals",       # single-exchange SCD2 history build
    "a_histogram_quantiles",  # 64-bin quantile sketch, two narrow passes
    "a_mad_outliers",         # median/MAD robust outliers, one exchange
    "stream_funnel_steps",    # chained conditional-min funnel windows
    "o_zorder_key",           # normalized bit-interleave layout key
    "llm_tokenize_ids",       # frozen-vocab token-id encoding
    "llm_embed_feature_hash", # signed feature-hashing embedding
    "w_gap_fill_resample",    # per-user calendar spine + decimal ffill
    "j_bloom_prune_join",     # broadcast bloom bit-test before exact join
    "llm_dedup_canonical",    # cluster canonical selection after CC labels
    "llm_sample_pps",         # systematic PPS weighted sampling
    "a_incremental_view",     # partial-agg delta merge (IVM refresh)
    "llm_distinct_sketch_hll",# 64-register integer-exact HLL sketch
    "w_time_weighted_avg",    # duration-weighted mean, one exchange
    "llm_corpus_clean",       # composed dedup+quality+decontam pipeline
    "j_argmin_supplier",      # Q2-shaped argmin, single exchange
    "w_ewma",                 # fold-exact EWMA per user
    "a_heavy_hitters_cms",    # count-min sketch heavy hitters
    "llm_kmv_algebra",        # KMV sketch union/intersection algebra
    "llm_epoch_shuffle",      # deterministic epoch shuffle + sharding
    "llm_audio_frames",       # binary frame windowing, map-side only
    "graph_pagerank",         # fixed-point integer PageRank, 4 iterations
    "o_global_rownum",        # bucketed global ordinal, no global sort
    "llm_image_patches",      # ViT patch grid, 2-level explode
    "llm_bpe_merges",         # 2-round BPE training, broadcast argmax pair
    "w_rank_family",          # 5 rank functions, one window spec
    "dq_constraint_report",   # one-pass multi-constraint quality audit
    "a_retention_cohorts",    # weekly cohort retention grid
    "stream_markov_transitions",  # lead-pair transition matrix
    "w_distinct_over_window", # dense_rank distinct-count workaround
    "j_temporal_scd2_lookup", # point-in-time asof vs SCD2, union form
    "llm_video_keyframes",    # stride keyframe sampling, map-side
    "ml_quantile_binning",    # exact-rank quartile bins, broadcast bounds
    "ml_zscore_scaling",      # decimal-moment z-scores, bit-exact
    "ml_winsorize",           # p05/p95 clip, same rank machinery
    "f_array_hof",            # vector HOF surface, fold-exact sq_norm
    "f_null_semantics",       # null-safe eq + NULLS LAST witness
    "j_hierarchy_unroll",     # ancestor chain: unroll == recursive CTE
    "o_snapshot_diff",        # full-outer state reconciliation
    "a_bitmap_distinct",      # bit_or popcount exact distinct
    "stream_top_paths",       # ordered journey mining, top-k
    "a_grouped_mode",         # deterministic mode via count+rank
    "a_weighted_median",      # integer crossing-point weighted median
    "w_capped_running_sum",   # clamped recurrence as ordered fold
    "a_seasonal_anomaly",     # hour-profile z-score, broadcast baseline
    "a_gini_concentration",   # rank-formula Gini, one exchange
    "a_interpolated_percentiles",  # percentile_cont, bracketing stats
    "a_q12_late_shipments",   # Q12 shape: CASE-sums over order join
    "a_q14_promo_share",      # Q14 shape: one-pass promo revenue ratio
    "j_q19_disjunctive_pred", # Q19 shape: OR-clause predicate join
    "a_benford_deviation",    # first-digit law audit, 9-row grid
    "w_activity_streaks",     # gaps-and-islands day streaks, 1 exchange
    "a_q4_priority_exists",   # Q4 shape: semi-join existence count
    "j_q21_waiting_suppliers",# Q21 shape: sole-late supplier windows
    "graph_triangle_count",   # oriented wedge-join triangle counting
    "w_max_concurrency",      # +1/-1 sweep-line interval concurrency
    "stream_attribution",     # last-touch window attribution
    "stream_rollup_cascade",  # hourly layer re-aggregated to daily
    "llm_langid_trained",     # in-engine trained+broadcast lang profiles
    "j_basket_pairs",         # one-shuffle basket pair mining
    "llm_dedup_incremental",  # new-batch vs corpus dedup, keyed probes
    "graph_bfs_distance",     # 4-round Pregel-style BFS
    "a_yoy_growth",           # calendar-join YoY, post-agg broadcast
    "a_new_vs_returning",     # first-touch split, one exchange
    "a_bounce_rate",          # sessionize → bounce share per day
    "stream_late_rows_audit", # watermark-delay drop-rate replay
    "stream_interval_left_join",  # outer attribution window
    "a_skew_kurtosis",        # decimal power-sum higher moments
    "w_max_drawdown",         # integer-cents drawdown, one exchange
    "llm_span_corruption",    # T5 denoising spans, map-side HOFs
    "a_autocorr_lag1",        # exact-moment autocorrelation
    "a_pareto_8020",          # cross-multiplied 80% crossing rank
    "llm_boundary_overlap",   # suffix/prefix stitch-candidate join
    "w_gap_alerts",           # heartbeat silence detection
    "a_rolling_dau_7d",       # trailing-window distinct actives
    "llm_boilerplate_ngrams", # cross-source repetition mining
    "a_ship_latency_pct",     # nearest-rank SLA percentiles
    "j_spatial_grid_join",    # 3x3 stencil spatial candidates
    "a_ols_slope",            # closed-form per-group least squares
    "llm_length_batching",    # padding-waste batch assembly
    "a_abc_classification",   # cross-multiplied ABC classes
    "w_interval_merge",       # overlapping-interval union
    "j_basket_lift",          # support/confidence/lift rules
    "dq_partition_checksum",  # order-canonical partition md5
    "llm_dataset_card",       # one-pass corpus summary block
    "graph_degree_histogram", # degree rollup diagnostic
    "a_ab_test_ztest",        # pooled-variance conversion z-test
    "a_dow_hour_grid",        # arithmetic-weekday heatmap grid
    "a_rfm_segmentation",     # tie-broken NTILE quintile scoring
    "a_return_rate_brand",    # one-pass conditional return metrics
    "j_asof_tolerance",       # as-of join with staleness cap (merge_asof)
    "llm_cdc_chunks",         # content-defined chunking (rolling-hash)
    "ml_kmeans_step",         # spherical k-means Lloyd step (fixed-point)
    "llm_dedup_cdc",          # shift-robust near-dup over CDC chunk hashes
    "w_cusum_changepoint",    # CUSUM drift detection (ordered fold)
    "j_interval_overlap",     # interval-set overlap join
    "j_ancestry_converged",   # pointer-jumping ancestry (O(log h) rounds)
    "graph_bfs_converged",    # frontier-exhausting BFS
    "a_q1_pricing_summary",   # TPC-H Q1: one-pass 8-measure wide aggregate
    "a_q6_forecast_revenue",  # TPC-H Q6: scan-filter-sum, pure pushdown
    "j_q5_regional_volume",   # TPC-H Q5: 6-way join, one fact shuffle
    "a_q8_market_share",      # TPC-H Q8: CASE-share, no fact self-join
    "a_q9_product_profit",    # TPC-H Q9 shape: broadcast-only joins
    "j_q10_returned_items",   # TPC-H Q10: aggregate-then-top-k
    "a_q13_order_distribution", # TPC-H Q13: pre-agg before outer join
    "j_q20_dominant_suppliers", # TPC-H Q20 shape: agg+window, semi probe
    "j_similarity_prefix_join", # exact prefix-filtered similarity join
    "j_similarity_ppjoin_pos",  # + PPJoin positional filter (round 9)
    "j_fuzzy_edit1_join",       # deletion-neighborhood edit-1 matching
    "llm_stratified_split",     # exact per-stratum 80/10/10 split
    "w_linear_interpolate",     # time interpolation (ffill+bfill windows)
    "w_holt_linear",            # Holt level+trend fold per series
    "j_asof_nearest",           # bidirectional as-of via one union+sort
    "w_rolling_median_7",       # exact trailing-frame rolling median
    "w_capped_sessions",        # gap+cap sessionization fold
    "dq_skew_report",           # shuffle-key skew profile
    "llm_keywords_tfidf",       # per-doc top-k term salience
    "a_ltv_cumulative",         # cohort LTV running curve
    "w_funnel_within",          # time-boxed conversion metric
    "llm_phrase_search",        # positional-index adjacency join
    "j_bom_rollup",             # multiplicative pointer jumping
    "w_control_chart",          # SPC zone rules over daily series
    "a_survival_km",            # Kaplan-Meier product-limit fold
    "ml_gini_split",            # one-pass split-candidate contingencies
    "j_graph_2hop_recs",        # wedge join + anti-join + top-k
    "ml_roc_auc",               # rank-statistic AUC
    "a_changepoint_binseg",     # one-pass SSE split scoring
    "a_sequence_ab",            # first-occurrence ordering pairs
    "llm_e2e_prepare",          # fused corpus-prep pipeline DAG
    "ml_calibration_bins",      # reliability-diagram bins
    "ml_lift_gains",            # cumulative-gains / lift table
    "a_ddsketch_log2",          # log2-bucket mergeable quantile sketch
    "llm_preference_pairs",     # RLHF/DPO pair construction
    "llm_fim_transform",        # fill-in-middle PSM reorder
    "ml_target_encoding_loo",   # leakage-guarded target encoding
    "w_bollinger_bands",        # rolling-moment bands, exact decimals
    "a_runs_test",              # runs-count randomness z
    "j_skyline_pareto",         # 2D skyline in one sorted pass
    "a_lorenz_curve_points",    # exact-decimal concentration curve
    "a_price_index_laspeyres",  # integer-basket price indices
    "a_xyz_classification",     # demand-CV variability classes
    "a_wilson_ci",              # Wilson proportion intervals
    "a_dau_mau_stickiness",     # daily vs 30-day distinct ratio
    "dq_merkle_root",           # XOR digests + table root hash
    "o_global_ntile",           # shard id + running length, one bucketing
    "ml_ks_statistic",          # integer cross-multiplied KS distance
    "ml_pr_auc",                # average precision from global ranks
    "a_trimmed_mean",           # exact-rank 5% trimmed mean
    "a_weighted_percentiles_global",  # exact weighted p10/p50/p90 at fact grain
    "ml_mcc",                   # balanced-quality MCC from one count pass
    "llm_dedup_semantic",       # SemDeDup: cluster-blocked cosine prune
    "llm_shuffle_shards",       # exact-balance epoch shuffle shards
    "llm_chunk_fixed_overlap",  # map-side overlapping RAG chunking
    "ml_psi_drift",             # reference-binned drift report
    "ml_woe_encoding",          # WoE/IV categorical scoring
    "llm_dedup_containment",    # min-hash-bucketed containment pairs
    "ml_linreg_normal",         # one-pass OLS via exact-decimal Cramer
    "a_theil_sen_monthly",      # pairwise-median robust trend, calendar-bounded
    "w_rolling_corr",           # rolling Pearson from exact window moments
    "stream_rolling_corr_stateful",  # same stat, per-observation stateful fold
    "stream_bollinger_stateful",     # bands via the state-incremental fold
    "ml_kmeans_converged",      # frozen-quantizer serving pass (round 9)
    "llm_ann_ivf_trained",      # trained-IVF probe over frozen inverted lists
    "ml_spearman_corr",         # rank correlation, aggregate-first tie spans
    "ml_mutual_info",           # PMI/MI cell grid, quantized ln outputs
    "ml_kendall_tau",           # tau-b from exact pair-sign counts
    "ml_sprt_sequential",       # Wald SPRT early-stopping per day
    "llm_self_bleu",            # corpus-diversity BLEU-2 over doc pairs
    "llm_ann_ndcg",             # position-aware IVF ranking quality
    "a_seasonal_strength",      # dow-explained variance share, exact moments
    "a_hhi_concentration",      # squared-share market concentration
    "dq_l_diversity",           # sensitive-attribute uniformity audit
    "llm_dedup_tau_curve",      # jaccard-decile histogram for tau tuning
    "a_tail_risk_var_es",       # nearest-rank VaR95 + expected shortfall
    "a_neyman_allocation",      # variance-optimal stratified sample quotas
    "stream_capped_balance_stateful",  # token-bucket fold, one double of state
    "stream_markov_stateful",   # transition matrix from last-event state
    "llm_dedup_containment_g5", # 5-gram containment: the measured scale path
    "graph_kcore",              # fixed-depth k-core peel, lineage-cut rounds
    "o_file_skipping_stats",    # min/max manifest + planner skip verdicts
    "w_ohlc_resample",          # arg-min/max OHLC candles, window-free
    "llm_audio_silence_segments",  # frame-energy VAD + island merge
    "j_knn_grid_join",          # grid-ring kNN, WindowGroupLimit top-k
    "f_point_in_polygon",       # crossing-number ray cast, zero joins
    "o_manifest_prune",         # per-query pruning math over the manifest
    "a_geofence_dwell",         # spatial x ordered time attribution
    "a_tile_pyramid",           # coarse-from-fine multi-resolution rollup
    "j_polygon_grid_join",      # grid-blocked polygon-table containment join
    "ml_cuped_adjustment",      # CUPED variance-reduced A/B readout
    "ml_cuped_stratified",      # post-stratified CUPED, order-pinned fold
    "ml_srm_check",             # sample-ratio-mismatch chi-square guardrail
    "ml_diff_in_diff",          # 2x2 DiD estimator, one conditional agg
    "ml_group_sequential",      # interim-look z vs Pocock boundary
    "j_trajectory_fence_crossing",  # grid-blocked segment intersection join
    "a_hex_rollup",             # two-lattice hex binning, map-side assign
    "j_polygon_overlap_join",   # pure-expression polygon classification
    "ml_experiment_power",      # MDE planning readout per segment
    "a_hex_smoothing",          # hex-grid scatter-gather stencil smoothing
    "graph_label_propagation",  # synchronous LPA community detection
    "j_nearest_edge_join",      # point-to-segment distance argmin join
    "graph_connected_components",  # large-star/small-star CC histogram
    "dq_t_closeness",           # ordered-EMD privacy release gate
    "ml_permutation_test",      # deterministic-hash permutation test
    "ml_bootstrap_poisson_ci",  # Poisson-bootstrap 95% CI
    "ml_tost_equivalence",      # TOST equivalence readout per stratum
    "a_kde_epanechnikov",       # grid-blocked Epanechnikov KDE
    "graph_jaccard_linkpred",   # common-neighbor Jaccard link prediction
    "ml_auc_delong_ci",         # DeLong SE + 95% CI for the exact AUC
    "a_esd_outliers",           # sequential max-deviate outlier trimming
    "llm_sample_reservoir",     # A-ES weighted reservoir sample
    "stream_reservoir_stateful",  # per-shard stateful A-ES reservoir replay
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from banksy_spark.session import get_spark, release_caches
    from banksy_spark.suite import REGISTRY

    spark = get_spark("banksy-bench")

    def run(name: str) -> float:
        # clear cached plans so run #2 re-executes for real — without this
        # the persist()-ing fuzzy-dedup queries would measure cache reads
        release_caches(spark)
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # Warm-up: JVM/codegen/parquet-footer caches.
    REGISTRY["a_grouped_sum"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Best of two genuine runs per query (one-shot numbers carry ±30%
    # noise from JIT/IO warmup on local mode), with an adaptive THIRD
    # run when the first two disagree by >1.4x: round-10 measured that
    # host-load spikes can double a single run's time for a random
    # subset of queries (two back-to-back full benches each produced a
    # DIFFERENT set of >2x outliers vs round 9, min-combined geomean
    # 1.07 with none >1.7x) — one retry collapses exactly those.
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        a, b = run(name), run(name)
        if max(a, b) > 1.4 * min(a, b):
            a = min(a, run(name))
        per_query[name] = round(min(a, b), 3)

    total = round(sum(per_query.values()), 3)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    full = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "runs_per_query": 2,
        "sf": sf,
        "cpus": cpus,
    }
    # Full per-query detail first (the builder's BENCH_local_* records
    # capture this line verbatim) ...
    print(json.dumps(full))
    # ... and to a file (r14, VERDICT r13 item 1): the driver keeps only
    # the last ~2000 chars of stdout, which front-truncates the ~9KB
    # per-query line — PERF_r13 came back with an empty per_query block.
    # BENCH_perquery.json carries the full dict per run; the committed
    # copy is the round's record. Methodology (what is timed, how many
    # runs, min-combining) is unchanged.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_perquery.json"), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout still carries the full line
    # Self-computed round-over-round signal for the driver's tail window:
    # geomean of per-query time ratios vs the previous round's committed
    # record (BENCH_perquery_prev.json, pinned at each round close), only
    # over same-cpu-count runs so the 8-cpu scaling run is not compared
    # against a 32-cpu record.
    geomean_vs_prev, n_common = None, 0
    try:
        with open(os.path.join(here, "BENCH_perquery_prev.json")) as f:
            prev = json.load(f)
        if str(prev.get("cpus")) == cpus and prev.get("sf") == sf:
            import math

            ratios = [
                per_query[q] / p
                for q, p in prev["queries"].items()
                if q in per_query and p > 0 and per_query[q] > 0
            ]
            n_common = len(ratios)
            if ratios:
                geomean_vs_prev = round(
                    math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3
                )
    except (OSError, ValueError, KeyError):
        pass
    # The compact summary stays the FINAL line: <~400 chars, always
    # parses inside the driver's 2000-char tail. The 5 slowest queries
    # and the geomean ride along as the per-query signal.
    slowest = dict(
        sorted(per_query.items(), key=lambda kv: -kv[1])[:5]
    )
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries_count": len(per_query),
                "slowest5": slowest,
                "geomean_vs_prev": geomean_vs_prev,
                "n_common_vs_prev": n_common,
                "runs_per_query": 2,
                "sf": sf,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
