"""Pre-committed driver-window rotation plan (round-8 verdict item 2).

The driver verifies the FIRST 50 registry entries each round
(suite/__init__.py `_FRONT`). This module pins the NEXT two windows by
name so rotating is a copy-paste, and tests/test_contract.py asserts
the plan stays consistent with the live registry and the verified
union (no typos, no wasted slots, full coverage by round 11).

Ordering within each window is by residual risk, same discipline as
rounds 8-9: hand-rolled arithmetic and stateful/iterative operators
first, mechanical shapes last.

Pre-validation (round 9 close): every R10 AND R11 name passes the
vanilla-ANSI driver-simulation probe (tools/ansi_check.py, sf0.01 —
50/50 and 48/48) in addition to the standing tuned-session sweeps —
the remaining rotations carry no session-config risk.

Re-validation (round 10 close): all 50 R11 names re-passed the
vanilla-ANSI driver-simulation probe under the POST-round-10 code
(brier string-routing, PPJoin alpha derivation, registry reorder) —
50/50 at sf0.01 — so the final rotation still carries no
session-config or code-drift risk.

Round-11 drift note: the two R11 names whose implementations changed
AFTER the rotation was applied (llm_sample_pps — fixed-bucket prefix
rewrite; j_basket_lift — in-plan pair-exchange sizing) were
individually re-passed through the vanilla-ANSI probe and the
three-SF sweep under the changed code before commit.

Round-13 execution state: R13 below IS the live _FRONT window
(rotate.py --apply ran as round 13's first command, per the round-12
verdict). The 11 round-13-born queries sit in R14 with the 50-name
R14_RECHECK_FILL behind them; window_r14() is the next rotation once
CORRECTNESS_r13.json lands.

Round-10 execution state: R10 below IS the live _FRONT window
(tests/test_contract.py pins the equality), with two adjustments vs
the round-9 plan: ml_brier_score re-enters first (round 9's single
red row — driver HUGEINT hash rendering on a >int64 DECIMAL output,
value-exact, now string-routed) and ml_zscore_scaling moves to R11.
R11 is the final window: after it lands, union(CORRECTNESS_r*) covers
the entire 322-name registry.
"""

# Round 10: the 50 riskiest never-driver-verified queries left after
# the round-9 window lands — the newly literal-centroid-oracled
# trainers and round-9 additions first (their oracles are new), then
# multimodal decoders, converged iterative ops, sketches, streaming
# twins, temporal joins, CDC, and the remaining hand-rolled statistics.
R10 = [
    # round-9 red-row re-entry: driver HUGEINT hash-rendering on a
    # >int64 DECIMAL output, adjudicated value-exact, now string-routed
    # (suite/round8.py) — must show a green row in CORRECTNESS_r10
    "ml_brier_score",
    # newly-oracled / new this round
    "ml_kmeans_converged",
    "llm_ann_ivf_trained",
    "stream_rolling_corr_stateful",
    "j_similarity_ppjoin_pos",
    # multimodal Arrow decode paths
    "llm_audio_frames",
    "llm_image_patches",
    "llm_video_keyframes",
    # converged iterative operators
    "j_ancestry_converged",
    "graph_bfs_converged",
    "graph_bfs_distance",
    # sketches
    "a_heavy_hitters_cms",
    "llm_kmv_algebra",
    "llm_distinct_sketch_hll",
    "a_bitmap_distinct",
    # streaming-semantics twins
    "stream_markov_transitions",
    "stream_attribution",
    "stream_top_paths",
    "stream_interval_left_join",
    "stream_hopping_window",
    "stream_session_window_native",
    "stream_funnel_steps",
    # temporal / interval / spatial joins
    "j_asof_tolerance",
    "j_interval_overlap",
    "j_spatial_grid_join",
    "j_temporal_scd2_lookup",
    # CDC family
    "llm_cdc_chunks",
    "llm_dedup_cdc",
    "o_cdc_merge_apply",
    # windows / SCD2 / rank
    "w_rank_family",
    "w_scd2_intervals",
    "w_distinct_over_window",
    "w_ewma",
    "w_time_weighted_avg",
    "w_capped_running_sum",
    "w_rolling_range",
    # ANN variants
    "llm_ann_pq",
    "llm_ann_recall_pq",
    "llm_ann_ivf_multiprobe",
    "llm_ann_recall_multiprobe",
    # skew / bloom join machinery
    "j_salted_skew_join",
    "j_bloom_prune_join",
    # dedup / decontam / retrieval
    "llm_dedup_incremental",
    "llm_dedup_lsh_recall",
    "llm_dedup_spans",
    "llm_decontam_overlap",
    "llm_bm25_topk",
    # hand-rolled statistics
    "a_mad_outliers",
    "a_histogram_quantiles",
    # round-9-close stateful twin (new oracle — verify first)
    "stream_bollinger_stateful",
]

# Round 11: the tail — everything never driver-verified after R10.
R11 = [
    # displaced from R10 by the ml_brier_score re-entry (mechanical
    # shape, lowest residual risk of the planned 50)
    "ml_zscore_scaling",
    "a_retention_cohorts",
    "llm_quality_repetition",
    "llm_domain_mix",
    "llm_rank_fusion",
    "a_decorrelated_avg",
    "llm_mix_temperature",
    "j_decorrelated_exists",
    "o_zorder_key",
    "llm_chunk_overlap",
    "llm_bpe_pairs",
    "llm_quality_classifier",
    "llm_dsir_importance",
    "llm_lm_fluency",
    "llm_pmi_cooc",
    "llm_embed_feature_hash",
    "llm_tokenize_ids",
    "w_gap_fill_resample",
    "llm_sample_pps",
    "a_incremental_view",
    "j_argmin_supplier",
    "o_compaction_plan",
    "llm_epoch_shuffle",
    "llm_bpe_merges",
    "f_array_hof",
    "f_null_semantics",
    "j_hierarchy_unroll",
    "o_snapshot_diff",
    "a_seasonal_anomaly",
    "w_activity_streaks",
    "llm_langid_trained",
    "j_basket_pairs",
    "a_topn_others_rollup",
    "o_union_evolved",
    "a_yoy_growth",
    "llm_span_corruption",
    "llm_boundary_overlap",
    "w_gap_alerts",
    "a_rolling_dau_7d",
    "llm_boilerplate_ngrams",
    "a_ship_latency_pct",
    "j_basket_lift",
    "dq_partition_checksum",
    "graph_degree_histogram",
    "a_dow_hour_grid",
    "dq_k_anonymity",
    "llm_e2e_prepare",
    "a_xyz_classification",
    "a_dau_mau_stickiness",
    "dq_merkle_root",
]


# Round 12+: post-plan additions. The R10/R11 plan retires the original
# 322-name backlog; queries registered AFTER the plan was cut queue
# here and rotate into the window once R11 lands (they are pytest- and
# sweep-verified meanwhile). tests/test_contract.py includes R12 in the
# every-query-has-a-window coverage check. Round-11-born queries are
# APPENDED here as they are registered, so the R12 window closes the
# driver gap completely (union == registry at the R12 boundary).
R12 = [
    # round-10 streaming twins (stream==batch bit-exact pytests +
    # window-form oracles)
    "stream_capped_balance_stateful",
    "stream_markov_stateful",
    # round-10 containment scale path (measured: near-linear candidates
    # in both vocabulary regimes, SCALE.md round-10 section)
    "llm_dedup_containment_g5",
    # round-10 iterative-graph addition (fixed-depth peel, proven
    # fixpoint budget)
    "graph_kcore",
    # round-11 additions (suite/round11.py)
    "o_file_skipping_stats",
    "w_ohlc_resample",
    "llm_audio_silence_segments",
    "j_knn_grid_join",
    # round-12 re-entry: only red driver row ever (R11 — the driver's
    # pandas canonicalizer crashed on its ARRAY<DOUBLE> head3 column).
    # Rewritten round 12 with scalar head_1..head_3 outputs in both
    # engines; re-probed at three SFs + ANSI. RECHECK convention
    # (tools/backlog.py:12-14): red-only names re-enter the next window.
    "f_array_hof",
    # round-12 additions (suite/round12.py), registered before the R12
    # driver run — appended so the gap-closing window verifies them too
    "f_point_in_polygon",
    "o_manifest_prune",
    "a_geofence_dwell",
    "a_tile_pyramid",
    "j_polygon_grid_join",
    "ml_cuped_adjustment",
]

# Re-check fill for the round-12 window: _FRONT must stay at 50 names
# (the driver samples the FIRST 50 registry entries and
# tests/test_contract.py pins the length), but R12 holds only the
# post-plan additions. The balance re-verifies the highest-residual-risk
# ALREADY-verified names — hand-rolled arithmetic, trained/frozen
# oracles, stateful twins, and the iterative graph ops — so the final
# window spends its spare slots where a regression would matter most.
# Order: riskiest first, same discipline as R8–R11. window_r12() takes
# fill names from the TOP of this list, so post-plan additions shrink
# the fill from the bottom (lowest-risk re-checks drop first).
R12_RECHECK_FILL = [
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
    "a_histogram_quantiles",
    "llm_dsir_importance",
    "llm_lm_fluency",
    "llm_pmi_cooc",
    "llm_sample_pps",
    "llm_e2e_prepare",
    "w_scd2_intervals",
    "o_cdc_merge_apply",
    "llm_corpus_clean",
    "llm_dedup_semantic",
    "j_basket_lift",
]


# Round 13: pre-committed PURE RE-CHECK window (the R12 gap-closing
# window completes driver coverage of the full registry, so R13 spends
# all 50 slots on the highest-residual-risk names NOT already re-checked
# inside window_r12()). Risk ranking, same discipline as R8-R12:
# (1) the seven R12_RECHECK_FILL names the 50-slot cap squeezed out of
#     the live R12 window (they were already risk-ranked);
# (2) similarity/dedup variants whose only green rows date to r3-r9;
# (3) gram-builder queries in the round-10 fuzz-defect class;
# (4) global-ordinal / exact-rank machinery (holistic aggregates);
# (5) hand-rolled statistics with transcendental/quantization hazards;
# (6) ordered folds (list_reduce oracles) and remaining streaming twins;
# (7) iterative graph + storage-layer queries.
# Round-12-born queries all sit in the live R12 window, so none repeat
# here. tools/rotate.py applies this once CORRECTNESS_r12.json lands.
# Pre-validation (round 12 close): all 50 R13 names passed the
# vanilla-ANSI driver-simulation probe (tools/ansi_check.py, 50/50)
# under the final round-12 code — the rotation carries no
# session-config risk.
R13 = [
    # (1) squeezed-out R12 fill
    "llm_sample_pps",
    "llm_e2e_prepare",
    "w_scd2_intervals",
    "o_cdc_merge_apply",
    "llm_corpus_clean",
    "llm_dedup_semantic",
    "j_basket_lift",
    # (2) similarity / dedup variants
    "llm_dedup_minhash_lsh",
    "llm_dedup_containment",
    "llm_dedup_containment_k3",
    "llm_dedup_ngram_jaccard",
    "llm_simhash",
    "llm_embed_near_dup",
    "llm_dedup_tau_curve",
    "llm_ann_recall",
    "llm_ann_ndcg",
    # (3) gram builders (round-10 fuzz-defect class)
    "llm_bpe_pairs",
    "llm_bpe_merges",
    "llm_self_bleu",
    "llm_boilerplate_ngrams",
    # (4) global ordinals / exact ranks
    "o_global_rownum",
    "o_global_ntile",
    "a_exact_median",
    "a_exact_percentiles",
    "a_weighted_percentiles_global",
    "a_interpolated_percentiles",
    # (5) hand-rolled statistics
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
    # (6) ordered folds + streaming twins
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
    # (7) iterative graph + storage
    "graph_triangle_count",
    "o_compaction_plan",
    "o_zorder_key",
]


def window_r12():
    """The concrete 50-name round-12 window: every post-plan addition
    (R12, never driver-verified) first, then the highest-risk re-checks
    from R12_RECHECK_FILL, deduplicated, truncated to 50. If R12 ever
    outgrows 50 on its own, the window is its first 50 and a later
    window carries the rest."""
    window = list(R12)
    for name in R12_RECHECK_FILL:
        if len(window) >= 50:
            break
        if name not in window:
            window.append(name)
    return window[:50]


# Round 14: the pending window for ROUND-13-BORN queries. R13 is a
# pure re-check window with zero slack (exactly 50 pre-committed
# names), so anything registered during round 13 must be appended HERE
# at registration time — never left windowless (the rounds-10/11
# "never-windowed backlog" pattern; round-12 verdict item 2 for round
# 13). tests/test_contract.py enforces that every registry name absent
# from the driver-verified union sits in this list.
R14 = [
    # round-13 registrations (suite/round13.py): experimentation family
    # (stratified CUPED, SRM, DiD, group-sequential, power) + spatial
    # third round (trajectory-fence crossing, hex rollup + smoothing,
    # polygon-polygon overlap)
    "ml_cuped_stratified",
    "ml_srm_check",
    "ml_diff_in_diff",
    "ml_group_sequential",
    "j_trajectory_fence_crossing",
    "a_hex_rollup",
    "j_polygon_overlap_join",
    "ml_experiment_power",
    "a_hex_smoothing",
    # second batch (suite/round13b.py): graph + spatial
    "graph_label_propagation",
    "j_nearest_edge_join",
    # third batch (suite/round13c.py): CC, privacy, resampling, KDE
    "graph_connected_components",
    "dq_t_closeness",
    "ml_permutation_test",
    "ml_bootstrap_poisson_ci",
    "ml_tost_equivalence",
    "a_kde_epanechnikov",
    # fourth batch (suite/round13d.py): linkpred, DeLong, ESD, A-ES
    "graph_jaccard_linkpred",
    "ml_auc_delong_ci",
    "a_esd_outliers",
    "llm_sample_reservoir",
    "stream_reservoir_stateful",
]

# Re-check fill for the round-14 window: _FRONT must stay at 50 names
# (the driver verifies exactly the first 50 registry entries), so the
# slots R14 doesn't consume go to the highest-residual-risk re-checks
# NOT already covered by window_r12() or R13. Risk ranking, same
# discipline as R8-R13: (1) hand-rolled statistics with
# transcendental / quantization / tie hazards whose last green rows
# date to r7-r9; (2) ANN / dedup / text-scoring variants in the same
# staleness band; (3) ordered folds and interval/window machinery;
# (4) streaming-semantics twins; (5) storage-layer checksums and
# incremental-view arithmetic.
R14_RECHECK_FILL = [
    # (0) r14-optimization-round restructures + the four touched-but-
    # never-driver-windowed queries from VERDICT r13 item 5. A query
    # whose physical plan changed THIS round is the highest residual
    # risk by definition — the independent oracle re-check is the bar
    # the optimization round is graded against. Restructured queries
    # that sat in the R12 or R13 windows (w_* folds, semantic,
    # minhash_lsh, corpus_clean, ngram_jaccard, tau_curve,
    # basket_lift, triangle_count, prefix/ppjoin, incremental,
    # lsh_recall, spans, dedup_cdc, pagerank) are EXCLUDED by the
    # no-repeat contract rules; their post-change verification
    # is the builder's three-SF oracle sweep recorded in
    # OPTIMIZATION_r14.md.
    "llm_dedup_canonical",
    "a_q1_pricing_summary",
    "a_q14_promo_share",
    "llm_dsir_importance",
    "llm_dedup_clusters",
    "j_basket_pairs",
    "dq_constraint_report",
    "a_xyz_classification",
    "a_ols_slope",
    # (1) hand-rolled statistics, r7-r9 last-green
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
    "ml_target_encoding_loo",
    "ml_woe_encoding",
    "a_price_index_laspeyres",
    "a_hhi_concentration",
    # (2) ANN / dedup / text scoring
    "llm_ann_bruteforce",
    "llm_ann_lsh_bucketed",
    "llm_dedup_clusters",
    "llm_fingerprint",
    "llm_dsir_importance",
    "llm_pmi_cooc",
    "llm_lm_fluency",
    "llm_keywords_tfidf",
    # (3) ordered folds / interval machinery
    "w_rolling_median_7",
    "w_peak_detection",
    "w_interval_merge",
    "w_linear_interpolate",
    "w_time_weighted_avg",
    "w_capped_running_sum",
    # (4) streaming twins
    "stream_late_rows_audit",
    "stream_dedup_earliest",
    # (5) storage layer / incremental view
    "dq_merkle_root",
    "dq_partition_checksum",
    "o_snapshot_diff",
    "a_incremental_view",
    # (6) tail: quantile/binning machinery, r7 last-green — present so
    # the fill alone covers 50 slots even before R14 gains names; the
    # tail drops automatically as round-13-born queries take the front
    "a_lorenz_curve_points",
    "a_pareto_8020",
    "j_skyline_pareto",
    "ml_calibration_bins",
    "ml_quantile_binning",
    "ml_winsorize",
]


def window_r14():
    """The concrete 50-name round-14 window: every round-13-born query
    (R14, never driver-verified) first, then the highest-risk re-checks
    from R14_RECHECK_FILL, deduplicated, truncated to 50. If R14 ever
    outgrows 50 on its own, the window is its first 50 and a later
    window carries the rest."""
    window = list(R14)
    for name in R14_RECHECK_FILL:
        if len(window) >= 50:
            break
        if name not in window:
            window.append(name)
    return window[:50]
