#!/usr/bin/env python
"""Measured ×10 scale-up: wall-clock ratio per headline family between
the shipped sf0.1 fixtures and the replica-scaled ~sf1 set built by
tools/make_sf1.py (10 key-remapped copies; dims fixed — the TPC-H
scaling model).

The question this answers with data instead of argument: when the
input grows 10×, does each operator's wall grow ~linearly (shuffle- and
scan-bound, the shape that survives 100 TB) or super-linearly
(something quadratic or coordination-bound is hiding)? On local[32]
the ratio also absorbs fixed per-query overhead, so small queries show
ratios BELOW the data ratio; what matters is that nothing material
exceeds it.

Text/embedding *similarity* families are excluded by design: replicas
are exact twins, so dedup pair counts grow quadratically in K by
construction of the dataset, not by any property of the operator —
their scale curves are measured properly (Heaps-law corpora) in
SCALE.md via tools/bench_simjoin_scale.py.

    python tools/make_sf1.py            # once
    python tools/bench_scaleup.py       # prints one JSON line per query + summary
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

QUERIES = [
    # scan + agg
    "a_grouped_sum",
    "a_q1_pricing_summary",
    "a_q13_order_distribution",
    "a_salted_sum",
    "a_heavy_hitters_cms",
    # joins
    "j_q3_shipping_priority",
    "j_q5_regional_volume",
    "a_q9_product_profit",
    "a_decorrelated_avg",
    "j_decorrelated_exists",
    "j_salted_skew_join",
    "j_basket_lift",
    # windows / ordinals / rank statistics
    "j_window_not_selfjoin",
    "w_rolling_range",
    "stream_sessionize",
    "stream_rollup_multigrain",
    "a_exact_median",
    "o_global_ntile",
    "ml_roc_auc",
    "a_rfm_segmentation",
    "a_retention_cohorts",
    "llm_sample_pps",
    "a_mad_outliers",
    "o_file_skipping_stats",
    "w_ohlc_resample",
    "f_point_in_polygon",
    "o_manifest_prune",
    "a_geofence_dwell",
    "a_tile_pyramid",
    "j_polygon_grid_join",
    "ml_cuped_adjustment",
    "ml_cuped_stratified",
    "ml_srm_check",
    "ml_diff_in_diff",
    "ml_group_sequential",
    "j_trajectory_fence_crossing",
    "a_hex_rollup",
    "a_hex_smoothing",
    "graph_label_propagation",
    "j_nearest_edge_join",
    "j_polygon_overlap_join",
    "ml_experiment_power",
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
    # iterative graph
    "graph_pagerank",
    "graph_kcore",
    # embeddings (non-similarity)
    "llm_ann_bruteforce",
    "llm_ann_ivf",
    "llm_embed_quantize_int8",
]

SMALL = os.environ.get("SCALEUP_SMALL", "/root/testdata/sf0.1")
BIG = os.environ.get("SCALEUP_BIG", "/root/repo/.scratch/sf1r")


def main() -> None:
    from banksy_spark.session import get_spark, release_caches
    from banksy_spark.suite import REGISTRY

    names = sys.argv[1:] or QUERIES  # optional subset, e.g. the x30 trend run

    spark = get_spark("banksy-scaleup")

    def run(name: str, sf_dir: str) -> float:
        release_caches(spark)
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    # warm-up both directions
    run("a_grouped_sum", SMALL)
    run("a_grouped_sum", BIG)

    out: dict[str, dict[str, float]] = {}
    for name in names:
        t_small = min(run(name, SMALL), run(name, SMALL))
        t_big = min(run(name, BIG), run(name, BIG))
        out[name] = {
            "sf0.1_s": round(t_small, 2),
            "sf1_s": round(t_big, 2),
            "ratio": round(t_big / t_small, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)

    ratios = [v["ratio"] for v in out.values()]
    gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    print(
        json.dumps(
            {
                "metric": "scaleup_x10",
                "geomean_ratio": round(gm, 2),
                "max_ratio": max(ratios),
                "max_query": max(out, key=lambda k: out[k]["ratio"]),
                "n_queries": len(out),
            }
        )
    )


if __name__ == "__main__":
    main()
