"""Randomized differential fuzzing: Spark query vs DuckDB oracle over
GENERATED tables, not the shipped fixtures.

The standing three-SF sweep proves oracle parity on the driver's fixed
seed-42 testdata; this module proves the parity is a property of the
OPERATORS, not of one dataset. Each regime writes a fresh set of the
ten standard tables (exact parquet physical types: int32/int64/double/
timestamp[us]/list<float>) into a tmp dir from an adversarial random
generator, then replays a cross-family query subset through the SAME
value-canonicalizer as tools/check.py (order-insensitive sha256 over
repr-canonical rows, columns sorted by name — the driver's comparison
semantics).

Regimes target the failure modes a fixed fixture can't exercise:
  - ties      : coarse value grids (duplicate money values, second-grid
                timestamps, skewed user_ids) → every rank/median/argmax
                tie-break and window ORDER BY gets real collisions
  - sparse    : tiny tables, single-row groups, customers with no
                orders, orders with no lineitems → empty-group and
                missing-key boundaries
  - advtext   : exact-dup / near-dup / single-token / repeated-shingle
                documents → dedup + shingle edge cases

The generator preserves the testdata's schema contract (TESTDATA.md):
referential integrity, enum domains, 2-decimal money (exact in both
engines' doubles), n_chars == len(text), and the same calendar ranges
(several queries carry fixture-calendar date literals — random dates
stay inside the same windows so those predicates stay non-trivially
selective rather than degenerate).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from check import TABLES, table_digest  # noqa: E402  (tools/check.py)

_EPOCH_EVENTS = datetime.datetime(2024, 1, 1)
_EPOCH_ORDERS = datetime.datetime(1995, 1, 1)

_WORDS = (
    "the fast key order sort table scan merge part window small hash "
    "join data slow filter customer line batch value row query group "
    "spark index range cache disk"
).split()
# the unicode regime swaps in multibyte scripts: CJK (3-byte UTF-8),
# Cyrillic and accented Latin (2-byte), an astral-plane emoji (4-byte,
# a surrogate PAIR in the JVM's UTF-16), and a decomposed combining
# sequence ("e" + U+0301) — the classes where code-point vs code-unit
# vs grapheme disagreements between engines would surface in length(),
# substring, split and binary collation
_WORDS_UNICODE = _WORDS[:10] + [
    "héllo", "naïve", "café", "ñandú", "Ωmega", "straße",
    "москва", "данные", "東京", "データ", "漢字",
    "🚀rocket", "🎯", "étoile", "ﬁligree", "Ａｂｃ",
]
_ADJ = ["new", "cold", "red", "blue", "old", "hot", "large", "small"]
_NOUN = ["gizmo", "widget", "bolt", "plate", "rod", "ring", "gear", "anvil"]
_PTYPE = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "MEDIUM", "PROMO"]
_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_SEG = ["MACHINERY", "HOUSEHOLD", "FURNITURE", "BUILDING", "AUTOMOBILE"]
_ETYPE = ["signup", "click", "error", "view", "purchase"]
_REGION = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _money(rng: np.random.RandomState, n: int, grid: int, lo_c: int, hi_c: int):
    """2-decimal money drawn from a `grid`-sized cent set: small grids
    force heavy exact-value ties (the rank/median trap)."""
    cents = rng.choice(rng.randint(lo_c, hi_c, size=grid), size=n)
    return (cents / 100.0).round(2)


def _ts(rng, n, epoch, span_days, grid_sec):
    off = rng.randint(0, span_days * 86400 // grid_sec, size=n) * grid_sec
    return np.array(
        [epoch + datetime.timedelta(seconds=int(s)) for s in off],
        dtype="datetime64[us]",
    )


def _docs(rng: np.random.RandomState, n: int, regime: str):
    words = _WORDS_UNICODE if regime == "unicode" else _WORDS
    texts: list[str] = []
    for i in range(n):
        if regime == "unicode":
            # same shape mix as advtext (dups, near-dups, short docs)
            # but over the multibyte vocabulary
            kind = i % 4
            if kind == 0:
                texts.append(" ".join(rng.choice(words, rng.randint(10, 40))))
            elif kind == 1:
                texts.append(texts[-1])  # exact duplicate
            elif kind == 2:
                texts.append(texts[-2] + " " + str(rng.choice(words)))
            else:
                texts.append(" ".join(rng.choice(words, rng.randint(2, 6))))
        elif regime == "advtext":
            kind = i % 6
            if kind == 0:  # normal
                texts.append(" ".join(rng.choice(_WORDS, rng.randint(10, 40))))
            elif kind == 1:  # exact duplicate of the previous normal doc
                texts.append(texts[-1])
            elif kind == 2:  # near-dup: one word appended
                texts.append(texts[-2] + " " + str(rng.choice(_WORDS)))
            elif kind == 3:  # all-same-token (one distinct shingle)
                texts.append(" ".join([str(rng.choice(_WORDS))] * rng.randint(5, 20)))
            elif kind == 4:  # below the 3-token shingle threshold
                texts.append(" ".join(rng.choice(_WORDS, rng.randint(1, 3))))
            else:  # alternating pattern: few distinct shingles, long doc
                a, b = rng.choice(_WORDS, 2, replace=False)
                texts.append(" ".join([a, b] * rng.randint(6, 15)))
        else:
            texts.append(" ".join(rng.choice(_WORDS, rng.randint(10, 60))))
    langs = rng.choice(["en", "es", "de", "fr", "zh"], size=n, p=[0.8, 0.05, 0.05, 0.05, 0.05])
    return texts, langs


def generate_tables(out_dir: Path, seed: int, regime: str) -> None:
    rng = np.random.RandomState(seed)
    sparse = regime == "sparse"
    grid = 12 if regime == "ties" else 4000
    C = 6 if sparse else 120
    S = 4 if sparse else 30
    P = 5 if sparse else 80
    O = 10 if sparse else 400
    L = 14 if sparse else 1600
    E = 12 if sparse else 900
    D = 8 if sparse else 120
    V = 6 if sparse else 150

    def w(name: str, cols: dict, schema: pa.Schema) -> None:
        pq.write_table(
            pa.table({k: pa.array(v, type=schema.field(k).type) for k, v in cols.items()}),
            out_dir / f"{name}.parquet",
        )

    w(
        "region",
        {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": _REGION},
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    NN = 6 if sparse else 25
    w(
        "nation",
        {
            "n_nationkey": np.arange(NN, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(NN)],
            "n_regionkey": rng.randint(0, 5, NN).astype(np.int32),
        },
        pa.schema(
            [("n_nationkey", pa.int32()), ("n_name", pa.string()), ("n_regionkey", pa.int32())]
        ),
    )
    w(
        "customer",
        {
            "c_custkey": np.arange(C, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(C)],
            "c_nationkey": rng.randint(0, NN, C).astype(np.int32),
            "c_acctbal": _money(rng, C, grid, -90000, 999000),
            "c_mktsegment": rng.choice(_SEG, C),
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    w(
        "supplier",
        {
            "s_suppkey": np.arange(S, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(S)],
            "s_nationkey": rng.randint(0, NN, S).astype(np.int32),
            "s_acctbal": _money(rng, S, grid, -90000, 999000),
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )
    w(
        "part",
        {
            "p_partkey": np.arange(P, dtype=np.int64),
            "p_name": [f"{rng.choice(_ADJ)} {rng.choice(_NOUN)}" for _ in range(P)],
            "p_brand": [f"Brand#{rng.randint(1, 26)}" for _ in range(P)],
            "p_type": rng.choice(_PTYPE, P),
            "p_size": rng.randint(1, 51, P).astype(np.int32),
            "p_retailprice": _money(rng, P, grid, 90000, 10500000),
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )
    # orders: leave the TOP customer keys order-less (Q22-idle shape)
    o_cust = rng.randint(0, max(C - 2, 1), O).astype(np.int64)
    o_date = _ts(rng, O, _EPOCH_ORDERS, 2400, 86400)
    w(
        "orders",
        {
            "o_orderkey": np.arange(O, dtype=np.int64),
            "o_custkey": o_cust,
            "o_orderstatus": rng.choice(["O", "F", "P"], O),
            "o_totalprice": _money(rng, O, grid, 90000, 10500000),
            "o_orderdate": o_date,
            "o_orderpriority": rng.choice(_PRIO, O),
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    # lineitem: ship AFTER the parent order date; last orderkey has no lines
    l_ord = rng.randint(0, max(O - 1, 1), L).astype(np.int64)
    ship = np.array(
        [
            o_date[k] + np.timedelta64(int(d) * 86400 + int(s), "s")
            for k, d, s in zip(
                l_ord, rng.randint(1, 120, L), rng.randint(0, 2, L) * 43200
            )
        ],
        dtype="datetime64[us]",
    )
    w(
        "lineitem",
        {
            "l_orderkey": l_ord,
            "l_partkey": rng.randint(0, P, L).astype(np.int64),
            "l_suppkey": rng.randint(0, S, L).astype(np.int64),
            "l_linenumber": rng.randint(1, 8, L).astype(np.int32),
            "l_quantity": rng.randint(1, 51, L).astype(np.float64),
            "l_extendedprice": _money(rng, L, grid, 90000, 10500000),
            "l_discount": rng.randint(0, 11, L) / 100.0,
            "l_tax": rng.randint(0, 9, L) / 100.0,
            "l_returnflag": rng.choice(["A", "N", "R"], L),
            "l_linestatus": rng.choice(["O", "F"], L),
            "l_shipdate": ship,
        },
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )
    # events: skewed users + second-grid ts so same-user same-ts ties occur
    n_users = 3 if sparse else 40
    uids = rng.zipf(1.7, E) % n_users if regime == "ties" else rng.randint(0, n_users, E)
    w(
        "events",
        {
            "event_id": np.arange(E, dtype=np.int64),
            "ts": _ts(rng, E, _EPOCH_EVENTS, 30, 60 if regime == "ties" else 1),
            "user_id": uids.astype(np.int64),
            "event_type": rng.choice(_ETYPE, E),
            "value": _money(rng, E, grid, 1, 33000),
            "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, E)],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    texts, langs = _docs(rng, D, regime)
    w(
        "documents",
        {
            "doc_id": np.arange(D, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": [f"src{rng.randint(0, 20)}" for _ in range(D)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    # embeddings: 1/8-grid floats (exact in float32), no zero vectors
    emb = rng.randint(-8, 9, size=(V, 64)).astype(np.float32) / 8.0
    emb[np.abs(emb).sum(axis=1) == 0, 0] = 1.0
    w(
        "embeddings",
        {
            "vec_id": np.arange(V, dtype=np.int64),
            "embedding": [row for row in emb],
            "label": rng.randint(0, 10, V).astype(np.int32),
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )


# Cross-family subset: exact-rank statistics (tie-sensitive), windows
# over skewed/tied event times, dedup + shingle families (text edge
# cases), an as-of join, and grouped aggregates. Heavier iterative /
# trained / sketch queries are excluded on runtime grounds — their
# parity is covered by the three-SF sweep and their own property tests.
FUZZ_QUERIES = [
    "a_grouped_sum",
    "a_grouped_mode",
    "a_exact_median",
    "a_exact_percentiles",
    "a_trimmed_mean",
    "a_weighted_median",
    "a_largest_remainder",
    "a_runs_test",
    "ml_quantile_binning",
    "w_interval_merge",
    "w_capped_running_sum",
    "w_forward_fill",
    "stream_markov_transitions",
    "j_asof_nearest",
    "llm_dedup_exact",
    "llm_dedup_ngram_jaccard",
    "llm_token_count",
    "llm_fingerprint",
    # widened set: interpolation/rank boundaries, window shapes over
    # tied timestamps, hash-split determinism, funnels/cohorts
    "a_interpolated_percentiles",
    "a_weighted_percentiles_global",
    "a_histogram_quantiles",
    "a_grouped_count",
    "a_topn_others_rollup",
    "a_wilson_ci",
    "a_mann_kendall_trend",
    "a_autocorr_lag1",
    "a_sequence_ab",
    "a_new_vs_returning",
    "a_bounce_rate",
    "a_retention_cohorts",
    "ml_winsorize",
    "ml_target_encoding_loo",
    "ml_confusion_metrics",
    "w_rolling_median_7",
    "w_max_drawdown",
    "w_peak_detection",
    "w_lead_lag_delta",
    "w_scd2_intervals",
    "stream_sessionize",
    "j_interval_overlap",
    "llm_dedup_normalized",
    "llm_text_stats",
    "llm_sample_by_hash",
    "llm_split_assign",
    # TPC-H shapes: date-literal predicates stay meaningful because the
    # generator keeps the fixture calendar; random keys exercise the
    # empty-group and no-match sides of every join
    "a_q1_pricing_summary",
    "a_q4_priority_exists",
    "a_q6_forecast_revenue",
    "a_q12_late_shipments",
    "a_q13_order_distribution",
    "a_q14_promo_share",
    "a_q16_supplier_variety",
    "a_q18_having_semijoin",
    "a_q22_idle_customers",
    "j_q3_shipping_priority",
    "j_q5_regional_volume",
    "j_q10_returned_items",
    "j_q19_disjunctive_pred",
    "a_decorrelated_avg",
    "j_decorrelated_exists",
    # dedup / similarity / retrieval on degenerate random corpora
    "llm_simhash",
    "llm_dedup_minhash_lsh",
    "llm_dedup_spans",
    "llm_quality_score",
    "llm_langid",
    "llm_keywords_tfidf",
    "llm_term_freq",
    "llm_bm25_topk",
    "llm_decontam_overlap",
    "llm_ann_bruteforce",
    "llm_embed_near_dup",
    # dq + graph on random key structure
    "dq_constraint_report",
    "dq_k_anonymity",
    "dq_skew_report",
    "graph_degree_histogram",
    "graph_triangle_count",
    # regression pin: native session_window merges at delta == gap
    # (boundary-INCLUSIVE) — only the minute-grid regimes produce
    # exact-gap deltas, which is how the sweep caught the >= oracle
    "stream_session_window_native",
    # regression pins: bigram builders crashed on single-token docs
    # (Spark sequence(1, 0) is the descending [1, 0]); advtext's 1-2
    # token documents are the trigger
    "llm_dsir_importance",
    "llm_lm_fluency",
    "llm_pmi_cooc",
    # regression pin: recall truth set must cover INDEXABLE (>=3 token)
    # docs only on BOTH engines — a 2-token doc has a 2-gram truth
    # shingle set but no 3-gram signature (seed-777 advtext find)
    "llm_dedup_lsh_recall",
    # round-11/12 families: market-data resample on tie-heavy streams,
    # storage manifests on random key layouts, spatial crossing tests /
    # grid blocking on random coordinates, exact-DECIMAL pyramid sums,
    # integer-microsecond dwell arithmetic over random timestamps
    "w_ohlc_resample",
    "o_file_skipping_stats",
    "o_manifest_prune",
    "j_knn_grid_join",
    "f_point_in_polygon",
    "j_polygon_grid_join",
    "a_geofence_dwell",
    "a_tile_pyramid",
    # exact-integer-moment CUPED: sparse regimes exercise the
    # zero-variance theta=0 CASE guard
    "ml_cuped_adjustment",
    # round-13 experimentation family: hand-rolled chi2/z/theta
    # arithmetic with empty-arm and zero-variance NULL/CASE guards the
    # sparse regime exercises; the order-pinned stratified fold must
    # stay bit-exact under every data shape
    "ml_cuped_stratified",
    "ml_srm_check",
    "ml_diff_in_diff",
    "ml_group_sequential",
    # round-13 spatial: strict cross-product predicate + grid blocking
    # on random coordinates, two-lattice hex argmin on random points
    "j_trajectory_fence_crossing",
    "a_hex_rollup",
    "a_hex_smoothing",
    "j_polygon_overlap_join",
    "ml_experiment_power",
    # round-13 second batch: integer vote recurrence + clamped-projection
    # distance argmin, both exact-parity on random data
    "graph_label_propagation",
    "j_nearest_edge_join",
    # round-13 third batch: star-contraction CC vs the recursive-CTE
    # closure on random edge structure; deterministic hash-resampling
    # (the draws are data-independent, only the cents vary); ordered
    # EMD + Welch TOST CASE guards under sparse/tie regimes; quantized
    # KDE scatter on random coordinates
    "graph_connected_components",
    "dq_t_closeness",
    "ml_permutation_test",
    "ml_bootstrap_poisson_ci",
    "ml_tost_equivalence",
    "a_kde_epanechnikov",
    # round-13 fourth batch: wedge-join Jaccard on random edges; the
    # doubled-midrank DeLong algebra under tie-heavy regimes; the
    # refit-remove ESD recurrence with n<=2 guards on sparse days;
    # the transcendental-free A-ES key on random doc lengths
    "graph_jaccard_linkpred",
    "ml_auc_delong_ci",
    "a_esd_outliers",
    "llm_sample_reservoir",
    "stream_reservoir_stateful",
    # round-13 widening (r12 verdict item 7): hand-rolled statistics
    # whose arithmetic was previously covered only by the offline
    # fuzz_sweep — rank/concordance machinery on tie-heavy regimes,
    # ordered folds, quantile/changepoint selection, and the
    # transcendental-output families whose oracles quantize
    "ml_spearman_corr",
    "ml_kendall_tau",
    "a_theil_sen_monthly",
    "a_chi2_contingency",
    "a_tail_risk_var_es",
    "w_holt_linear",
    "w_cusum_changepoint",
    "a_changepoint_binseg",
    "ml_sprt_sequential",
    "ml_linreg_normal",
    "w_rolling_corr",
    "a_skew_kurtosis",
]

_REGIMES = [
    ("ties", 101),
    ("ties", 202),
    ("sparse", 303),
    ("advtext", 404),
    ("unicode", 505),
]


@pytest.fixture(scope="module", params=[f"{r}-{s}" for r, s in _REGIMES])
def fuzz_dir(request, tmp_path_factory):
    regime, seed = request.param.rsplit("-", 1)
    d = tmp_path_factory.mktemp(f"fuzz_{request.param}")
    generate_tables(d, int(seed), regime)
    return str(d)


def _duck_digest(con, sql):
    cur = con.execute(sql)
    cols = [c[0] for c in cur.description]
    return cols, table_digest(cols, cur.fetchall())


def _spark_digest(df):
    cols = df.columns
    return cols, table_digest(cols, [list(r) for r in df.collect()])


def test_fuzzed_tables_match_fixture_schemas(fuzz_dir, spark):
    """The generator's output must be schema-identical to the shipped
    fixtures — otherwise a parity pass here wouldn't transfer."""
    for t in TABLES:
        a = spark.read.parquet(f"{fuzz_dir}/{t}.parquet").schema
        b = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").schema
        assert a == b, f"{t}: {a} != {b}"


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_differential_oracle_parity_on_random_tables(fuzz_dir, spark, name):
    import duckdb

    from banksy_spark.suite import REGISTRY

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_dir}/{t}.parquet'"
            )
        s_cols, (s_n, s_hash, s_lines) = _spark_digest(
            REGISTRY[name].fn(spark, fuzz_dir)
        )
        d_cols, (d_n, d_hash, d_lines) = _duck_digest(con, REGISTRY[name].oracle)
        assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
        assert s_n == d_n, f"{name}: rows {s_n} != {d_n}"
        if s_hash != d_hash:
            diff_a = [x for x in s_lines if x not in set(d_lines)][:3]
            diff_b = [x for x in d_lines if x not in set(s_lines)][:3]
            raise AssertionError(
                f"{name}: value hash mismatch\n spark-only: {diff_a}\n duck-only: {diff_b}"
            )
    finally:
        con.close()
