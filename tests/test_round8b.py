"""Independent recomputation contracts for the round-8b statistics.

The DuckDB oracles pin Spark==DuckDB; these tests pin both against a
THIRD implementation (numpy/pandas over the same collected points), so
a shared algebra mistake in the twin SQL/DataFrame formulas can't slip
through as a matching pair of wrong answers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(spark, name, sf=SF):
    from banksy_spark.suite import REGISTRY

    return REGISTRY[name].fn(spark, sf)


# --- ml_linreg_normal -------------------------------------------------------


def test_linreg_normal_matches_numpy_lstsq(spark):
    got = {r["brand"]: r for r in _q(spark, "ml_linreg_normal").collect()}
    assert len(got) == 25
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet")
    pts = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(
            "p_brand",
            F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("x1"),
            F.round("l_quantity", 0).cast("bigint").alias("x2"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("y"),
        )
        .toPandas()
    )
    for brand, g in pts.groupby("p_brand"):
        X = np.column_stack(
            [np.ones(len(g)), g.x1.to_numpy(float), g.x2.to_numpy(float)]
        )
        beta = np.linalg.lstsq(X, g.y.to_numpy(float), rcond=None)[0]
        r = got[brand]
        assert r["n"] == len(g)
        np.testing.assert_allclose(
            [r["beta0"], r["beta1"], r["beta2"]], beta, rtol=1e-8
        )


def test_linreg_normal_single_aggregate_plan(spark):
    plan = _q(spark, "ml_linreg_normal")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one shuffle: the brand-grain aggregate exchange (plus AQE reads)
    assert plan.count("Exchange hashpartitioning") == 1


# --- a_theil_sen_monthly ----------------------------------------------------


def test_theil_sen_matches_numpy_pairwise_median(spark):
    got = {
        (r["brand"], r["mon"]): r
        for r in _q(spark, "a_theil_sen_monthly").collect()
    }
    assert got, "empty result"
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet")
    daily = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .filter(F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#3"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "mon"
            ),
            F.dayofmonth("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint")).alias("q"),
            F.count(F.lit(1)).alias("c"),
        )
        .toPandas()
    )
    n_checked = 0
    for (brand, mon), g in daily.groupby(["brand", "mon"]):
        g = g.sort_values("d")
        d = g.d.to_numpy(float)
        ybar = g.q.to_numpy(float) / g.c.to_numpy(float)
        slopes = [
            (ybar[j] - ybar[i]) / (d[j] - d[i])
            for i in range(len(d))
            for j in range(i + 1, len(d))
        ]
        if not slopes:
            assert (brand, mon) not in got
            continue
        r = got[(brand, mon)]
        assert r["n_pairs"] == len(slopes)
        # lower median = element at index (n+1)//2 - 1 of the sorted list
        lower_med = sorted(slopes)[(len(slopes) + 1) // 2 - 1]
        np.testing.assert_allclose(r["ts_slope"], lower_med, rtol=1e-9)
        n_checked += 1
    assert n_checked >= 10


# --- w_rolling_corr ---------------------------------------------------------


def test_rolling_corr_matches_pandas(spark):
    res = _q(spark, "w_rolling_corr").toPandas()
    assert len(res) > 0
    finite = res.corr7.dropna()
    assert ((finite <= 1.0) & (finite >= -1.0)).all()
    for brand, g in res.groupby("brand"):
        g = g.sort_values("day").reset_index(drop=True)
        # rebuild the full daily series: the query drops rn < 7 rows, so
        # recompute from the parquet side for the first brand only
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        pt = spark.read.parquet(f"{SF}/part.parquet")
        daily = (
            li.join(pt, li.l_partkey == pt.p_partkey)
            .filter(F.col("p_brand") == brand)
            .groupBy(F.col("l_shipdate").cast("date").alias("day"))
            .agg(
                F.sum(F.round("l_quantity", 0).cast("bigint")).alias("x"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                ).alias("y"),
            )
            .toPandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        ref = daily.x.rolling(7).corr(daily.y)
        ref_by_day = dict(zip(daily.day, ref))
        for _, r in g.iterrows():
            expect = ref_by_day[r["day"]]
            if np.isnan(expect):
                assert r["corr7"] is None or np.isnan(r["corr7"])
            else:
                np.testing.assert_allclose(r["corr7"], expect, rtol=1e-9)
        break  # one brand is enough for the cross-check


def test_rolling_corr_single_window_pass(spark):
    plan = _q(spark, "w_rolling_corr")._jdf.queryExecution().executedPlan().toString()
    # all five moments + rn ride window passes over the DAILY grain (no
    # fact-sized window, no self-join): the only join is the broadcast
    # part-dim join, and the brand partitioning is computed once
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") <= 2
    assert plan.count("Exchange hashpartitioning") <= 2


# --- ml_spearman_corr -------------------------------------------------------


def test_spearman_matches_pandas(spark):
    row = _q(spark, "ml_spearman_corr").collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pdf = li.select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    ).dropna().toPandas()
    assert row["n"] == len(pdf)
    # tie-averaged ranks + Pearson — the textbook definition, computed
    # by a third implementation (pandas average ranks, numpy corrcoef;
    # pandas' method="spearman" itself would require scipy)
    rx = pdf.x.rank(method="average").to_numpy(float)
    ry = pdf.y.rank(method="average").to_numpy(float)
    expect = np.corrcoef(rx, ry)[0, 1]
    np.testing.assert_allclose(row["rho"], expect, rtol=1e-9)


def test_spearman_no_fact_window(spark):
    plan = (
        _q(spark, "ml_spearman_corr")._jdf.queryExecution().executedPlan().toString()
    )
    # the fact never enters a window: every Window node the ordinal
    # machinery emits is bucket-partitioned (audited globally in
    # PLANS.md); here just pin that no global single-partition exchange
    # feeds a Window
    assert "Exchange SinglePartition" not in plan.split("AdaptiveSparkPlan")[0] or (
        "Window" not in plan
    )
    assert "CartesianProduct" not in plan


# --- ml_mutual_info ---------------------------------------------------------


def test_mutual_info_matches_numpy(spark):
    rows = _q(spark, "ml_mutual_info").collect()
    assert len(rows) == 25
    li = spark.read.parquet(f"{SF}/orders.parquet")
    cu = spark.read.parquet(f"{SF}/customer.parquet")
    pdf = li.join(cu, li.o_custkey == cu.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
    ).toPandas()
    n = len(pdf)
    joint = pdf.groupby(["seg", "pri"]).size()
    ni = pdf.groupby("seg").size()
    nj = pdf.groupby("pri").size()
    total_mi = 0.0
    for r in rows:
        nij = joint[(r["seg"], r["pri"])]
        assert r["nij"] == nij
        pmi = np.log(n * nij / (ni[r["seg"]] * nj[r["pri"]]))
        np.testing.assert_allclose(r["pmi"], pmi, atol=2e-12)
        np.testing.assert_allclose(r["mi_term"], (nij / n) * pmi, atol=2e-12)
        total_mi += r["mi_term"]
    # MI >= 0 (within the 12-decimal quantization of its 25 terms)
    assert total_mi >= -25e-12


# --- ml_kendall_tau ---------------------------------------------------------


def test_kendall_tau_matches_numpy(spark):
    rows = {r["brand"]: r for r in _q(spark, "ml_kendall_tau").collect()}
    assert len(rows) == 3
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet")
    daily = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .filter(F.col("p_brand") == "Brand#11")
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint")).alias("x"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("y"),
        )
        .toPandas()
    )
    x = daily.x.to_numpy(np.int64)
    y = daily.y.to_numpy(np.int64)
    n = len(x)
    dx = np.sign(x[None, :] - x[:, None])
    dy = np.sign(y[None, :] - y[:, None])
    iu = np.triu_indices(n, 1)
    s = dx[iu] * dy[iu]
    nc, nd = int((s > 0).sum()), int((s < 0).sum())
    n0 = n * (n - 1) // 2
    n1 = int((dx[iu] == 0).sum())
    n2 = int((dy[iu] == 0).sum())
    tau = (nc - nd) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    r = rows["Brand#11"]
    assert (r["n0"], r["nc"], r["nd"]) == (n0, nc, nd)
    np.testing.assert_allclose(r["tau_b"], tau, rtol=1e-12)


# --- ml_sprt_sequential -----------------------------------------------------


def test_sprt_matches_python_replay(spark):
    import math

    rows = {r["day"]: r for r in _q(spark, "ml_sprt_sequential").collect()}
    assert rows
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            "event_id",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("p"),
        )
        .toPandas()
    )
    l1 = math.log(0.25 / 0.15)
    l0 = math.log(0.75 / 0.85)
    a = math.log(0.95 / 0.05)
    b = math.log(0.05 / 0.95)
    ev["day"] = ev.ts.dt.date
    n_decided = 0
    for day, g in ev.groupby("day"):
        g = g.sort_values(["ts", "event_id"])
        k = 0
        n_dec = llr_dec = None
        for n, p in enumerate(g.p, start=1):
            k += p
            llr = k * l1 + (n - k) * l0
            if n_dec is None and (llr >= a or llr <= b):
                n_dec, llr_dec = n, llr
        r = rows[day]
        assert r["n_trials"] == len(g) and r["n_success"] == k
        if n_dec is None:
            assert r["decision"] == "continue" and r["n_at_decision"] is None
        else:
            assert r["n_at_decision"] == n_dec
            np.testing.assert_allclose(r["llr_at_decision"], llr_dec, rtol=1e-12)
            assert r["decision"] == ("accept_h1" if llr_dec >= a else "accept_h0")
            n_decided += 1
    assert n_decided >= 5  # the 20% true rate decides most days


# --- llm_self_bleu ----------------------------------------------------------


def test_self_bleu_matches_python_replay(spark):
    import math
    from collections import Counter

    rows = {r["doc_id"]: r for r in _q(spark, "llm_self_bleu").collect()}
    assert rows
    docs = {
        r["doc_id"]: (r["lang"], r["text"].split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    # rebuild the consecutive-by-lang pairing
    by_lang: dict = {}
    for did in sorted(docs):
        by_lang.setdefault(docs[did][0], []).append(did)
    n_checked = 0
    for lang, ids in by_lang.items():
        for a_id, b_id in zip(ids, ids[1:]):
            wa, wb = docs[a_id][1], docs[b_id][1]
            r = rows[a_id]
            assert r["ref_id"] == b_id
            assert (r["n_tok"], r["r_tok"]) == (len(wa), len(wb))
            c1 = sum(
                min(c, Counter(wb)[g]) for g, c in Counter(wa).items()
            )
            big = lambda w: [f"{x} {y}" for x, y in zip(w, w[1:])]
            c2 = sum(
                min(c, Counter(big(wb))[g])
                for g, c in Counter(big(wa)).items()
            )
            assert (r["clip1"], r["clip2"]) == (c1, c2)
            if c1 > 0 and c2 > 0:
                bp = (
                    1.0
                    if len(wa) >= len(wb)
                    else math.exp(1.0 - len(wb) / len(wa))
                )
                bleu = bp * math.sqrt(
                    (c1 / len(wa)) * (c2 / (len(wa) - 1))
                )
                np.testing.assert_allclose(r["bleu2"], bleu, atol=1e-11)
            else:
                assert r["bleu2"] == 0.0
            n_checked += 1
            if n_checked >= 60:
                break
        if n_checked >= 60:
            break
    assert n_checked >= 60


# --- llm_ann_ndcg -----------------------------------------------------------


def test_ndcg_matches_python_replay(spark):
    import math

    got = {r["qid"]: r for r in _q(spark, "llm_ann_ndcg").collect()}
    assert got
    from banksy_spark.suite.llm import llm_ann_bruteforce, llm_ann_ivf

    bf = (
        llm_ann_bruteforce(spark, SF)
        .filter(F.col("rnk") <= 3)
        .select("qid", "neighbor_id", "rnk")
        .collect()
    )
    ivf = llm_ann_ivf(spark, SF).select("qid", "neighbor_id", "rnk").collect()
    truth = {}
    for r in bf:
        truth.setdefault(r.qid, {})[r.neighbor_id] = 4 - r.rnk
    d = [1.0, 1.0 / math.log2(3.0), 0.5]
    for qid, r in got.items():
        rels = {x.rnk: truth[qid].get(x.neighbor_id, 0) for x in ivf if x.qid == qid}
        expect_r = [rels.get(i, 0) for i in (1, 2, 3)]
        assert [r["r1"], r["r2"], r["r3"]] == expect_r
        dcg = sum(g * di for g, di in zip(expect_r, d))
        tgrades = sorted(truth[qid].values(), reverse=True) + [0, 0, 0]
        idcg = sum(g * di for g, di in zip(tgrades[:3], d))
        np.testing.assert_allclose(r["dcg"], dcg, rtol=1e-12)
        np.testing.assert_allclose(r["ndcg"], dcg / idcg, rtol=1e-12)
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-12


def test_ndcg_perfect_when_recall_perfect_and_ordered(spark):
    """On the clustered fixture (tools/clustered_embeddings), where
    single-probe IVF achieves recall 1.0 on most queries, any query
    whose retrieved set AND order equal the truth must score ndcg=1."""
    got = _q(spark, "llm_ann_ndcg").collect()
    perfect = [r for r in got if (r["r1"], r["r2"], r["r3"]) == (3, 2, 1)]
    for r in perfect:
        np.testing.assert_allclose(r["ndcg"], 1.0, rtol=1e-12)


# --- a_seasonal_strength ----------------------------------------------------


def test_seasonal_strength_matches_pandas(spark):
    rows = {r["event_type"]: r for r in _q(spark, "a_seasonal_strength").collect()}
    assert len(rows) == 5
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev.ts.dt.date
    ev["cents"] = (ev.value * 100).round().astype("int64")
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index(name="x")
    )
    daily["dow"] = pd.to_datetime(daily.day).dt.dayofweek  # Mon=0 (any labeling works)
    for et, g in daily.groupby("event_type"):
        x = g.x.to_numpy(float)
        ss_tot = ((x - x.mean()) ** 2).sum()
        ss_resid = sum(
            ((gg.x.to_numpy(float) - gg.x.to_numpy(float).mean()) ** 2).sum()
            for _, gg in g.groupby("dow")
        )
        r = rows[et]
        assert r["n_days"] == len(g)
        np.testing.assert_allclose(r["ss_total"], ss_tot, rtol=1e-9)
        np.testing.assert_allclose(r["ss_resid"], ss_resid, rtol=1e-9)
        np.testing.assert_allclose(
            r["seasonal_strength"], 1 - ss_resid / ss_tot, rtol=1e-9
        )
        assert r["seasonal_strength"] <= 1.0 + 1e-12


# --- a_hhi_concentration / dq_l_diversity -----------------------------------


def test_hhi_matches_numpy(spark):
    rows = {r["nation"]: r for r in _q(spark, "a_hhi_concentration").collect()}
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    su = spark.read.parquet(f"{SF}/supplier.parquet")
    rev = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .select(
            F.col("s_nationkey").alias("nation"),
            "l_suppkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            ).cast("bigint").alias("cents"),
        )
        .groupBy("nation", "l_suppkey")
        .agg(F.sum("cents").alias("r"))
        .toPandas()
    )
    for nation, g in rev.groupby("nation"):
        shares = g.r.to_numpy(float) / g.r.sum()
        r = rows[nation]
        assert r["n_suppliers"] == len(g)
        np.testing.assert_allclose(r["hhi"], (shares**2).sum(), rtol=1e-9)
        assert 1.0 / len(g) - 1e-12 <= r["hhi"] <= 1.0 + 1e-12


def test_l_diversity_flags_uniform_groups_only(spark):
    out = _q(spark, "dq_l_diversity").toPandas()
    assert (out.l_distinct < 2).all()
    # every flagged group is uniform: re-derive one group and confirm
    c = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    c["bucket"] = np.floor(c.c_acctbal / 1000)
    c["sens"] = np.where(c.c_acctbal < 0, "delinquent", "current")
    g = c.groupby(["c_nationkey", "c_mktsegment", "bucket"]).sens.nunique()
    want_flagged = int((g < 2).sum())
    assert len(out) == want_flagged


# --- llm_dedup_tau_curve / a_tail_risk_var_es -------------------------------


def test_tau_curve_consistent_with_jaccard_pairs(spark):
    curve = {r["bucket"]: r["n_pairs"] for r in _q(spark, "llm_dedup_tau_curve").collect()}
    assert curve and all(0 <= b <= 10 for b in curve)
    from banksy_spark.suite.llm import llm_dedup_ngram_jaccard

    jac = llm_dedup_ngram_jaccard(spark, SF).collect()
    # the >= 0.1 jaccard pairs must equal the bucket>=1 mass of the curve
    assert sum(n for b, n in curve.items() if b >= 1) == len(jac)


def test_tail_risk_matches_numpy(spark):
    import math

    rows = {r["pri"]: r for r in _q(spark, "a_tail_risk_var_es").collect()}
    assert len(rows) == 5
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    ).toPandas()
    for pri, g in o.groupby("o_orderpriority"):
        x = np.sort(g.cents.to_numpy(np.int64))
        n = len(x)
        k = math.ceil(n / 20)
        tail = x[n - k:]
        r = rows[pri]
        assert (r["n"], r["k"]) == (n, k)
        assert r["var95_cents"] == tail.min()
        np.testing.assert_allclose(r["es95_cents"], tail.mean(), rtol=1e-12)
        assert r["es95_cents"] >= r["var95_cents"]


# --- a_neyman_allocation ----------------------------------------------------


def test_neyman_allocation_matches_numpy(spark):
    rows = {r["flag"]: r for r in _q(spark, "a_neyman_allocation").collect()}
    assert set(rows) == {"A", "N", "R"}
    assert sum(r["alloc"] for r in rows.values()) == 1000
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("c"),
    ).toPandas()
    w = {}
    for flag, g in li.groupby("l_returnflag"):
        x = g.c.to_numpy(float)
        s = x.std(ddof=1)
        r = rows[flag]
        assert r["n_pop"] == len(g)
        np.testing.assert_allclose(r["s_h"], s, rtol=1e-9)
        w[flag] = len(g) * s
    shares = {f: 1000 * v / sum(w.values()) for f, v in w.items()}
    base = {f: int(np.floor(v)) for f, v in shares.items()}
    leftover = 1000 - sum(base.values())
    order = sorted(shares, key=lambda f: (-(shares[f] - base[f]), f))
    for i, f in enumerate(order):
        expect = base[f] + (1 if i < leftover else 0)
        assert rows[f]["alloc"] == expect, f
