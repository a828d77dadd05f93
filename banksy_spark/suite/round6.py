"""Round-6 batch 1: queries built ON the reusable global-ordinal
operator (operators/ordinals.py) — rank statistics and ordered-scan
artifacts whose naive forms are single-partition windows, expressed
here with every window partitioned.

- o_global_ntile: the operator's public demo — global row number,
  NTILE shard AND exact running length in ONE bucketing, proven
  against the naive-window oracle (o_global_rownum's big sibling).
- ml_ks_statistic: two-sample Kolmogorov-Smirnov D between the score
  CDFs of positive/negative orders, cross-multiplied to stay integer.
- ml_pr_auc: average precision (PR-AUC, step interpolation) from
  global ranks — integer-scaled precision terms so both engines sum
  identical integers.
- a_trimmed_mean: 5%-trimmed mean by exact global rank bounds.

Parity rules as registry.py: exact DECIMAL/integer arithmetic until
one final division; every computed column aliased identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.operators.ordinals import global_ordinals
from banksy_spark.suite.registry import T, query

# --- global ntile / running length over a string sort key ------------------


@query(
    "o_global_ntile",
    oracle="""
    WITH d AS (
      SELECT doc_id, md5(text) AS sk, length(text) AS len FROM documents
    )
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY sk, doc_id) AS global_rn,
           NTILE(7) OVER (ORDER BY sk, doc_id) AS shard,
           CAST(SUM(len) OVER (ORDER BY sk, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT)
             AS cum_len
    FROM d
    """,
    note="Global shard assignment + running byte budget in one pass: "
    "documents ordered by content hash get a stable global ordinal, a "
    "7-way NTILE shard id, and the exact running text length (the "
    "running total a packed-shard writer consumes). The string sort "
    "key rides the ordinal operator through a numeric monotone prefix "
    "(first 4 hex digits as an integer) prepended to the order spec — "
    "same total order, numeric range bucketing; rn, tile and the "
    "integer cumsum all come from ONE bucketing with partitioned "
    "windows only. The oracle is the naive global-window form, proving "
    "the decomposition exact end-to-end (o_global_rownum's pattern, "
    "now through the reusable operator).",
)
def o_global_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("sk"),
        F.length("text").alias("len"),
    ).withColumn(
        "skp", F.expr("CAST(conv(substring(sk, 1, 4), 16, 10) AS BIGINT)")
    )
    out = global_ordinals(
        d,
        ["skp", "sk", "doc_id"],
        row_number="global_rn",
        ntile=(7, "shard"),
        cumsum=[("len", "cum_len")],
    )
    return out.select(
        "doc_id",
        "global_rn",
        F.col("shard").cast("bigint").alias("shard"),
        "cum_len",
    )


# --- two-sample Kolmogorov-Smirnov -----------------------------------------


@query(
    "ml_ks_statistic",
    oracle="""
    WITH s AS (
      SELECT o_totalprice AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (
      SELECT score, SUM(y) AS p, COUNT(*) - SUM(y) AS q
      FROM s GROUP BY 1
    ),
    c AS (
      SELECT SUM(p) OVER (ORDER BY score
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cp,
             SUM(q) OVER (ORDER BY score
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cq,
             SUM(p) OVER () AS np, SUM(q) OVER () AS nq
      FROM g
    )
    SELECT CAST(MAX(np) AS BIGINT) AS n_pos,
           CAST(MAX(nq) AS BIGINT) AS n_neg,
           CAST(MAX(ABS(cp * nq - cq * np)) AS BIGINT) AS d_scaled,
           CAST(MAX(ABS(cp * nq - cq * np)) AS DOUBLE)
             / (CAST(MAX(np) AS DOUBLE) * MAX(nq)) AS ks_d
    FROM c
    """,
    note="Two-sample Kolmogorov-Smirnov statistic: D = max over score "
    "thresholds of |CDF_pos - CDF_neg|, the scale-free separation "
    "measure next to ml_roc_auc. Scores collapse to distinct-value "
    "grain first (one exchange), then BOTH running counts ride one "
    "ordinal bucketing (integer cumsums, grand totals as literals); "
    "the CDF difference is cross-multiplied (cp*nq - cq*np) so the max "
    "is over exact integers — one final division. No single-partition "
    "window at any grain (the naive form sorts all distinct scores "
    "through one task; distinct-score count scales with the fact).",
)
def ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = s.groupBy("score").agg(
        F.sum("y").alias("p"),
        (F.count(F.lit(1)) - F.sum("y")).alias("q"),
    )
    c = global_ordinals(
        g,
        ["score"],
        cumsum=[("p", "cp"), ("q", "cq")],
        totals=[("p", "np"), ("q", "nq")],
    )
    d_scaled = F.abs(F.col("cp") * F.col("nq") - F.col("cq") * F.col("np"))
    return c.agg(
        F.max("np").alias("n_pos"),
        F.max("nq").alias("n_neg"),
        F.max(d_scaled).alias("d_scaled"),
        (
            F.max(d_scaled).cast("double")
            / (F.max("np").cast("double") * F.max("nq"))
        ).alias("ks_d"),
    )


# --- average precision (PR-AUC, step interpolation) ------------------------

_AP_SCALE = 1_000_000_000_000  # 1e12: precision terms as exact integers


@query(
    "ml_pr_auc",
    oracle=f"""
    WITH s AS (
      SELECT o_orderkey,
             o_totalprice AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    r AS (
      SELECT y,
             ROW_NUMBER() OVER (ORDER BY score DESC, o_orderkey) AS rn,
             SUM(y) OVER (ORDER BY score DESC, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos,
             SUM(y) OVER () AS np
      FROM s
    )
    SELECT CAST(MAX(np) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN y = 1 THEN (cum_pos * {_AP_SCALE}) // rn
                         ELSE 0 END) AS BIGINT) AS ap_scaled,
           CAST(SUM(CASE WHEN y = 1 THEN (cum_pos * {_AP_SCALE}) // rn
                         ELSE 0 END) AS DOUBLE)
             / (CAST(MAX(np) AS DOUBLE) * {_AP_SCALE}) AS avg_precision
    FROM r
    """,
    note="Average precision (area under the PR curve, step "
    "interpolation): AP = mean over positives of precision@rank. The "
    "global best-first rank AND the running positive count come from "
    "one ordinal bucketing; each precision term is floor-scaled to an "
    "integer (cum_pos*1e12 DIV rn) so both engines sum IDENTICAL "
    "integers — float summation order never enters. The class-"
    "imbalance-honest companion to ml_roc_auc built on the same "
    "machinery.",
)
def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    r = global_ordinals(
        s,
        ["-score", "o_orderkey"],
        row_number="rn",
        cumsum=[("y", "cum_pos")],
        totals=[("y", "np")],
    )
    term = F.expr(f"CASE WHEN y = 1 THEN (cum_pos * {_AP_SCALE}) DIV rn ELSE 0 END")
    return r.agg(
        F.max("np").alias("n_pos"),
        F.sum(term).alias("ap_scaled"),
        (
            F.sum(term).cast("double")
            / (F.max("np").cast("double") * F.lit(float(_AP_SCALE)))
        ).alias("avg_precision"),
    )


# --- trimmed mean -----------------------------------------------------------


@query(
    "a_trimmed_mean",
    oracle="""
    WITH r AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price_d,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    )
    SELECT COUNT(*) AS n_kept,
           MAX(n) - COUNT(*) AS n_trimmed,
           CAST(CAST(SUM(price_d) AS VARCHAR) AS DOUBLE) / COUNT(*)
             AS trimmed_mean
    FROM r
    WHERE rn > n // 20 AND rn <= n - n // 20
    """,
    note="5%-trimmed mean of order prices: exact global ranks bound "
    "the kept middle (rn in (N/20, N - N/20], integer division — no "
    "approximate percentile cutoffs, so the kept SET is identical "
    "across engines), then one exact DECIMAL sum and a single "
    "division. Rank and total count come from the ordinal operator "
    "(partitioned windows + literal N); the robust-location companion "
    "to a_mad_outliers that quantile-sketch trimming cannot make "
    "bit-reproducible.",
)
def a_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_d"),
    )
    r = global_ordinals(
        o,
        ["o_totalprice", "o_orderkey"],
        row_number="rn",
        total_count="n",
    )
    lo = F.floor(F.col("n") / 20)
    kept = r.filter((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        (F.max("n") - F.count(F.lit(1))).alias("n_trimmed"),
        (
            F.sum("price_d").cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("trimmed_mean"),
    )


# --- exact global weighted percentiles -------------------------------------


@query(
    "a_weighted_percentiles_global",
    oracle="""
    WITH w AS (
      SELECT CAST(l_quantity AS BIGINT) AS wt,
             l_extendedprice AS v, l_orderkey, l_linenumber
      FROM lineitem
    ),
    c AS (
      SELECT v, wt,
             SUM(wt) OVER (ORDER BY v, l_orderkey, l_linenumber, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumw,
             SUM(wt) OVER () AS tw
      FROM w
    )
    SELECT CAST(MAX(tw) AS BIGINT) AS total_weight,
           MAX(CASE WHEN 10 * cumw >= tw AND 10 * (cumw - wt) < tw
                    THEN v END) AS p10,
           MAX(CASE WHEN 2 * cumw >= tw AND 2 * (cumw - wt) < tw
                    THEN v END) AS p50,
           MAX(CASE WHEN 10 * cumw >= 9 * tw AND 10 * (cumw - wt) < 9 * tw
                    THEN v END) AS p90
    FROM c
    """,
    note="Exact GLOBAL weighted percentiles (price weighted by shipped "
    "quantity) at fact-table grain: the crossing row for each quantile "
    "is the first whose running weight reaches q*W — both conditions "
    "cross-multiplied integers, so the selected rows are identical "
    "across engines (the grouped twin is a_weighted_median; quantile "
    "SKETCHES bound error, this is the zero-error answer). The running "
    "weight rides the ordinal operator's bucketed integer cumsum with "
    "the grand total as a literal — no single-partition window over "
    "the 600k-row (6B-at-scale) fact. One final 3-value aggregate.",
)
def a_weighted_percentiles_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("wt"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    c = global_ordinals(
        w,
        ["v", "l_orderkey", "l_linenumber", "wt"],
        cumsum=[("wt", "cumw")],
        totals=[("wt", "tw")],
    )
    cumw, wt, tw, v = F.col("cumw"), F.col("wt"), F.col("tw"), F.col("v")
    return c.agg(
        F.max(tw).alias("total_weight"),
        F.max(F.when((10 * cumw >= tw) & (10 * (cumw - wt) < tw), v)).alias("p10"),
        F.max(F.when((2 * cumw >= tw) & (2 * (cumw - wt) < tw), v)).alias("p50"),
        F.max(
            F.when((10 * cumw >= 9 * tw) & (10 * (cumw - wt) < 9 * tw), v)
        ).alias("p90"),
    )


# --- Matthews correlation / Cohen's kappa ----------------------------------

_CONF_ORACLE_CTE = """
    WITH scored AS (
      SELECT len(string_split(text, ' ')) >= 40 AS pred,
             lang = 'en' AS label
      FROM documents
    ),
    c AS (
      SELECT
        CAST(SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
             AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END)
             AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END)
             AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END)
             AS BIGINT) AS tn
      FROM scored
    )
"""


def _conf_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select(
        (F.size(F.split("text", " ")) >= 40).alias("pred"),
        (F.col("lang") == "en").alias("label"),
    )
    p, l = F.col("pred"), F.col("label")
    return d.agg(
        F.sum(F.when(p & l, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(p & ~l, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~p & l, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~p & ~l, 1).otherwise(0)).alias("tn"),
    )


@query(
    "ml_mcc",
    oracle=_CONF_ORACLE_CTE
    + """
    SELECT tp, fp, fn, tn,
           tp * tn - fp * fn AS mcc_num,
           CAST(tp * tn - fp * fn AS DOUBLE)
             / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                    * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))
             AS mcc
    FROM c
    """,
    note="Matthews correlation coefficient of the frozen length "
    "classifier vs the language label — the single balanced-quality "
    "number precision/recall can't give on skewed classes "
    "(ml_confusion_metrics' companion). Numerator stays an exact "
    "integer; the denominator's four marginals are cast to DOUBLE "
    "before multiplying (their product overflows BIGINT at corpus "
    "scale) and sqrt is IEEE correctly-rounded in both engines, so "
    "the whole expression is bit-stable. One conditional-count "
    "aggregate pass; scale-free.",
)
def ml_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _conf_counts(spark, sf_dir)
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    num = tp * tn - fp * fn
    den = F.sqrt(
        (tp + fp).cast("double")
        * (tp + fn).cast("double")
        * (tn + fp).cast("double")
        * (tn + fn).cast("double")
    )
    return c.select(
        "tp", "fp", "fn", "tn",
        num.alias("mcc_num"),
        (num.cast("double") / den).alias("mcc"),
    )


@query(
    "ml_cohen_kappa",
    oracle=_CONF_ORACLE_CTE
    + """
    SELECT tp, fp, fn, tn,
           (tp + fp + fn + tn) * (tp + tn)
             - ((tp + fp) * (tp + fn) + (tn + fp) * (tn + fn))
             AS kappa_num,
           (tp + fp + fn + tn) * (tp + fp + fn + tn)
             - ((tp + fp) * (tp + fn) + (tn + fp) * (tn + fn))
             AS kappa_den,
           CAST((tp + fp + fn + tn) * (tp + tn)
                - ((tp + fp) * (tp + fn) + (tn + fp) * (tn + fn)) AS DOUBLE)
             / ((tp + fp + fn + tn) * (tp + fp + fn + tn)
                - ((tp + fp) * (tp + fn) + (tn + fp) * (tn + fn)))
             AS kappa
    FROM c
    """,
    note="Cohen's kappa (chance-corrected agreement) between the "
    "length classifier and the language label: kappa = (po - pe)/(1 - "
    "pe) cross-multiplied by N^2 so numerator and denominator are "
    "EXACT integers (N*(tp+tn) - sum of marginal products) — one final "
    "division, no float accumulation anywhere. Same one-pass "
    "conditional-count shape as ml_mcc.",
)
def ml_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _conf_counts(spark, sf_dir)
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    n = tp + fp + fn + tn
    pe_scaled = (tp + fp) * (tp + fn) + (tn + fp) * (tn + fn)
    num = n * (tp + tn) - pe_scaled
    den = n * n - pe_scaled
    return c.select(
        "tp", "fp", "fn", "tn",
        num.alias("kappa_num"),
        den.alias("kappa_den"),
        (num.cast("double") / den).alias("kappa"),
    )
