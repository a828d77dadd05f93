"""Round-4 continuation, batch 5: exact higher central moments (skewness
and kurtosis), per-user maximum drawdown, T5-style span corruption for
denoising pretraining, and lag-1 autocorrelation of a daily series.

Same parity rules as the rest of the suite (registry.py docstring);
these four lean on the integer/decimal-moment discipline: every
aggregate is integer cents (or a DECIMAL(38,0) power sum), floats
appear only in final per-row formulas over identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

# cents conversion: value is a 2-dp quantity stored as double; the round
# is exact in both engines (value*100 lands within 1e-10 of an integer).
_CENTS_DUCK = "CAST(ROUND(value * 100) AS BIGINT)"


def _cents_spark():
    return F.round(F.col("value") * 100, 0).cast("bigint")


# --- Exact skewness / kurtosis via integer power sums ----------------------


@query(
    "a_skew_kurtosis",
    oracle=f"""
    WITH mom AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST({_CENTS_DUCK} AS DECIMAL(38,0))) AS s1,
             SUM(CAST({_CENTS_DUCK} AS DECIMAL(38,0))
                 * CAST({_CENTS_DUCK} AS DECIMAL(38,0))) AS s2,
             SUM(CAST({_CENTS_DUCK} AS DECIMAL(38,0))
                 * CAST({_CENTS_DUCK} AS DECIMAL(38,0))
                 * CAST({_CENTS_DUCK} AS DECIMAL(38,0))) AS s3,
             SUM(CAST({_CENTS_DUCK} AS DECIMAL(38,0))
                 * CAST({_CENTS_DUCK} AS DECIMAL(38,0))
                 * CAST({_CENTS_DUCK} AS DECIMAL(38,0))
                 * CAST({_CENTS_DUCK} AS DECIMAL(38,0))) AS s4
      FROM events GROUP BY event_type
    ), d AS (
      SELECT event_type, n,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS m1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS m2,
             CAST(CAST(s3 AS VARCHAR) AS DOUBLE) AS m3,
             CAST(CAST(s4 AS VARCHAR) AS DOUBLE) AS m4
      FROM mom
    ), c AS (
      SELECT event_type, n, m1 / n AS mu,
             m2 / n - (m1 / n) * (m1 / n) AS var_c,
             m3 / n - 3e0 * (m1 / n) * (m2 / n)
               + 2e0 * (m1 / n) * (m1 / n) * (m1 / n) AS mu3,
             m4 / n - 4e0 * (m1 / n) * (m3 / n)
               + 6e0 * (m1 / n) * (m1 / n) * (m2 / n)
               - 3e0 * (m1 / n) * (m1 / n) * (m1 / n) * (m1 / n) AS mu4
      FROM d
    )
    SELECT event_type, n, mu / 100e0 AS mean_value,
           sqrt(var_c) / 100e0 AS stddev_value,
           mu3 / (sqrt(var_c) * sqrt(var_c) * sqrt(var_c)) AS skewness,
           mu4 / (var_c * var_c) - 3e0 AS excess_kurtosis
    FROM c
    """,
    note="Exact skewness and excess kurtosis per event type, the "
    "higher-moment extension of a_corr_manual's discipline: raw power sums "
    "s1..s4 accumulate as integer cents in DECIMAL(38,0) — associative, "
    "partial-agg-order-immune, overflow-safe (cents^4 is ~19 digits, the "
    "sums stay well under 38) — then ONE per-row double formula converts "
    "central moments via the VARCHAR-routed parse. Both engines evaluate "
    "the identical expression tree on identical doubles, so sqrt/divide "
    "round identically. Scale: a single map-side-combinable aggregate over "
    "the fact table; 5 output rows. This is how you get distribution-shape "
    "stats at 100 TB without a second pass or a float-sum race.",
)
def a_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    c = _cents_spark().cast("decimal(38,0)")
    mom = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
        F.sum(c * c * c).alias("s3"),
        F.sum(c * c * c * c).alias("s4"),
    )
    m1 = F.col("s1").cast("string").cast("double")
    m2 = F.col("s2").cast("string").cast("double")
    m3 = F.col("s3").cast("string").cast("double")
    m4 = F.col("s4").cast("string").cast("double")
    n = F.col("n")
    mu = m1 / n
    var_c = m2 / n - mu * mu
    mu3 = m3 / n - F.lit(3.0) * mu * (m2 / n) + F.lit(2.0) * mu * mu * mu
    mu4 = (
        m4 / n
        - F.lit(4.0) * mu * (m3 / n)
        + F.lit(6.0) * mu * mu * (m2 / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    sd = F.sqrt(var_c)
    return mom.select(
        "event_type",
        "n",
        (mu / F.lit(100.0)).alias("mean_value"),
        (sd / F.lit(100.0)).alias("stddev_value"),
        (mu3 / (sd * sd * sd)).alias("skewness"),
        (mu4 / (var_c * var_c) - F.lit(3.0)).alias("excess_kurtosis"),
    )


# --- Per-user maximum drawdown ---------------------------------------------


@query(
    "w_max_drawdown",
    oracle=f"""
    WITH flows AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type IN ('purchase', 'signup', 'click')
                  THEN {_CENTS_DUCK} ELSE -{_CENTS_DUCK} END AS flow
      FROM events
    ), series AS (
      SELECT user_id, ts, event_id,
             SUM(flow) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS cum
      FROM flows
    ), peaks AS (
      SELECT user_id, cum,
             MAX(cum) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS run_peak
      FROM series
    )
    SELECT user_id,
           CAST(MAX(run_peak - cum) AS BIGINT) AS max_drawdown_cents
    FROM peaks
    GROUP BY user_id
    """,
    note="Maximum drawdown per user over a signed integer-cents flow "
    "series (purchase/signup/click credit, view/error debit): cumulative "
    "sum, running peak, max(peak - cum) — the classic risk metric, fully "
    "integer so parity is exact. All three windows and the final agg "
    "share ONE user_id exchange; the running sum's default RANGE frame "
    "handles (ts, event_id) ties deterministically because event_id is "
    "unique. Scale: one shuffle, partition-local sorts; the streaming "
    "twin carries (cum, peak, max_dd) as three numbers of per-user state.",
)
def w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    credit = F.col("event_type").isin("purchase", "signup", "click")
    flow = F.when(credit, _cents_spark()).otherwise(-_cents_spark())
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    series = ev.select(
        "user_id", "ts", "event_id", F.sum(flow).over(wo).alias("cum")
    )
    run_peak = F.max("cum").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        series.select("user_id", "cum", run_peak.alias("run_peak"))
        .groupBy("user_id")
        .agg(F.max(F.col("run_peak") - F.col("cum")).alias("max_drawdown_cents"))
    )


# --- T5-style span corruption ----------------------------------------------


@query(
    "llm_span_corruption",
    oracle="""
    WITH tokd AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             [CASE WHEN ((i - 1) // 3) % 5 <> 0 THEN toks[i]
                   ELSE '<extra_id_' || CAST((i - 1) // 15 AS VARCHAR) || '>'
              END
              for i in generate_series(1, len(toks))
              if ((i - 1) // 3) % 5 <> 0 OR (i - 1) % 3 = 0],
             ' ') AS input_text,
           array_to_string(
             [CASE WHEN (i - 1) % 3 = 0
                   THEN '<extra_id_' || CAST((i - 1) // 15 AS VARCHAR)
                        || '> ' || toks[i]
                   ELSE toks[i]
              END
              for i in generate_series(1, len(toks))
              if ((i - 1) // 3) % 5 = 0],
             ' ') AS target_text
    FROM tokd
    """,
    note="T5/UL2-style span corruption for denoising pretraining: every "
    "5th 3-token span (20% corruption rate, deterministic by position — "
    "no RNG, so batch and oracle agree bit-for-bit) is replaced by one "
    "<extra_id_k> sentinel in the input; the target is the concatenation "
    "of sentinel + original tokens for each masked span. Pure array "
    "higher-order functions over 1-based indices (element_at both sides) "
    "— zero shuffles, zero UDFs; the whole transform is map-side "
    "whole-stage-codegen. At 100 TB this runs at scan speed and is "
    "re-derivable from the raw corpus (the masking is positional, so no "
    "mask table needs persisting).",
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    sent = "concat('<extra_id_', CAST((i - 1) DIV 15 AS STRING), '>')"
    input_expr = (
        "array_join(filter(transform(sequence(1, size(toks)), i -> "
        f"  CASE WHEN ((i - 1) DIV 3) % 5 != 0 THEN element_at(toks, i) "
        f"       WHEN (i - 1) % 3 = 0 THEN {sent} "
        "        ELSE NULL END), x -> x IS NOT NULL), ' ')"
    )
    target_expr = (
        "array_join(filter(transform(sequence(1, size(toks)), i -> "
        "  CASE WHEN ((i - 1) DIV 3) % 5 != 0 THEN NULL "
        f"       WHEN (i - 1) % 3 = 0 THEN concat({sent}, ' ', element_at(toks, i)) "
        "        ELSE element_at(toks, i) END), x -> x IS NOT NULL), ' ')"
    )
    return toks.select(
        "doc_id",
        F.expr(input_expr).alias("input_text"),
        F.expr(target_expr).alias("target_text"),
    )


# --- Lag-1 autocorrelation of the daily revenue series ---------------------


@query(
    "a_autocorr_lag1",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_CENTS_DUCK}) AS rev
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CAST(a.rev AS DECIMAL(38,0)) AS x,
             CAST(b.rev AS DECIMAL(38,0)) AS y
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day = a.day + INTERVAL 1 DAY
    ), mom AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pairs GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
             AS autocorr_lag1
    FROM mom
    """,
    note="Lag-1 autocorrelation of the daily revenue-cents series per "
    "event type — a_corr_manual's exact-moment machinery composed over a "
    "derived series: daily integer aggregate, calendar self-join (day+1, "
    "gap-proof like a_yoy_growth), then integer moment sums and one "
    "per-row Pearson formula. Integer products stay within BIGINT (daily "
    "cents ~1e6, squared ~1e12, x30 days). Scale: the self-join and "
    "moments run on the |types|x|days| aggregate — dimension-sized; only "
    "the daily rollup touches the fact table, map-side combinable. The "
    "numerator's integer arithmetic is exact; only the final divide/sqrt "
    "is float, on identical operands.",
)
def a_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_cents_spark()).alias("rev"))
    a = daily.alias("a")
    b = daily.select(
        F.col("event_type").alias("event_type_b"),
        F.date_sub(F.col("day"), 1).alias("day_b"),
        F.col("rev").alias("y"),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("event_type") == F.col("event_type_b"))
        & (F.col("day") == F.col("day_b")),
    ).select(
        "event_type",
        F.col("rev").cast("decimal(38,0)").alias("x"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    mom = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("string").cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("string").cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("string").cast("double")
    )
    return mom.select("event_type", "n", (num / den).alias("autocorr_lag1"))


# --- Pareto 80/20 concentration --------------------------------------------


@query(
    "a_pareto_8020",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT seg, rev,
             ROW_NUMBER() OVER (PARTITION BY seg
                                ORDER BY rev DESC, c_custkey) AS rk,
             SUM(rev) OVER (PARTITION BY seg
                            ORDER BY rev DESC, c_custkey) AS cum,
             SUM(rev) OVER (PARTITION BY seg) AS tot,
             COUNT(*) OVER (PARTITION BY seg) AS n_cust
      FROM rev
    )
    SELECT seg, n_cust, MIN(rk) AS top_customers_for_80pct,
           CAST(MIN(rk) AS DOUBLE) / n_cust AS pareto_share
    FROM ranked
    WHERE cum * 5 >= tot * 4
    GROUP BY seg, n_cust
    """,
    note="Pareto 80/20 concentration per segment: the minimal number of "
    "top customers whose cumulative DECIMAL revenue crosses 80% of the "
    "segment total. The threshold test is cross-multiplied (cum*5 >= "
    "tot*4) so it stays in exact decimal — no ratio, no float boundary "
    "flake; the (rev DESC, custkey) ordering makes the running sum's "
    "peer-free RANGE frame deterministic. All four windows and the final "
    "MIN share one seg partitioning over the post-aggregate customer "
    "table. Scale: the heavy agg keys on (seg, custkey); windows run on "
    "|customers| rows; output is |segments|.",
)
def a_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("seg", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    ).localCheckpoint(eager=False)  # |customers|-sized: the ordinal
    # directory job and the rank pass read ONE materialization instead
    # of re-running the orders join+aggregate each (the a_rfm pattern)
    from banksy_spark.operators.ordinals import grouped_ordinals

    # 5 segments over a customer-scale frame: rank + exact DECIMAL
    # running revenue ride grouped_ordinals (bucket-bounded sorts; the
    # unique custkey tie-break makes the naive RANGE frame == ROWS)
    ranked = grouped_ordinals(
        rev,
        ["seg"],
        ["-rev", "c_custkey"],
        row_number="rk",
        group_count="n_cust",
        cumsum=[("rev", "cum")],
        group_totals=[("rev", "tot")],
    )
    return (
        ranked.filter(F.col("cum") * 5 >= F.col("tot") * 4)
        .groupBy("seg", "n_cust")
        .agg(F.min("rk").alias("top_customers_for_80pct"))
        .select(
            "seg",
            "n_cust",
            "top_customers_for_80pct",
            (
                F.col("top_customers_for_80pct").cast("double") / F.col("n_cust")
            ).alias("pareto_share"),
        )
    )


# --- Crawl boundary-overlap stitching --------------------------------------

_OVL_K = 3


@query(
    "llm_boundary_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), sfx AS (
      SELECT doc_id,
             array_to_string(toks[len(toks)-{_OVL_K - 1}:len(toks)], ' ') AS key
      FROM t WHERE len(toks) >= {_OVL_K}
    ), pfx AS (
      SELECT doc_id,
             array_to_string(toks[1:{_OVL_K}], ' ') AS key
      FROM t WHERE len(toks) >= {_OVL_K}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.key AS overlap_phrase
    FROM sfx a JOIN pfx b ON a.key = b.key AND a.doc_id <> b.doc_id
    """,
    note="Crawl-boundary overlap stitching: document pairs where A's last "
    f"{_OVL_K} tokens equal B's first {_OVL_K} — the signal that a crawler "
    "split one logical page into two records (the continuation-candidate "
    "generator for re-stitching). Each doc contributes ONE suffix key and "
    "ONE prefix key; candidates come only from key equality, so the join "
    "is hash-keyed and never all-pairs — the same candidates-by-key "
    "discipline as the LSH dedup family. In production the key is a "
    "longer n-gram's hash (collision-free at 8+ tokens); the short key "
    "here keeps the synthetic corpus's match rate nonzero. Scale: two "
    "map-side projections + one equi-join on the phrase key.",
)
def llm_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= _OVL_K
    )
    sfx = t.select(
        F.col("doc_id").alias("doc_a"),
        F.array_join(
            F.slice(F.col("toks"), F.size("toks") - (_OVL_K - 1), _OVL_K), " "
        ).alias("key"),
    )
    pfx = t.select(
        F.col("doc_id").alias("doc_b"),
        F.array_join(F.slice(F.col("toks"), 1, _OVL_K), " ").alias("key"),
    )
    return (
        sfx.join(pfx, "key")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", F.col("key").alias("overlap_phrase"))
    )


# --- Heartbeat gap alerts ---------------------------------------------------


@query(
    "w_gap_alerts",
    oracle="""
    SELECT user_id, prev_ts AS gap_start, ts AS gap_end,
           (epoch_us(ts) - epoch_us(prev_ts)) // 60000000 AS gap_minutes
    FROM (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    )
    WHERE prev_ts IS NOT NULL AND ts - prev_ts > INTERVAL 6 HOUR
    """,
    note="Heartbeat gap detection: per user, silences longer than 6 hours "
    "between consecutive events, emitted as (gap_start, gap_end, whole "
    "minutes) — the monitoring primitive behind dead-sensor and "
    "lost-session alerts. One LAG window per user (tie-broken on "
    "event_id), integer-microsecond floor-division for the duration. "
    "Scale: one user_id exchange; the streaming twin is "
    "applyInPandasWithState with a processing-time timeout firing the "
    "alert when no event renews the key — the batch form here is its "
    "replay/audit twin.",
)
def w_gap_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "ts", F.lag("ts").over(wo).alias("prev_ts")
    )
    gap_us = F.unix_micros("ts") - F.unix_micros("prev_ts")
    return lagged.filter(
        F.col("prev_ts").isNotNull() & (gap_us > 6 * 3600 * 1000000)
    ).select(
        "user_id",
        F.col("prev_ts").alias("gap_start"),
        F.col("ts").alias("gap_end"),
        F.expr("(unix_micros(ts) - unix_micros(prev_ts)) DIV 60000000").alias(
            "gap_minutes"
        ),
    )
