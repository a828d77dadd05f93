"""Round-5 continuation, batch 8: ML evaluation metrics and offline
changepoint/sequence analysis.

- ml_roc_auc: exact ROC-AUC via the Mann-Whitney rank statistic with
  proper tie handling — kept in INTEGER arithmetic (2×avg-rank =
  min_rank + max_rank) until one final division, so parity is exact.
- ml_confusion_metrics: confusion matrix + precision/recall/F1 of the
  frozen linear quality classifier (llm_quality_classifier) against a
  held-out-style label — the evaluation half of the train/infer story.
- a_changepoint_binseg: offline binary-segmentation changepoint (best
  single split by SSE reduction) per series — the batch complement of
  the online CUSUM fold, computed from exact-DECIMAL prefix moments.
- a_sequence_ab: A-before-B ordering statistics for every ordered pair
  of event types (did the user's first A precede their first B) — the
  sequential-pattern count adjacent-only Markov transitions can't see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

# --- exact ROC-AUC ---------------------------------------------------------


@query(
    "ml_roc_auc",
    oracle="""
    WITH scored AS (
      SELECT o_totalprice AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    rn_t AS (
      SELECT y, score,
             ROW_NUMBER() OVER (ORDER BY score, y) AS rn
      FROM scored
    ),
    ranked AS (
      SELECT y,
             MIN(rn) OVER (PARTITION BY score) AS min_rn,
             MAX(rn) OVER (PARTITION BY score) AS max_rn
      FROM rn_t
    )
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
           CAST(SUM(CASE WHEN y = 1 THEN min_rn + max_rn ELSE 0 END)
                - SUM(y) * (SUM(y) + 1) AS DOUBLE)
             / (2e0 * SUM(y) * (COUNT(*) - SUM(y))) AS auc
    FROM ranked
    """,
    note="Exact ROC-AUC of order price predicting finished status, via "
    "the Mann-Whitney U rank statistic: ties get the average rank, held "
    "as the INTEGER doubled form min_rank+max_rank over the tie group, "
    "so the whole statistic stays integer until the single final "
    "division — exact parity, no float rank accumulation. Tie groups "
    "collapse FIRST (one map-side-combinable aggregate per distinct "
    "score), so the fact never enters a window: the running count over "
    "the distinct-score frame (operators/ordinals.py, every window "
    "PARTITION BY bucket — plan-asserted in test_plans.py) yields each "
    "group's rank span as min_rn = cum_n − n + 1, max_rn = cum_n. The "
    "evaluation primitive for every ranking model the suite trains "
    "(quality classifier, langid, DSIR weights).",
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import global_ordinals

    scored = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    # Tie groups collapse BEFORE any sort: one map-side-combinable
    # aggregate per distinct score (n rows, p positives), then the
    # running count over the distinct-score frame gives every tie
    # group's rank span directly — min_rn = cum_n − n + 1, max_rn =
    # cum_n, so Σ_pos(min_rn + max_rn) = Σ p·(2·cum_n − n + 1).  The
    # fact never enters a window: the only fact-scale exchange is the
    # score aggregate's, and the ordinal pass runs over the (much
    # smaller) distinct-score frame.
    g = (
        scored.groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("p"))
        .localCheckpoint(eager=False)  # sampled + counted + ranked once
    )
    r = global_ordinals(g, ["score"], cumsum=[("n", "cum_n")])
    n_pos = F.sum("p")
    n_all = F.sum("n")
    s2 = F.sum(F.col("p") * (2 * F.col("cum_n") - F.col("n") + 1))
    return r.agg(
        n_pos.alias("n_pos"),
        (n_all - n_pos).alias("n_neg"),
        (
            (s2 - n_pos * (n_pos + 1)).cast("double")
            / (F.lit(2.0) * n_pos * (n_all - n_pos))
        ).alias("auc"),
    )


# --- confusion matrix / precision / recall / F1 ----------------------------


@query(
    "ml_confusion_metrics",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) >= 40 AS pred,
             lang = 'en' AS label
      FROM documents
    )
    SELECT
      CAST(SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
           AS BIGINT) AS tp,
      CAST(SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END)
           AS BIGINT) AS fp,
      CAST(SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END)
           AS BIGINT) AS fn,
      CAST(SUM(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END)
           AS BIGINT) AS tn,
      CAST(SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS DOUBLE)
        / SUM(CASE WHEN pred THEN 1 ELSE 0 END) AS precision_,
      CAST(SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS DOUBLE)
        / SUM(CASE WHEN label THEN 1 ELSE 0 END) AS recall_,
      2e0 * SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
        / (SUM(CASE WHEN pred THEN 1 ELSE 0 END)
           + SUM(CASE WHEN label THEN 1 ELSE 0 END)) AS f1
    FROM scored
    """,
    note="Classifier evaluation: confusion matrix and precision/recall/"
    "F1 of a length-rule predictor against the language label — the "
    "eval half every trained component needs next to its inference "
    "query. F1 computed as 2·tp/(pred_pos+label_pos) (one division, no "
    "harmonic-mean intermediate — fewer rounding sites, same value). "
    "Pure conditional counts: one map stage, a single-row aggregate; "
    "scale-free.",
)
def ml_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select(
        (F.size(F.split("text", " ")) >= 40).alias("pred"),
        (F.col("lang") == "en").alias("label"),
    )
    p, l = F.col("pred"), F.col("label")
    tp = F.sum(F.when(p & l, 1).otherwise(0))
    fp = F.sum(F.when(p & ~l, 1).otherwise(0))
    fn = F.sum(F.when(~p & l, 1).otherwise(0))
    tn = F.sum(F.when(~p & ~l, 1).otherwise(0))
    pred_pos = F.sum(F.when(p, 1).otherwise(0))
    label_pos = F.sum(F.when(l, 1).otherwise(0))
    return d.agg(
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        tn.alias("tn"),
        (tp.cast("double") / pred_pos).alias("precision_"),
        (tp.cast("double") / label_pos).alias("recall_"),
        (F.lit(2.0) * tp / (pred_pos + label_pos)).alias("f1"),
    )


# --- offline changepoint: binary segmentation ------------------------------


@query(
    "a_changepoint_binseg",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS pri, o_orderdate AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ),
    pre AS (
      SELECT pri, day, cents,
             ROW_NUMBER() OVER w AS k,
             COUNT(*) OVER (PARTITION BY pri) AS n,
             SUM(CAST(cents AS DECIMAL(38,0))) OVER wk AS s1,
             SUM(CAST(cents AS DECIMAL(38,0))
                 * CAST(cents AS DECIMAL(38,0))) OVER wk AS s2,
             SUM(CAST(cents AS DECIMAL(38,0))) OVER (PARTITION BY pri) AS t1,
             SUM(CAST(cents AS DECIMAL(38,0))
                 * CAST(cents AS DECIMAL(38,0)))
               OVER (PARTITION BY pri) AS t2
      FROM daily
      WINDOW w  AS (PARTITION BY pri ORDER BY day),
             wk AS (PARTITION BY pri ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    costs AS (
      SELECT pri, day, k, n,
             (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
              - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                * CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / k)
             + (CAST(CAST(t2 - s2 AS VARCHAR) AS DOUBLE)
                - CAST(CAST(t1 - s1 AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(t1 - s1 AS VARCHAR) AS DOUBLE) / (n - k))
               AS split_cost,
             CAST(CAST(t2 AS VARCHAR) AS DOUBLE)
               - CAST(CAST(t1 AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(t1 AS VARCHAR) AS DOUBLE) / n AS null_cost
      FROM pre WHERE k < n
    )
    SELECT pri, day AS split_day, split_cost, null_cost,
           null_cost - split_cost AS gain
    FROM (
      SELECT pri, day, split_cost, null_cost,
             ROW_NUMBER() OVER (PARTITION BY pri
                                ORDER BY split_cost, day) AS rk
      FROM costs
    )
    WHERE rk = 1
    """,
    note="Offline changepoint via binary segmentation: the single split "
    "of each daily-revenue series minimizing total within-segment SSE — "
    "the batch complement of the online CUSUM fold. SSE at every "
    "candidate split comes from DECIMAL(38,0) prefix sums of integer "
    "cents and cents² (associative-exact running windows; the only "
    "doubles are the final (Σx)²/k divisions, identical both engines), "
    "so ALL n-1 candidate splits are scored in ONE window pass — no "
    "per-candidate rescans. Deterministic argmin (cost, day). Scale: "
    "one exchange per series; recursing into segments (full binseg) "
    "repeats the same shape on row ranges.",
)
def a_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.suite.round5 import cusum_parts

    daily, _ = cusum_parts(spark, sf_dir)
    c38 = F.col("cents").cast("decimal(38,0)")
    w = Window.partitionBy("pri").orderBy("day")
    wk = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("pri")
    pre = daily.select(
        "pri",
        "day",
        F.row_number().over(w).alias("k"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum(c38).over(wk).alias("s1"),
        F.sum(c38 * c38).over(wk).alias("s2"),
        F.sum(c38).over(wp).alias("t1"),
        F.sum(c38 * c38).over(wp).alias("t2"),
    ).filter(F.col("k") < F.col("n"))

    def dd(c: F.Column) -> F.Column:
        return c.cast("string").cast("double")

    k, n = F.col("k"), F.col("n")
    left = dd(F.col("s2")) - dd(F.col("s1")) * dd(F.col("s1")) / k
    right = dd(F.col("t2") - F.col("s2")) - dd(F.col("t1") - F.col("s1")) * dd(
        F.col("t1") - F.col("s1")
    ) / (n - k)
    null_cost = dd(F.col("t2")) - dd(F.col("t1")) * dd(F.col("t1")) / n
    costs = pre.select(
        "pri",
        "day",
        (left + right).alias("split_cost"),
        null_cost.alias("null_cost"),
    )
    w_best = Window.partitionBy("pri").orderBy("split_cost", "day")
    return (
        costs.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "pri",
            F.col("day").alias("split_day"),
            "split_cost",
            "null_cost",
            (F.col("null_cost") - F.col("split_cost")).alias("gain"),
        )
    )


# --- A-before-B sequential-pattern counts ----------------------------------


@query(
    "a_sequence_ab",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type, MIN(epoch_us(ts)) AS first_us
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users_a_before_b
    FROM firsts a
    JOIN firsts b ON b.user_id = a.user_id
                 AND b.event_type <> a.event_type
    WHERE a.first_us < b.first_us
    GROUP BY 1, 2
    """,
    note="Sequential-pattern counts: for every ordered pair of event "
    "types, how many users did their first A strictly before their "
    "first B — the non-adjacent ordering statistic Markov transition "
    "counts (adjacent pairs only) cannot express; the funnel-direction "
    "evidence product analytics reads before committing to a funnel "
    "definition. Shape: events collapse to ≤|types| rows per user in "
    "one exchange, the per-user pair join is |types|² ≤ 25 rows per "
    "user, output ≤ 20 rows. Exact-µs first-occurrence comparison "
    "(strict, so same-µs firsts count neither direction).",
)
def a_sequence_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    firsts = (
        T(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min(F.unix_micros("ts")).alias("first_us"))
    )
    a = firsts.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("first_us").alias("us_a"),
    )
    b = firsts.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("first_us").alias("us_b"),
    )
    return (
        a.join(b, "user_id")
        .filter(
            (F.col("type_a") != F.col("type_b"))
            & (F.col("us_a") < F.col("us_b"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users_a_before_b"))
    )
