"""Round-5 continuation, batch 10: model-calibration and gains-table
evaluation — completing the ML-eval family (ml_roc_auc,
ml_confusion_metrics) with the two artifacts a model review actually
reads.

- ml_calibration_bins: the reliability diagram's data — mean predicted
  score vs observed positive rate per score decile. DECIMAL sums keep
  the means associative-exact.
- ml_lift_gains: the cumulative-gains / lift table — what fraction of
  all positives the top-k score deciles capture, and the lift over
  random targeting. Integer counts + one final division per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

# --- calibration (reliability) bins ----------------------------------------


@query(
    "ml_calibration_bins",
    oracle="""
    WITH scored AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price_d,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin,
           COUNT(*) AS n,
           CAST(CAST(SUM(price_d) AS VARCHAR) AS DOUBLE)
             / COUNT(*) / 500000e0 AS mean_score,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS pos_rate
    FROM scored GROUP BY 1
    """,
    note="Calibration (reliability-diagram) bins: orders decile-binned "
    "by score (price, deterministic orderkey tiebreak so NTILE edges "
    "are identical across engines), per-bin mean normalized score vs "
    "observed positive rate — a calibrated model's bins sit on the "
    "diagonal. The score mean routes through an exact DECIMAL sum; the "
    "positive rate is integer/integer. Scale: the NTILE rides "
    "operators/ordinals.py — range-bucketed global row number + "
    "integer tile arithmetic, every window PARTITION BY bucket "
    "(no single-partition exchange, plan-asserted); per-bin "
    "aggregates are one tiny exchange.",
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import global_ordinals

    o = T(spark, sf_dir, "orders").select(
        "o_totalprice",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_d"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    scored = global_ordinals(
        o, ["o_totalprice", "o_orderkey"], ntile=(10, "bin")
    )
    scored = scored.withColumn("bin", F.col("bin").cast("bigint"))
    return scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("price_d").cast("string").cast("double")
            / F.count(F.lit(1))
            / F.lit(500000.0)
        ).alias("mean_score"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("pos_rate"),
    )


# --- cumulative gains / lift table -----------------------------------------


@query(
    "ml_lift_gains",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
      FROM orders
    ),
    per AS (
      SELECT decile, COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS pos FROM scored GROUP BY 1
    )
    SELECT decile, n, pos,
           CAST(SUM(pos) OVER (ORDER BY decile
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT)
             AS cum_pos,
           CAST(SUM(pos) OVER (ORDER BY decile
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS DOUBLE)
             / SUM(pos) OVER () AS gain,
           (CAST(SUM(pos) OVER (ORDER BY decile
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS DOUBLE)
              / SUM(pos) OVER ())
             / (CAST(SUM(n) OVER (ORDER BY decile
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS DOUBLE)
                / SUM(n) OVER ()) AS lift
    FROM per
    """,
    note="Cumulative-gains / lift table: score deciles best-first "
    "(deterministic tiebreak), what share of ALL positives the top "
    "deciles capture (gain) and the ratio over random targeting "
    "(lift) — the campaign-targeting artifact next to ROC-AUC. All "
    "counts integer; each output row does two divisions. The running "
    "windows run over the 10 POST-AGG decile rows (bounded by "
    "construction — allowlisted in tools/plan_audit.py); the NTILE "
    "itself rides operators/ordinals.py with a desc-ordered range "
    "bucketing, no single-partition window over the fact.",
)
def ml_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import global_ordinals

    o = T(spark, sf_dir, "orders").select(
        "o_totalprice",
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    scored = global_ordinals(
        o, ["-o_totalprice", "o_orderkey"], ntile=(10, "decile")
    )
    per = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    # `per` is exactly 10 rows (the decile grain) by construction, so
    # the unpartitioned running/total windows below are bounded and
    # allowlisted in tools/plan_audit.py — the ~21 "WindowExec: No
    # Partition Defined" warnings this query logs are EXPECTED noise
    # from these 10-row frames, not a fact-scale global window (that
    # one is the ordinal-decomposed NTILE above). Do not re-triage.
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum_pos = F.sum("pos").over(w_cum)
    gain = cum_pos.cast("double") / F.sum("pos").over(w_all)
    frac = F.sum("n").over(w_cum).cast("double") / F.sum("n").over(w_all)
    return per.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n",
        "pos",
        cum_pos.alias("cum_pos"),
        gain.alias("gain"),
        (gain / frac).alias("lift"),
    )
