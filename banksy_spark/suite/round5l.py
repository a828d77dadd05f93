"""Round-5 continuation, batch 11: a mergeable relative-error quantile
sketch with an in-query merge==rebuild proof.

a_ddsketch_log2 is the DDSketch idea (log-bucketed histogram, bounded
RELATIVE error — where equi-width histograms' error is absolute) made
engine-parity-exact: the bucket index is the integer bit-length of the
value in cents (floor(log2)+1 via binary-string length — no libm log),
so buckets are γ=2 geometric and every engine assigns identically.
The sketch is a (bucket → count) map: merging = adding counts, which
the query PROVES by building the sketch on two disjoint halves of the
data and on the whole, and emitting the per-bucket equality — the same
algebra contract llm_kmv_algebra pins for distinct sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query


@query(
    "a_ddsketch_log2",
    oracle="""
    WITH cents AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             o_orderkey % 2 AS half
      FROM orders
    ),
    sk AS (
      SELECT length(format('{:b}', c)) AS bucket,
             COUNT(*) AS n_full,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_even,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_odd
      FROM cents GROUP BY 1
    )
    SELECT bucket, n_full, n_even, n_odd,
           n_even + n_odd = n_full AS merge_equals_rebuild,
           CAST(SUM(n_full) OVER (ORDER BY bucket
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS cum_n,
           1.5e0 * CAST(2 AS DOUBLE) ** (bucket - 1) / 100e0
             AS bucket_mid_dollars
    FROM sk
    """,
    note="Mergeable relative-error quantile sketch (DDSketch idea, γ=2, "
    "made parity-exact): bucket = integer bit-length of the value in "
    "cents — floor(log2)+1 computed as binary-string LENGTH, never "
    "libm log2, so both engines bucket identically including exact "
    "powers of two. Bounded RELATIVE error (any value in bucket b is "
    "within √2 of the geometric mid 1.5·2^(b-1)) where equi-width "
    "histograms (a_histogram_quantiles) bound absolute error. "
    "Mergeability is PROVEN in-query: the sketch built on the "
    "even/odd-orderkey halves summed per bucket must equal the "
    "whole-data build (merge_equals_rebuild all true) — counts are the "
    "whole state, so partial sketches from any partitioning combine "
    "associatively; cum_n gives rank→bucket quantile lookup. Scale: "
    "one map stage + a ≤64-bucket aggregate; the sketch of 100 TB is "
    "64 rows per series key.",
)
def a_ddsketch_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = T(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("c"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    sk = cents.groupBy(F.length(F.bin("c")).cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_full"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_even"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_odd"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return sk.select(
        "bucket",
        "n_full",
        "n_even",
        "n_odd",
        (F.col("n_even") + F.col("n_odd") == F.col("n_full")).alias(
            "merge_equals_rebuild"
        ),
        F.sum("n_full").over(w).alias("cum_n"),
        (
            F.lit(1.5)
            * F.pow(F.lit(2.0), F.col("bucket") - 1)
            / F.lit(100.0)
        ).alias("bucket_mid_dollars"),
    )
