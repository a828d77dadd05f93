"""Round-5 continuation, batch 17: Wilson score confidence intervals.

a_wilson_ci computes the Wilson score interval for each market
segment's order-completion rate — the interval that behaves correctly
at extreme rates and small n where the naive normal interval fails,
and the standard ranking statistic for "sort by lower confidence
bound" (Reddit-style). z is the literal 1.96; the only irrational is
the IEEE-correctly-rounded sqrt, so both engines emit identical
bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

_Z = "1.96e0"


@query(
    "a_wilson_ci",
    oracle=f"""
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    )
    SELECT segment, n, k,
           CAST(k AS DOUBLE) / n AS p_hat,
           (CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2e0 * n)
            - {_Z} * sqrt((CAST(k AS DOUBLE) / n)
                          * (1e0 - CAST(k AS DOUBLE) / n) / n
                          + {_Z} * {_Z} / (4e0 * n * n)))
             / (1e0 + {_Z} * {_Z} / n) AS ci_lower,
           (CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2e0 * n)
            + {_Z} * sqrt((CAST(k AS DOUBLE) / n)
                          * (1e0 - CAST(k AS DOUBLE) / n) / n
                          + {_Z} * {_Z} / (4e0 * n * n)))
             / (1e0 + {_Z} * {_Z} / n) AS ci_upper
    FROM seg
    """,
    note="Wilson score 95% confidence interval for each market segment's "
    "order-completion rate — the proportion CI that stays inside [0,1] "
    "and behaves at small n where the naive Wald interval collapses; "
    "its lower bound is the standard 'rank by confident quality' "
    "statistic. Integer counts from one customer-broadcast join + "
    "segment aggregate; z is the literal 1.96, sqrt is IEEE-correctly-"
    "rounded, every expression identically associated both engines — "
    "bit-exact bounds with no erf/normal-quantile dependency (z "
    "literals are exactly how the suite keeps inferential stats "
    "implementable, cf. a_ab_test_ztest).",
)
def a_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("k"),
        )
    )
    z = F.lit(1.96)
    n = F.col("n")
    p = F.col("k").cast("double") / n
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
    center = p + z * z / (F.lit(2.0) * n)
    denom = F.lit(1.0) + z * z / n
    return seg.select(
        "segment",
        "n",
        "k",
        p.alias("p_hat"),
        ((center - half) / denom).alias("ci_lower"),
        ((center + half) / denom).alias("ci_upper"),
    )
