"""Round-5 continuation, batch 16: economic/inventory analytics —
Lorenz curve, fixed-basket price indices, and XYZ variability classes.

- a_lorenz_curve_points: the concentration curve behind
  a_gini_concentration — per customer-rank decile, cumulative share of
  revenue vs population. Exact DECIMAL cumulative sums.
- a_price_index_laspeyres: Laspeyres and Paasche price indices between
  two years from the lineitem fact — the fixed-basket vs
  current-basket inflation measures, each a ratio of exact DECIMAL
  basket sums over parts present in both years.
- a_xyz_classification: the variability half of ABC/XYZ inventory
  analysis — coefficient of variation of each part's daily demand,
  bucketed X/Y/Z. Exact decimal moments; the only irrational is the
  IEEE-correctly-rounded sqrt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

_D = 'CAST(CAST({} AS VARCHAR) AS DOUBLE)'


def _dd(c: F.Column) -> F.Column:
    return c.cast("string").cast("double")


# --- Lorenz curve ----------------------------------------------------------


@query(
    "a_lorenz_curve_points",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT r,
             ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS rk,
             COUNT(*) OVER () AS n,
             SUM(r) OVER () AS total,
             SUM(r) OVER (ORDER BY r, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM rev
    )
    SELECT decile,
           MAX(pop_share) AS pop_share,
           MAX(rev_share) AS rev_share
    FROM (
      SELECT CAST((10 * rk + n - 1) // n AS BIGINT) AS decile,
             CAST(rk AS DOUBLE) / n AS pop_share,
             {_D.format('cum')} / {_D.format('total')} AS rev_share
      FROM ranked
    )
    GROUP BY 1
    """,
    note="Lorenz concentration curve: customers ranked poorest-first by "
    "revenue (deterministic custkey tiebreak), cumulative revenue share "
    "vs population share sampled at each decile boundary — the plot "
    "behind a_gini_concentration's scalar. Cumulative sums stay exact "
    "DECIMAL until the two final share divisions; the decile bucket is "
    "integer ceiling arithmetic ((10·rk+n−1) div n). Rank AND running "
    "sum ride one operators/ordinals.py bucketing (exact per-bucket "
    "DECIMAL partial sums as prefix offsets, count/total attached as "
    "literals — no OVER () window, no single-partition exchange), "
    "10-row output.",
)
def a_lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import global_ordinals

    rev = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
        .localCheckpoint(eager=False)  # sampled + counted + ranked: agg once
    )
    ranked = global_ordinals(
        rev,
        ["r", "o_custkey"],
        row_number="rk",
        cumsum=[("r", "cum")],
        total_count="n",
        totals=[("r", "total")],
    ).select("rk", "n", "total", "cum")
    pts = ranked.select(
        F.floor((10 * F.col("rk") + F.col("n") - 1) / F.col("n")).alias("decile"),
        (F.col("rk").cast("double") / F.col("n")).alias("pop_share"),
        (_dd(F.col("cum")) / _dd(F.col("total"))).alias("rev_share"),
    )
    return pts.groupBy("decile").agg(
        F.max("pop_share").alias("pop_share"),
        F.max("rev_share").alias("rev_share"),
    )


# --- Laspeyres / Paasche price indices -------------------------------------


@query(
    "a_price_index_laspeyres",
    oracle="""
    WITH yr AS (
      SELECT l_partkey,
             EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS y,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS spend
      FROM lineitem
      WHERE EXTRACT(year FROM CAST(l_shipdate AS DATE)) IN (1996, 1997)
      GROUP BY 1, 2
    ),
    px AS (
      SELECT l_partkey, y,
             CAST(q * 100 AS BIGINT) AS q_c,
             CAST(FLOOR(CAST(CAST(spend AS VARCHAR) AS DOUBLE)
                        / CAST(CAST(q AS VARCHAR) AS DOUBLE) * 1000000e0)
                  AS BIGINT) AS p_u
      FROM yr
    ),
    joined AS (
      SELECT b.l_partkey, b.p_u AS p0, c.p_u AS p1, b.q_c AS q0, c.q_c AS q1
      FROM px b JOIN px c ON c.l_partkey = b.l_partkey
      WHERE b.y = 1996 AND c.y = 1997
    )
    SELECT COUNT(*) AS n_parts,
           CAST(CAST(SUM(CAST(p1 AS DECIMAL(38,0)) * q0) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(p0 AS DECIMAL(38,0)) * q0) AS VARCHAR)
                    AS DOUBLE) AS laspeyres,
           CAST(CAST(SUM(CAST(p1 AS DECIMAL(38,0)) * q1) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(p0 AS DECIMAL(38,0)) * q1) AS VARCHAR)
                    AS DOUBLE) AS paasche
    FROM joined
    """,
    note="Laspeyres and Paasche price indices 1996→1997 over the parts "
    "traded in BOTH years — the two classical fixed-basket inflation "
    "measures (their geometric mean is Fisher's ideal). Unit prices are "
    "floor-quantized to integer micro-dollars (floor is unambiguous "
    "where round-half could diverge), so every basket term p·q is an "
    "INTEGER and the basket sums are associative-exact DECIMAL(38,0) — "
    "summing double products here measurably drifts by partial-agg "
    "order (caught by the oracle on first run, 1 ulp at the 15th "
    "digit). Scale: the per-part join is dimension-sized; one fact "
    "scan feeds both years via the year pivot.",
)
def a_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    yr = (
        li.withColumn("y", F.year(F.col("l_shipdate").cast("date")))
        .filter(F.col("y").isin(1996, 1997))
        .groupBy("l_partkey", "y")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("spend"),
        )
        .select(
            "l_partkey",
            "y",
            (F.col("q") * 100).cast("bigint").alias("q_c"),
            F.floor(_dd(F.col("spend")) / _dd(F.col("q")) * F.lit(1_000_000.0))
            .cast("bigint")
            .alias("p_u"),
        )
    )
    base = yr.filter(F.col("y") == 1996).select(
        "l_partkey", F.col("p_u").alias("p0"), F.col("q_c").alias("q0")
    )
    cur = yr.filter(F.col("y") == 1997).select(
        "l_partkey", F.col("p_u").alias("p1"), F.col("q_c").alias("q1")
    )
    j = base.join(cur, "l_partkey")
    p0d = F.col("p0").cast("decimal(38,0)")
    p1d = F.col("p1").cast("decimal(38,0)")
    return j.agg(
        F.count(F.lit(1)).alias("n_parts"),
        (
            _dd(F.sum(p1d * F.col("q0"))) / _dd(F.sum(p0d * F.col("q0")))
        ).alias("laspeyres"),
        (
            _dd(F.sum(p1d * F.col("q1"))) / _dd(F.sum(p0d * F.col("q1")))
        ).alias("paasche"),
    )


# --- XYZ variability classification ----------------------------------------


@query(
    "a_xyz_classification",
    oracle="""
    WITH daily AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    mom AS (
      SELECT l_partkey,
             COUNT(*) AS n_days,
             CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(q * q) AS VARCHAR) AS DOUBLE) AS s2
      FROM daily GROUP BY 1
    )
    SELECT l_partkey, n_days,
           sqrt(s2 / n_days - (s1 / n_days) * (s1 / n_days))
             / (s1 / n_days) AS cv,
           CASE WHEN sqrt(s2 / n_days - (s1 / n_days) * (s1 / n_days))
                     / (s1 / n_days) < 0.5 THEN 'X'
                WHEN sqrt(s2 / n_days - (s1 / n_days) * (s1 / n_days))
                     / (s1 / n_days) < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz
    FROM mom
    WHERE n_days >= 10
    """,
    note="XYZ variability classification — the demand-volatility half of "
    "ABC/XYZ inventory analysis (a_abc_classification is the value "
    "half): coefficient of variation of each part's daily shipped "
    "quantity, bucketed X(<0.5)/Y(<1.0)/Z — steady parts forecast, "
    "erratic parts buffer. Moments come from exact DECIMAL sums of q "
    "and q² (string-routed to doubles), sqrt is IEEE-exact, and the "
    "identical expression appears in the CASE (common subexpression, "
    "same value). Parts with <10 active days are excluded (cv of a "
    "sparse series is noise). One (part, day) exchange then a "
    "part-keyed aggregate.",
)
def a_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    # r14 opt (guide §2.5): the (part, day) key is near-unique (~500k
    # groups from 600k rows), so the partial agg collapsed nothing and
    # the post-exchange dedup ran in an AQE-coalesced 3-task stage
    # (0.78 s of the 1.56 s wall). Repartitioning on the materialized
    # key columns is the one exchange the aggregate needs, pinned
    # (REPARTITION_BY_NUM) at the session's shuffle parallelism.
    n_base = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    daily = (
        li.select(
            "l_partkey",
            F.col("l_shipdate").cast("date").alias("day"),
            "l_quantity",
        )
        .repartition(n_base, "l_partkey", "day")
        .groupBy("l_partkey", "day")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
    )
    mom = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_days"),
        _dd(F.sum("q")).alias("s1"),
        _dd(F.sum(F.col("q") * F.col("q"))).alias("s2"),
    ).filter(F.col("n_days") >= 10)
    mean = F.col("s1") / F.col("n_days")
    cv = F.sqrt(F.col("s2") / F.col("n_days") - mean * mean) / mean
    return mom.select(
        "l_partkey",
        "n_days",
        cv.alias("cv"),
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias("xyz"),
    )
