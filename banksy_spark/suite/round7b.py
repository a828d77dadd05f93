"""Round-7 batch B: TPC-H Q3 — the last of the 22 TPC-H query shapes.

With this, every TPC-H query has a named adaptation in the suite
(q2 ≅ j_argmin_supplier, q17 ≅ a_decorrelated_avg; the rest carry
their q-number).  Q3 is the aggregate-then-top-k join: segment-filtered
customers × open orders × shipped-later lineitems, revenue per order,
top 10.  The scale shape is the same as j_q10_returned_items — the
global "ORDER BY revenue LIMIT 10" must plan as TakeOrderedAndProject
(per-partition top-k then a 10-row merge), never a global sort.

Reference parity: the reference's pandas nlargest-after-groupby is the
single-node form of this (arbitrage_scanner.py's best-payout-per-side
selections); this is the two-fact-join version at engine scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

_REV_DUCK = (
    "CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1.0 - l.l_discount AS DECIMAL(5,2))"
)


@query(
    "j_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(CAST(SUM({_REV_DUCK}) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-01-01'
    GROUP BY 1, 3, 4
    ORDER BY SUM({_REV_DUCK}) DESC, 3 ASC, 1 ASC
    LIMIT 10
    """,
    note="TPC-H Q3 (shipping priority; o_orderpriority stands in for the "
    "generator's missing o_shippriority, cutoff adapted to the 1995-2001 "
    "date range): revenue of still-shipping orders for one market "
    "segment, top 10 by revenue. Shape: customer is a broadcast "
    "semi-filter on the order side (segment prunes 4/5), the orderdate "
    "filter prunes orders and the shipdate filter prunes lineitem BEFORE "
    "the one fact shuffle (orderkey equi-join), and the global top-10 "
    "plans as TakeOrderedAndProject — per-partition heaps then a 10-row "
    "merge on the driver, never a single-task global sort (plan-asserted "
    "in tests/test_round7b_plans.py). The unique l_orderkey tiebreak "
    "after (revenue DESC, orderdate) pins the cut deterministically. "
    "Exactness: revenue is the suite's 4dp DECIMAL convention, compared "
    "via the varchar-double round-trip.",
)
def j_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-01-01").cast("date")
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").cast("date") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").cast("date") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(5,2)")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).alias("_rev"))
    )
    return (
        agg.orderBy(
            F.col("_rev").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("string").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )
