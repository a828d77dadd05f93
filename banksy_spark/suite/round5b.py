"""Round-5 continuation: the eleven TPC-H query shapes not yet in the
suite (Q1, Q5, Q6, Q7, Q8, Q9, Q10, Q11, Q13, Q16, Q20), completing the
full 22-shape TPC-H surface alongside the already-registered
Q2/Q3/Q4/Q12/Q14/Q15/Q17/Q18/Q19/Q21/Q22 forms.

The testdata star schema (TESTDATA.md) lacks ``partsupp``,
``l_shipmode/commitdate/receiptdate`` and comment columns, so four
shapes are adapted the way the Q2/Q12 forms already were: the
*optimization shape* (which joins shuffle, which broadcast, where the
scalar subquery decorrelates) is preserved exactly; only the filter
vocabulary moves to columns the testdata has. Each adaptation is noted
per query.

Numeric parity follows registry.py's conventions: DECIMAL for
associative-exact sums, decimal→VARCHAR→DOUBLE for the final
conversion, identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, fan_out, query

def _rev_spark() -> F.Column:
    """Revenue term: 2dp price × 2dp (1-discount) = exact 4dp decimal.
    (Built lazily — Column construction needs an active SparkContext.)"""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(5,2)")
_REV_DUCK = (
    "CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1.0 - l.l_discount AS DECIMAL(5,2))"
)

_D = 'CAST(CAST({} AS VARCHAR) AS DOUBLE)'  # decimal → exact double


def _dd(col: str) -> F.Column:
    """Spark twin of _D: decimal column → exact IEEE double via string."""
    return F.col(col).cast("string").cast("double")


# --- TPC-H Q1: pricing summary report --------------------------------------


@query(
    "a_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_D.format('sum_qty_d')} AS sum_qty,
           {_D.format('sum_base_d')} AS sum_base_price,
           {_D.format('sum_disc_d')} AS sum_disc_price,
           {_D.format('sum_charge_d')} AS sum_charge,
           {_D.format('sum_qty_d')} / count_order AS avg_qty,
           {_D.format('sum_base_d')} / count_order AS avg_price,
           {_D.format('sum_discount_d')} / count_order AS avg_disc,
           count_order
    FROM (
      SELECT l.l_returnflag, l.l_linestatus,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS sum_qty_d,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS sum_base_d,
             SUM({_REV_DUCK}) AS sum_disc_d,
             SUM({_REV_DUCK}
                 * CAST(1.0 + l.l_tax AS DECIMAL(5,2))) AS sum_charge_d,
             SUM(CAST(l.l_discount AS DECIMAL(5,2))) AS sum_discount_d,
             COUNT(*) AS count_order
      FROM lineitem l
      WHERE CAST(l.l_shipdate AS DATE) <= DATE '2001-09-02'
      GROUP BY 1, 2
    )
    """,
    note="TPC-H Q1: the canonical one-pass wide aggregate — eight measures "
    "over lineitem in a single scan, grouped by the 6-value "
    "(returnflag, linestatus) key. All sums run as DECIMAL so partial "
    "aggregation is associative-exact regardless of partition order; "
    "averages divide the exact sums by the count in IEEE doubles "
    "identically in both engines. Scale: map-side partial agg collapses "
    "600M rows/partition to ≤6 groups before the one tiny exchange — the "
    "query is pure scan bandwidth, and the shipdate filter prunes at the "
    "parquet footer.",
)
def a_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: six DECIMAL measure sums over the single-row-group fact
    # ran map-side on one real task (r13 opt; filter still pushes to
    # the scan below the repartition).
    li = fan_out(
        T(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        )
        .filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
    )
    charge = _rev_spark() * (F.lit(1.0) + F.col("l_tax")).cast("decimal(5,2)")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty_d"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_base_d"),
        F.sum(_rev_spark()).alias("sum_disc_d"),
        F.sum(charge).alias("sum_charge_d"),
        F.sum(F.col("l_discount").cast("decimal(5,2)")).alias("sum_discount_d"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        _dd("sum_qty_d").alias("sum_qty"),
        _dd("sum_base_d").alias("sum_base_price"),
        _dd("sum_disc_d").alias("sum_disc_price"),
        _dd("sum_charge_d").alias("sum_charge"),
        (_dd("sum_qty_d") / F.col("count_order")).alias("avg_qty"),
        (_dd("sum_base_d") / F.col("count_order")).alias("avg_price"),
        (_dd("sum_discount_d") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


# --- TPC-H Q6: forecast revenue change -------------------------------------


@query(
    "a_q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(l.l_discount AS DECIMAL(5,2))) AS VARCHAR)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
      AND l.l_discount >= 0.05 AND l.l_discount <= 0.07
      AND l.l_quantity < 24
    """,
    note="TPC-H Q6: scan-filter-sum with zero joins — the predicate-pushdown "
    "showcase. All three predicates (date range, discount band, quantity "
    "cap) are parquet-pushable min/max filters; the plan is a pruned "
    "columnar scan (3 columns of 11) feeding one decimal sum, fully "
    "map-side until the single-row exchange. At 100 TB this is bounded by "
    "how many row groups the footer stats eliminate, which is why the "
    "filter must reach the scan (plan-audited in PLANS.md).",
)
def a_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(5,2)")
        )
        .cast("string")
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- TPC-H Q5: local supplier volume ---------------------------------------


@query(
    "j_q5_regional_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(CAST(SUM({_REV_DUCK}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1
    """,
    note="TPC-H Q5: six-way join where revenue only counts when customer "
    "and supplier share a nation inside one region. Shape: exactly ONE "
    "shuffle join (lineitem⋈orders on orderkey — the two fact tables); "
    "supplier+nation+region collapse to a broadcast filter on l_suppkey, "
    "and customer broadcasts onto the order side with the "
    "c_nationkey=s_nationkey residual. The orderdate year filter prunes "
    "orders before the fact shuffle. At scale the orderkey shuffle is "
    "avoidable entirely if both facts are bucketed by orderkey (SCALE.md).",
)
def j_q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s_asia = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    j = (
        li.join(F.broadcast(s_asia), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return j.groupBy("n_name").agg(
        F.sum(_rev_spark()).cast("string").cast("double").alias("revenue")
    )


# --- TPC-H Q7: volume shipping between two nations -------------------------


@query(
    "a_q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS l_year,
           CAST(CAST(SUM({_REV_DUCK}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    note="TPC-H Q7: bilateral trade volume between two nations, both "
    "directions, by ship year. The disjunctive nation-pair predicate "
    "cannot become a single equi-join key, so it stays a residual on the "
    "broadcast dims: supplier-side nation filters lineitem FIRST (before "
    "the fact shuffle), customer-side nation filters orders, and the "
    "orderkey join carries only survivors. Year extraction is "
    "post-join, group is (2×2×years) tiny. One fact shuffle total.",
)
def a_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = T(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s2 = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c2 = (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(F.broadcast(s2), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c2), o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year(F.col("l_shipdate").cast("date")).cast("bigint").alias("l_year"),
    ).agg(F.sum(_rev_spark()).cast("string").cast("double").alias("revenue"))


# --- TPC-H Q8: national market share ---------------------------------------


@query(
    "a_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(nation_rev AS VARCHAR) AS DOUBLE)
             / CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS o_year,
             SUM(CASE WHEN sn.n_name = 'NATION_6' THEN {_REV_DUCK}
                      ELSE CAST(0 AS DECIMAL(24,4)) END) AS nation_rev,
             SUM({_REV_DUCK}) AS total_rev
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
      GROUP BY 1
    )
    """,
    note="TPC-H Q8: market share of one supplier nation within a consuming "
    "region, per order year. The share numerator is a CASE inside the SAME "
    "aggregate as the denominator — one pass, no fact self-join. Part "
    "(type filter) and supplier-nation broadcast onto lineitem pre-shuffle; "
    "customer-nation-region broadcast onto orders; one orderkey shuffle. "
    "The final ratio divides two exact decimals as doubles.",
)
def a_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    nat = T(spark, sf_dir, "nation")
    sn = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o = (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == F.col("o_orderkey"))
    )
    agg = j.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_6", _rev_spark()).otherwise(
                F.lit(0).cast("decimal(24,4)")
            )
        ).alias("nation_rev"),
        F.sum(_rev_spark()).alias("total_rev"),
    )
    return agg.select(
        "o_year",
        (_dd("nation_rev") / _dd("total_rev")).alias("mkt_share"),
    )


# --- TPC-H Q9: product type profit (adapted: retailprice as unit cost) -----


@query(
    "a_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS o_year,
           CAST(CAST(SUM({_REV_DUCK}) AS VARCHAR) AS DOUBLE)
             - CAST(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))
                             * CAST(l.l_quantity AS DECIMAL(7,2))
                             * CAST(0.50 AS DECIMAL(3,2))) AS VARCHAR)
                    AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    note="TPC-H Q9 shape (testdata has no partsupp, so unit cost = "
    "0.5×p_retailprice instead of ps_supplycost): profit per supplier "
    "nation per year for one product family. Revenue and cost are summed "
    "as SEPARATE exact decimals and subtracted once as doubles — keeping "
    "one decimal scale per aggregate rather than mixing scales in a "
    "row-level subtraction. Part (name LIKE) and supplier-nation both "
    "broadcast; with orders not needed (year from shipdate) the plan is "
    "join-free of fact shuffles — one scan, one tiny group exchange.",
)
def a_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    n = T(spark, sf_dir, "nation")
    s = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(7,2)")
        * F.lit(0.50).cast("decimal(3,2)")
    )
    j = li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey")).join(
        F.broadcast(s), li.l_suppkey == F.col("s_suppkey")
    )
    agg = j.groupBy(
        F.col("n_name").alias("nation"),
        F.year(F.col("l_shipdate").cast("date")).cast("bigint").alias("o_year"),
    ).agg(
        F.sum(_rev_spark()).alias("rev_d"),
        F.sum(cost).alias("cost_d"),
    )
    return agg.select(
        "nation", "o_year", (_dd("rev_d") - _dd("cost_d")).alias("profit")
    )


# --- TPC-H Q10: returned item reporting (top 20 customers) -----------------


@query(
    "j_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
           c_acctbal
    FROM (
      SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
             SUM({_REV_DUCK}) AS rev
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
        AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
      GROUP BY 1, 2, 3, 4
    )
    ORDER BY rev DESC, c_custkey
    LIMIT 20
    """,
    note="TPC-H Q10: top-20 customers by revenue lost to returns in one "
    "quarter. Returnflag filters lineitem and the quarter filters orders "
    "BEFORE the one orderkey shuffle; customer+nation broadcast onto the "
    "aggregate. The top-k is deterministic (revenue DESC, custkey "
    "tiebreak) — Spark plans orderBy().limit(20) as "
    "TakeOrderedAndProject (per-partition top-20 heaps, one 20-row "
    "merge — plan-asserted in test_plans.py), DuckDB as ORDER BY/"
    "LIMIT; both see the same exact decimal revenue so the selected "
    "set is identical. Scale: aggregate first (customers ≪ lineitems), "
    "top-k never sorts the fact and never ranks through one partition.",
)
def j_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_rev_spark()).alias("rev"))
    )
    return (
        agg.orderBy(F.col("rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name",
            _dd("rev").alias("revenue"), "c_acctbal",
        )
    )


# --- TPC-H Q11: important stock (adapted: shipped value, no partsupp) ------


@query(
    "a_q11_important_parts",
    oracle="""
    SELECT l_partkey,
           CAST(CAST(val AS VARCHAR) AS DOUBLE) AS part_value
    FROM (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY 1
    )
    WHERE 500 * val > (
      SELECT SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    """,
    note="TPC-H Q11 shape (no partsupp → 'stock value' = shipped "
    "extendedprice from EUROPE-region suppliers): parts whose value "
    "exceeds 1/500 of the regional total. The scalar subquery "
    "decorrelates to a broadcast 1-row aggregate over the SAME grouped "
    "frame (computed once, reused for both sides via a second tiny agg — "
    "no second fact scan), and the threshold compares 500×val > total in "
    "exact DECIMAL (integer multiply) rather than dividing. Supplier/"
    "nation/region collapse to one broadcast filter pre-shuffle.",
)
def a_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s_eu = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(s_eu), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val"))
    )
    total = per_part.agg(F.sum("val").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.lit(500).cast("decimal(10,0)") * F.col("val") > F.col("total"))
        .select("l_partkey", _dd("val").alias("part_value"))
    )


# --- TPC-H Q13: customer order-count distribution --------------------------


@query(
    "a_q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    GROUP BY 1
    """,
    note="TPC-H Q13: distribution of per-customer order counts, keeping "
    "zero-order customers (the LEFT join with the filter INSIDE the join "
    "condition, not WHERE — pushing it to WHERE would silently drop the "
    "zero bucket). Shape: aggregate orders by custkey FIRST (one shuffle "
    "sized by orders), left-join customer to the small count table to "
    "restore missing customers as 0, then the second aggregate is over "
    "|distinct counts| rows. Never joins raw orders to customer row-wise.",
)
def a_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    counts = c.join(per_cust, c.c_custkey == F.col("o_custkey"), "left").select(
        "c_custkey", F.coalesce(F.col("n_ord"), F.lit(0)).alias("c_count")
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- TPC-H Q16: supplier variety (adapted: complaints = negative balance) --


@query(
    "a_q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
    note="TPC-H Q16 shape (no partsupp → supplier-part pairs come from "
    "lineitem; no comment column → 'complaint' suppliers = negative "
    "acctbal): distinct-supplier variety per (brand, type, size). The "
    "NOT IN becomes a broadcast LEFT ANTI join (the excluded set is tiny "
    "and null-free by construction), part filters broadcast, and the "
    "COUNT(DISTINCT) shuffles once on the group key with Spark's two-phase "
    "distinct expansion. Scale: the anti-join prunes before the distinct "
    "exchange; no fact self-join.",
)
def a_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti"
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt")
    )


# --- TPC-H Q20: dominant part suppliers (adapted semi-join chain) ----------


@query(
    "j_q20_dominant_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT pair.l_suppkey
        FROM (
          SELECT l.l_suppkey, l.l_partkey,
                 SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS pair_qty
          FROM lineitem l
          WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
          GROUP BY 1, 2
        ) pair
        JOIN (
          SELECT l.l_partkey,
                 SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS part_qty
          FROM lineitem l
          WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
          GROUP BY 1
        ) tot ON tot.l_partkey = pair.l_partkey
        JOIN part p ON p.p_partkey = pair.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND 4 * pair.pair_qty > tot.part_qty
      )
    """,
    note="TPC-H Q20 shape (no partsupp availqty → 'has excess stock' "
    "becomes 'dominant supplier': shipped >25% of a part's 1996 volume): "
    "the nested IN-chain decorrelates to one lineitem aggregation at "
    "(partkey, suppkey) grain with the per-part total as a WINDOW over "
    "the same exchange — the oracle's two scans collapse to one in Spark. "
    "Part name filter broadcasts, the threshold compares 4×pair > total "
    "in exact DECIMAL, and the supplier probe is a broadcast LEFT SEMI. "
    "Plan: one fact shuffle, zero self-joins (asserted in PLANS.md).",
)
def j_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pair_qty")
    )
    # per-part total via window over the SAME partkey exchange (no 2nd scan)
    w = Window.partitionBy("l_partkey")
    dominant = pair.withColumn("part_qty", F.sum("pair_qty").over(w)).filter(
        F.lit(4).cast("decimal(10,0)") * F.col("pair_qty") > F.col("part_qty")
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    dom_supp = dominant.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_suppkey").distinct()
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return s.join(
        F.broadcast(dom_supp), s.s_suppkey == dom_supp.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")
