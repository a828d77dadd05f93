"""Core operator suite: SURVEY.md §2.2-§2.7 (P/J/A/W/O/F families).

Each named query re-expresses one reference operator (file:line cited in
the note) on the testdata star schema, Spark-first, paired with a DuckDB
oracle producing identical column names and bit-identical values.

Numeric-parity rules (see suite.registry docstring): grouped sums go
through DECIMAL so partial-aggregation order can't change the answer;
row-level arithmetic stays DOUBLE (same expression → same IEEE bits in
both engines); counts/row_numbers are cast to BIGINT on both sides.

Scale notes appear per query: which side broadcasts, where the (single)
shuffle is, and what changes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.functions.odds import normalize_even_odds, sign_prefix
from banksy_spark.functions.text import (
    blank_if_contains_any,
    camel_boundary_team_1,
    camel_boundary_team_2,
    coerce_double,
    first_token,
    last_token,
    right_of_first_space,
)
from banksy_spark.operators.reshape import explode_pair, keep_first, melt, union_all, with_seq
from banksy_spark.suite.registry import T, query

# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "p_project_rename",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice AS price, l_returnflag AS flag
    FROM lineitem WHERE l_quantity < 3
    """,
    note="P1/P2/P3 select+reorder+rename (arbitrage_scanner.py:67-69,100,137-138)",
)
def p_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 3)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )


@query(
    "p_filter_blank_null",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null, o_orderpriority
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL AND o_orderpriority <> '3-MEDIUM'
    """,
    note="P4 not-equal/not-null filters (arbitrage_scanner.py:62-63,252)",
)
def p_filter_blank_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").withColumn(
        "status_or_null", F.nullif(F.col("o_orderstatus"), F.lit("O"))
    )
    return o.filter(
        F.col("status_or_null").isNotNull() & (F.col("o_orderpriority") != "3-MEDIUM")
    ).select("o_orderkey", "status_or_null", "o_orderpriority")


@query(
    "p_filter_string_preds",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE length(p_name) >= 9 AND p_type LIKE 'E%'
      AND NOT (length(p_name) < 10 AND p_name LIKE '%bolt')
    """,
    note="P5 length/startswith/endswith incl. De Morgan'd NOT-AND (bovada_pull.py:56; arbitrage_scanner.py:232-233)",
)
def p_filter_string_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.filter(
        (F.length("p_name") >= 9)
        & F.col("p_type").startswith("E")
        & ~((F.length("p_name") < 10) & F.col("p_name").endswith("bolt"))
    ).select("p_partkey", "p_name", "p_type")


@query(
    "p_filter_numeric",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net
    FROM lineitem
    WHERE l_extendedprice * (1 - l_discount) > 90000
      AND NOT (l_quantity = 50 AND l_tax = 0)
    """,
    note="P6 numeric threshold + boolean-algebra exclusion (arbitrage_scanner.py:331-332,401)",
)
def p_filter_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(
        (net > 90000) & ~((F.col("l_quantity") == 50) & (F.col("l_tax") == 0))
    ).select("l_orderkey", "l_linenumber", net.alias("net"))


@query(
    "p_membership",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus NOT IN ('P')
    """,
    note="P7 isin + anti-membership on literal lists (bovada_pull.py:161-162; arbitrage_scanner.py:469-474)",
)
def p_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & ~F.col("o_orderstatus").isin("P")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@query(
    "p_positional_slice",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(rn AS BIGINT) AS seq
    FROM (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn > 1
    """,
    note="P8 drop-first-k positional slice via reified order (arbitrage_scanner.py:61,65; SURVEY §4.3.1)",
)
def p_positional_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    out = with_seq(li, order_by=["l_linenumber"], partition_by=["l_orderkey"])
    return out.filter(F.col("_seq") > 1).select(
        "l_orderkey", "l_linenumber", F.col("_seq").cast("bigint").alias("seq")
    )


@query(
    "p_case_classifier",
    oracle="""
    SELECT p_partkey, p_name,
           CASE WHEN regexp_matches(p_name, 'o|u') THEN 'over-under'
                WHEN length(p_name) IN (8, 9) THEN 'ml'
                WHEN contains(p_name, ' ') THEN 'spread'
                ELSE 'ERROR' END AS bet_class
    FROM part
    """,
    note="P9 ordered CASE chain, first-match precedence (determine_bet_type, arbitrage_scanner.py:90-99)",
)
def p_case_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    cls = (
        F.when(F.col("p_name").rlike("o|u"), "over-under")
        .when(F.length("p_name").isin(8, 9), "ml")
        .when(F.col("p_name").contains(" "), "spread")
        .otherwise("ERROR")
    )
    return p.select("p_partkey", "p_name", cls.alias("bet_class"))


@query(
    "p_masked_coalesce",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (CASE WHEN l_returnflag = 'N' THEN '' ELSE l_returnflag END) = ''
                THEN l_linestatus
                ELSE (CASE WHEN l_returnflag = 'N' THEN '' ELSE l_returnflag END)
           END AS resolved
    FROM lineitem
    """,
    note="P10 masked coalesce a.mask(a=='', b) (bovada_pull.py:139-144)",
)
def p_masked_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    a = F.when(F.col("l_returnflag") == "N", "").otherwise(F.col("l_returnflag"))
    masked = F.when(a == "", F.col("l_linestatus")).otherwise(a)
    return li.select("l_orderkey", "l_linenumber", masked.alias("resolved"))


@query(
    "p_const_columns",
    oracle="""
    SELECT o_orderkey, 'MLB' AS sport, 'Payout' AS info, 100 AS base_stake
    FROM orders WHERE o_orderstatus = 'F'
    """,
    note="P11 constant literal columns (arbitrage_scanner.py:56,248; bovada_pull.py:169-170)",
)
def p_const_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return o.select(
        "o_orderkey",
        F.lit("MLB").alias("sport"),
        F.lit("Payout").alias("info"),
        F.lit(100).alias("base_stake"),
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@query(
    "j_broadcast_dim_chain",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    note="J1 dimension-chain broadcast joins (team CSVs, arbitrage_scanner.py:193). "
    "Scale: nation/region broadcast; single shuffle for the final groupBy.",
)
def j_broadcast_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("acctbal_sum"),
        )
    )


@query(
    "j_left_multikey",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, l.l_returnflag, g.n_lines
    FROM lineitem l
    LEFT JOIN (
      SELECT l_partkey, l_suppkey, l_returnflag, COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1, 2, 3
    ) g USING (l_partkey, l_suppkey, l_returnflag)
    """,
    note="J2 left equi-join on a 3-column key (arbitrage_scanner.py:207)",
)
def j_left_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    g = li.groupBy("l_partkey", "l_suppkey", "l_returnflag").agg(F.count("*").alias("n_lines"))
    return li.join(g, ["l_partkey", "l_suppkey", "l_returnflag"], "left").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag", "n_lines"
    )


@query(
    "j_anti_no_match",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    note="J3 left-join+filter expressed directly as left_anti (arbitrage_scanner.py:251-252)",
)
def j_anti_no_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "j_inner_5key",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, a.l_partkey, a.l_suppkey, a.l_returnflag,
           a.l_quantity, b.l_extendedprice
    FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, l_quantity
          FROM lineitem) a
    JOIN (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, l_extendedprice
          FROM lineitem) b
    USING (l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag)
    """,
    note="J4 inner equi-join on a 5-column composite key (arbitrage_scanner.py:357)",
)
def j_inner_5key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag"]
    a = li.select(*keys, "l_quantity")
    b = li.select(*keys, "l_extendedprice")
    return a.join(b, keys, "inner")


@query(
    "j_anti_subquery",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09)
    """,
    note="J5 anti-join against a query-derived key set (bovada_pull.py:158-162; arbitrage_scanner.py:469-470)",
)
def j_anti_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    bad = li.filter(F.col("l_discount") > 0.09).select("l_orderkey").distinct()
    return o.join(bad, o.o_orderkey == bad.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


@query(
    "j_semi_flag",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN m.l_orderkey IS NOT NULL THEN '*' || o_orderstatus
                ELSE o_orderstatus END AS status_flag
    FROM orders
    LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 49) m
      ON o_orderkey = m.l_orderkey
    """,
    note="J6 semi-join-derived flag: '*'+Sport for NY-only games (arbitrage_scanner.py:474-475)",
)
def j_semi_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    marker = li.filter(F.col("l_quantity") >= 49).select("l_orderkey").distinct()
    joined = o.join(marker, o.o_orderkey == marker.l_orderkey, "left")
    flag = F.when(
        F.col("l_orderkey").isNotNull(), F.concat(F.lit("*"), F.col("o_orderstatus"))
    ).otherwise(F.col("o_orderstatus"))
    return joined.select("o_orderkey", flag.alias("status_flag"))


@query(
    "j_window_not_selfjoin",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_total,
           l_extendedprice / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey) AS DOUBLE) AS price_share
    FROM lineitem
    """,
    note="J7 groupby+merge-back rewritten as a window aggregate — one shuffle, no join "
    "(arbitrage_scanner.py:280-282,373-375; SURVEY §4.2)",
)
def j_window_not_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    total = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        total.alias("order_total"),
        (F.col("l_extendedprice") / total).alias("price_share"),
    )


@query(
    "j_derived_date_key",
    oracle="""
    SELECT o_orderkey, od, d.n_orders
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders) o
    LEFT JOIN (
      SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ) d USING (od)
    """,
    note="J8 left join on a to_date-derived key (arbitrage_scanner.py:453-458)",
)
def j_derived_date_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").withColumn("od", F.to_date("o_orderdate"))
    daily = o.groupBy("od").agg(F.count("*").alias("n_orders"))
    return o.join(daily, "od", "left").select("o_orderkey", "od", "n_orders")


@query(
    "j_explicit_cols",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name AS customer_name, c_mktsegment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    note="J9 join with explicit column selection instead of suffix cleanup (arbitrage_scanner.py:421-424)",
)
def j_explicit_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_name").alias("customer_name"), "c_mktsegment"
    )
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "customer_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@query(
    "a_grouped_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS sum_disc,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    note="A1 grouped SUM, the arbitrage core's aggregate shape (arbitrage_scanner.py:280). "
    "Scale: map-side partial agg; DECIMAL keeps the sum order-independent.",
)
def a_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base"),
        F.sum(price * disc).cast("double").alias("sum_disc"),
        F.count("*").alias("n_rows"),
    )


@query(
    "a_grouped_count",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    note="A3 grouped COUNT per (date, key) (arbitrage_scanner.py:446-447)",
)
def a_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events")
    )


@query(
    "a_rowwise_greatest",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           GREATEST(l_quantity, l_extendedprice / 10000.0, l_tax * 100.0) AS best
    FROM lineitem
    """,
    note="A4 row-wise max across columns (max(axis=1), arbitrage_scanner.py:277)",
)
def a_rowwise_greatest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    best = F.greatest(
        F.col("l_quantity"), F.col("l_extendedprice") / 10000.0, F.col("l_tax") * 100.0
    )
    return li.select("l_orderkey", "l_linenumber", best.alias("best"))


@query(
    "a_nunique_filter",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, CAST(g.n_flags AS BIGINT) AS n_flags
    FROM lineitem l
    JOIN (
      SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS n_flags
      FROM lineitem GROUP BY 1 HAVING COUNT(DISTINCT l_returnflag) <> 1
    ) g USING (l_orderkey)
    """,
    note="A5 per-group distinct-count as row filter via window, no join "
    "(groupby.transform('nunique'), arbitrage_scanner.py:427-431)",
)
def a_nunique_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    n_flags = F.size(F.collect_set("l_returnflag").over(w))
    return (
        li.withColumn("n_flags", n_flags.cast("bigint"))
        .filter(F.col("n_flags") != 1)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "n_flags")
    )


@query(
    "a_string_agg",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, chr(10) ORDER BY n_name) AS members,
           COUNT(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    note="A6 string aggregation to one value per group with pinned order "
    "('\\n'.join, arbitrage_scanner.py:490-491). Scale: bounded group width.",
)
def a_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "\n").alias("members"),
        F.count("*").alias("n_nations"),
    )


@query(
    "a_cumcount_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS rnk,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1
                AS BIGINT) AS cumcount
    FROM orders
    """,
    note="A7/W5 per-group first-occurrence rank + cumcount (bovada_pull.py:158-162)",
)
def a_cumcount_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rnk = F.row_number().over(w).cast("bigint")
    return o.select(
        "o_custkey", "o_orderkey", rnk.alias("rnk"), (rnk - 1).alias("cumcount")
    )


# ---------------------------------------------------------------------------
# §2.5 Windows / row-order semantics
# ---------------------------------------------------------------------------


@query(
    "w_pair_parity",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR((rn - 1) / 2) + 1 AS BIGINT) AS pair_id,
           CAST((rn - 1) % 2 AS INT) AS parity
    FROM (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
      FROM lineitem
    )
    """,
    note="W1/W2 adjacent-pair id + row parity from a reified sequence "
    "(game_id = i//2+1, arbitrage_scanner.py:104,368-370)",
)
def w_pair_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.reshape import pair_id, pair_parity

    li = T(spark, sf_dir, "lineitem")
    out = with_seq(li, order_by=["l_linenumber"], partition_by=["l_orderkey"])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        pair_id(F.col("_seq")).alias("pair_id"),
        pair_parity(F.col("_seq")).alias("parity"),
    )


@query(
    "w_forward_fill",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             CASE WHEN l_linenumber % 2 = 0 THEN NULL ELSE l_extendedprice END AS v
      FROM lineitem
    )
    """,
    note="W3 forward fill = running last(ignorenulls) (ffill, arbitrage_scanner.py:369). "
    "l_linenumber is NOT unique per order in the testdata, so the order carries a "
    "tie-break — the §4.3.1 deterministic-total-order contract in action.",
)
def w_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.reshape import forward_fill

    li = T(spark, sf_dir, "lineitem").withColumn(
        "v",
        F.when(F.col("l_linenumber") % 2 == 0, None).otherwise(F.col("l_extendedprice")),
    )
    filled = forward_fill(
        li, "v", order_by=["l_linenumber", "l_extendedprice"], partition_by=["l_orderkey"]
    )
    return filled.select("l_orderkey", "l_linenumber", F.col("v").alias("filled"))


@query(
    "w_argmax_column",
    oracle="""
    SELECT l_orderkey, l_linenumber, mx AS best,
           CASE WHEN b1 = mx THEN 'qty' WHEN b2 = mx THEN 'price' ELSE 'tax' END AS best_bookie
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_quantity * 1000.0 AS b1, l_extendedprice * 0.5 AS b2,
             (1 + l_tax) * 20000.0 AS b3,
             GREATEST(l_quantity * 1000.0, l_extendedprice * 0.5, (1 + l_tax) * 20000.0) AS mx
      FROM lineitem
    )
    """,
    note="W6 argmax-across-columns: name of the max column, first-match-wins "
    "(find_max_payout_column, arbitrage_scanner.py:350-355) — coalesce(when), no UDF",
)
def w_argmax_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    b1 = F.col("l_quantity") * 1000.0
    b2 = F.col("l_extendedprice") * 0.5
    b3 = (1 + F.col("l_tax")) * 20000.0
    mx = F.greatest(b1, b2, b3)
    which = F.coalesce(
        F.when(b1 == mx, F.lit("qty")), F.when(b2 == mx, F.lit("price")), F.lit("tax")
    )
    return li.select(
        "l_orderkey", "l_linenumber", mx.alias("best"), which.alias("best_bookie")
    )


# ---------------------------------------------------------------------------
# §2.6 Sorts / set ops / reshaping
# ---------------------------------------------------------------------------


@query(
    "o_categorical_sort_key",
    oracle="""
    SELECT CAST(CASE o_orderpriority
             WHEN '2-HIGH' THEN 1 WHEN '1-URGENT' THEN 2 WHEN '5-LOW' THEN 3
             WHEN '3-MEDIUM' THEN 4 WHEN '4-NOT SPECIFIED' THEN 5 ELSE 0 END AS BIGINT)
             AS sort_key,
           o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    note="O1 custom categorical sort order reified as an array_position key "
    "(pd.Categorical ordered, arbitrage_scanner.py:167-169)",
)
def o_categorical_sort_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    order = F.array(
        F.lit("2-HIGH"), F.lit("1-URGENT"), F.lit("5-LOW"), F.lit("3-MEDIUM"),
        F.lit("4-NOT SPECIFIED"),
    )
    key = F.array_position(order, F.col("o_orderpriority")).cast("bigint")
    return (
        o.select(key.alias("sort_key"), "o_orderpriority")
        .groupBy("sort_key", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("sort_key")
    )


@query(
    "o_union",
    oracle="""
    SELECT o_orderkey, 'finished' AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    note="O3 vertical concat by name (pd.concat, arbitrage_scanner.py:58,118,164)",
)
def o_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    u1 = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("finished").alias("src")
    )
    u2 = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src")
    )
    return union_all([u1, u2])


@query(
    "o_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
    FROM lineitem WHERE l_orderkey < 2000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 2000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 2000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey < 2000
    """,
    note="O5 wide→long unpivot via native melt — no shuffle "
    "(pd.melt, arbitrage_scanner.py:336-343,410)",
)
def o_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return melt(
        li,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="metric",
        value_name="value",
    )


@query(
    "o_explode_stack",
    oracle="""
    SELECT c_custkey, 'name' AS field, c_name AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'segment' AS field, c_mktsegment AS val FROM customer
    """,
    note="O4/O6 row duplication with differentiator via explode — replaces the "
    "order-dependent duplicate-then-blank trick (arbitrage_scanner.py:122-133,239)",
)
def o_explode_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    out = explode_pair(
        c,
        cols=["c_name", "c_mktsegment"],
        out_col="val",
        label_col="field",
        labels=["name", "segment"],
    )
    return out.select("c_custkey", "field", "val")


@query(
    "o_dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS first_date
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
    """,
    note="O7 keep-first-per-key dedup with pinned order (bovada_pull.py:156-162)",
)
def o_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    first = keep_first(o, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"])
    return first.select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("first_date")
    )


# ---------------------------------------------------------------------------
# §2.7 Scalar functions
# ---------------------------------------------------------------------------


@query(
    "f_regex_suite",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '^[a-z]+ ', '') AS no_first,
           regexp_replace(regexp_replace(p_name, ' ', '-', 'g'), 'e', '3', 'g') AS dashed,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_tokens
    FROM part
    """,
    note="F1/F2/F3 regexp extract / chained replace / findall-count "
    "(bovada_pull.py:69-97,73,46-48; arbitrage_scanner.py:77,179,237-238)",
)
def f_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"^[a-z]+ ", "").alias("no_first"),
        F.regexp_replace(F.regexp_replace("p_name", " ", "-"), "e", "3").alias("dashed"),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[a-z]+"), 0)).cast("bigint").alias(
            "n_tokens"
        ),
    )


@query(
    "f_string_suite",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS first_tok,
           string_split(p_name, ' ')[-1] AS last_tok,
           CASE WHEN strpos(p_name, ' ') > 0
                THEN substr(p_name, strpos(p_name, ' ') + 1) ELSE p_name END AS after_space,
           substr(p_name, 1, 1) AS first_char,
           rtrim(p_name, 'gn') AS rtrimmed,
           ltrim(p_name, 'sb') AS ltrimmed,
           CAST(length(p_name) AS BIGINT) AS name_len,
           contains(p_name, 'id') AS has_id,
           starts_with(p_name, 'small') AS is_small,
           p_name LIKE '%t' AS ends_t
    FROM part
    """,
    note="F5/F6/F7/F8 token access, locate+substr, trim char-sets, length/contains "
    "(arbitrage_scanner.py:151,155-162,175,86-87; bovada_pull.py:83-84)",
)
def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        first_token(F.col("p_name")).alias("first_tok"),
        last_token(F.col("p_name")).alias("last_tok"),
        right_of_first_space(F.col("p_name")).alias("after_space"),
        F.substring("p_name", 1, 1).alias("first_char"),
        F.expr("trim(TRAILING 'gn' FROM p_name)").alias("rtrimmed"),
        F.expr("trim(LEADING 'sb' FROM p_name)").alias("ltrimmed"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.col("p_name").contains("id").alias("has_id"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_name").endswith("t").alias("ends_t"),
    )


@query(
    "f_signprefix_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN v > 0 THEN '+' || CAST(v AS VARCHAR) ELSE CAST(v AS VARCHAR) END
             AS signed_str,
           TRY_CAST(garbage AS DOUBLE) AS parsed,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(5,2)), 2) AS DOUBLE) AS rounded2
    FROM (
      SELECT *, CAST(l_quantity - 25 AS INT) AS v,
             CASE WHEN l_linenumber % 3 = 0 THEN 'x' || CAST(l_quantity AS VARCHAR)
                  ELSE CAST(l_quantity AS VARCHAR) END AS garbage
      FROM lineitem
    )
    """,
    note="F9/F11/F12 sign-prefix rendering, coercing try_cast (to_numeric errors='coerce'), "
    "decimal HALF_UP round (arbitrage_scanner.py:381-385,270-272,370,378)",
)
def f_signprefix_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    v = (F.col("l_quantity") - 25).cast("int")
    garbage = F.when(
        F.col("l_linenumber") % 3 == 0,
        F.concat(F.lit("x"), F.col("l_quantity").cast("string")),
    ).otherwise(F.col("l_quantity").cast("string"))
    rounded2 = F.round(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)"),
        2,
    ).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        sign_prefix(v).alias("signed_str"),
        coerce_double(garbage).alias("parsed"),
        rounded2.alias("rounded2"),
    )


@query(
    "f_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
           strftime(o_orderdate, '%Y-%m-%d %H:%M') AS ods
    FROM orders
    """,
    note="F13/F14 to_date, month truncation, timestamp formatting "
    "(arbitrage_scanner.py:299-300,445-456)",
)
def f_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("om"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm").alias("ods"),
    )


@query(
    "f_coalesce_fill",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'unknown') AS seg_resolved,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_or_zero
    FROM customer
    """,
    note="F18 coalesce chain + fillna defaults (arbitrage_scanner.py:196,288-293,304-305)",
)
def f_coalesce_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("unknown")).alias(
            "seg_resolved"
        ),
        F.coalesce(
            F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")), F.lit(0.0)
        ).alias("bal_or_zero"),
    )


@query(
    "f_blank_charset_even",
    oracle="""
    SELECT p_partkey,
           CASE WHEN regexp_matches(p_name, '[aeu]') THEN '' ELSE p_name END AS blanked,
           CASE WHEN (CASE WHEN p_type = 'ECONOMY' THEN 'EVEN' ELSE p_type END)
                     IN ('EVEN', 'even') THEN '+100'
                ELSE (CASE WHEN p_type = 'ECONOMY' THEN 'EVEN' ELSE p_type END)
           END AS even_normalized
    FROM part
    """,
    note="F19 char-set blanking + F4 exact EVEN→+100 literal replace "
    "(bovada_pull.py:172,152-154)",
)
def f_blank_charset_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    synthetic_even = F.when(F.col("p_type") == "ECONOMY", "EVEN").otherwise(F.col("p_type"))
    return p.select(
        "p_partkey",
        blank_if_contains_any(F.col("p_name"), "aeu").alias("blanked"),
        normalize_even_odds(synthetic_even).alias("even_normalized"),
    )


@query(
    "f_camel_split",
    oracle="""
    SELECT p_partkey, camel,
           upper(substr(t1, 1, 1)) || substr(t1, 2) AS team_1,
           upper(substr(t2, 1, 1)) || substr(t2, 2) AS team_2
    FROM (
      SELECT p_partkey,
             string_split(p_name, ' ')[1] AS t1,
             string_split(p_name, ' ')[-1] AS t2,
             upper(substr(string_split(p_name, ' ')[1], 1, 1))
               || substr(string_split(p_name, ' ')[1], 2)
               || upper(substr(string_split(p_name, ' ')[-1], 1, 1))
               || substr(string_split(p_name, ' ')[-1], 2) AS camel
      FROM part
    )
    """,
    note="F10 CamelCase boundary split (find_team_1/2, bovada_pull.py:105-118). "
    "Oracle derives the split independently from the source tokens.",
)
def f_camel_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    t1 = first_token(F.col("p_name"))
    t2 = last_token(F.col("p_name"))
    camel = F.concat(F.initcap(t1), F.initcap(t2))
    withc = p.select("p_partkey", camel.alias("camel"))
    return withc.select(
        "p_partkey",
        "camel",
        camel_boundary_team_1(F.col("camel")).alias("team_1"),
        camel_boundary_team_2(F.col("camel")).alias("team_2"),
    )


@query(
    "a_salted_sum",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    note="Skewed-aggregation cure: two-stage salted sum (operators/skew.py). "
    "l_returnflag has only 3 values — at 100 TB each key would serialize onto one "
    "reducer; salting by pmod(hash(l_orderkey), 16) spreads stage 1 over 48 partials, "
    "stage 2 combines them. DECIMAL partials make the result bit-equal to the plain "
    "single-stage oracle.",
)
def a_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.skew import salted_agg

    li = T(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(12,2)")),
            "n_rows": F.count("*"),
        },
        salt_col=F.hash("l_orderkey"),
        n_salt=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


@query(
    "a_exact_median",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN rn * 2 IN (cnt, cnt + 1, cnt + 2) THEN l_quantity END)
                / COUNT(CASE WHEN rn * 2 IN (cnt, cnt + 1, cnt + 2) THEN 1 END)
                AS DOUBLE) AS median_qty
    FROM (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      FROM lineitem
    ) GROUP BY l_returnflag
    """,
    note="Exact grouped median without engine-specific interpolation: rank the values "
    "with a deterministic tie-break, average the middle one or two. (percentile/"
    "quantile_cont interpolate with engine-dependent float order, so this rank form "
    "is the cross-engine-verifiable shape; medians are absent from the reference, "
    "SURVEY §2.4 'not present'.) Values here are half-integers, so the 2-element "
    "mean is exact. Scale: the rank rides grouped_ordinals — 3 return flags over "
    "all of lineitem is the few-huge-groups shape where a plain PARTITION BY "
    "window sorts a third of the fact on ONE task; the decomposition bounds "
    "every sort partition by the range-bucket size instead.",
)
def a_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import grouped_ordinals

    li = T(spark, sf_dir, "lineitem")
    ranked = grouped_ordinals(
        li.select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"),
        ["l_returnflag"],
        ["l_quantity", "l_orderkey", "l_linenumber"],
        row_number="rn",
        group_count="cnt",
    )
    mid = F.col("rn") * 2
    is_mid = mid.isin(F.col("cnt"), F.col("cnt") + 1, F.col("cnt") + 2)
    picked = F.when(is_mid, F.col("l_quantity"))
    return ranked.groupBy("l_returnflag").agg(
        (F.sum(picked) / F.count(picked)).cast("double").alias("median_qty")
    )


@query(
    "j_multi_join_topk",
    oracle="""
    SELECT o.o_orderkey, c.c_mktsegment, CAST(o.o_orderdate AS DATE) AS od,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    note="TPC-H Q3-shaped multi-way join + top-k: two fact joins, filtered segments, "
    "decimal revenue, deterministic top-10 (revenue desc, key tiebreak so the LIMIT "
    "selects the same rows in both engines). Scale: customer side is filtered before "
    "the join (Catalyst pushes the segment predicate below), the top-k is a "
    "TakeOrdered — no global sort materializes.",
)
def j_multi_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    li = T(spark, sf_dir, "lineitem")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    ).cast("double")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "c_mktsegment", F.to_date("o_orderdate").alias("od"))
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "o_set_ops",
    oracle="""
    SELECT o_orderkey, 'both' AS src FROM (
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT o_orderkey, 'only_f' AS src FROM (
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
    note="Set operators intersect/except — absent from the reference (SURVEY §2.6 "
    "'no intersect/except') but part of a complete engine surface. Both compile to "
    "aggregate/anti-join forms, one shuffle each.",
)
def o_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    u = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    both = f.intersect(u).select("o_orderkey", F.lit("both").alias("src"))
    # subtract() is SQL EXCEPT (set semantics); exceptAll+distinct is NOT
    # equivalent when the left side has duplicates of a right-side value
    only_f = f.subtract(u).select("o_orderkey", F.lit("only_f").alias("src"))
    return both.unionByName(only_f)


@query(
    "o_pivot_wide",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END)
                AS DOUBLE) AS qty_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END)
                AS DOUBLE) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
    note="Pivot long→wide (the inverse of melt; the reference's implicit per-bookie "
    "column layout, arbitrage_scanner.py:137-138). Spark pivot with an explicit value "
    "list stays a single-pass aggregate — never use the value-discovering form at "
    "scale (it runs an extra distinct job).",
)
def o_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")))
    )
    return out.select(
        "l_returnflag",
        F.col("F").cast("double").alias("qty_F"),
        F.col("O").cast("double").alias("qty_O"),
    )


@query(
    "w_ntile_quartiles",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ntile(4) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                AS INT) AS quartile,
           CAST(rank() OVER (PARTITION BY l_returnflag
                             ORDER BY CAST(l_quantity AS INT)) AS BIGINT) AS qty_rank,
           CAST(dense_rank() OVER (PARTITION BY l_returnflag
                                   ORDER BY CAST(l_quantity AS INT)) AS BIGINT)
             AS qty_dense_rank
    FROM lineitem
    """,
    note="Ranking family: ntile/rank/dense_rank over deterministic orders (absent from "
    "the reference, SURVEY §2.5 'no ranking'; completes the window surface). rank ties "
    "on integral quantity are legitimate and produce identical gaps in both engines.",
)
def w_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import grouped_ordinals

    li = T(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("int").alias("q"),
        "l_orderkey",
        "l_linenumber",
    )
    # 3 flags over all of lineitem: the NTILE rides grouped_ordinals
    # (bucket-bounded sorts, integer tile arithmetic from rn + count)
    tiled = grouped_ordinals(
        base,
        ["l_returnflag"],
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        ntile=(4, "quartile"),
    )
    # rank/dense_rank on an integral key need no fact-side sort at all:
    # rank = 1 + rows with smaller value, dense = 1 + distinct smaller
    # values — both from the tiny (flag, value) count directory via a
    # broadcast triangular join, then broadcast back over the fact.
    # The directory persists so the self-join's two sides read one
    # materialization instead of re-scanning lineitem each.
    from banksy_spark.operators.ordinals import materialize_directory

    vc = materialize_directory(
        base.groupBy("l_returnflag", "q").agg(F.count("*").alias("c"))
    )
    a, b = vc.alias("a"), vc.alias("b")
    ranks = (
        a.join(
            F.broadcast(b),
            (F.col("a.l_returnflag") == F.col("b.l_returnflag"))
            & (F.col("b.q") < F.col("a.q")),
            "left",
        )
        .groupBy(
            F.col("a.l_returnflag").alias("l_returnflag"),
            F.col("a.q").alias("q"),
        )
        .agg(
            (F.coalesce(F.sum("b.c"), F.lit(0)) + 1).alias("qty_rank"),
            (F.count("b.q") + 1).alias("qty_dense_rank"),
        )
    )
    return tiled.join(F.broadcast(ranks), ["l_returnflag", "q"]).select(
        "l_orderkey",
        "l_linenumber",
        F.col("quartile").cast("int").alias("quartile"),
        F.col("qty_rank").cast("bigint").alias("qty_rank"),
        F.col("qty_dense_rank").cast("bigint").alias("qty_dense_rank"),
    )


@query(
    "w_lead_lag_delta",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice - lag(l_extendedprice) OVER w AS delta_prev,
           lead(l_extendedprice) OVER w - l_extendedprice AS delta_next
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice)
    """,
    note="lead/lag deltas over the reified order (absent from the reference, SURVEY "
    "§2.5 'no lead/lag'); the tie-broken order keeps both engines aligned on the "
    "non-unique l_linenumber.",
)
def w_lead_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") - F.lag("l_extendedprice").over(w)).alias("delta_prev"),
        (F.lead("l_extendedprice").over(w) - F.col("l_extendedprice")).alias("delta_next"),
    )


@query(
    "a_cube_grouping",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS flag,
           COALESCE(l_linestatus, '<all>') AS status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    note="CUBE with GROUPING flags: all four aggregation grains of (flag, status) in "
    "one pass, subtotal rows disambiguated from real NULLs by grouping id — the OLAP "
    "companion to the grouping-sets rollup (absent from the reference, SURVEY §2.4 "
    "'no grouping sets / cube / rollup').",
)
def a_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "gid",
            "n",
        )
    )


@query(
    "f_string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(string_split(p_name, ' ')[1], string_split(p_name, ' ')[-1])
                AS BIGINT) AS lev_tokens,
           CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_type
    FROM part
    """,
    note="Edit-distance scalar (levenshtein) between derived strings — the per-row "
    "building block of edit-distance near-dup (the pairwise form would block like the "
    "jaccard query; the scalar is what whole-stage codegen vectorizes).",
)
def f_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    t1 = first_token(F.col("p_name"))
    t2 = last_token(F.col("p_name"))
    return p.select(
        "p_partkey",
        F.levenshtein(t1, t2).cast("bigint").alias("lev_tokens"),
        F.levenshtein(F.col("p_name"), F.col("p_type")).cast("bigint").alias("lev_type"),
    )


@query(
    "a_corr_manual",
    oracle="""
    SELECT l_returnflag,
           (n * sxy - sx * sy)
             / NULLIF(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0)
             AS corr_qty_price,
           CAST(n AS BIGINT) AS n
    FROM (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    """,
    note="Pearson correlation from exact decimal moments: built-in corr() accumulates "
    "doubles in partial-aggregation order (engine-dependent bits), so the five moments "
    "are summed as exact DECIMALs and the correlation assembled in identical double "
    "arithmetic — a bit-reproducible statistical aggregate. Scale: one shuffle, "
    "map-side partials.",
)
def a_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(12,2)")
    pd_ = F.col("l_extendedprice").cast("decimal(18,2)")
    # decimal→double conversion rounds differently across engines for
    # wide values; decimal→string→double is a correctly-rounded parse in
    # both, so the moments land on identical bits (verified: the direct
    # cast diverged by one ulp at sf0.001)
    as_dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        as_dbl(F.sum(qd)).alias("sx"),
        as_dbl(F.sum(pd_)).alias("sy"),
        as_dbl(F.sum(qd * qd)).alias("sxx"),
        as_dbl(F.sum(pd_ * pd_)).alias("syy"),
        as_dbl(F.sum(qd * pd_)).alias("sxy"),
    )
    # NULLIF guards the zero-variance group: Spark's non-ANSI x/0.0 is
    # NULL while DuckDB's IEEE ops give inf/NaN — both sides must agree
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        den, F.lit(0.0)
    )
    return m.select(
        "l_returnflag", corr.alias("corr_qty_price"), F.col("n").cast("bigint").alias("n")
    )
