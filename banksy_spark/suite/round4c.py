"""Round-4 continuation operators: the remaining classic TPC-H query
shapes the testdata can express (Q4 existence-count, Q15 top supplier,
Q21 waiting-supplier multi-correlation, Q22 idle high-balance
customers), triangle counting on a derived graph, interval
max-concurrency via a +1/-1 sweep, and last-touch marketing
attribution.

Same parity rules as the rest of the suite (registry.py docstring):
decimal routing for aggregated money, identical aliases both sides,
decimal→double through VARCHAR when the value can carry >16 significant
digits, deterministic tie-breaks on every window ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

# --- TPC-H Q4 shape: order-priority existence count ------------------------


@query(
    "a_q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    note="TPC-H Q4 shape (reference family: EXISTS-filtered counts; the "
    "testdata has no commit/receipt dates, so 'late' = any line shipped >60 "
    "days after the order date): per-priority count of one-quarter orders "
    "having at least one late line. The EXISTS becomes a LEFT SEMI join whose "
    "condition carries both the orderkey equality and the cross-table date "
    "predicate — the semi join stops probing an order at its first late line "
    "and never duplicates order rows, so no post-join distinct is needed. "
    "Scale: the quarter filter prunes orders before the join (pushed to the "
    "scan), lineitem is only touched on the two scanned columns, and the "
    "per-priority agg is map-side combinable to ≤5 rows.",
)
def a_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- TPC-H Q15 shape: top revenue supplier ---------------------------------


@query(
    "j_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1.0 - l_discount AS DECIMAL(5,2))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(CAST(r.rev AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rev = (SELECT MAX(rev) FROM rev)
    """,
    note="TPC-H Q15 shape: the supplier(s) with maximum one-quarter revenue. "
    "The classic view + scalar-MAX subquery decorrelates into one grouped "
    "DECIMAL aggregate, a 1-row global MAX re-aggregation, and a broadcast "
    "equality join of that single row back onto the per-supplier revenues — "
    "the max comparison happens on exact DECIMAL, so ties are exact, and the "
    "double conversion goes through VARCHAR for correctly-rounded parity. "
    "Scale: lineitem is scanned once with the quarter filter pushed down; "
    "everything after the first agg is |suppliers|-sized; both the MAX row "
    "and the supplier dim broadcast.",
)
def j_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(5,2)")
        ).alias("rev")
    )
    mx = rev.agg(F.max("rev").alias("mx"))
    sup = T(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("rev") == F.col("mx"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev").cast("string").cast("double").alias("total_revenue"),
        )
    )


# --- TPC-H Q21 shape: sole-late supplier in multi-supplier orders ----------


@query(
    "j_q21_waiting_suppliers",
    oracle="""
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), flagged AS (
      SELECT l_suppkey, late,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM per_supp
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM flagged f JOIN supplier s ON s.s_suppkey = f.l_suppkey
    WHERE f.late = 1 AND f.n_supp > 1 AND f.n_late = 1
    GROUP BY s.s_name
    """,
    note="TPC-H Q21 shape (late = shipped >60 days after order date): for "
    "each supplier, how many finalized multi-supplier orders it alone held "
    "up. The reference form is a correlated EXISTS (another supplier on the "
    "order) plus NOT EXISTS (another LATE supplier) — both decorrelate into "
    "one (orderkey, suppkey) aggregate followed by two window counts over "
    "orderkey: n_supp>1 replaces EXISTS, n_late=1 replaces NOT EXISTS. The "
    "explicit repartition on l_orderkey lets the grouped agg (orderkey, "
    "suppkey — a superset key) and the window share ONE exchange. Scale: one "
    "shuffle join on orderkey, one co-partitioned window, broadcast supplier "
    "dim; nothing is per-pair.",
)
def j_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    sup = T(spark, sf_dir, "supplier")
    return (
        flagged.filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- TPC-H Q22 shape: idle high-balance customers --------------------------


@query(
    "a_q22_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE c.c_acctbal > 0.0
      AND CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.cnt > pos.tot
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
    note="TPC-H Q22 shape (mktsegment stands in for the phone country "
    "prefix; 'idle' = no order since 2000-01-01, the recency variant — every "
    "synthetic customer has SOME order): per-segment count and balance total "
    "of customers with no recent orders yet an above-average positive balance. The scalar AVG "
    "subquery is decorrelated into a 1-row (SUM, COUNT) aggregate broadcast "
    "onto every customer row, and the comparison is cross-multiplied "
    "(bal*cnt > tot) so it runs entirely in exact DECIMAL — no division, no "
    "float threshold, bit-identical tie behavior in both engines. The NOT "
    "EXISTS is a LEFT ANTI join against only the o_custkey column. Scale: "
    "customer is scanned once, the anti join is the only shuffle (orders "
    "pruned to one column), the 1-row aggregate broadcasts.",
)
def a_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("tot"),
        F.count(F.lit(1)).alias("cnt"),
    )
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    idle = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        idle.filter(F.col("c_acctbal") > 0.0)
        .crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast("decimal(18,2)") * F.col("cnt") > F.col("tot"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --- Triangle counting on a derived graph ----------------------------------

_TRI_N = 2000  # node-space modulus for the derived graph


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT
             LEAST(o_custkey % {_TRI_N}, o_orderkey % {_TRI_N}) AS u,
             GREATEST(o_custkey % {_TRI_N}, o_orderkey % {_TRI_N}) AS v
      FROM orders
      WHERE o_custkey % {_TRI_N} <> o_orderkey % {_TRI_N}
    )
    SELECT e1.u AS corner, COUNT(*) AS tri_cnt
    FROM edges e1
    JOIN edges e2 ON e2.u = e1.v
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    GROUP BY e1.u
    """,
    note="Triangle counting (graph family, alongside graph_pagerank): edges "
    "are derived deterministically from orders (custkey mod N — orderkey mod "
    "N), oriented low-id→high-id so every triangle a<b<c is enumerated "
    "exactly once: wedge join (a,b)x(b,c) then closing-edge join (a,c). "
    "Output is the per-lowest-corner triangle count. The oriented form is "
    "THE scale algorithm — an unoriented 3-way self-join counts each "
    "triangle 6x and explodes on high-degree nodes; in production the "
    "orientation key is (degree, id) rather than raw id, which bounds every "
    "node's out-degree near sqrt(|E|) and removes hub skew. The edge set is "
    "persisted once and reused by all three join legs. Scale: shuffles are "
    "keyed on edge endpoints only; intermediate wedge volume is "
    "sum-of-out-degree-squares, the quantity degree-orientation minimizes.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % _TRI_N).alias("a"),
        (F.col("o_orderkey") % _TRI_N).alias("b"),
    )
    # r14 opt (guide §2.5): the edge distinct's exchange was
    # AQE-coalesced to ONE partition (29k edges are tiny bytes), and
    # because both downstream joins broadcast, the ENTIRE wedge
    # enumeration + closing join + count ran as one 0.83 s task. The
    # explicit repartition on the edge key is the exchange the distinct
    # needs anyway, pinned (REPARTITION_BY_NUM) at the session's
    # shuffle parallelism, so the persisted edges carry that width into
    # every broadcast-probe leg.
    n_base = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    edges = (
        o.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .repartition(n_base, "u", "v")
        .distinct()
        .persist()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    return (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .groupBy(F.col("e1.u").alias("corner"))
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )


# --- Interval max-concurrency sweep ----------------------------------------

_US_PER_DAY = 86_400_000_000


@query(
    "w_max_concurrency",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type,
             epoch_us(ts) + CAST(ROUND(value * 100) AS BIGINT) * 10000 AS t,
             -1 AS d
      FROM events
    ), run AS (
      SELECT event_type, t, d,
             SUM(d) OVER (PARTITION BY event_type ORDER BY t, d) AS conc
      FROM pts
    )
    SELECT event_type, t // {_US_PER_DAY} AS day_idx,
           CAST(MAX(conc) AS BIGINT) AS max_conc
    FROM run
    GROUP BY event_type, day_idx
    """,
    note="Maximum interval concurrency (the classic sweep-line): each event "
    "opens an interval [ts, ts + value seconds); unpivot to +1/-1 boundary "
    "points, running-sum them in (t, d) order — ends sort before starts at "
    "the same instant, so touching intervals don't count as overlapping — "
    "and take the per-day maximum per event type. Durations are converted "
    "to integer microseconds via round(value*100)*10000 (value is a 2dp "
    "quantity, so the rounding is exact in both engines) and the running "
    "sum uses the default RANGE frame, which aggregates tied peers "
    "together — the result is order-deterministic without a unique "
    "tie-break column. Scale: the sort is partitioned per event_type (in "
    "production: per (type, day) with per-day open-interval carry-in, the "
    "standard segmented sweep); no joins, one exchange.",
)
def w_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    dur_us = (F.round(F.col("value") * 100, 0).cast("bigint") * 10000).alias("dur")
    starts = ev.select(
        "event_type", F.unix_micros("ts").alias("t"), F.lit(1).alias("d")
    )
    ends = ev.select(
        "event_type",
        (F.unix_micros("ts") + dur_us).alias("t"),
        F.lit(-1).alias("d"),
    )
    w = Window.partitionBy("event_type").orderBy("t", "d")
    return (
        starts.unionByName(ends)
        .select("event_type", "t", F.sum("d").over(w).alias("conc"))
        .groupBy("event_type", F.expr(f"t DIV {_US_PER_DAY}").alias("day_idx"))
        .agg(F.max("conc").alias("max_conc"))
    )


# --- Last-touch marketing attribution --------------------------------------


@query(
    "stream_attribution",
    oracle="""
    WITH lab AS (
      SELECT event_type, ts, value,
             LAST_VALUE(CASE WHEN event_type IN ('click','view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel,
             LAST_VALUE(CASE WHEN event_type IN ('click','view')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS ch_ts
      FROM events
    )
    SELECT channel, COUNT(*) AS purchases,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS revenue
    FROM lab
    WHERE event_type = 'purchase' AND channel IS NOT NULL
      AND ts <= ch_ts + INTERVAL 7 DAY
    GROUP BY channel
    """,
    note="Last-touch attribution: every purchase is credited to the user's "
    "most recent click/view within a 7-day lookback. The per-user timeline "
    "is ONE window pass — last(ignorenulls) over rows up to 1-preceding "
    "carries the latest touchpoint's (type, ts) forward; the two carried "
    "columns share the frame and null on the same rows, so they always come "
    "from the same touch event. Ordering tie-breaks on event_id, which is "
    "unique, so the carry is deterministic. Revenue sums in DECIMAL. Scale: "
    "one exchange on user_id covers the window; the final per-channel agg "
    "is map-side combinable to |channels| rows — the shape Structured "
    "Streaming runs incrementally with the touchpoint as keyed state.",
)
def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    lab = ev.select(
        "event_type",
        "ts",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("channel"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w).alias("ch_ts"),
    )
    return (
        lab.filter(
            (F.col("event_type") == "purchase")
            & F.col("channel").isNotNull()
            & (F.col("ts") <= F.col("ch_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("revenue"),
        )
    )


# --- Cascaded rollup: hourly layer re-aggregated to daily ------------------


@query(
    "stream_rollup_cascade",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             COUNT(*) AS ev_cnt,
             SUM(CAST(value AS DECIMAL(18,2))) AS val_sum
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(date_trunc('day', hr) AS DATE) AS day,
           CAST(SUM(ev_cnt) AS BIGINT) AS ev_cnt,
           MAX(ev_cnt) AS peak_hour_cnt,
           CAST(CAST(SUM(val_sum) AS VARCHAR) AS DOUBLE) AS val_sum
    FROM hourly GROUP BY 1, 2
    """,
    note="Cascaded (progressive) rollup: raw events aggregate to an hourly "
    "layer, and the daily layer re-aggregates the HOURLY rows — counts and "
    "DECIMAL sums re-sum losslessly, and the cascade also yields metrics the "
    "flat daily agg cannot express (peak hour within the day). This is the "
    "streaming-warehouse architecture for cutting state at scale: the "
    "Structured Streaming twin keeps only hour-grain state (watermark closes "
    "each hour) and the daily layer reads the compacted hourly sink — state "
    "is |types|x24 per day instead of per-event. Batch shape: two map-side "
    "combinable aggs, the second over an input already reduced ~1000x.",
)
def stream_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("ev_cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("val_sum"),
    )
    return hourly.groupBy(
        "event_type", F.date_trunc("day", "hr").cast("date").alias("day")
    ).agg(
        F.sum("ev_cnt").alias("ev_cnt"),
        F.max("ev_cnt").alias("peak_hour_cnt"),
        F.sum("val_sum").cast("string").cast("double").alias("val_sum"),
    )


# --- In-engine trained language-ID -----------------------------------------


@query(
    "llm_langid_trained",
    oracle="""
    WITH tok AS (
      SELECT d.doc_id, t.w
      FROM documents d,
           UNNEST(string_split_regex(lower(d.text), '[^a-z]+')) AS t(w)
      WHERE t.w <> ''
    ), train_cnt AS (
      SELECT d.lang, t.w, COUNT(*) AS cnt
      FROM tok t JOIN documents d USING (doc_id)
      WHERE d.doc_id % 5 <> 4
      GROUP BY 1, 2
    ), profile AS (
      SELECT lang, w FROM (
        SELECT lang, w,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, w) AS rk
        FROM train_cnt) WHERE rk <= 20
    ), test_words AS (
      SELECT DISTINCT doc_id, w FROM tok WHERE doc_id % 5 = 4
    ), scored AS (
      SELECT tw.doc_id, p.lang, COUNT(*) AS matched
      FROM test_words tw JOIN profile p ON p.w = tw.w
      GROUP BY 1, 2
    ), best AS (
      SELECT doc_id, lang AS pred_lang, matched FROM (
        SELECT doc_id, lang, matched,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY matched DESC, lang) AS rk
        FROM scored) WHERE rk = 1
    )
    SELECT b.doc_id, b.pred_lang, d.lang AS true_lang, b.matched,
           CAST(b.pred_lang = d.lang AS INTEGER) AS hit
    FROM best b JOIN documents d USING (doc_id)
    """,
    note="Language-ID trained IN the engine (vs llm_langid's fixed "
    "heuristic): an 80/20 content split by doc_id, per-language top-20 word "
    "profiles learned from the train split (rank window, deterministic "
    "(count, word) tie-break), then test docs classified by profile-hit "
    "count with argmax-per-doc (tie broken on lang). Everything is integer "
    "counts — no float model weights, so parity is exact. Scale: tokenize "
    "is map-side explode; the count agg is keyed on (lang, word); the "
    "learned profile is ~|langs|x20 rows and BROADCASTS to the scoring "
    "join, so scoring never shuffles the corpus — the standard shape for "
    "applying any small learned artifact (vocab, centroids, thresholds) to "
    "100 TB of text.",
)
def llm_langid_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    train_cnt = (
        tok.join(d.select("doc_id", "lang"), "doc_id")
        .filter(F.col("doc_id") % 5 != 4)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wprof = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "w")
    profile = (
        train_cnt.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= 20)
        .select("lang", "w")
    )
    test_words = tok.filter(F.col("doc_id") % 5 == 4).distinct()
    scored = (
        test_words.join(F.broadcast(profile), "w")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("matched"))
    )
    wbest = Window.partitionBy("doc_id").orderBy(F.col("matched").desc(), "lang")
    best = (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "matched")
    )
    return best.join(
        d.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    ).select(
        "doc_id",
        "pred_lang",
        "true_lang",
        "matched",
        (F.col("pred_lang") == F.col("true_lang")).cast("int").alias("hit"),
    )


# --- Market-basket pair mining ---------------------------------------------


@query(
    "j_basket_pairs",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p1, p2, n_orders FROM pairs WHERE n_orders >= 2
    """,
    note="Market-basket pair mining: co-purchased part pairs appearing in "
    ">=2 orders. The oracle states it as the naive within-order self-join; "
    "the Spark plan instead does ONE shuffle on orderkey, collect_set + "
    "sort_array per order, and generates ordered pairs map-side with array "
    "higher-order functions (transform x slice) — the quadratic work is "
    "bounded by basket size (<=13 lines here; capped in production), while "
    "the data-sized stages stay linear. The pair-count agg shuffles on "
    "(p1, p2), which is naturally high-cardinality (no skew). A self-join "
    "form would shuffle lineitem twice and rely on the optimizer to keep "
    "the probe local; the array form makes the locality structural.",
)
def j_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r14 opt (guide §2.5): the per-order set build + pair explode ran
    # in the stage reading the orderkey exchange, which AQE's
    # byte-based coalescing collapsed to ~3 tasks (sets are small
    # bytes, the explode is the CPU). An explicit repartition on the
    # group key is the exchange the aggregate needs anyway, pinned
    # (REPARTITION_BY_NUM) at the session's shuffle parallelism; the
    # partial agg it forgoes collapsed nothing here (the scan is one
    # task, so the "partial" already ran serially).
    n_base = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sets = li.repartition(n_base, "l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("pr")
    ).select("pr.p1", "pr.p2")
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


# --- Top-N with OTHERS rollup ----------------------------------------------


@query(
    "a_topn_others_rollup",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, c.c_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT seg, c_custkey, rev,
             ROW_NUMBER() OVER (PARTITION BY seg
                                ORDER BY rev DESC, c_custkey) AS rk
      FROM rev
    )
    SELECT seg,
           CASE WHEN rk <= 3 THEN CAST(c_custkey AS VARCHAR)
                ELSE 'OTHERS' END AS who,
           COUNT(*) AS n_custs,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS revenue
    FROM ranked
    GROUP BY 1, 2
    """,
    note="Top-N-with-OTHERS (the standard BI presentation rollup): per "
    "segment, the top-3 customers by exact DECIMAL revenue keep their "
    "identity, everyone else folds into one OTHERS row per segment. Rank "
    "ties break on custkey so the bucket assignment is deterministic; the "
    "re-grouping sums the already-aggregated DECIMAL revenues, so the "
    "OTHERS total is exact. Scale: customer broadcasts into the orders "
    "agg; the rank window runs over the |customers|-sized aggregate, not "
    "the fact table; the final agg collapses to |segments|x4 rows. The "
    "5-value segment key is low-cardinality by nature — fine for a window "
    "over pre-aggregated rows, and the reason the heavy agg keys on "
    "(seg, custkey) first.",
)
def a_topn_others_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("seg", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    # The rank exists ONLY to pick the top 3 per segment, so phrase it
    # as rank<=3 directly: Spark plans that as WindowGroupLimit (a
    # per-map-partition top-K before the shuffle), bounding what any
    # one task sorts even when a segment is most of the table. OTHERS
    # is then exact-DECIMAL subtraction of the top-3 from the per-
    # segment grand aggregate — no task ever ranks a whole segment.
    w = Window.partitionBy("seg").orderBy(F.col("rev").desc(), "c_custkey")
    top = rev.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    top_out = top.select(
        "seg",
        F.col("c_custkey").cast("string").alias("who"),
        F.lit(1).cast("bigint").alias("n_custs"),
        F.col("rev").cast("string").cast("double").alias("revenue"),
    )
    top_agg = top.groupBy("seg").agg(
        F.count(F.lit(1)).alias("t_n"), F.sum("rev").alias("t_rev")
    )
    tot_agg = rev.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("rev").alias("rev_all")
    )
    others = (
        tot_agg.join(F.broadcast(top_agg), "seg")
        .filter(F.col("n_all") > F.col("t_n"))
        .select(
            "seg",
            F.lit("OTHERS").alias("who"),
            (F.col("n_all") - F.col("t_n")).cast("bigint").alias("n_custs"),
            (F.col("rev_all") - F.col("t_rev"))
            .cast("string")
            .cast("double")
            .alias("revenue"),
        )
    )
    return top_out.unionByName(others)


# --- Schema-evolution union ------------------------------------------------


@query(
    "o_union_evolved",
    oracle="""
    SELECT doc_id, lang, n_chars, NULL AS source
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars, source
    FROM documents WHERE doc_id % 2 = 1
    """,
    note="Schema-evolution union: an old-generation extract (no source "
    "column) unions with the current generation; the missing column "
    "null-pads via unionByName(allowMissingColumns=True) — the DataFrame "
    "twin of a mergeSchema parquet read over mixed-generation files. No "
    "shuffle at all: union is a plan-level concatenation, each side keeps "
    "its own partitioning, and Catalyst still prunes columns per branch. "
    "At 100 TB this is the zero-cost way to keep old data readable after "
    "a column add — no backfill rewrite of petabytes of history.",
)
def o_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    old_gen = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    new_gen = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars", "source"
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True)
