"""Round-4 continuation, batch 9: ABC inventory classification, interval
merging (union of overlapping intervals), and association-rule metrics
(support / confidence / lift) over co-purchase pairs.

Same parity rules as the rest of the suite (registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

# --- ABC inventory classification ------------------------------------------


@query(
    "a_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
             SUM(rev) OVER () AS tot
      FROM rev
    ), classed AS (
      SELECT rev,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class, COUNT(*) AS n_parts,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS revenue
    FROM classed GROUP BY abc_class
    """,
    note="ABC inventory classification: parts ranked by exact DECIMAL "
    "revenue, class A while the running share stays within 80%, B to 95%, "
    "C after — both thresholds cross-multiplied so classification never "
    "touches a float. The running-revenue share rides operators/"
    "ordinals.py: per-bucket exact DECIMAL partial sums prefix-offset "
    "the intra-bucket running sum (every window PARTITION BY bucket) "
    "and the grand total attaches as a literal — no single-partition "
    "window even though the input is only |parts| rows, so the same "
    "query shape survives a fact-grain key. Tie-break on partkey pins "
    "boundary assignment. Scale: one map-side-combinable agg over "
    "lineitem; 3 output rows.",
)
def a_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import global_ordinals

    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    ).localCheckpoint(eager=False)  # sampled + counted + ranked: agg once
    ranked = global_ordinals(
        rev,
        ["-rev", "l_partkey"],
        cumsum=[("rev", "cum")],
        totals=[("rev", "tot")],
    ).select("rev", "cum", "tot")
    abc = (
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
    )
    return (
        ranked.select("rev", abc.alias("abc_class"))
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("string").cast("double").alias("revenue"),
        )
    )


# --- Merge overlapping intervals -------------------------------------------


@query(
    "w_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(ROUND(value * 100) AS BIGINT) * 10000 AS e
      FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) IS NULL
                    OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk,
             event_id
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY s, event_id)
               AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           MIN(s) AS merged_start_us, MAX(e) AS merged_end_us,
           COUNT(*) AS n_intervals
    FROM islands
    GROUP BY user_id, island
    """,
    note="Union of overlapping intervals (interval merge): each event "
    "opens [ts, ts + value seconds); per user, a new merged island begins "
    "whenever an interval starts strictly after the running MAX of all "
    "previous ends (the running max — not lag(end) — is what makes the "
    "merge correct when an earlier interval fully contains later ones). "
    "Integer-microsecond arithmetic throughout; (s, event_id) ordering is "
    "unique so both windows are deterministic. The sweep twin of "
    "w_max_concurrency: that one counts overlap depth, this one produces "
    "the merged coverage spans — together they're the interval-algebra "
    "pair behind outage windows and session coverage. Scale: one user_id "
    "exchange shared by both windows and the final island agg.",
)
def w_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    dur = F.round(F.col("value") * 100, 0).cast("bigint") * 10000
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + dur).alias("e"),
    )
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max = F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    islands = iv.select(
        "user_id", "s", "e", "event_id", F.sum(brk).over(wo).alias("island")
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("merged_start_us"),
        F.max("e").alias("merged_end_us"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


# --- Association rules: support / confidence / lift ------------------------

# Pair-explode shuffle sizing: ~200k pair rows per task (the x30 run
# measured 850k/task spilling and ~210k/task linear), estimating
# ~2 pairs per lineitem row (TPC-H baskets average ~4 items -> C(4,2)=6
# pairs per ~4 rows; the 27M pairs / 18M rows x30 measurement is 1.5).
_PAIR_ROWS_PER_TASK = 200_000
_PAIRS_PER_LINEITEM = 2


def _pair_parallelism(spark: SparkSession, n_li: int) -> int:
    """Partitions for the exploded-pair exchange: never below the
    session shuffle parallelism (small SFs keep their plan unchanged),
    scaling up with the estimated pair count when the data outgrows the
    session constant — the in-plan form of the x30 diagnosis's manual
    ``shuffle_partitions=128``. Capped at 4096 as a runaway guard (at
    that size a real deployment resizes the session, and AQE coalesces
    any overshoot)."""
    conf = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    est_pairs = _PAIRS_PER_LINEITEM * int(n_li)
    return max(conf, min(4096, est_pairs // _PAIR_ROWS_PER_TASK))


@query(
    "j_basket_lift",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
    item AS (SELECT l_partkey, COUNT(*) AS cnt FROM op GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS pair_cnt
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT p.p1, p.p2, p.pair_cnt, i1.cnt AS cnt1, i2.cnt AS cnt2,
           CAST(p.pair_cnt AS DOUBLE) / nb.n_orders AS support,
           CAST(p.pair_cnt AS DOUBLE) / i1.cnt AS confidence,
           CAST(p.pair_cnt AS DOUBLE) * nb.n_orders / i1.cnt / i2.cnt AS lift
    FROM pairs p
    JOIN item i1 ON i1.l_partkey = p.p1
    JOIN item i2 ON i2.l_partkey = p.p2
    CROSS JOIN nb
    """,
    note="Association-rule metrics over co-purchase pairs: support, "
    "confidence and lift for part pairs appearing in >=3 orders. The pair "
    "counts reuse j_basket_pairs' shape (the oracle states the naive "
    "self-join; Spark generates pairs map-side from per-order sorted item "
    "sets, one orderkey shuffle); item marginals and the 1-row basket "
    "total then BROADCAST onto the filtered pair list, so the ratio "
    "columns cost no extra shuffle. All ratios divide integer-exact "
    "counts in the identical left-to-right association (a/b/c form, no "
    "reassociation), so parity is bit-exact. Scale: the HAVING prunes "
    "pairs before the marginal joins; everything after the pair agg is "
    "pruned-pair-list sized. The pair-explode exchange is sized to the "
    "DATA (memoized lineitem count -> _pair_parallelism), not the "
    "session constant: the x30 scale run measured 27M exploded pairs "
    "landing 850k/task on fixed 32 partitions (sort/spill, the one "
    "steepening slope in SCALE.md) and 128 partitions restoring the "
    "linear slope — this encodes that fix in-plan.",
)
def j_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r14 opt (guide §2.5): the heavy chain — per-order set build +
    # pair explode — ran in the stage reading the orderkey exchange,
    # which AQE's byte-based coalescing collapsed to ~3 tasks. The
    # explicit repartition on the group key is the exchange the
    # aggregate needs anyway, pinned (REPARTITION_BY_NUM) at the
    # session's shuffle parallelism; collect_set absorbs the distinct,
    # so the sets chain needs no separate op. The three marginal
    # subtrees (i1/i2/nb) stay lazy duplicates on purpose: they
    # materialize CONCURRENTLY under AQE and an eager shared
    # checkpoint was measured WORSE (2.38 vs 1.84 s min — the
    # materialization barrier serializes the three cheap broadcast
    # sides).
    n_base = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    op = li.distinct()
    nb = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    sets = li.repartition(n_base, "l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    from banksy_spark.operators.ordinals import memoized_count

    n_pairs_part = _pair_parallelism(spark, memoized_count(li, "basket_li"))
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
        # NB: this explicit exchange sits BELOW partial aggregation, so
        # the shuffle carries raw exploded pairs with no map-side
        # combine. Measured fine on the near-unique-pair ×30 replica
        # (slope 8.02, SCALE.md); if duplicate-heavy basket regimes
        # appear, prefer raising spark.sql.shuffle.partitions for the
        # aggregate (keeping partial agg above the exchange) over this
        # pre-aggregation repartition (round-11 ADVICE adjudication).
        .repartition(n_pairs_part, "p1", "p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 3)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("cnt").alias("cnt1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("cnt").alias("cnt2"))
    pc = F.col("pair_cnt").cast("double")
    return (
        pairs.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .crossJoin(F.broadcast(nb))
        .select(
            "p1",
            "p2",
            "pair_cnt",
            "cnt1",
            "cnt2",
            (pc / F.col("n_orders")).alias("support"),
            (pc / F.col("cnt1")).alias("confidence"),
            (pc * F.col("n_orders") / F.col("cnt1") / F.col("cnt2")).alias("lift"),
        )
    )


# --- Partition checksum (cross-system reconciliation) ----------------------


@query(
    "dq_partition_checksum",
    oracle="""
    WITH h AS (
      SELECT source,
             md5(CAST(doc_id AS VARCHAR) || '|' || lang || '|'
                 || CAST(n_chars AS VARCHAR)) AS row_h
      FROM documents
    )
    SELECT source, COUNT(*) AS n_rows,
           md5(string_agg(row_h, '' ORDER BY row_h)) AS checksum
    FROM h GROUP BY source
    """,
    note="Per-partition content checksum: a deterministic md5 over each "
    "source's row hashes, ORDER-CANONICALIZED by sorting the row hashes "
    "before chaining — so the checksum is identical no matter how either "
    "engine partitions or orders the scan. This is the migration/replica "
    "reconciliation primitive (the cheap first pass before a row-level "
    "diff like o_snapshot_diff): ship (partition, n_rows, checksum) from "
    "both systems, compare 3 columns per partition instead of the data. "
    "Scale: row hashing is map-side; the sort is per-partition-key over "
    "that key's rows only. For partitions too large to sort, the swap is "
    "an order-free combiner (XOR/sum of row hashes) — weaker but "
    "mergeable; noted, not substituted.",
)
def dq_partition_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    row_h = F.md5(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
        )
    )
    return (
        d.select("source", row_h.alias("row_h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_list("row_h")))
            ).alias("checksum"),
        )
    )


# --- Dataset card stats ------------------------------------------------------


@query(
    "llm_dataset_card",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                AS BIGINT) AS en_docs,
           COUNT(*) - COUNT(DISTINCT text) AS dup_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY source
    """,
    note="Dataset-card statistics per source: document count, total "
    "characters, language spread, English share, exact duplicate count "
    "(rows minus distinct texts), and mean length — the one-pass summary "
    "block a corpus release ships with (HF dataset cards / Dolma-style "
    "reports). Everything is integer except the final mean, which divides "
    "two integer-exact values. COUNT(DISTINCT text) hashes full payloads; "
    "at 100 TB the swap is distinct-over-md5 (shuffle 16-byte digests, "
    "not documents — the exact trick llm_dedup_exact uses) or the HLL "
    "register sketch for approximate spread. Scale: one aggregate, "
    "|sources| output rows.",
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en_docs"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("dup_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


# --- Degree histogram of the derived graph ---------------------------------

_DEG_N = 2000


@query(
    "graph_degree_histogram",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT
             LEAST(o_custkey % {_DEG_N}, o_orderkey % {_DEG_N}) AS u,
             GREATEST(o_custkey % {_DEG_N}, o_orderkey % {_DEG_N}) AS v
      FROM orders
      WHERE o_custkey % {_DEG_N} <> o_orderkey % {_DEG_N}
    ), sym AS (
      SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0
    ), deg AS (
      SELECT node, COUNT(*) AS degree FROM sym GROUP BY node
    )
    SELECT degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
    note="Degree histogram of the derived order graph (same edge "
    "construction as graph_triangle_count): per-node degree via the "
    "symmetrized endpoint explode, then the degree-frequency rollup — "
    "the first diagnostic you run before choosing graph-algorithm "
    "strategy (hub skew here is what motivates degree-ORIENTED triangle "
    "counting and frontier-based BFS). Two keyed aggregates, both "
    "map-side combinable; the endpoint explode is a zero-shuffle UNION "
    "ALL of two column projections. Scale: output is bounded by max "
    "degree; the node-degree intermediate is |V|-sized.",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % _DEG_N).alias("a"),
        (F.col("o_orderkey") % _DEG_N).alias("b"),
    )
    e0 = (
        o.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    sym = e0.select(F.col("u").alias("node")).unionByName(
        e0.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


# --- Two-proportion z-test (A/B conversion) --------------------------------


@query(
    "a_ab_test_ztest",
    oracle="""
    WITH conv AS (
      SELECT user_id, user_id % 2 AS cohort,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT
        CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN cohort = 0 THEN converted ELSE 0 END)
             AS BIGINT) AS x_a,
        CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN cohort = 1 THEN converted ELSE 0 END)
             AS BIGINT) AS x_b
      FROM conv
    )
    SELECT n_a, x_a, n_b, x_b,
           CAST(x_a AS DOUBLE) / n_a AS rate_a,
           CAST(x_b AS DOUBLE) / n_b AS rate_b,
           (CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
             / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 / n_a + 1e0 / n_b)) AS z_score
    FROM agg
    """,
    note="Two-proportion z-test on user-parity A/B cohorts (converted = "
    "any purchase): the experiment-analysis primitive, computed as one "
    "per-user conversion rollup plus one 4-counter aggregate — every "
    "input to the z formula is an exact integer, and the pooled-variance "
    "expression evaluates the identical double tree in both engines. "
    "Scale: the user rollup is one keyed exchange (or the per-user flag "
    "already exists in a profile table); the z computation is a 1-row "
    "formula. Assignment by hash parity is the production pattern "
    "(deterministic, join-free, consistent across sessions).",
)
def a_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    conv = conv.select(
        (F.col("user_id") % 2).alias("cohort"), "converted"
    )
    agg = conv.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("cohort") == 0, F.col("converted")).otherwise(0)).alias(
            "x_a"
        ),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("cohort") == 1, F.col("converted")).otherwise(0)).alias(
            "x_b"
        ),
    )
    ra = F.col("x_a").cast("double") / F.col("n_a")
    rb = F.col("x_b").cast("double") / F.col("n_b")
    p = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        z.alias("z_score"),
    )


# --- Day-of-week x hour activity grid --------------------------------------


@query(
    "a_dow_hour_grid",
    oracle="""
    WITH g AS (
      SELECT (epoch_us(ts) // 86400000000) % 7 AS dow_idx,
             (epoch_us(ts) % 86400000000) // 3600000000 AS hour_of_day,
             COUNT(*) AS events
      FROM events GROUP BY 1, 2
    )
    SELECT dow_idx, hour_of_day, events,
           CAST(events AS DOUBLE)
             / SUM(events) OVER (PARTITION BY dow_idx) AS share_of_dow
    FROM g
    """,
    note="Day-of-week x hour-of-day activity heatmap grid with per-day "
    "shares. The weekday index is computed ARITHMETICALLY from epoch "
    "microseconds ((days since epoch) mod 7) rather than via dayofweek()/ "
    "extract(dow) — the two engines disagree on weekday numbering origin "
    "(Spark: 1=Sunday; DuckDB: 0=Sunday) and both depend on session "
    "timezone; integer epoch math sidesteps the whole class. One "
    "map-side-combinable count agg to the 7x24 grid, then a window share "
    "over 168 rows. Scale: grid-sized everything after the first agg.",
)
def a_dow_hour_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    g = ev.groupBy(
        F.expr("(unix_micros(ts) DIV 86400000000) % 7").alias("dow_idx"),
        F.expr("(unix_micros(ts) % 86400000000) DIV 3600000000").alias(
            "hour_of_day"
        ),
    ).agg(F.count(F.lit(1)).alias("events"))
    w = Window.partitionBy("dow_idx")
    return g.select(
        "dow_idx",
        "hour_of_day",
        "events",
        (F.col("events").cast("double") / F.sum("events").over(w)).alias(
            "share_of_dow"
        ),
    )


# --- RFM customer segmentation ---------------------------------------------


@query(
    "a_rfm_segmentation",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       DATE '2001-08-01') AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, recency_days, frequency,
             NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'new'
                ELSE 'regular' END AS segment
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    note="RFM segmentation: per-customer recency (days before the corpus "
    "horizon 2001-08-01), frequency and exact DECIMAL monetary, scored "
    "into quintiles with NTILE — every NTILE ordering carries the custkey "
    "tie-break, which is what makes NTILE deterministic (ties at a "
    "quintile boundary otherwise land arbitrarily, a known cross-engine "
    "hash flake). Output is the scored-cell census plus the classic "
    "champion/at-risk/new labeling. Scale: one orders aggregate; each "
    "of the three quintile scores rides operators/ordinals.py — "
    "range-bucketed exact global row number + integer tile arithmetic, "
    "every window PARTITION BY bucket (the chained calls re-sort the "
    "|customers| frame three times, same sort count as three NTILEs, "
    "but none through a single partition; on a cluster you'd persist "
    "the customer aggregate across the three bucketings).",
)
def a_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import multi_ordinals

    o = T(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-08-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    # one shared sampling/directory pass scores all three dimensions;
    # materialize the customer aggregate once so the three bounded
    # driver jobs don't re-aggregate orders
    cust = cust.localCheckpoint(eager=False)
    scored = multi_ordinals(
        cust,
        [
            {"order": ["recency_days", "o_custkey"], "ntile": (5, "r_score")},
            {"order": ["-frequency", "o_custkey"], "ntile": (5, "f_score")},
            {"order": ["-monetary", "o_custkey"], "ntile": (5, "m_score")},
        ],
    ).select("r_score", "f_score", "m_score")
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "at_risk")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "new")
        .otherwise("regular")
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
            "n_customers",
            seg.alias("segment"),
        )
    )


# --- Return rate per brand ---------------------------------------------------


@query(
    "a_return_rate_brand",
    oracle="""
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS returned,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS return_rate,
           CAST(CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                              THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS VARCHAR) AS DOUBLE) AS returned_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
    note="Return rate and returned revenue per brand (l_returnflag = 'R'): "
    "conditional counts and a conditional DECIMAL revenue sum in ONE "
    "aggregate pass over the broadcast part join — the merchandising "
    "quality readout, same one-pass CASE-sum discipline as the Q12/Q14 "
    "shapes. The rate divides integer-exact counts; the revenue converts "
    "once through VARCHAR. Scale: broadcast dim, map-side combinable, "
    "|brands| output rows.",
)
def a_return_rate_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice"
    )
    pt = T(spark, sf_dir, "part").select("p_partkey", "p_brand")
    is_r = F.col("l_returnflag") == "R"
    ret = F.sum(F.when(is_r, 1).otherwise(0))
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            ret.alias("returned"),
            (ret.cast("double") / F.count(F.lit(1))).alias("return_rate"),
            F.sum(
                F.when(
                    is_r, F.col("l_extendedprice").cast("decimal(18,2)")
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("string")
            .cast("double")
            .alias("returned_revenue"),
        )
    )
