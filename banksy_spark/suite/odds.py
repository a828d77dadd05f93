"""Odds/arbitrage domain suite — the reference's analytical core
(arbitrage_scanner.py:269-293,360-378) mapped onto the testdata.

Mapping: game = l_orderkey, the two sides of a bet = parity of
l_linenumber, the competing bookies' quotes = the multiple lineitems on
each side, and the American odds of a quote are derived deterministically
from the price: am = floor(l_extendedprice) % 401 - 200 ∈ [-200, 200].

Everything is integer/double arithmetic on both engines, so values are
bit-identical to the oracle without rounding tricks.

Scale design: one shuffle per query (groupBy game or the window over
game); no self-joins — per-group aggregates are pivoted with
max(when(...)) in the same aggregation, following SURVEY §4.2's
window-replaces-merge-back rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.functions.odds import american_to_decimal, arbitrage_margin_pct, sign_prefix
from banksy_spark.suite.registry import T, query

# American odds derived from the price, shared by every query below.
_AM_SQL = "CAST(FLOOR(l_extendedprice) AS BIGINT) % 401 - 200"


def _american(li: DataFrame) -> DataFrame:
    """lineitem + (game_id, side, am): the normalized odds long table."""
    return li.select(
        F.col("l_orderkey").alias("game_id"),
        (F.col("l_linenumber") % 2).alias("side"),
        (F.floor("l_extendedprice").cast("bigint") % 401 - 200).alias("am"),
    )


@query(
    "odds_arbitrage_core",
    oracle=f"""
    WITH odds AS (
      SELECT l_orderkey AS game_id, l_linenumber % 2 AS side,
             {_AM_SQL} AS am
      FROM lineitem
    ),
    best AS (
      SELECT game_id,
             MAX(CASE WHEN side = 0 THEN am END) AS best0,
             MAX(CASE WHEN side = 1 THEN am END) AS best1
      FROM odds GROUP BY game_id
    ),
    dec AS (
      SELECT game_id, best0, best1, best0 + best1 AS arb_sum,
             CASE WHEN best0 > 0 THEN best0 / 100.0 + 1.0
                  WHEN best0 < 0 THEN 100.0 / ABS(best0) + 1.0
                  ELSE 1.0 END AS d0,
             CASE WHEN best1 > 0 THEN best1 / 100.0 + 1.0
                  WHEN best1 < 0 THEN 100.0 / ABS(best1) + 1.0
                  ELSE 1.0 END AS d1
      FROM best WHERE best0 IS NOT NULL AND best1 IS NOT NULL
    )
    SELECT game_id, best0, best1, arb_sum, d0, d1,
           100.0 * d0 / d1 AS stake1,
           (100.0 * d0 - (100.0 + 100.0 * d0 / d1))
             / (100.0 + 100.0 * d0 / d1) * 100.0 AS margin_pct
    FROM dec WHERE arb_sum > 0
    """,
    note="FLAGSHIP: the arbitrage test (arbitrage_scanner.py:269-293) + stake/margin math "
    "(:360-378). A4 best-per-side, A1 grouped pivot-agg, F15 odds conversion, F16 margin. "
    "Scale: single shuffle on game_id; partial max map-side; no merge-back join.",
)
def odds_arbitrage_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    odds = _american(T(spark, sf_dir, "lineitem"))
    best = odds.groupBy("game_id").agg(
        F.max(F.when(F.col("side") == 0, F.col("am"))).alias("best0"),
        F.max(F.when(F.col("side") == 1, F.col("am"))).alias("best1"),
    )
    both = best.filter(F.col("best0").isNotNull() & F.col("best1").isNotNull())
    d0 = american_to_decimal(F.col("best0"))
    d1 = american_to_decimal(F.col("best1"))
    stake1 = F.lit(100.0) * d0 / d1
    payout = F.lit(100.0) * d0
    total = F.lit(100.0) + stake1
    out = both.select(
        "game_id",
        "best0",
        "best1",
        (F.col("best0") + F.col("best1")).alias("arb_sum"),
        d0.alias("d0"),
        d1.alias("d1"),
        stake1.alias("stake1"),
        arbitrage_margin_pct(payout, total).alias("margin_pct"),
    )
    return out.filter(F.col("arb_sum") > 0)


@query(
    "odds_decimal_conversion",
    oracle=f"""
    SELECT l_orderkey AS game_id, l_linenumber, am,
           CASE WHEN am > 0 THEN am / 100.0 + 1.0
                WHEN am < 0 THEN 100.0 / ABS(am) + 1.0
                ELSE 1.0 END AS decimal_odds,
           CASE WHEN am > 0 THEN '+' || CAST(am AS VARCHAR)
                ELSE CAST(am AS VARCHAR) END AS rendered
    FROM (SELECT l_orderkey, l_linenumber, {_AM_SQL} AS am FROM lineitem)
    """,
    note="F15 American→decimal odds + F9 sign-prefix rendering "
    "(custom_formula arbitrage_scanner.py:360-366; add_plus_if_positive :413-417)",
)
def odds_decimal_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("game_id"),
        "l_linenumber",
        (F.floor("l_extendedprice").cast("bigint") % 401 - 200).alias("am"),
    )
    return base.select(
        "game_id",
        "l_linenumber",
        "am",
        american_to_decimal(F.col("am")).alias("decimal_odds"),
        sign_prefix(F.col("am")).alias("rendered"),
    )


@query(
    "odds_stake_equalize",
    oracle=f"""
    WITH odds AS (
      SELECT l_orderkey AS game_id, l_linenumber, {_AM_SQL} AS am,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_extendedprice) AS seq
      FROM lineitem
    ),
    dec AS (
      SELECT game_id, l_linenumber, am, seq, (seq - 1) % 2 AS parity,
             CASE WHEN am > 0 THEN am / 100.0 + 1.0
                  WHEN am < 0 THEN 100.0 / ABS(am) + 1.0
                  ELSE 1.0 END AS d
      FROM odds
    )
    SELECT game_id, l_linenumber, am, parity,
           CASE WHEN parity = 0 THEN 100.0
                ELSE 100.0 * lag(d) OVER (PARTITION BY game_id ORDER BY seq) / d
           END AS stake
    FROM dec
    """,
    note="W2 row-parity branch + stake equalization (arbitrage_scanner.py:368-370): "
    "even rows stake 100, odd rows stake so both outcomes pay alike",
)
def odds_stake_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    odds = li.select(
        F.col("l_orderkey").alias("game_id"),
        "l_linenumber",
        "l_extendedprice",
        (F.floor("l_extendedprice").cast("bigint") % 401 - 200).alias("am"),
    )
    # l_linenumber is not unique per order — tie-break on price for a
    # deterministic total order (SURVEY §4.3.1).
    w = Window.partitionBy("game_id").orderBy("l_linenumber", "l_extendedprice")
    odds = odds.withColumn("seq", F.row_number().over(w))
    d = american_to_decimal(F.col("am"))
    parity = (F.col("seq") - 1) % 2
    stake = F.when(parity == 0, F.lit(100.0)).otherwise(
        F.lit(100.0) * F.lag(d).over(w) / d
    )
    return odds.select(
        "game_id", "l_linenumber", "am",
        parity.cast("bigint").alias("parity"), stake.alias("stake")
    )


@query(
    "odds_sign_audit",
    oracle=f"""
    WITH odds AS (
      SELECT l_orderkey AS game_id, l_linenumber, {_AM_SQL} AS am,
             CASE WHEN {_AM_SQL} > 0 THEN '+' ELSE '-' END AS sign
      FROM lineitem
    )
    SELECT o.game_id, o.l_linenumber, o.sign, CAST(g.n_signs AS BIGINT) AS n_signs
    FROM odds o
    JOIN (SELECT game_id, COUNT(DISTINCT sign) AS n_signs FROM odds GROUP BY 1
          HAVING COUNT(DISTINCT sign) <> 1) g USING (game_id)
    """,
    note="A5 sign audit: keep games whose lines don't all share one sign "
    "(groupby.transform('nunique').ne(1), arbitrage_scanner.py:427-431) — window, no join",
)
def odds_sign_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    am = F.floor("l_extendedprice").cast("bigint") % 401 - 200
    odds = li.select(
        F.col("l_orderkey").alias("game_id"),
        "l_linenumber",
        F.when(am > 0, "+").otherwise("-").alias("sign"),
    )
    w = Window.partitionBy("game_id")
    n_signs = F.size(F.collect_set("sign").over(w)).cast("bigint")
    return (
        odds.withColumn("n_signs", n_signs)
        .filter(F.col("n_signs") != 1)
        .select("game_id", "l_linenumber", "sign", "n_signs")
    )


@query(
    "odds_rate_limit",
    oracle="""
    WITH log AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_sent
      FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS day, log.n_sent
    FROM events e
    LEFT JOIN log ON e.user_id = log.user_id AND CAST(e.ts AS DATE) = log.day
    WHERE e.event_type = 'error' AND (log.n_sent IS NULL OR log.n_sent < 3)
    """,
    note="J8+A3 daily rate limit: candidates joined to per-(key,day) send counts, keep "
    "count<3-or-never-sent (arbitrage_scanner.py:434-461)",
)
def odds_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    log = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_sent"))
    )
    cand = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.to_date("ts").alias("day")
    )
    joined = cand.join(log, ["user_id", "day"], "left")
    return joined.filter(F.col("n_sent").isNull() | (F.col("n_sent") < 3)).select(
        "event_id", "user_id", "day", "n_sent"
    )


@query(
    "odds_message_build",
    oracle=f"""
    WITH odds AS (
      SELECT l_orderkey AS game_id, l_linenumber % 2 AS side, {_AM_SQL} AS am
      FROM lineitem
    ),
    best AS (
      SELECT game_id,
             MAX(CASE WHEN side = 0 THEN am END) AS best0,
             MAX(CASE WHEN side = 1 THEN am END) AS best1
      FROM odds GROUP BY game_id
      HAVING MAX(CASE WHEN side = 0 THEN am END) + MAX(CASE WHEN side = 1 THEN am END) > 0
    ),
    lines AS (
      SELECT game_id, best0 + best1 AS arb_sum,
             'Game ' || CAST(game_id AS VARCHAR) || ': '
               || (CASE WHEN best0 > 0 THEN '+' || CAST(best0 AS VARCHAR)
                        ELSE CAST(best0 AS VARCHAR) END)
               || ' / '
               || (CASE WHEN best1 > 0 THEN '+' || CAST(best1 AS VARCHAR)
                        ELSE CAST(best1 AS VARCHAR) END) AS line
      FROM best
    )
    SELECT string_agg(line, chr(10) ORDER BY arb_sum DESC, game_id) AS message,
           COUNT(*) AS n_opportunities
    FROM lines
    """,
    note="A6+F9 alert message build: per-opportunity line, concat ordered by margin desc, "
    "joined with newlines into one scalar (arbitrage_scanner.py:478-491)",
)
def odds_message_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    odds = _american(T(spark, sf_dir, "lineitem"))
    best = (
        odds.groupBy("game_id")
        .agg(
            F.max(F.when(F.col("side") == 0, F.col("am"))).alias("best0"),
            F.max(F.when(F.col("side") == 1, F.col("am"))).alias("best1"),
        )
        .filter((F.col("best0") + F.col("best1")) > 0)
    )
    line = F.concat(
        F.lit("Game "),
        F.col("game_id").cast("string"),
        F.lit(": "),
        sign_prefix(F.col("best0")),
        F.lit(" / "),
        sign_prefix(F.col("best1")),
    )
    lines = best.select(
        (F.col("best0") + F.col("best1")).alias("arb_sum"), "game_id", line.alias("line")
    )
    # Order inside the aggregate is pinned by sorting struct keys:
    # (-arb_sum asc ≡ arb_sum desc, then game_id asc).
    sortable = lines.select(
        F.struct((-F.col("arb_sum")).alias("k1"), F.col("game_id").alias("k2"),
                 F.col("line").alias("line")).alias("s")
    )
    return sortable.agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda x: x["line"]), "\n"
        ).alias("message"),
        F.count("*").alias("n_opportunities"),
    )
