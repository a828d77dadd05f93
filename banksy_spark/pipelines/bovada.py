"""Entry point B: the Bovada semi-structured page-text parser
(bovada_pull.py:44-200) as one DataFrame expression tree.

Input: a DataFrame with one ``payload`` string column (the scraped page
text — the Selenium loop itself stays a driver-side adapter, §2.1 S2).
Output: long odds rows (date, Team, bet_type, info, Bovada) joinable
onto the canonical odds table on (Team, bet_type, info)
(arbitrage_scanner.py:207).

Per-game segment grammar (FIXTURES.md A2):
  <M/D/YY> <h:mm AM|PM> <Team1Team2> + <s1>(<p1>) <s2>(<p2>)
  <ml1> <ml2> O <total>(<p3>) U <total>(<p4>)
plus junk segments ending ' Bets' with len<25 (dropped, :56) and
repeat matchups (whole second game dropped, :156-162).

Scale note: one blob parses on one task by nature; at scale the source
would deliver one blob per (scrape, sport) shard and the explode fans
segments out across the cluster. posexplode supplies the reified
segment order (SURVEY §4.3.1) — no dependence on physical row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from banksy_spark.functions.odds import normalize_even_odds
from banksy_spark.functions.text import camel_boundary_team_1, camel_boundary_team_2
from banksy_spark.operators.reshape import drop_groups_with_dup

# SQL-literal form: backslashes doubled because F.expr parses the string
# literal with C-style escapes before the regex engine sees it.
_DATE_PAT = r"\\d{1,2}/\\d{1,2}/\\d{2}"


def parse_bovada(blob: DataFrame, min_payload_len: int = 250) -> DataFrame:
    """payload → long odds rows. Validity gate: payloads shorter than
    ``min_payload_len`` parse to zero rows (the scrape-retry predicate,
    bovada_pull.py:34)."""
    valid = blob.filter(F.length("payload") >= min_payload_len)

    # 1. date-anchored segmentation (:46-52): dates[i] pairs with the
    #    text BETWEEN date i and date i+1; split()[0] is the preamble.
    seg = valid.select(
        F.expr(f"regexp_extract_all(payload, '{_DATE_PAT}', 0)").alias("dates"),
        F.expr(f"slice(split(payload, '{_DATE_PAT}'), 2, 1000000)").alias("segs"),
    ).select(
        # zip by position; posexplode reifies the game order
        F.posexplode(F.expr("zip_with(dates, segs, (d, s) -> struct(d AS date, s AS seg))"))
    ).select(
        F.col("pos").alias("game_id"),
        F.col("col.date").alias("date"),
        F.trim(F.col("col.seg")).alias("seg"),
    )

    # 2. junk filter, De Morgan form kept from the reference (:56)
    seg = seg.filter((F.length("seg") >= 25) | (~F.col("seg").endswith(" Bets")))

    # 3. strip the clock (:58-61): slice from find('AM')-preferred-else-
    #    find('PM') + 3. Python's not-found (-1) yields [2:]; locate()'s
    #    not-found (0) + 3 = substr(3) reproduces that exactly.
    ampm = F.when(F.locate("AM", F.col("seg")) > 0, F.locate("AM", F.col("seg"))).otherwise(
        F.locate("PM", F.col("seg"))
    )
    seg = seg.withColumn("body", F.trim(F.substr(F.col("seg"), ampm + F.lit(3))))

    # 4. split the team pair from the odds at the first ' + ' (else
    #    ' - ') marker (:63-65) — multi-word team names stay intact;
    #    then the CamelCase boundary split (:105-118)
    marker = F.when(F.locate(" + ", F.col("body")) > 0, F.locate(" + ", F.col("body"))).otherwise(
        F.locate(" - ", F.col("body"))
    )
    teams_blob = F.when(marker > 0, F.substring(F.col("body"), 1, marker - 1)).otherwise(
        F.col("body")
    )
    # the reference slices conditionally then applies .str[3:]
    # UNconditionally (bovada_pull.py:65) — so a no-marker body still
    # loses its first 3 chars: substr(body, 4) in the fallback arm
    rest = F.when(marker > 0, F.substr(F.col("body"), marker + F.lit(3))).otherwise(
        F.substr(F.col("body"), F.lit(4))
    )
    seg = (
        seg.withColumn("team_1", camel_boundary_team_1(teams_blob))
        .withColumn("team_2", camel_boundary_team_2(teams_blob))
        .withColumn("rest", rest)
    )

    # 5. parenthesized payouts in order; spreads/MLs/totals from the
    #    de-parenthesized token stream of the odds part (:69-97)
    seg = seg.withColumn(
        "payouts", F.expr(r"regexp_extract_all(rest, '\\(([^)]*)\\)', 1)")
    ).withColumn(
        "toks",
        F.split(F.trim(F.regexp_replace(F.regexp_replace("rest", r"\([^)]*\)", ""), r"\s+", " ")), " "),
    )
    # toks: [s1, s2, ml1, ml2, 'O', total, 'U', total]
    get = lambda i: F.element_at(F.col("toks"), i)  # noqa: E731
    seg = seg.select(
        "game_id", "date", "team_1", "team_2",
        get(1).alias("spread_1"), get(2).alias("spread_2"),
        get(3).alias("ml_1"), get(4).alias("ml_2"),
        get(6).alias("total_o"), get(8).alias("total_u"),
        F.element_at("payouts", 1).alias("sp_pay_1"),
        F.element_at("payouts", 2).alias("sp_pay_2"),
        F.element_at("payouts", 3).alias("ou_pay_1"),
        F.element_at("payouts", 4).alias("ou_pay_2"),
    )

    # 6. emit long rows per team × bet type × info (:166-200); the
    #    explode carries each value WITH its labels — no row-order tricks
    def row(team_col, bt, info, val):
        return F.struct(
            F.col(team_col).alias("Team"), F.lit(bt).alias("bet_type"),
            F.lit(info).alias("info"), val.alias("Bovada"),
        )

    ou_line_1 = F.concat(F.lit("+"), F.col("total_o"))  # 'O'→'+' (:152-154 analog)
    ou_line_2 = F.concat(F.lit("-"), F.col("total_u"))  # 'U'→'-'
    rows = F.array(
        row("team_1", "ML", "Payout", F.col("ml_1")),
        row("team_2", "ML", "Payout", F.col("ml_2")),
        row("team_1", "Spread", "Line", F.col("spread_1")),
        row("team_1", "Spread", "Payout", F.col("sp_pay_1")),
        row("team_2", "Spread", "Line", F.col("spread_2")),
        row("team_2", "Spread", "Payout", F.col("sp_pay_2")),
        row("team_1", "Over/Under", "Line", ou_line_1),
        row("team_1", "Over/Under", "Payout", F.col("ou_pay_1")),
        row("team_2", "Over/Under", "Line", ou_line_2),
        row("team_2", "Over/Under", "Payout", F.col("ou_pay_2")),
    )
    long = seg.select("game_id", "date", F.explode(rows).alias("r")).select(
        "game_id", "date",
        F.col("r.Team").alias("Team"), F.col("r.bet_type").alias("bet_type"),
        F.col("r.info").alias("info"),
        normalize_even_odds(F.col("r.Bovada")).alias("Bovada"),  # :152-154
    )

    # 7. repeat-matchup dedup: a team's SECOND game is dropped whole —
    #    opponent's rows too (:156-162)
    return drop_groups_with_dup(
        long, dup_keys=["Team", "bet_type", "info"], order_by=["game_id"], group_col="game_id"
    )
