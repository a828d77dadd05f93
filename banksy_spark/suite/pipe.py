"""Pipeline-level suite queries: the phase-4 pipeline functions
(banksy_spark.pipelines) run over a fixed in-line fixture (FIXTURES.md
A1/A5 shapes), with DuckDB oracles that re-implement the reference
semantics independently in SQL over the same VALUES — so the driver's
correctness gate covers the pipelines, not just single operators.

The fixture is deliberately adversarial: stray header row, rank-prefixed
team with ' +' tail, EVEN/even odds, N/A and empty cells, an O/U game
with no arbitrage, and a rate-limited team in the log.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.pipelines import decide_alerts, find_arbitrage, normalize_odds
from banksy_spark.suite.registry import query

BOOKIES = ["DraftKings", "FanDuel", "Caesars"]

_RAW_ROWS = [
    (0, "Team", "NFL", "DraftKings", "FanDuel", "Caesars"),
    (1, "3 Seattle Seahawks", "NFL", "+145 +", "EVEN", "N/A"),
    (2, "Cardinals", "NFL", "-160", "-155", "+130"),
    (3, "Bills", "NFL", "-3.5 -110", "-3.5 -105", "N/A"),
    (4, "Jets", "NFL", "+3.5 -110", "+3.5 +120", ""),
    (5, "Packers", "NFL", "o47.5 -105", "o47.5 -110", "N/A"),
    (6, "Bears", "NFL", "u47.5 even", "u47.5 -120", "N/A"),
    (1, "12 New York Mets", "MLB", "+210", "EVEN", "N/A"),
    (2, "Braves", "MLB", "-150", "+105", "N/A"),
]
_RAW_SCHEMA = (
    "_seq bigint, Team string, Sport string, "
    "DraftKings string, FanDuel string, Caesars string"
)

_LOG_ROWS = [
    ("Cardinals", datetime.datetime(2024, 5, 1, 8, 0)),
    ("Cardinals", datetime.datetime(2024, 5, 1, 9, 0)),
    ("Cardinals", datetime.datetime(2024, 5, 1, 10, 0)),
    ("Braves", datetime.datetime(2024, 4, 30, 9, 0)),
]

_ALERT_TS = "2024-05-01 12:00:00"


def _raw_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_RAW_ROWS, _RAW_SCHEMA)


def _values_sql() -> str:
    rows = ", ".join(
        "({}, '{}', '{}', '{}', '{}', '{}')".format(*r) for r in _RAW_ROWS
    )
    return f"(VALUES {rows}) AS raw(_seq, team, sport, dk, fd, cz)"


def _carve_sql(raw: str) -> str:
    """DuckDB twin of odds_pipeline's per-bookie carve (incl. the
    reference's bookie-column rstrip(' +') at :86-87)."""
    col = f"rtrim({raw}, ' +')"
    pick = (
        f"CASE WHEN info = 'Line' THEN string_split({col}, ' ')[1]"
        f" ELSE string_split({col}, ' ')[-1] END"
    )
    nulled = f"CASE WHEN {col} IN ('N/A', '') THEN NULL ELSE {pick} END"
    evened = f"CASE WHEN ({nulled}) IN ('EVEN', 'even') THEN '+100' ELSE ({nulled}) END"
    return (
        f"CASE WHEN info = 'Line'"
        f" THEN regexp_replace(regexp_replace({evened}, '^o', '+'), '^u', '-')"
        f" ELSE ({evened}) END"
    )


# Shared CTE chain: raw fixture → canonical long odds (oracle twin of
# normalize_odds, re-derived in SQL from arbitrage_scanner.py semantics)
_NORM_CTES = f"""
    raw AS (SELECT * FROM {_values_sql()}),
    filt AS (
      SELECT * FROM raw WHERE team <> 'Team' AND team <> '' AND team IS NOT NULL
    ),
    clean AS (
      SELECT _seq, sport, dk, fd, cz,
             CASE WHEN len(string_split(t2, ' ')) >= 3
                  THEN string_split(t2, ' ')[1] ELSE t2 END AS team
      FROM (SELECT *, regexp_replace(team, '^\\d+ ', '') AS t2 FROM filt)
    ),
    gid AS (
      SELECT *, CAST(FLOOR((row_number() OVER (PARTITION BY sport ORDER BY _seq) - 1) / 2)
                     + 1 AS BIGINT) AS game_id
      FROM clean
    ),
    bt AS (
      SELECT *, CASE WHEN regexp_matches(rtrim(dk, ' +'), '[ou]') THEN 'Over/Under'
                     WHEN length(rtrim(dk, ' +')) IN (4, 5) THEN 'ML'
                     WHEN regexp_matches(rtrim(dk, ' +'), '[+-]') THEN 'Spread'
                     ELSE 'ERROR' END AS bet_type
      FROM gid
    ),
    longrows AS (
      SELECT b.*, i.info FROM bt b
      CROSS JOIN (VALUES ('Line'), ('Payout')) i(info)
      WHERE NOT (b.bet_type = 'ML' AND i.info = 'Line')
    ),
    canon AS (
      SELECT sport, game_id, team, bet_type, info,
             {_carve_sql('dk')} AS dk_v, {_carve_sql('fd')} AS fd_v,
             {_carve_sql('cz')} AS cz_v
      FROM longrows
    )
"""


@query(
    "pipe_normalize_odds",
    oracle=f"""
    WITH {_NORM_CTES}
    SELECT sport AS "Sport", game_id, team AS "Team", bet_type, info,
           dk_v AS "DraftKings", fd_v AS "FanDuel", cz_v AS "Caesars"
    FROM canon
    """,
    note="Pipeline: normalize_odds over the A1 fixture (arbitrage_scanner.py:60-209); "
    "oracle re-derives header drop, team cleanup, pair ids, Line/Payout explode and "
    "token fixes independently in SQL.",
)
def pipe_normalize_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_odds(_raw_df(spark), BOOKIES)


# Arbitrage chain on top of the canonical odds (oracle twin of
# find_arbitrage: greatest, argmax bookie, window arb test, stakes)
_ARB_CTES = f"""
    {_NORM_CTES},
    pay AS (
      SELECT sport, game_id, team, bet_type,
             CAST(dk_v AS DOUBLE) AS dk, CAST(fd_v AS DOUBLE) AS fd,
             CAST(cz_v AS DOUBLE) AS cz
      FROM canon WHERE info = 'Payout'
    ),
    mx AS (
      SELECT *,
             CASE WHEN dk IS NULL AND fd IS NULL AND cz IS NULL THEN NULL
                  ELSE GREATEST(COALESCE(dk, -1e18), COALESCE(fd, -1e18),
                                COALESCE(cz, -1e18)) END AS max_payout,
             CASE WHEN dk IS NULL AND fd IS NULL AND cz IS NULL THEN NULL
                  WHEN dk = GREATEST(COALESCE(dk, -1e18), COALESCE(fd, -1e18),
                                     COALESCE(cz, -1e18)) THEN 'DraftKings'
                  WHEN fd = GREATEST(COALESCE(dk, -1e18), COALESCE(fd, -1e18),
                                     COALESCE(cz, -1e18)) THEN 'FanDuel'
                  ELSE 'Caesars' END AS best_bookie
      FROM pay
    ),
    arb AS (
      SELECT *,
             SUM(max_payout) OVER (PARTITION BY sport, game_id, bet_type) AS arb_sum,
             COUNT(*) OVER (PARTITION BY sport, game_id, bet_type) AS n_sides,
             row_number() OVER (PARTITION BY sport, game_id, bet_type ORDER BY team) AS seq,
             FIRST_VALUE(max_payout) OVER (PARTITION BY sport, game_id, bet_type
                                           ORDER BY team
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND
                                           UNBOUNDED FOLLOWING) AS first_payout
      FROM mx
    ),
    dec AS (
      SELECT *,
             CASE WHEN max_payout > 0 THEN max_payout / 100.0 + 1.0
                  WHEN max_payout < 0 THEN 100.0 / ABS(max_payout) + 1.0
                  ELSE 1.0 END AS d_own,
             CASE WHEN first_payout > 0 THEN first_payout / 100.0 + 1.0
                  WHEN first_payout < 0 THEN 100.0 / ABS(first_payout) + 1.0
                  ELSE 1.0 END AS d_first
      FROM arb
      WHERE arb_sum > 0 AND n_sides = 2
        AND NOT (max_payout = 100 AND arb_sum = 200)
    ),
    staked AS (
      -- round_even = banker's rounding, matching Spark's F.bround (the
      -- pandas .round() the reference uses); plain ROUND is
      -- half-away-from-zero and diverges on exact half-cents
      SELECT *, round_even(CASE WHEN seq = 1 THEN 100.0
                                ELSE 100.0 * d_first / d_own END, 2) AS stake
      FROM dec
    ),
    opps AS (
      SELECT sport, game_id, bet_type, team, best_bookie, max_payout,
             CASE WHEN CAST(max_payout AS INT) > 0
                  THEN '+' || CAST(CAST(max_payout AS INT) AS VARCHAR)
                  ELSE CAST(CAST(max_payout AS INT) AS VARCHAR) END AS rendered_odds,
             stake,
             CAST(round_even((100.0 * d_first
                         - SUM(stake) OVER (PARTITION BY sport, game_id, bet_type))
                        / SUM(stake) OVER (PARTITION BY sport, game_id, bet_type)
                        * 100.0, 0) AS INT) AS profit_margin
      FROM staked
    )
"""


@query(
    "pipe_find_arbitrage",
    oracle=f"""
    WITH {_ARB_CTES}
    SELECT sport AS "Sport", game_id, bet_type, team AS "Team", best_bookie,
           max_payout, rendered_odds, stake, profit_margin
    FROM opps
    """,
    note="Pipeline: normalize_odds → find_arbitrage over the A1 fixture "
    "(arbitrage_scanner.py:269-293,360-378); oracle re-derives best-payout, argmax "
    "bookie, window arb test and stake/margin math in SQL.",
)
def pipe_find_arbitrage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return find_arbitrage(normalize_odds(_raw_df(spark), BOOKIES), BOOKIES)


@query(
    "pipe_decide_alerts",
    oracle=f"""
    WITH {_ARB_CTES},
    log AS (
      SELECT * FROM (VALUES
        ('Cardinals', TIMESTAMP '2024-05-01 08:00:00'),
        ('Cardinals', TIMESTAMP '2024-05-01 09:00:00'),
        ('Cardinals', TIMESTAMP '2024-05-01 10:00:00'),
        ('Braves', TIMESTAMP '2024-04-30 09:00:00')
      ) AS log(team, updated_at)
    ),
    sent AS (
      SELECT team, CAST(updated_at AS DATE) AS day, COUNT(*) AS n_sent
      FROM log GROUP BY 1, 2
    ),
    cand AS (
      SELECT o.*, CAST(TIMESTAMP '{_ALERT_TS}' AS DATE) AS day
      FROM opps o WHERE profit_margin >= 3
    )
    SELECT c.sport AS "Sport", c.game_id, c.bet_type, c.team AS "Team",
           c.best_bookie, c.max_payout, c.rendered_odds, c.stake, c.profit_margin,
           c.day, TIMESTAMP '{_ALERT_TS}' AS alert_ts,
           c.sport || ' game ' || CAST(c.game_id AS VARCHAR) || ' ' || c.bet_type
             || ': ' || c.team || ' @ ' || c.rendered_odds || ' (' || c.best_bookie
             || ') margin ' || CAST(c.profit_margin AS VARCHAR) || '%' AS combined
    FROM cand c
    LEFT JOIN sent s ON c.team = s.team AND c.day = s.day
    WHERE s.n_sent IS NULL OR s.n_sent < 3
    """,
    note="Pipeline: full chain through decide_alerts with a seeded notification log "
    "(arbitrage_scanner.py:323-514): threshold, <3/day rate limit against the log, "
    "message build. 'Cardinals' is rate-limited out by the fixture.",
)
def pipe_decide_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    opps = find_arbitrage(normalize_odds(_raw_df(spark), BOOKIES), BOOKIES).withColumn(
        "alert_ts", F.lit(_ALERT_TS).cast("timestamp")
    )
    log = spark.createDataFrame(_LOG_ROWS, "Team string, updated_at timestamp")
    to_send, _ = decide_alerts(opps, log)
    return to_send


_BLOB = (
    "Bovada Sportsbook live odds feed " + "x" * 220 + " "
    "1/12/24 7:05 PM SeahawksCardinals + -3.5(-110) +3.5(-105) -180 +155 "
    "O 47.5(-105) U 47.5(-115) "
    "1/13/24 6:30 PM PackersBears + -7(-110) +7(EVEN) EVEN +170 "
    "O 44.5(-110) U 44.5(-105) "
    "1/14/24 NFL Bets "
    "1/15/24 8:00 PM RamsSeahawks + -2.5(-110) +2.5(-110) -130 +110 "
    "O 41(-110) U 41(-110) "
    "1/16/24 7:10 PM Red SoxYankees + -1.5(-140) +1.5(+120) -115 -105 "
    "O 8.5(-110) U 8.5(-110)"
)


def _bovada_ctes() -> str:
    """DuckDB twin of parse_bovada as a reusable CTE chain ending in
    ``bov`` (game_id, date, team, bet_type, info, bovada). RE2 has no
    lookahead, so the CamelCase boundary is found with a char-list
    comprehension instead of the Spark regex: first 1-based index i≥2
    whose char is uppercase and (i==2 or the previous char isn't a
    space) — the reference's char walk (bovada_pull.py:105-118)
    verbatim."""
    emit = " UNION ALL ".join(
        f"SELECT game_id, date, {team} AS team, '{bt}' AS bet_type, "
        f"'{info}' AS info, {val} AS v FROM fields"
        for team, bt, info, val in [
            ("team_1", "ML", "Payout", "ml_1"),
            ("team_2", "ML", "Payout", "ml_2"),
            ("team_1", "Spread", "Line", "spread_1"),
            ("team_1", "Spread", "Payout", "sp_pay_1"),
            ("team_2", "Spread", "Line", "spread_2"),
            ("team_2", "Spread", "Payout", "sp_pay_2"),
            ("team_1", "Over/Under", "Line", "'+' || total_o"),
            ("team_1", "Over/Under", "Payout", "ou_pay_1"),
            ("team_2", "Over/Under", "Line", "'-' || total_u"),
            ("team_2", "Over/Under", "Payout", "ou_pay_2"),
        ]
    )
    return f"""
    blob(payload) AS (VALUES ('{_BLOB}')),
    valid AS (SELECT * FROM blob WHERE length(payload) >= 250),
    sliced AS (
      SELECT regexp_extract_all(payload, '\\d{{1,2}}/\\d{{1,2}}/\\d{{2}}') AS dates,
             string_split_regex(payload, '\\d{{1,2}}/\\d{{1,2}}/\\d{{2}}') AS parts
      FROM valid
    ),
    seg AS (
      SELECT CAST(i - 1 AS INT) AS game_id, dates[i] AS date, trim(parts[i + 1]) AS seg
      FROM sliced, unnest(generate_series(1, len(dates))) AS t(i)
    ),
    kept AS (
      SELECT * FROM seg WHERE length(seg) >= 25 OR NOT ends_with(seg, ' Bets')
    ),
    body_t AS (
      SELECT game_id, date,
             trim(substr(seg, (CASE WHEN strpos(seg, 'AM') > 0 THEN strpos(seg, 'AM')
                               ELSE strpos(seg, 'PM') END) + 3)) AS body
      FROM kept
    ),
    marked AS (
      SELECT game_id, date, body,
             CASE WHEN strpos(body, ' + ') > 0 THEN strpos(body, ' + ')
                  ELSE strpos(body, ' - ') END AS mpos
      FROM body_t
    ),
    teamed AS (
      SELECT game_id, date, tb, rest,
             COALESCE(([i FOR i IN generate_series(2, length(tb))
                        IF chars[i] BETWEEN 'A' AND 'Z'
                           AND (i = 2 OR chars[i - 1] <> ' ')])[1], 0) AS idx
      FROM (SELECT game_id, date,
                   CASE WHEN mpos > 0 THEN substr(body, 1, mpos - 1) ELSE body END AS tb,
                   -- reference applies .str[3:] unconditionally
                   -- (bovada_pull.py:65): no-marker bodies also lose 3 chars
                   CASE WHEN mpos > 0 THEN substr(body, mpos + 3) ELSE substr(body, 4) END AS rest,
                   string_split_regex(
                     CASE WHEN mpos > 0 THEN substr(body, 1, mpos - 1) ELSE body END,
                     '') AS chars
            FROM marked)
    ),
    fields AS (
      SELECT game_id, date,
             CASE WHEN idx = 0 THEN tb ELSE substr(tb, 1, idx - 1) END AS team_1,
             CASE WHEN idx = 0 THEN tb ELSE substr(tb, idx) END AS team_2,
             toks[1] AS spread_1, toks[2] AS spread_2,
             toks[3] AS ml_1, toks[4] AS ml_2,
             toks[6] AS total_o, toks[8] AS total_u,
             pays[1] AS sp_pay_1, pays[2] AS sp_pay_2,
             pays[3] AS ou_pay_1, pays[4] AS ou_pay_2
      FROM (
        SELECT t.*, regexp_extract_all(rest, '\\(([^)]*)\\)', 1) AS pays,
               string_split(trim(regexp_replace(regexp_replace(rest,
                 '\\([^)]*\\)', '', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
        FROM teamed t
      )
    ),
    bov_longrows AS ({emit}),
    normed AS (
      SELECT game_id, date, team, bet_type, info,
             CASE WHEN v IN ('EVEN', 'even') THEN '+100' ELSE v END AS bovada
      FROM bov_longrows
    ),
    offending AS (
      SELECT DISTINCT game_id FROM (
        SELECT game_id, row_number() OVER (PARTITION BY team, bet_type, info
                                           ORDER BY game_id) AS rn
        FROM normed
      ) WHERE rn >= 2
    ),
    bov AS (
      SELECT game_id, date, team, bet_type, info, bovada
      FROM normed WHERE game_id NOT IN (SELECT game_id FROM offending)
    )"""


@query(
    "pipe_parse_bovada",
    oracle=f"""
    WITH {_bovada_ctes()}
    SELECT game_id, date, team AS "Team", bet_type, info, bovada AS "Bovada"
    FROM bov
    """,
    note="Pipeline: parse_bovada over the A2 blob fixture (bovada_pull.py:44-200): "
    "date segmentation, camel team split, paren/token carving, junk filter, "
    "whole-game duplicate drop. Oracle re-derives the parse in SQL (char-list "
    "comprehension replaces the lookahead regex for the camel boundary).",
)
def pipe_parse_bovada(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.pipelines import parse_bovada

    blob = spark.createDataFrame([(_BLOB,)], "payload string")
    return parse_bovada(blob)


@query(
    "pipe_join_bovada",
    oracle=f"""
    WITH {_bovada_ctes()},
    {_NORM_CTES.lstrip()}
    SELECT c.sport AS "Sport", c.game_id, c.team AS "Team", c.bet_type, c.info,
           c.dk_v AS "DraftKings", c.fd_v AS "FanDuel", c.cz_v AS "Caesars",
           b.bovada AS "Bovada"
    FROM canon c
    LEFT JOIN bov b
      ON c.team = b.team AND c.bet_type = b.bet_type AND c.info = b.info
    """,
    note="Pipeline: the bovada enrichment join (arbitrage_scanner.py:206-209) — the "
    "parsed Bovada odds become one more bookie column on the canonical table, joined "
    "on (Team, bet_type, info) exactly like the reference (J2, 3-col key). Teams "
    "present in both fixtures (Cardinals, Packers, Bears) fill; the rest stay NULL.",
)
def pipe_join_bovada(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.pipelines import parse_bovada

    canonical = normalize_odds(_raw_df(spark), BOOKIES)
    blob = spark.createDataFrame([(_BLOB,)], "payload string")
    bov = parse_bovada(blob).select("Team", "bet_type", "info", "Bovada")
    return canonical.join(bov, ["Team", "bet_type", "info"], "left").select(
        "Sport", "game_id", "Team", "bet_type", "info",
        "DraftKings", "FanDuel", "Caesars", "Bovada",
    )
