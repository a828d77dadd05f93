"""S1 end-to-end: canned HTML odds pages → table parse → header
promotion → one labelled frame (the reference's primary source edge,
arbitrage_scanner.py:44-70, hit on every run).

The HTML fixture is deliberately adversarial: a banner row, the header
as DATA (the reference promotes a scraped row, :65-66), a mid-table
repeated header (the rows :142-143 deletes), a blank-first-cell row, a
ragged row, nested markup + entities inside cells, attribute-carrying
and case-mixed tags, and a SECOND table that must be ignored (the
reference scrapes only ``soup.find('table')``, :50).

The oracle re-derives the cleanup in SQL from the RAW ``<tr>`` rows
(declared once as VALUES): the HTML→cells step itself is pytest-covered
in tests/test_sources.py, and this query proves the promoted frame the
engine hands downstream matches an independent SQL derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from banksy_spark.suite.registry import query

_NFL_PAGE = """
<html><body>
<div class="nav">ignore me</div>
<TABLE class="odds" id="main">
  <tr><td colspan="5">Today's&nbsp;Best <b>NFL</b> Lines</td></tr>
  <tr><th>Team</th><th>Time</th><th>DraftKings</th><th>FanDuel</th><th>Caesars</th></tr>
  <tr><td><b>3 Seattle</b> Seahawks</td><td>1:00 PM</td><td>+145 +</td><td>EVEN</td><td>N/A</td></tr>
  <tr><td>Cardinals</td><td>1:00 PM</td><td>-160</td><td>-155</td><td>+130</td></tr>
  <tr><td></td><td>ad row</td><td>x</td><td>y</td><td>z</td></tr>
  <tr><th>Team</th><th>Time</th><th>DraftKings</th><th>FanDuel</th><th>Caesars</th></tr>
  <tr><td>Bills &amp; co</td><td>4:25 PM</td><td>-3.5 -110</td><td>-3.5 -105</td><td>N/A</td></tr>
  <tr><td>Jets</td><td>4:25 PM</td><td>+3.5 -110</td><td>+3.5 +120</td></tr>
</TABLE>
<table class="footer"><tr><td>Not</td><td>this</td><td>one</td></tr></table>
</body></html>
"""

_MLB_PAGE = """
<html><body>
<table>
  <tr><td colspan="5">MLB banner</td></tr>
  <tr><td>Team</td><td>Time</td><td>DraftKings</td><td>FanDuel</td><td>Caesars</td></tr>
  <tr><td>
      12 New York Mets
  </td><td>7:10 PM</td><td>+210</td><td>EVEN</td><td>N/A</td></tr>
  <tr><td>Braves</td><td>7:10 PM</td><td>-150</td><td>+105</td><td>N/A</td></tr>
</table>
</body></html>
"""

# the RAW <tr> rows of each page's FIRST table, exactly as the parser
# must emit them (pytest proves HTML → these rows; the oracle below
# proves these rows → the promoted frame) — _seq is the tr position
_RAW_TR_ROWS = [
    ("NFL", 0, "Today's Best NFL Lines", None, None, None, None),
    ("NFL", 1, "Team", "Time", "DraftKings", "FanDuel", "Caesars"),
    ("NFL", 2, "3 Seattle Seahawks", "1:00 PM", "+145 +", "EVEN", "N/A"),
    ("NFL", 3, "Cardinals", "1:00 PM", "-160", "-155", "+130"),
    ("NFL", 4, "", "ad row", "x", "y", "z"),
    ("NFL", 5, "Team", "Time", "DraftKings", "FanDuel", "Caesars"),
    ("NFL", 6, "Bills & co", "4:25 PM", "-3.5 -110", "-3.5 -105", "N/A"),
    ("NFL", 7, "Jets", "4:25 PM", "+3.5 -110", "+3.5 +120", None),
    ("MLB", 0, "MLB banner", None, None, None, None),
    ("MLB", 1, "Team", "Time", "DraftKings", "FanDuel", "Caesars"),
    ("MLB", 2, "12 New York Mets", "7:10 PM", "+210", "EVEN", "N/A"),
    ("MLB", 3, "Braves", "7:10 PM", "-150", "+105", "N/A"),
]


def _values_sql() -> str:
    def lit(x):
        return "NULL" if x is None else "'" + str(x).replace("'", "''") + "'"

    rows = ", ".join(
        f"({lit(s)}, {i}, {lit(c0)}, {lit(c1)}, {lit(c2)}, {lit(c3)}, {lit(c4)})"
        for s, i, c0, c1, c2, c3, c4 in _RAW_TR_ROWS
    )
    return f"(VALUES {rows}) AS tr(sport, _seq, c0, c1, c2, c3, c4)"


PAGES = {"NFL": _NFL_PAGE, "MLB": _MLB_PAGE}


@query(
    "pipe_scrape_table",
    oracle=f"""
    WITH tr AS (SELECT * FROM {_values_sql()})
    SELECT c0 AS "Team", c1 AS "Time", c2 AS "DraftKings",
           c3 AS "FanDuel", c4 AS "Caesars", sport AS "Sport"
    FROM tr
    WHERE _seq > 1              -- banner row 0 + promoted header row 1
      AND c0 <> '' AND c0 IS NOT NULL
      AND c1 IS NOT NULL
      AND c0 <> 'Team'          -- mid-table repeated headers
    """,
    note="S1 HTML-table scrape end-to-end: per-sport canned pages → "
    "regex <tr>/<td> extraction (first table only, like the "
    "reference's soup.find) → banner drop + header promotion (the "
    "header row IS scraped data, arbitrage_scanner.py:61-66) + "
    "repeated-header delete (:142-143) → one labelled frame. "
    "Driver-side by design: scraping isn't distributed work; the "
    "engine sees a DataFrame (at scale, N pages fan out as N driver "
    "fetches feeding one createDataFrame — rows are per-game, "
    "thousands at most, never fact-grain).",
)
def pipe_scrape_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.sources.adapters import scrape_tables_to_df

    return scrape_tables_to_df(
        spark,
        PAGES,
        "`Team` string, `Time` string, `DraftKings` string, "
        "`FanDuel` string, `Caesars` string, `Sport` string",
        label_col="Sport",
    )
