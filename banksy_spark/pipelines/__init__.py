"""Pipelines: the reference's entry points as pure DataFrame→DataFrame
functions (SURVEY.md §3, §7 phase 4). Scrapes and sinks stay at the
edges; everything here is a lazy expression tree."""

from banksy_spark.pipelines.bovada import parse_bovada
from banksy_spark.pipelines.odds_pipeline import (
    decide_alerts,
    phoenix_wall_ts,
    find_arbitrage,
    normalize_odds,
)

__all__ = ["normalize_odds", "find_arbitrage", "decide_alerts", "parse_bovada", "phoenix_wall_ts"]
