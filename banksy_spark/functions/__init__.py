"""Scalar function layer (SURVEY.md §2.7) — pure Catalyst expressions.

Every function here returns a ``Column`` built from
``pyspark.sql.functions`` only: JVM-side, codegen'd, no Python in the
hot path. These compose into the operator and pipeline layers.
"""

from banksy_spark.functions.odds import (
    american_to_decimal,
    arbitrage_margin_pct,
    best_payout_sum_is_arb,
    sign_prefix,
    normalize_even_odds,
)
from banksy_spark.functions.text import (
    extract_second_word,
    right_of_first_space,
    first_token,
    last_token,
    blank_if_contains_any,
    coerce_double,
    camel_boundary_team_1,
    camel_boundary_team_2,
)

__all__ = [
    "american_to_decimal",
    "arbitrage_margin_pct",
    "best_payout_sum_is_arb",
    "sign_prefix",
    "normalize_even_odds",
    "extract_second_word",
    "right_of_first_space",
    "first_token",
    "last_token",
    "blank_if_contains_any",
    "coerce_double",
    "camel_boundary_team_1",
    "camel_boundary_team_2",
]
