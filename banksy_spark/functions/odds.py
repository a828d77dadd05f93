"""Odds math (SURVEY.md §2.7 F15-F17, F9, F4).

The arbitrage domain's scalar core, as Catalyst expression trees. The
reference implements these as row-wise ``df.apply`` Python functions
(arbitrage_scanner.py:360-366, 381-385, 413-417); here each is a
``when`` chain that whole-stage codegen compiles, so they cost the same
as built-in arithmetic at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def american_to_decimal(odds: Column) -> Column:
    """American odds → decimal odds (arbitrage_scanner.py:360-366).

    +150 → 2.5 ; -200 → 1.5 ; 0/NULL-ish → 1.0 (reference's ``else`` arm).
    """
    return (
        F.when(odds > 0, odds / F.lit(100.0) + F.lit(1.0))
        .when(odds < 0, F.lit(100.0) / F.abs(odds) + F.lit(1.0))
        .otherwise(F.lit(1.0))
    )


def stake_for_equal_payout(base_stake: Column, own_decimal: Column, other_decimal: Column) -> Column:
    """Stake on this side so both outcomes pay the same as ``base_stake``
    on the other side (arbitrage_scanner.py:368-370): stake2 =
    base*dec_other/dec_own."""
    return base_stake * other_decimal / own_decimal


def arbitrage_margin_pct(total_payout: Column, total_stake: Column) -> Column:
    """Profit margin % = (payout - stake) / stake * 100
    (arbitrage_scanner.py:378)."""
    return (total_payout - total_stake) / total_stake * F.lit(100.0)


def best_payout_sum_is_arb(payout_sum: Column) -> Column:
    """The arbitrage test: sum of the two sides' best American odds > 0
    (arbitrage_scanner.py:283-285)."""
    return payout_sum > F.lit(0)


def sign_prefix(v: Column) -> Column:
    """Render a number with an explicit '+' on positives
    (arbitrage_scanner.py:381-385, 413-417): 150 → '+150', -110 → '-110'."""
    s = v.cast("string")
    return F.when(v > 0, F.concat(F.lit("+"), s)).otherwise(s)


def normalize_even_odds(v: Column) -> Column:
    """'EVEN'/'even' → '+100' (bovada_pull.py:152-154,194). Whole-value
    literal replace of exactly those two spellings, so an ``isin`` not a
    lowercase-compare ('Even' passes through, matching the reference).
    The separate substring-regex replace at arbitrage_scanner.py:177-179
    (which also maps 'o'→'' and 'u'→'-') is chained ``regexp_replace``
    in the pipeline layer, not this function."""
    return F.when(v.isin("EVEN", "even"), F.lit("+100")).otherwise(v)
