"""Property-based checks (SURVEY §5.2 item 4), deterministic profile.

The properties pin the reference's *semantics*, including where its
heuristic deliberately diverges from true arbitrage math.
"""

from __future__ import annotations

from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from banksy_spark.functions.odds import american_to_decimal

# odds away from the degenerate (-100, 100) band, like real books
_odds = st.integers(min_value=101, max_value=500)


def _decimal(am: int) -> float:
    if am > 0:
        return am / 100.0 + 1.0
    if am < 0:
        return 100.0 / abs(am) + 1.0
    return 1.0


@settings(max_examples=50, deadline=None)
@given(a=_odds, b=_odds)
def test_mixed_sign_flag_equals_true_arbitrage(a: int, b: int):
    """For the common one-favorite case (a>0, b<0) the reference's
    `a + b > 0` test (arbitrage_scanner.py:283-285) is EXACTLY the true
    arbitrage condition 1/d(a) + 1/d(-b) < 1 — algebra, not luck.

    a == |b| is excluded: the sum is exactly 1 mathematically but lands
    at 0.999… in floats (the knife-edge where the heuristic and float
    comparison disagree by one ulp)."""
    assume(a != b)
    flag = a + (-b) > 0
    true_arb = 1.0 / _decimal(a) + 1.0 / _decimal(-b) < 1.0
    assert flag == true_arb


@settings(max_examples=20, deadline=None)
@given(a=_odds, b=_odds)
def test_both_positive_flag_overreports(a: int, b: int):
    """Both-sides-positive: the reference flags every pair (sum>0) but
    true arbitrage additionally needs a*b > 10000. We replicate the
    reference faithfully, so document the divergence as a property:
    flagged ⊇ true-arb, with equality iff a*b > 10000."""
    flag = a + b > 0
    true_arb = 1.0 / _decimal(a) + 1.0 / _decimal(b) < 1.0
    assert flag  # always flagged
    assert true_arb == (a * b > 10000)


def test_stake_math_equalizes_payouts(spark):
    """Stakes per arbitrage_scanner.py:368-370: whatever the outcome,
    the payout is identical (within float ε) — checked through the
    Spark expression tree, not Python."""
    rows = [(150, -120), (225, -180), (105, -101), (300, 250)]
    df = spark.createDataFrame(rows, "a int, b int")
    d_a = american_to_decimal(F.col("a"))
    d_b = american_to_decimal(F.col("b"))
    stake_b = F.lit(100.0) * d_a / d_b
    out = df.select(
        (F.lit(100.0) * d_a).alias("payout_a"),
        (stake_b * d_b).alias("payout_b"),
    )
    for r in out.collect():
        assert abs(r.payout_a - r.payout_b) < 1e-9
