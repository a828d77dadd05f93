"""Skew-handling operators (SURVEY.md §7 phase 6; 100 TB posture).

AQE's skew-join splitting handles join-side skew automatically
(session.py enables it); these helpers cover aggregation-side skew,
where a handful of hot keys would otherwise serialize onto single
reducers. The classic cure: salt the key, aggregate twice.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_col: Column,
    n_salt: int = 16,
    combiners: dict[str, object] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation for hot grouping keys.

    Stage 1 groups by (keys…, salt) — the hot key's rows spread over
    ``n_salt`` reducers; stage 2 re-aggregates the partials by the real
    keys. Correct only for algebraic aggregates whose partial combines
    with a second-stage aggregate: sum/count combine with SUM (the
    default); min/max must pass ``combiners={'name': F.min}`` etc. —
    their partials do NOT sum. Pass DECIMAL-cast columns for
    order-independent sums (suite parity convention).

    ``aggs`` maps output column name → stage-1 aggregate expression.
    ``salt_col`` must be deterministic from row content (e.g.
    ``hash(id_col)``) so re-runs and retries land rows in the same salt
    bucket.
    """
    combiners = combiners or {}
    salt = F.pmod(salt_col, F.lit(n_salt)).alias("_salt")
    stage1 = df.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[combiners.get(name, F.sum)(name).alias(name) for name in aggs]
    )
