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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_col: Column,
    n_salt: int = 8,
) -> DataFrame:
    """Salted equi-join for a skewed key when the small side is still
    too large to broadcast (the manual fallback behind AQE's skew-join
    splitting — use AQE first; this is for pathological single-key skew
    or engines/stages where AQE cannot split).

    The big side gets a deterministic content-derived salt in
    ``[0, n_salt)``; the small side is replicated once per salt value, so
    each (key, salt) shard joins independently — a hot key's rows spread
    over ``n_salt`` reducers instead of serializing onto one.

    ``salt_col`` must be deterministic from row content (e.g.
    ``F.xxhash64(id_col)``) so retries land rows in the same shard.
    Cost: the small side shuffles n_salt× its size — salt only when a
    key is actually hot.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(salt_col, F.lit(n_salt)).cast("bigint")
    )
    salted_small = small.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(n_salt - 1).cast("bigint"))
        ).alias("_salt"),
    )
    out = salted_big.join(salted_small, [*keys, "_salt"])
    return out.drop("_salt")
