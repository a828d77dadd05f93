"""Data-layout operators: multi-dimensional clustering keys.

``zorder_key`` is the OPTIMIZE-ZORDER primitive (Delta/Iceberg-style)
as a pure Catalyst expression: min-max normalize every dimension to a
fixed bit width (integer-exact), then bit-interleave. Rows written
sorted by the key are co-located in ALL dimensions, so parquet
row-group min/max stats prune multi-dimensional range predicates that
a single-column sort serves only for its leading key (proof:
tests/test_scale.py::test_zorder_layout_prunes_2d_boxes).

Normalization first matters: with unequal domain widths the wider key
dominates an unnormalized interleave — measured on (partkey, suppkey),
the raw 16-bit interleave pruned WORSE than a plain partkey sort.

Scale: the range aggregate is one lazy 1-row broadcast; the interleave
itself is map-only — at 100 TB this runs inside the write path
(``df.repartitionByRange(N, "zkey").sortWithinPartitions("zkey")``)
at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_col: str = "zkey"
) -> DataFrame:
    """Append an interleaved clustering key over ``cols`` (all numeric).

    Bit ``i`` of normalized column ``j`` lands at position
    ``len(cols)*i + (len(cols)-1-j)`` — for two columns this is the
    classic (a: 2i+1, b: 2i) Morton layout.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    rng = df.agg(
        *[
            agg
            for c in cols
            for agg in (F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}"))
        ]
    )
    out = df.crossJoin(F.broadcast(rng))
    terms = []
    for j, c in enumerate(cols):
        norm = f"(({c} - _mn_{c}) * {1 << bits}) DIV (_mx_{c} - _mn_{c} + 1)"
        out = out.withColumn(f"_nb_{c}", F.expr(norm))
        terms += [
            f"shiftleft(shiftright(_nb_{c}, {i}) & 1, {n * i + (n - 1 - j)})"
            for i in range(bits)
        ]
    out = out.withColumn(key_col, F.expr(" + ".join(terms)).cast("bigint"))
    drop = [f"_mn_{c}" for c in cols] + [f"_mx_{c}" for c in cols] + [
        f"_nb_{c}" for c in cols
    ]
    return out.drop(*drop)
