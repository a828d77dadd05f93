"""Operator layer (SURVEY.md §2.2-2.6): reshaping, windows, dedup.

Everything order-dependent takes explicit ordering columns — Spark
DataFrames have no physical row order, so the pandas RangeIndex
semantics of the reference are reified as columns (SURVEY.md §4.3.1).
"""

from banksy_spark.operators.reshape import (
    drop_groups_with_dup,
    explode_pair,
    forward_fill,
    keep_first,
    melt,
    pair_id,
    pair_parity,
    union_all,
    with_seq,
)
from banksy_spark.operators.skew import salted_agg

__all__ = [
    "with_seq",
    "pair_id",
    "pair_parity",
    "forward_fill",
    "keep_first",
    "drop_groups_with_dup",
    "melt",
    "explode_pair",
    "union_all",
    "salted_agg",
]
