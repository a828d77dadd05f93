"""Row-order reification + reshaping operators (SURVEY.md §2.5, §2.6).

The reference leans on the pandas RangeIndex for meaning: adjacent row
pairs form a game (arbitrage_scanner.py:104 ``game_id = i//2+1``), row
parity selects team-1 vs team-2 (arbitrage_scanner.py:368-370),
``ffill`` copies a value to the partner row (arbitrage_scanner.py:369).
Spark has no row order, so every operator here takes explicit ordering
columns and builds a window. The ordering must be a *deterministic total
order* (e.g. ``(l_orderkey, l_linenumber)``) — never rely on scan order,
never use ``monotonically_increasing_id`` for cross-partition sequences.

Scale note: a single global ``row_number()`` over an unpartitioned
window serializes onto one task — fine for the reference's 10³ rows,
fatal at 100 TB. Every helper therefore takes ``partition_by``; at
scale the order-dependent semantics only ever matter *within* a game /
group, which is exactly the partition key. The unpartitioned form is
allowed but reserved for small normalized slices (post-filter odds
tables), not raw facts.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _window(order_by: Sequence[ColumnOrName], partition_by: Sequence[ColumnOrName] | None):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*order_by)


def with_seq(
    df: DataFrame,
    order_by: Sequence[ColumnOrName],
    partition_by: Sequence[ColumnOrName] | None = None,
    col_name: str = "_seq",
) -> DataFrame:
    """Reify row order: 1-based dense sequence over an explicit total
    order (the ``_seq`` contract, SURVEY.md §4.3.1)."""
    return df.withColumn(col_name, F.row_number().over(_window(order_by, partition_by)))


def pair_id(seq: Column) -> Column:
    """Adjacent-pair id from a 1-based sequence: rows (1,2)→1, (3,4)→2.

    The reference's ``game_id = i//2 + 1`` on a 0-based index
    (arbitrage_scanner.py:104-116) ≡ ``floor((seq-1)/2)+1`` on 1-based.
    """
    return (F.floor((seq - 1) / 2) + 1).cast("long")


def pair_parity(seq: Column) -> Column:
    """0 for the first row of a pair, 1 for the second (reference's
    even/odd index branch, arbitrage_scanner.py:368-370; pandas is
    0-based so 1-based seq shifts by one)."""
    return ((seq - 1) % 2).cast("int")


def forward_fill(
    df: DataFrame,
    col: str,
    order_by: Sequence[ColumnOrName],
    partition_by: Sequence[ColumnOrName] | None = None,
) -> DataFrame:
    """pandas ``fillna(method='ffill')`` (arbitrage_scanner.py:369) as a
    running ``last(ignorenulls)`` window."""
    w = _window(order_by, partition_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(col, F.last(F.col(col), ignorenulls=True).over(w))


def keep_first(
    df: DataFrame,
    keys: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
) -> DataFrame:
    """Keep the earliest row per key under a *pinned* order.
    ``dropDuplicates`` alone keeps an arbitrary row; rank and filter
    keeps the first. Note: exact parity with bovada_pull.py:156-162
    (second-matchup removal) additionally drops the *whole* duplicate
    game — both the repeated team's row and its opponent's — which is
    ``drop_groups_with_dup`` below, not this row-level keep-first."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def drop_groups_with_dup(
    df: DataFrame,
    dup_keys: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
    group_col: str,
) -> DataFrame:
    """Group-level anti-join parity with bovada_pull.py:156-162: when a
    key (team) appears a second time, drop the *entire* second group
    (game) — repeat row and its partner rows alike. Rank occurrences per
    key, collect the group ids of rank≥2 rows, anti-join them away.

    ``group_col`` must be a column *name* (str): the join-back needs the
    output column name, and deriving one from a Column expression relies
    on private APIs that don't exist under Spark Connect."""
    if not isinstance(group_col, str):
        raise TypeError("group_col must be a column name (str)")
    group_name = group_col
    w = Window.partitionBy(*dup_keys).orderBy(*order_by)
    offending = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") >= 2)
        .select(group_name)
        .distinct()
    )
    return df.join(offending, on=group_name, how="left_anti")


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long unpivot (pd.melt, arbitrage_scanner.py:336-343,410).

    Uses the native ``unpivot`` (Spark 3.4+): one pass, no shuffle, no
    row explosion beyond the intended len(value_vars)×.
    """
    return df.unpivot(list(id_vars), list(value_vars), var_name, value_name)


def explode_pair(
    df: DataFrame,
    cols: Sequence[str],
    out_col: str,
    label_col: str | None = None,
    labels: Sequence[str] | None = None,
) -> DataFrame:
    """N columns → N rows each carrying one value (arbitrage_scanner.py:
    239 Team1/Team2 stack; also the ×2 row-duplication at :122-133).

    The reference duplicates the whole frame then blanks by parity; an
    ``inline(arrays_zip(...))``-style explode produces each copy WITH
    its differentiator atomically, so no order dependence at all.
    """
    labels = list(labels) if labels is not None else list(cols)
    pairs = F.array(*[F.struct(F.lit(lab).alias("_lab"), F.col(c).alias("_val")) for lab, c in zip(labels, cols)])
    exploded = df.withColumn("_pair", F.explode(pairs))
    out = exploded.withColumn(out_col, F.col("_pair._val"))
    if label_col:
        out = out.withColumn(label_col, F.col("_pair._lab"))
    return out.drop("_pair", *[c for c in cols if c != out_col])


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """Vertical concat by column name (arbitrage_scanner.py:58,118,164;
    bovada_pull.py:198)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)
