"""Connected components over an edge list (duplicate-cluster
resolution for fuzzy dedup — suite.llm_extra.llm_dedup_clusters).

Min-label propagation with self-loops: each round every node takes the
minimum label over its in-neighborhood (self included, via the loop
edges), so after d rounds every node within distance d of its
component's minimum carries that minimum. Rounds are a *fixed* plan
depth — no driver-side convergence loop, the query stays lazy.

Plan-shape note (measured): referencing the label table twice per
round (labels ∪ neighbor-min) doubles the logical plan each round —
2^rounds leaf copies, 24 s of analysis + 109 s of recompute at 8
rounds on a 53-node graph. Folding self into the edge relation makes
each round reference labels exactly once: linear depth, ~10× faster.

Scale: each round is one shuffle keyed on node id over the EDGE list
(for dedup: the LSH collision pairs, tiny relative to the corpus).
Production replaces fixed rounds with alternating large-star/small-star
(O(log n) rounds, Kiveris et al.) — same per-round plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Label every node of the undirected graph given by ``pairs`` with
    its component's minimum node id. Correct for components whose
    minimum-label eccentricity is <= ``rounds``; callers verifying
    against an exact oracle (recursive CTE) will see a mismatch if a
    component ever outruns the budget.

    ``checkpoint_every``: truncate lineage with ``localCheckpoint``
    every N rounds. The default (None) keeps the query fully lazy —
    required by the suite contract — and linear plan depth is fine for
    the fixed 8 rounds. At cluster scale with many rounds (large-star/
    small-star to convergence), checkpointing every 2-3 rounds stops
    the optimizer re-walking an ever-deeper plan and releases shuffle
    files; results are identical (tested)."""
    und = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        pairs.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    nodes = und.select(F.col("s").alias("node")).distinct().persist()
    edges = und.union(
        nodes.select(F.col("node").alias("s"), F.col("node").alias("d"))
    ).persist()
    labels = nodes.withColumn("lab", F.col("node"))
    for i in range(rounds):
        labels = (
            edges.join(labels.withColumnRenamed("node", "_d"), F.col("d") == F.col("_d"))
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("lab").alias("lab"))
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            labels = labels.localCheckpoint(eager=False)
    return labels
