"""Property checks for the round-7 corpus-lifecycle queries
(suite.round7). Oracle parity runs in tools/check.py; these pin what
the oracle can't see: the SemDeDup pair join is blocked on the cluster
key (no cartesian anywhere in the plan), its hash-agg argmax matches
the sort-window definition, and the shuffle-shard assignment is
exactly balanced and invariant to the shuffle-partition setting.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_semdedup_plan_is_cluster_blocked(spark):
    from banksy_spark.suite import REGISTRY

    df = REGISTRY["llm_dedup_semantic"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the K-centroid candidate fan-out is a broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_semdedup_argmax_matches_sort_window(spark):
    """The hash-agg max((sim, -cid)) cluster assignment must equal the
    row_number()=1 row of a (sim DESC, cid ASC) sort — the oracle's
    definition — including on exact-tie fabricated vectors."""
    from banksy_spark.suite.llm import _DOT_SPARK, _NORM_SPARK

    rows = [
        (0, [1.0, 0.0]),   # centroid 0
        (1, [0.0, 1.0]),   # centroid 1
        (10, [1.0, 1.0]),  # exact tie with both centroids -> cid 0
        (11, [0.0, 2.0]),  # clearly centroid 1
    ]
    n = spark.createDataFrame(rows, "vec_id long, v array<double>").withColumn(
        "nrm", F.expr(_NORM_SPARK.format(v="v"))
    )
    cents = n.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    sim = F.expr(_DOT_SPARK.format(a="v", b="cv")) / (F.col("nrm") * F.col("cn"))
    cand = n.crossJoin(F.broadcast(cents)).withColumn("_s", sim)
    agg = (
        cand.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("_s").alias("s"), (-F.col("cid")).alias("nc"))).alias("m"))
        .select("vec_id", (-F.col("m.nc")).cast("bigint").alias("cluster"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_s").desc(), F.col("cid"))
    win = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").cast("bigint").alias("cluster"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, win.collect()))
    got = dict(agg.collect())
    assert got[10] == 0 and got[11] == 1


def test_shuffle_shards_balanced_and_partition_invariant(spark):
    from banksy_spark.suite import REGISTRY

    fn = REGISTRY["llm_shuffle_shards"].fn
    out = fn(spark, SF_SMOKE).collect()
    n = len(out)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] - sizes[0] <= 1  # exactly balanced ±1
    for poss in by_shard.values():  # within-shard positions are dense
        assert sorted(poss) == list(range(len(poss)))
    # epoch order is a permutation of 1..n
    assert sorted(r["epoch_pos"] for r in out) == list(range(1, n + 1))

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = fn(spark, SF_SMOKE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    key = lambda rs: sorted((r["doc_id"], r["epoch_pos"], r["shard"], r["shard_pos"]) for r in rs)
    assert key(out) == key(again)
