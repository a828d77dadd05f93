"""Scale-posture machinery: salted aggregation and bucketed co-located
joins (SURVEY §7 phase 6; the 100 TB strategies, demonstrated small)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from banksy_spark.operators.skew import salted_agg
from tests.conftest import SF_SMOKE


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    salted = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(12,2)")),
            "n": F.count("*"),
        },
        salt_col=F.hash("l_orderkey"),
        n_salt=16,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"),
        F.count("*").alias("n"),
    )
    s = {r.l_returnflag: (float(r.sum_qty), r.n) for r in salted.collect()}
    p = {r.l_returnflag: (float(r.sum_qty), r.n) for r in plain.collect()}
    assert s == p


def test_bucketed_join_has_no_shuffle(spark):
    """Pre-bucketing both sides on the join key removes the Exchange
    entirely — the co-location strategy for repeated big joins."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")

    lb = spark.table("li_bucketed")
    ob = spark.table("o_bucketed")
    # force the sort-merge path (broadcast would hide the point)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert "SortMergeJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0
    # sanity: the join still answers correctly
    assert joined.count() == lb.count()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """SCALE.md's scan-layer claim, pinned: a day-partitioned layout lets
    a day filter prune partitions at the file index, not post-scan."""
    from banksy_spark.io import write_overwrite
    from banksy_spark.suite.registry import T

    events = T(spark, SF_SMOKE, "events").withColumn("day", F.to_date("ts"))
    out = str(tmp_path / "events_by_day")
    write_overwrite(events, out, partition_by=["day"])

    pruned = spark.read.parquet(out).filter(F.col("day") == "2024-01-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*day.*\]", plan)
    # correctness: pruned read equals the unpartitioned filter
    want = events.filter(F.to_date("ts") == "2024-01-03").count()
    assert pruned.count() == want > 0


def test_packing_shards_scale_with_corpus(spark):
    """The packing shard count is a function of corpus size
    (greatest(32, n_docs/10000)) — parallelism grows with data instead
    of sitting at a constant that caps window concurrency at scale."""
    from banksy_spark.suite.llm import shard_count_expr

    def shards(n_rows: int) -> int:
        return spark.range(n_rows).agg(shard_count_expr()).collect()[0].n_shards

    assert shards(2_000) == 32          # floor keeps local cores busy
    assert shards(320_000) == 32        # at the knee
    assert shards(640_000) == 64        # grows with the corpus
    assert shards(1_280_000) == 128


def test_salted_join_matches_plain_join_on_hot_key(spark):
    """salted_join must be invisible in the result even when one key
    owns most rows (the scenario it exists for)."""
    from pyspark.sql import functions as F

    from banksy_spark.operators.skew import salted_join

    big = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        # 80% of rows land on key 7 — a genuinely hot key
        F.when(F.col("id") % 5 < 4, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 13).alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    got = (
        salted_join(big, small, ["k"], salt_col=F.xxhash64("row_id"), n_salt=8)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s"))
    )
    want = (
        big.join(small, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_zorder_layout_prunes_2d_boxes(spark, tmp_path):
    """The Z-order key must earn its keep: for a 2-D range predicate,
    a zkey-sorted layout must leave FEWER row groups un-prunable (by
    parquet min/max stats) than a leading-column sort — the claim in
    o_zorder_key's docstring, checked against real written footers."""
    import glob

    import pyarrow.parquet as pq

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_ORACLE

    z = REGISTRY["o_zorder_key"].fn(spark, SF_ORACLE)
    by_pk = str(tmp_path / "by_partkey")
    by_z = str(tmp_path / "by_zkey")
    z.orderBy("l_partkey").write.option("maxRecordsPerFile", 1000).parquet(by_pk)
    z.orderBy("zkey").write.option("maxRecordsPerFile", 1000).parquet(by_z)

    from pyspark.sql import functions as F

    pmax = z.agg(
        F.max("l_partkey").alias("pm"), F.max("l_suppkey").alias("sm")
    ).collect()[0]
    p_lo, p_hi = int(pmax.pm * 0.4), int(pmax.pm * 0.5)
    s_lo, s_hi = int(pmax.sm * 0.4), int(pmax.sm * 0.5)

    def must_read(d):
        tot, hit = 0, 0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                st = {
                    row.column(i).path_in_schema: row.column(i).statistics
                    for i in range(row.num_columns)
                }
                tot += 1
                sp, ss = st["l_partkey"], st["l_suppkey"]
                if (
                    sp.min <= p_hi
                    and sp.max >= p_lo
                    and ss.min <= s_hi
                    and ss.max >= s_lo
                ):
                    hit += 1
        return hit, tot

    pk_hit, pk_tot = must_read(by_pk)
    z_hit, z_tot = must_read(by_z)
    assert pk_tot == z_tot and pk_tot >= 30, "layouts must split comparably"
    assert z_hit < pk_hit, (z_hit, pk_hit)
    assert z_hit < z_tot // 4, "zorder should prune the large majority"


def test_zorder_operator_n_dimensional(spark):
    """zorder_key must generalize past 2 columns: keys stay within the
    interleave's bit budget, every dimension influences the key, and
    normalization makes the layout domain-width-independent."""
    from pyspark.sql import functions as F

    from banksy_spark.operators.layout import zorder_key

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 1000).alias("b"),  # deliberately much wider than a
        (F.col("id") % 13).alias("c"),
    )
    z = zorder_key(df, ["a", "b", "c"], bits=4)
    rows = z.collect()
    assert all(0 <= r.zkey < (1 << 12) for r in rows)
    # each dimension must move the key: fixing the other two, varying
    # one changes zkey
    base = {(r.a, r.b, r.c): r.zkey for r in rows}
    k0 = base[(0, 0, 0)]
    assert base[(1, 1, 1)] != k0
    got_cols = set(z.columns)
    assert got_cols == {"a", "b", "c", "zkey"}, "helper cols must be dropped"


def test_basket_pair_parallelism_scales_with_data(spark):
    """j_basket_lift sizes the exploded-pair exchange to the data, not
    the session constant — the in-plan form of the x30 diagnosis (27M
    pairs / 32 fixed partitions spilled at 850k rows per task; 128
    partitions restored the linear slope)."""
    from banksy_spark.suite.round4g import _pair_parallelism

    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # small SFs: never below the session parallelism (plan unchanged)
    assert _pair_parallelism(spark, 600_000) == conf
    # the x30 replica (18M lineitem rows): at least the measured-good
    # 128 tasks, i.e. <=300k estimated pairs per task
    n = _pair_parallelism(spark, 18_000_000)
    assert n >= 128
    # runaway guard: planet-scale input stays bounded
    assert _pair_parallelism(spark, 10**13) == 4096
