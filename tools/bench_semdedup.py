#!/usr/bin/env python
"""SemDeDup K-scaling counterfactual: fixed K vs K = greatest(8, n/1000).

Grows the embeddings fixture by unioning id-shifted + deterministically
perturbed copies (×1, ×4, ×16), then for each size measures, under both
centroid rules:

- K, the largest cluster, and the TOTAL within-cluster pair count
  (the work the pair join actually does);
- wall time of the full dedup query.

With fixed K the pair count grows ~n²/K (quadratic); with K ∝ n the
expected cluster size is constant so pairs grow ~linearly. Results are
recorded in SCALE.md (§ SemDeDup). Run:

    python tools/bench_semdedup.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def grown(spark, sf_dir: str, factor: int):
    from banksy_spark.suite.registry import T

    base = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n0 = base.count()
    parts = []
    for i in range(factor):
        # shift ids; perturb one dimension deterministically so copies
        # aren't exact dupes (they'd all collapse into one cluster)
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * n0)).alias("vec_id"),
                F.expr(
                    f"transform(embedding, (x, j) -> CASE WHEN j = {i % 8} "
                    f"THEN x + {0.01 * (i + 1)}D ELSE CAST(x AS DOUBLE) END)"
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def measure(spark, e, k_rule: str):
    from banksy_spark.suite.llm import _DOT_SPARK, _NORM_SPARK
    from banksy_spark.suite.round7 import _SEM_TAU

    n_vec = e.count()
    k = 8 if k_rule == "fixed" else max(8, n_vec // 1000)
    v = e.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    ).withColumn("nrm", F.expr(_NORM_SPARK.format(v="v")))
    cents = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    sim = F.expr(_DOT_SPARK.format(a="v", b="cv")) / (F.col("nrm") * F.col("cn"))
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .withColumn("_s", sim)
        .groupBy("vec_id")
        .agg(F.max(F.struct(F.col("_s").alias("s"), (-F.col("cid")).alias("nc"))).alias("m"))
        .select("vec_id", (-F.col("m.nc")).cast("bigint").alias("cluster"))
    )
    sizes = assigned.groupBy("cluster").count()
    stats = sizes.agg(
        F.max("count").alias("max_cluster"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
    ).first()

    if int(stats["pairs"]) > 50_000_000:
        # the quadratic counterfactual demonstrates itself: don't burn
        # minutes actually executing a 50M+-pair join
        return {
            "n_vec": n_vec,
            "k": int(k),
            "max_cluster": int(stats["max_cluster"]),
            "pairs": int(stats["pairs"]),
            "dropped": None,
            "pair_join_sec": None,
        }

    m = assigned.join(v, "vec_id").persist()
    a = m.select("cluster", F.col("vec_id").alias("a_id"), F.col("v").alias("av"), F.col("nrm").alias("an"))
    b = m.select("cluster", F.col("vec_id").alias("b_id"), F.col("v").alias("bv"), F.col("nrm").alias("bn"))
    pair_cos = F.expr(_DOT_SPARK.format(a="av", b="bv")) / (F.col("an") * F.col("bn"))
    t0 = time.time()
    n_drop = (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(pair_cos >= _SEM_TAU)
        .select("b_id").distinct().count()
    )
    wall = time.time() - t0
    m.unpersist()
    return {
        "n_vec": n_vec,
        "k": int(k),
        "max_cluster": int(stats["max_cluster"]),
        "pairs": int(stats["pairs"]),
        "dropped": int(n_drop),
        "pair_join_sec": round(wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="1,4,16")
    args = ap.parse_args()

    from banksy_spark.session import get_spark

    spark = get_spark("bench-semdedup")
    for factor in [int(x) for x in args.factors.split(",")]:
        e = grown(spark, args.sf, factor).persist()
        e.count()
        for rule in ("fixed", "scaled"):
            r = measure(spark, e, rule)
            r.update({"factor": factor, "rule": rule})
            print(json.dumps(r))
        e.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
