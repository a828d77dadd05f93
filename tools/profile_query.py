#!/usr/bin/env python
"""Per-query profiler for the optimization rounds: splits a query's
wall time into DataFrame construction (Python-side plan building),
planning (first explain → analysis+optimization+physical planning),
and execution (noop sink), and dumps explain("formatted") so plan
claims in OPTIMIZATION_r*.md are reproducible.

    python tools/profile_query.py [--sf DIR] [--runs N] [--plan-dir DIR] name ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None, help="write <name>.txt explain dumps here")
    args = ap.parse_args()

    from banksy_spark.session import get_spark, release_caches
    from banksy_spark.suite import REGISTRY

    spark = get_spark("banksy-profile")
    # Warm-up: JVM/codegen/parquet-footer caches (same as bench.py).
    REGISTRY["a_grouped_sum"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches(spark)

    print(f"{'query':34s} {'build':>7s} {'plan':>7s} " + " ".join(f"{'run'+str(i):>7s}" for i in range(args.runs)))
    for name in args.names:
        release_caches(spark)
        t0 = time.time()
        df = REGISTRY[name].fn(spark, args.sf)
        t_build = time.time() - t0
        t0 = time.time()
        plan_txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        t_plan = time.time() - t0
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as f:
                f.write(plan_txt)
        execs = []
        for _ in range(args.runs):
            release_caches(spark)
            df = REGISTRY[name].fn(spark, args.sf)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.time() - t0)
        print(
            f"{name:34s} {t_build:7.3f} {t_plan:7.3f} "
            + " ".join(f"{e:7.3f}" for e in execs)
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
