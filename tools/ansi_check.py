#!/usr/bin/env python
"""Driver-simulation: run suite queries on a VANILLA Spark session
(ANSI on by default in Spark 4, none of banksy_spark.session's tuning)
and compare against the DuckDB oracle — the strongest local mimic of an
external harness that builds its own SparkSession.

Usage: python tools/ansi_check.py [--sf DIR] [--first N] [name ...]
Defaults to the first 50 registry entries (the driver's window).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from banksy_spark.session import release_caches  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from check import table_digest

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    print("ansi.enabled:", spark.conf.get("spark.sql.ansi.enabled"))

    from banksy_spark.suite import REGISTRY

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or list(REGISTRY)[: args.first]
    n_fail = 0
    for name in names:
        spec = REGISTRY[name]
        release_caches(spark)
        try:
            df = spec.fn(spark, args.sf)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows {name}: {len(srows)}")
            continue
        cur = con.execute(spec.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        sn, sh, _ = table_digest(scols, srows)
        dn, dh, _ = table_digest(dcols, drows)
        if sn != dn or sorted(scols) != sorted(dcols) or sh != dh:
            print(
                f"FAIL {name}: rows {sn} vs {dn} "
                f"hash {'ok' if sh == dh else 'MISMATCH'}"
            )
            n_fail += 1
        else:
            print(f"PASS {name}")
    print(f"{len(names) - n_fail}/{len(names)} pass under vanilla ANSI session")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
