#!/usr/bin/env python
"""Compare Spark query output dtypes vs DuckDB oracle output types.

The driver's value hasher tolerates int32-vs-int64 width differences
(proven in round 7), but aligning them removes the remaining degree of
freedom for free (round-7 verdict item 6). This lists every column where
the Spark side and the (post-HUGEINT-fix) oracle side disagree on
integer width, so the Spark side can add an explicit cast.

Usage: python tools/schema_widths.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

INT_WIDTH = {
    "TINYINT": 8, "SMALLINT": 16, "INTEGER": 32, "BIGINT": 64,
    "UTINYINT": 8, "USMALLINT": 16, "UINTEGER": 32, "UBIGINT": 64,
    "tinyint": 8, "smallint": 16, "int": 32, "bigint": 64,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from banksy_spark.session import get_spark

    oracles = entry.oracle_sql()
    queries = entry.queries()
    names = args.names or [n for n in queries if n in oracles]

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    spark = get_spark("schema-widths")
    mismatched = 0
    for name in names:
        try:
            rel = con.sql(oracles[name])
            duck = dict(zip(rel.columns, (str(t) for t in rel.types)))
            spk = dict(queries[name](spark, args.sf).dtypes)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            mismatched += 1
            continue
        diffs = []
        for col, dt in duck.items():
            st = spk.get(col)
            if st is None:
                continue
            dw, sw = INT_WIDTH.get(dt), INT_WIDTH.get(st)
            if (dw is None) != (sw is None):
                # one side integer, the other not — worth a look too
                if dw is not None or sw is not None:
                    diffs.append((col, dt, st))
            elif dw is not None and dw != sw:
                diffs.append((col, dt, st))
        if diffs:
            mismatched += 1
            print(f"WIDTH {name}: {diffs}")
    print(f"checked {len(names)}, {mismatched} with int-width mismatches")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
