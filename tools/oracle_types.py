#!/usr/bin/env python
"""Scan every registry oracle's DuckDB output types.

DuckDB's ``SUM`` over an INTEGER column returns HUGEINT (int128), which
the driver's value hasher renders differently from Spark's BIGINT —
producing hash_match=false on bitwise-identical values (round-7 verdict).
This tool binds each oracle with ``con.sql(...)`` against the sf parquet
views and prints any column whose type is HUGEINT/UHUGEINT so the oracle
can be wrapped in CAST(... AS BIGINT).

It ALSO flags nested output types (LIST/ARRAY ``[]``, STRUCT, MAP,
UNION): the driver's pandas-based canonicalizer sorts columns via
``sort_values``, which cannot factorize list/struct/map cells — any
nested output column crashes the checker outright (round-11:
f_array_hof's ``head3 DOUBLE[]``). Serialize arrays at the boundary
(array_join / per-element scalar columns) in BOTH engines.

Usage: python tools/oracle_types.py [--sf DIR] [name ...]
Exit 0 iff no oracle emits a HUGEINT/UHUGEINT or nested-typed column.
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

BAD = {"HUGEINT", "UHUGEINT"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    names = args.names or list(oracles)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    bad = 0
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            bad += 1
            continue
        flagged = [(c, t) for c, t in cols if t in BAD]
        if flagged:
            bad += 1
            print(f"HUGEINT {name}: {flagged}")
        nested = [
            (c, t) for c, t in cols
            if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION"))
        ]
        if nested:
            bad += 1
            print(f"NESTED {name}: {nested}")
    print(
        f"checked {len(names)} oracles, {bad} with "
        "HUGEINT/UHUGEINT or nested outputs"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
