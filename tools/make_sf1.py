#!/usr/bin/env python
"""Build a replica-scaled ~sf1 dataset from the shipped sf0.1 fixtures.

TPC-H scaling model: region/nation are FIXED across scale factors;
every other table grows linearly. We scale by stacking K key-remapped
copies of sf0.1 — each replica's keys are offset by i * (max_key + 1),
so replicas are disjoint: group counts grow ×K, join fan-outs and
per-key cardinalities stay EXACTLY sf0.1's, which is what a real ×10
of the generator would do (dims-per-fact ratios preserved; the shared
nation/region dims see ×K fact rows per key, as at real scale).

NOT distribution-faithful for text/embedding similarity: each document
gains K-1 exact twins, so dedup pair counts grow quadratically in K by
construction — the similarity families have their own measured scale
curves (SCALE.md round-9/10 sections, Heaps-law corpora) and are
excluded from the replica-scaled bench.

Output: /root/repo/.scratch/sf1r/*.parquet (gitignored scratch).

    python tools/make_sf1.py [--k 10] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import duckdb

# per-table key columns to offset, with the table whose max defines the
# offset base for that column family
OFFSETS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
BASES = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
FIXED = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scratch/sf1r")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    base: dict[str, int] = {}
    for col, (tbl, c) in BASES.items():
        base[col] = (
            con.execute(
                f"SELECT max({c}) + 1 FROM '{args.src}/{tbl}.parquet'"
            ).fetchone()[0]
        )

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied (fixed dim)")

    for t, cols in OFFSETS.items():
        t0 = time.time()
        sel = ", ".join(
            f"{c} + i * {base[cols[c]]} AS {c}" if c in cols else c
            for c in _cols(con, args.src, t)
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{args.src}/{t}.parquet', "
            f"generate_series(0, {args.k - 1}) AS g(i)) TO "
            f"'{out}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({time.time() - t0:.1f}s)")


def _cols(con, src: str, t: str) -> list[str]:
    return [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
        ).fetchall()
    ]


if __name__ == "__main__":
    main()
