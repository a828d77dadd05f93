#!/usr/bin/env python
"""Full-registry randomized differential sweep (offline big brother of
tests/test_differential_fuzz.py).

The pytest gate fuzzes a 79-query subset on every run for CI speed;
this tool replays (almost) the WHOLE registry against the DuckDB
oracles on generated adversarial tables — same generator, same
regimes, same driver-style value-hash comparison. Usage:

    python tools/fuzz_sweep.py                  # all regimes, all safe queries
    python tools/fuzz_sweep.py --regime sparse  # one regime
    python tools/fuzz_sweep.py name1 name2      # triage specific names

Exit 0 iff everything checked matches.

EXCLUDED (by design, not by weakness):
 - frozen-literal oracles: the oracle side pins state trained on the
   seed-42 fixtures (IVF coarse quantizer, trained lang-id model,
   k-means converged centroids); on random data the frozen side
   diverges by construction. Their live-trained behavior is covered by
   tests/test_frozen_centroids.py + tests/test_round8.py.
 - S2/sink/adapter exemplars that don't read the sf tables.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from tests.test_differential_fuzz import generate_tables  # noqa: E402
from check import TABLES, table_digest  # noqa: E402

EXCLUDE = {
    # oracle freezes fixture-trained state (see module docstring)
    "llm_ann_ivf_trained",
    "llm_langid_trained",
    "ml_kmeans_converged",
}

REGIMES = [
    ("ties", 101),
    ("sparse", 303),
    ("advtext", 404),
    ("unicode", 505),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", choices=[r for r, _ in REGIMES])
    ap.add_argument(
        "--seed",
        type=int,
        help="override the generator seed (rotate per round: every seed "
        "is a fresh full-registry validation dataset)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from banksy_spark.session import get_spark, release_caches
    from banksy_spark.suite import REGISTRY

    spark = get_spark("banksy-fuzz-sweep")
    names = args.names or [n for n in REGISTRY if n not in EXCLUDE]
    regimes = [
        (r, args.seed if args.seed is not None else s)
        for r, s in REGIMES
        if not args.regime or r == args.regime
    ]

    n_pass = n_fail = 0
    fails: list[str] = []
    for regime, seed in regimes:
        d = Path(tempfile.mkdtemp(prefix=f"fuzz_{regime}_"))
        generate_tables(d, seed, regime)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        for name in names:
            spec = REGISTRY[name]
            if spec.oracle is None:
                continue
            release_caches(spark)
            t0 = time.time()
            try:
                df = spec.fn(spark, str(d))
                s_cols = df.columns
                s_n, s_hash, _ = table_digest(
                    s_cols, [list(r) for r in df.collect()]
                )
                cur = con.execute(spec.oracle)
                d_cols = [c[0] for c in cur.description]
                d_n, d_hash, _ = table_digest(d_cols, cur.fetchall())
                ok = (
                    sorted(s_cols) == sorted(d_cols)
                    and s_n == d_n
                    and s_hash == d_hash
                )
            except Exception as e:  # noqa: BLE001 — triage tool: record and move on
                ok = False
                print(f"ERROR {regime}/{name}: {type(e).__name__}: {e}", flush=True)
            dt = time.time() - t0
            if ok:
                n_pass += 1
                print(f"PASS {regime}/{name} ({dt:.1f}s)", flush=True)
            else:
                n_fail += 1
                fails.append(f"{regime}/{name}")
                print(f"FAIL {regime}/{name} ({dt:.1f}s)", flush=True)
        con.close()
    print(f"\n{n_pass} pass, {n_fail} fail")
    if fails:
        print("failures:", " ".join(fails))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
