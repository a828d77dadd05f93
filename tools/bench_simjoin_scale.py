#!/usr/bin/env python
"""Similarity-join scale curves (round-9, verdict item 5).

The 100 TB argument for the exact similarity family rests on
candidate-set reasoning: prefix filtering (j_similarity_prefix_join),
deletion-neighborhood blocking (j_fuzzy_edit1_join) and min-hash
bucketing (llm_dedup_containment) claim candidate counts that grow
with REAL collisions, not corpus². SCALE.md's measured curves stopped
at sf0.1 (5k docs / 15k customers); this tool generates sf0.3- and
sf1.0-equivalent fixtures (3x / 10x rows, same token vocabulary,
length distribution resampled from the real sf0.1 corpus, fixed 2%
near-dup + 1% boilerplate-wrap injection so match structure does not
drift with scale) and measures, per op per scale:

  cand        candidate pairs entering exact verification
  pairs       verified result pairs
  possible    n*(n-1)/2 — what brute force would verify
  sel         cand / possible (the filter's measured selectivity)
  sec         end-to-end wall time of the registered query

The candidate stages are re-declared inline (a measurement probe —
the queries themselves stay unchanged and driver-checkable); they use
the same helpers/expressions as the suite code they mirror
(round5c.py, round8.py).

Usage: python tools/bench_simjoin_scale.py  → one JSON line.
Fixtures are written under /tmp/banksy_simjoin_sf{mult} and reused.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SF01 = "/root/testdata/sf0.1"
MULTS = (1, 3, 10)  # sf0.1-, sf0.3-, sf1.0-equivalent row counts
BASE_DOCS = 5_000
BASE_CUST = 15_000
NEAR_DUP_FRAC = 0.02     # copy an earlier doc, mutate one word
CONTAIN_FRAC = 0.01      # earlier doc wrapped in boilerplate
SEED = 20260815


def _load_base_stats():
    import duckdb

    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT w FROM (SELECT unnest(string_split(text,' ')) w "
            f"FROM '{SF01}/documents.parquet') ORDER BY w"
        ).fetchall()
    ]
    lengths = [
        r[0]
        for r in con.sql(
            f"SELECT len(string_split(text,' ')) FROM '{SF01}/documents.parquet'"
        ).fetchall()
    ]
    return vocab, np.asarray(lengths, dtype=np.int64)


def build_fixture(mult: int, heaps: bool = False) -> str:
    """Synthetic corpus at ``mult``x the sf0.1 row counts.

    ``heaps=False``: the CLOSED-vocabulary corpus (the sf0.1 token set,
    31 words at every scale) — the worst case for df-ordered prefixes.
    ``heaps=True``: vocabulary grows with the corpus as |V| ~ n^0.5
    (Heaps' law, beta=0.5), drawn Zipf-weighted so the df distribution
    is realistic — the regime a real 100 TB corpus sits in."""
    tag = "heaps" if heaps else "sf"
    out_dir = f"/tmp/banksy_simjoin_{tag}{mult}"
    if os.path.exists(f"{out_dir}/_DONE"):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED + mult)
    vocab, lengths = _load_base_stats()
    if heaps:
        n_vocab = max(len(vocab), int(31 * (mult * 1.0) ** 0.5 * 10))
        vocab = [f"w{i}" for i in range(n_vocab)]
        # Zipf-ish draw weights (s=1.1) so rare tokens exist at every n
        w = 1.0 / np.arange(1, n_vocab + 1) ** 1.1
        weights = w / w.sum()
    n_docs = BASE_DOCS * mult
    texts: list[str] = []
    def draw(k: int) -> list[str]:
        if heaps:
            idx = rng.choice(len(vocab), size=k, p=weights)
        else:
            idx = rng.integers(0, len(vocab), k)
        return [vocab[int(j)] for j in idx]

    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < NEAR_DUP_FRAC:
            src = int(rng.integers(0, i))
            words = texts[src].split(" ")
            words[int(rng.integers(0, len(words)))] = draw(1)[0]
            texts.append(" ".join(words))
        elif i > 10 and r < NEAR_DUP_FRAC + CONTAIN_FRAC:
            src = int(rng.integers(0, i))
            pad = " ".join(draw(4))
            texts.append(f"{pad} {texts[src]} {pad}")
        else:
            ln = int(lengths[int(rng.integers(0, len(lengths)))])
            texts.append(" ".join(draw(ln)))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, f"{out_dir}/documents.parquet")
    n_cust = BASE_CUST * mult
    cust = pa.table(
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        }
    )
    pq.write_table(cust, f"{out_dir}/customer.parquet")
    open(f"{out_dir}/_DONE", "w").write("ok")
    return out_dir


def _prefix_candidates(spark, sf_dir):
    """The candidate stage of j_similarity_prefix_join (round5c.py)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from banksy_spark.suite.round5c import _TAU_DEN, _TAU_NUM, _shingle_sets

    sets = _shingle_sets(spark, sf_dir).withColumn("n", F.size("sh"))
    toks = sets.select("doc_id", "n", F.explode("sh").alias("tok"))
    df_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(df_tok, "tok")
    prefix_len = F.col("n") - F.floor(
        (F.lit(_TAU_NUM) * F.col("n") + F.lit(_TAU_DEN - 1)) / F.lit(_TAU_DEN)
    ) + 1
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    prefix = (
        ranked.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "n", F.xxhash64("tok").alias("tok"))
    )
    return (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            F.lit(_TAU_NUM) * F.greatest(F.col("a.n"), F.col("b.n"))
            <= F.lit(_TAU_DEN) * F.least(F.col("a.n"), F.col("b.n"))
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _ppjoin_candidates(spark, sf_dir):
    """The candidate stage of j_similarity_ppjoin_pos (round9.py):
    prefix candidates surviving the per-row positional filter."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from banksy_spark.suite.round5c import _TAU_DEN, _TAU_NUM, _shingle_sets

    sets = _shingle_sets(spark, sf_dir).withColumn("n", F.size("sh"))
    toks = sets.select("doc_id", "n", F.explode("sh").alias("tok"))
    df_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(df_tok, "tok")
    prefix_len = F.col("n") - F.floor(
        (F.lit(_TAU_NUM) * F.col("n") + F.lit(_TAU_DEN - 1)) / F.lit(_TAU_DEN)
    ) + 1
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    prefix = (
        ranked.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "n", "pos", F.xxhash64("tok").alias("tok"))
    )
    return (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            F.lit(_TAU_NUM) * F.greatest(F.col("a.n"), F.col("b.n"))
            <= F.lit(_TAU_DEN) * F.least(F.col("a.n"), F.col("b.n"))
        )
        .filter(
            F.lit(1)
            + F.least(
                F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
            )
            >= F.floor(
                (F.lit(3) * (F.col("a.n") + F.col("b.n")) + F.lit(7)) / F.lit(8)
            )
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _edit1_candidates(spark, sf_dir):
    """The candidate stage of j_fuzzy_edit1_join (round5c.py)."""
    from pyspark.sql import functions as F

    from banksy_spark.suite.registry import T

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    keys = c.select(
        "c_custkey",
        F.explode(
            F.array_union(
                F.array(F.col("c_name")),
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.length("c_name")),
                        lambda i: F.concat(
                            F.substring(F.col("c_name"), F.lit(1), i - 1),
                            F.col("c_name").substr(i + 1, F.length("c_name") - i),
                        ),
                    )
                ),
            )
        ).alias("blk"),
    )
    hashed = keys.select("c_custkey", F.xxhash64("blk").alias("h"))
    a = hashed.select(F.col("c_custkey").alias("key_a"), "h")
    b = hashed.select(F.col("c_custkey").alias("key_b"), "h")
    return (
        a.join(b, "h").filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )  # pre-distinct, pre-verify: what the verifier actually touches


def _containment_candidates(spark, sf_dir):
    """The candidate stage of llm_dedup_containment (round8.py)."""
    from pyspark.sql import functions as F

    from banksy_spark.suite.registry import T

    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    sh = (
        d.select(
            "doc_id",
            F.posexplode(F.expr(
                "transform(slice(w, 1, greatest(size(w) - 2, 0)), "
                "(x, j) -> concat(x, ' ', w[j + 1], ' ', w[j + 2]))"
            )).alias("_p", "s"),
        )
        .select("doc_id", F.md5(F.col("s").cast("binary")).alias("h"))
        .distinct()
    )
    mk = sh.groupBy("doc_id").agg(F.min("h").alias("mk"))
    a, b = mk.alias("a"), mk.alias("b")
    return a.join(
        b, (F.col("a.mk") == F.col("b.mk")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))


def _containment_k3_candidates(spark, sf_dir):
    """The candidate stage of llm_dedup_containment_k3 (round8.py):
    each doc indexes its k=3 smallest shingle hashes (OR-composition
    — a RECALL dial, so candidates are a superset of the k=1 stage
    by construction; measured here to pin the cost of that recall in
    both vocabulary regimes, round-9 verdict item 4)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from banksy_spark.suite.registry import T

    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    sh = (
        d.select(
            "doc_id",
            F.posexplode(F.expr(
                "transform(slice(w, 1, greatest(size(w) - 2, 0)), "
                "(x, j) -> concat(x, ' ', w[j + 1], ' ', w[j + 2]))"
            )).alias("_p", "s"),
        )
        .select("doc_id", F.md5(F.col("s").cast("binary")).alias("h"))
        .distinct()
    )
    wk = Window.partitionBy("doc_id").orderBy("h")
    mk = (
        sh.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "h")
    )
    a, b = mk.alias("a"), mk.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def _containment_g5_candidates(spark, sf_dir):
    """Cost-lever probe: the SAME single-min-hash candidate stage as
    llm_dedup_containment but over 5-gram (not 3-gram) word shingles.
    Longer shingles explode the key space back to sparse in a closed
    vocabulary (31 tokens give 31^3 = 29.8k possible 3-grams but
    31^5 = 28.6M possible 5-grams), so the global minimum hash
    concentrates far less — the 'longer shingles' lever SCALE.md
    names, measured. Not a registered query: candidate-stage cost
    measurement only (a 5-gram containment variant would define a
    different — also valid — containment measure)."""
    from pyspark.sql import functions as F

    from banksy_spark.suite.registry import T

    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    sh = (
        d.select(
            "doc_id",
            F.posexplode(F.expr(
                "transform(slice(w, 1, greatest(size(w) - 4, 0)), "
                "(x, j) -> concat_ws(' ', x, w[j + 1], w[j + 2], "
                "w[j + 3], w[j + 4]))"
            )).alias("_p", "s"),
        )
        .select("doc_id", F.md5(F.col("s").cast("binary")).alias("h"))
        .distinct()
    )
    mk = sh.groupBy("doc_id").agg(F.min("h").alias("mk"))
    a, b = mk.alias("a"), mk.alias("b")
    return a.join(
        b, (F.col("a.mk") == F.col("b.mk")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))


def main() -> int:
    import argparse

    from banksy_spark.session import get_spark, release_caches
    from banksy_spark.suite import REGISTRY

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--heaps", action="store_true",
        help="growing-vocabulary (Heaps-law, Zipf-weighted) corpus "
        "instead of the closed-vocabulary worst case",
    )
    args = ap.parse_args()

    spark = get_spark("bench-simjoin")
    ops = {
        "j_similarity_prefix_join": ("documents", BASE_DOCS, _prefix_candidates),
        "j_similarity_ppjoin_pos": ("documents", BASE_DOCS, _ppjoin_candidates),
        "j_fuzzy_edit1_join": ("customer", BASE_CUST, _edit1_candidates),
        "llm_dedup_containment": ("documents", BASE_DOCS, _containment_candidates),
        "llm_dedup_containment_k3": ("documents", BASE_DOCS, _containment_k3_candidates),
        # the longer-shingle cost lever, registered round 10 as the
        # containment family's scale path
        "llm_dedup_containment_g5": ("documents", BASE_DOCS, _containment_g5_candidates),
    }
    if args.heaps:  # documents-based ops only; vocab doesn't affect FastSS
        ops.pop("j_fuzzy_edit1_join")
    metric = "simjoin_scale_heaps" if args.heaps else "simjoin_scale"
    out: dict = {"metric": metric, "unit": "sec", "scales": {}}
    for mult in MULTS:
        sf_dir = build_fixture(mult, heaps=args.heaps)
        row: dict = {}
        for name, (tbl, base_n, cand_fn) in ops.items():
            n = base_n * mult
            if name in REGISTRY:
                t0 = time.time()
                pairs = REGISTRY[name].fn(spark, sf_dir).count()
                sec = round(time.time() - t0, 2)
            else:  # candidate-stage-only probe (e.g. the g5 lever)
                pairs, sec = None, None
            release_caches(spark)
            cand = cand_fn(spark, sf_dir).count()
            possible = n * (n - 1) // 2
            row[name] = {
                "n": n,
                "cand": cand,
                "pairs": pairs,
                "possible": possible,
                "sel": round(cand / possible, 8),
                "sec": sec,
            }
            release_caches(spark)
        out["scales"][f"x{mult}"] = row
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
