"""Structural contract of the trained-quantizer IVF (suite/round8.py).

`llm_ann_ivf_trained` has no SQL oracle (the k-means trainer is a
driver loop), so these tests pin everything the oracle would have:
ranks dense from 1 and ordered by cosine, neighbors drawn only from the
query's own cell, determinism across runs, and — on the clustered
fixture where single-probe recall is meaningful — a recall@3 floor
against the in-engine brute-force ground truth.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

TOPK = 3


def _result(spark, sf_dir):
    from banksy_spark.suite import REGISTRY

    return REGISTRY["llm_ann_ivf_trained"].fn(spark, sf_dir)


def test_ivf_trained_rank_and_cell_contract(spark):
    rows = _result(spark, SF_ORACLE).collect()
    assert rows, "empty result"
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    from banksy_spark.suite.round8 import _IVF_NQ

    assert set(by_q) <= set(range(_IVF_NQ))
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOPK
        # ordered by cosine desc (id tie-break can only reorder equals)
        for a, b in zip(rs, rs[1:]):
            assert a["cosine"] >= b["cosine"] - 1e-12
        # single-probe: every neighbor shares the query's cell
        assert len({r["cell"] for r in rs}) == 1
        assert all(r["neighbor_id"] != qid for r in rs)
        assert all(r["n_iter"] >= 1 for r in rs)


def test_ivf_trained_deterministic(spark):
    a = sorted(map(tuple, _result(spark, SF_ORACLE).collect()))
    b = sorted(map(tuple, _result(spark, SF_ORACLE).collect()))
    assert a == b


def test_ivf_trained_recall_on_clustered_fixture(spark, tmp_path):
    """On the mixture-of-Gaussians fixture (tools/clustered_embeddings)
    a trained quantizer must place true neighbors in the query's cell:
    recall@3 >= 0.9 at nprobe=1 — the same bar the exact-centroid IVF
    clears there, now with cells learned from the data. Trains LIVE on
    the fixture through the same serving helpers the registered query
    uses (the registry entry itself serves the FROZEN sf0.001-trained
    quantizer so it can carry a DuckDB oracle)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from clustered_embeddings import write_parquet

    from banksy_spark.operators.kmeans import kmeans_train
    from banksy_spark.suite.llm import _DOT_SPARK, _NORM_SPARK
    from banksy_spark.suite.registry import T
    from banksy_spark.suite.round8 import (
        _IVF_K,
        _IVF_NQ,
        ivf_parts_with_centroids,
        ivf_probe_topk,
    )

    d = str(tmp_path)
    write_parquet(f"{d}/embeddings.parquet")

    e = T(spark, d, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    )
    cents, _assigned, n_iter, _conv = kmeans_train(e, k=_IVF_K, max_iter=20)
    nv = ivf_parts_with_centroids(spark, d, cents)
    got = ivf_probe_topk(nv, n_iter)
    # in-engine brute-force ground truth over the same vectors
    n = (
        T(spark, d, "embeddings")
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
        .withColumn("nrm", F.expr(_NORM_SPARK.format(v="v")))
    )
    q = n.filter(F.col("vec_id") < _IVF_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.expr(_DOT_SPARK.format(a="qv", b="v")) / (F.col("qn") * F.col("nrm"))
    from pyspark.sql import Window

    wr = Window.partitionBy("qid").orderBy(F.desc("cosine"), "neighbor_id")
    truth = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOPK)
        .select("qid", "neighbor_id")
    )
    hits = truth.join(got.select("qid", "neighbor_id"), ["qid", "neighbor_id"]).count()
    total = truth.count()
    assert total == _IVF_NQ * TOPK
    assert hits / total >= 0.9, f"trained-IVF recall@3 {hits}/{total}"


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(path)


def test_containment_detects_embedded_document(spark, tmp_path):
    """A document whose text is fully embedded in a larger one must be
    flagged with containment exactly 1.0 in the contained direction —
    the asymmetric case symmetric Jaccard under-scores (here the
    Jaccard is only |A|/|B| ≈ 0.4)."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    wrapped = "header menu nav " + base + " footer legal copyright"
    unrelated = "one two three four five six seven eight nine ten"
    d = str(tmp_path)
    _write_docs(
        spark,
        f"{d}/documents.parquet",
        [
            (1, base, "en", "a", len(base)),
            (2, wrapped, "en", "b", len(wrapped)),
            (3, unrelated, "en", "c", len(unrelated)),
        ],
    )
    from banksy_spark.suite import REGISTRY

    rows = REGISTRY["llm_dedup_containment"].fn(spark, d).collect()
    # candidate generation: base's min shingle-hash must also be
    # wrapped's min (base's shingles are a subset plus boundary
    # shingles from the wrap — if a wrap shingle hashes lower the pair
    # is missed; with this fixture the pair IS found, and the test
    # pins that plus the exact containment values)
    pair = [r for r in rows if {r["a_id"], r["b_id"]} == {1, 2}]
    assert pair, f"embedded pair not flagged: {rows}"
    r = pair[0]
    small_sz = min(r["sz_a"], r["sz_b"])
    assert r["inter"] == small_sz  # every shingle of the embedded doc
    cont = r["cont_a_in_b"] if r["sz_a"] == small_sz else r["cont_b_in_a"]
    assert cont == 1.0
    assert not [r for r in rows if 3 in (r["a_id"], r["b_id"])]


def test_psi_zero_when_periods_identical(spark):
    """PSI contract: if the binned distribution matches the reference
    exactly, every psi_term is exactly 0.0 (not merely small) — the
    cross-ratio hits ln(1) with integer-exact arguments. Verified by
    construction: bins where cur_pct == ref_pct must emit 0.0."""
    from banksy_spark.suite import REGISTRY

    rows = REGISTRY["ml_psi_drift"].fn(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    for r in rows:
        if r["psi_term"] is None:
            assert r["ref_n"] == 0 or r["cur_n"] == 0
            continue
        if r["ref_pct"] == r["cur_pct"]:
            assert r["psi_term"] == 0.0
        # sign contract: a bin with higher current share contributes
        # a non-negative term, lower share likewise non-negative
        assert r["psi_term"] >= 0.0 or abs(r["psi_term"]) < 1e-15


def test_containment_k3_is_superset_of_k1(spark):
    """Widening the candidate index from 1 to 3 min-hashes can only ADD
    pairs: verification is exact and identical, so the k=3 result must
    be a superset of the k=1 result (and any growth is pure recall)."""
    from banksy_spark.suite import REGISTRY

    k1 = {
        (r["a_id"], r["b_id"])
        for r in REGISTRY["llm_dedup_containment"].fn(spark, SF_ORACLE).collect()
    }
    k3 = {
        (r["a_id"], r["b_id"])
        for r in REGISTRY["llm_dedup_containment_k3"].fn(spark, SF_ORACLE).collect()
    }
    assert k1 <= k3, f"k1 pairs missing from k3: {k1 - k3}"
