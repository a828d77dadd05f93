"""Round-8 additions: trained-coarse-quantizer ANN.

The suite's IVF family (suite/llm.py) trains its coarse quantizer as a
closed-form per-label centroid so the DuckDB oracle can reproduce it
bit-for-bit. That proves the *plumbing*; a production IVF index trains
its quantizer with k-means over a sample of the corpus (Faiss/ScaNN
convention). `llm_ann_ivf_trained` is that variant: the coarse
quantizer comes from the converged spherical k-means the suite already
ships (operators/kmeans.py, bit-exact-vs-Python pytest), unifying the
ANN and clustering centroid stories — the same trained centroids that
drive `ml_kmeans_converged` become the inverted-list keys here.

Not SQL-expressible (data-dependent iteration count in the trainer), so
the driver records the rows-only check, like ml_kmeans_converged; the
structural contract (neighbors share the query's cell, ranks dense from
1, cosine ordering, recall floor vs in-engine brute force on the
clustered fixture) is pytest-verified in tests/test_round8.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.llm import _DOT_SPARK, _NORM_SPARK
from banksy_spark.suite.registry import T, query

_IVF_K = 16  # inverted lists; >= the 8-cell closed-form variant
_IVF_TOPK = 3
_IVF_NQ = 8  # queries: vec_id < 8, same set as the llm_ann_* family


def ivf_trained_parts(spark: SparkSession, sf_dir: str):
    """(normed vectors+cell, n_iter) with the k-means coarse quantizer.

    The trainer persists the normed frame internally; we join its
    assignments back to a normed projection of the same scan — at 100 TB
    both sides shuffle on vec_id once (or co-locate via bucketing), and
    the assignment column would be written alongside the index anyway.
    """
    from banksy_spark.operators.kmeans import kmeans_train

    e = T(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    )
    _, assigned, n_iter, _ = kmeans_train(e, k=_IVF_K, max_iter=20)
    n = e.withColumn("nrm", F.expr(_NORM_SPARK.format(v="v")))
    return n.join(assigned, "vec_id"), n_iter


@query(
    "llm_ann_ivf_trained",
    oracle=None,  # trained quantizer = driver-loop k-means: not
    # SQL-expressible; structural contract pytest-verified
    # (tests/test_round8.py), trainer bit-exactness already covered by
    # tests/test_scale_ops.py::test_kmeans_train_converges_bit_exact_vs_python
    note="IVF-Flat with a TRAINED coarse quantizer: converged spherical "
    f"k-means (K={_IVF_K}, operators/kmeans.py) supplies the inverted "
    "lists, queries probe their own cell (nprobe=1) and rerank by exact "
    "cosine with a deterministic id tie-break. Same probe shape as "
    "llm_ann_ivf but the cells now adapt to the data instead of riding "
    "the label column — the Faiss/ScaNN construction. Scale: training "
    "cost is the k-means family's (broadcast centroids, "
    "map-side-combinable argmax per pass over a SAMPLE at 100 TB); the "
    "probe is one broadcast of 8 query rows + a cell-keyed rerank, no "
    "all-pairs anywhere. n_iter rides along as an audit column.",
)
def llm_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    nv, n_iter = ivf_trained_parts(spark, sf_dir)
    q = nv.filter(F.col("vec_id") < _IVF_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "cell",
    )
    joined = nv.join(F.broadcast(q), "cell").filter(
        F.col("vec_id") != F.col("qid")
    )
    cosine = F.expr(_DOT_SPARK.format(a="qv", b="v")) / (
        F.col("qn") * F.col("nrm")
    )
    wr = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        joined.select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.col("cell").cast("bigint").alias("cell"),
            cosine.alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= _IVF_TOPK)
        .withColumn("n_iter", F.lit(n_iter).cast("int"))
        .select("qid", "neighbor_id", "cell", "rnk", "cosine", "n_iter")
    )
