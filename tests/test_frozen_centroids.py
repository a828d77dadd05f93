"""The frozen-quantizer contract (tools/freeze_centroids.py).

``ml_kmeans_converged`` and ``llm_ann_ivf_trained`` serve centroids
frozen as source literals so their serving passes can carry DuckDB
oracles; the TRAINED STATE itself is pinned here: retraining on the
committed sf0.001 sample must reproduce every frozen coordinate and
audit fact bit-for-bit. A trainer change, fixture change, or hand-edit
of the generated module fails this loudly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name,k", [("KM8", 8), ("IVF16", 16)])
def test_retraining_reproduces_frozen_literals(spark, name, k):
    from banksy_spark.operators.kmeans import kmeans_train
    from banksy_spark.suite import _frozen_centroids as fc

    assert fc.TRAIN_SF == "sf0.001"
    frozen = dict(getattr(fc, f"{name}_CENTROIDS"))
    assert len(frozen) == k and all(len(cv) == 64 for cv in frozen.values())

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    )
    cents, _assigned, n_iter, converged = kmeans_train(e, k=k, max_iter=20)
    assert n_iter == getattr(fc, f"{name}_N_ITER")
    assert converged is getattr(fc, f"{name}_CONVERGED")
    got = {r["cell"]: list(r["cv"]) for r in cents.select("cell", "cv").collect()}
    assert set(got) == set(frozen)
    for cell in got:
        for a, b in zip(got[cell], frozen[cell]):
            # bit-exact: frozen via repr round-trip, not approximate
            assert a == b and math.copysign(1, a) == math.copysign(1, b), cell


def test_frozen_serving_matches_converged_assignment_on_training_sample(spark):
    """On the training corpus itself, serving the frozen KM8 centroids
    must reproduce the trainer's own converged assignment — the
    freeze step changed WHERE the centroids live, not what they say."""
    from banksy_spark.operators.kmeans import assign, centroids_df, kmeans_train
    from banksy_spark.suite._frozen_centroids import KM8_CENTROIDS

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    )
    _cents, assigned, _n_iter, converged = kmeans_train(e, k=8, max_iter=20)
    assert converged
    n = e.withColumn(
        "nrm",
        F.expr(
            "sqrt(aggregate(transform(v, x -> x * x), 0D, (acc, v) -> acc + v))"
        ),
    )
    served = assign(n, centroids_df(spark, KM8_CENTROIDS)).select("vec_id", "cell")
    diff = (
        served.withColumnRenamed("cell", "s_cell")
        .join(assigned, "vec_id")
        .filter(F.col("s_cell") != F.col("cell"))
        .count()
    )
    assert diff == 0
