"""Clustered-embedding fixture generator (round 7, VERDICT r6 item 5).

The driver's synthetic embeddings are directionally random, which makes
sub-linear high-recall ANN impossible by construction (BASELINE.md
records nprobe=6-of-10 — a 60% scan — as the first config clearing
recall@3 ≥ 0.9).  Real embedding spaces are clustered; this generator
produces a mixture-of-von-Mises-style table with the SAME schema as
``embeddings.parquet`` (vec_id BIGINT, embedding FLOAT[], label INT):

 - k unit-norm cluster directions (seeded Gaussian, normalized)
 - each vector = its cluster direction + N(0, sigma) noise
 - ``label`` IS the cluster id and ``vec_id % k`` the assignment, so
   the suite's label-mean IVF centroids recover the true structure and
   the first 8 vec_ids (the recall queries) span 8 distinct clusters.

On this table the IVF recall sweep (llm_ann_recall_multiprobe) clears
recall@3 ≥ 0.9 at nprobe=2 of 10 cells — a 20% probe fraction — which
tests/test_scale_ops.py pins as a floor; see BASELINE.md for the
measured curve.

Usage:
    python tools/clustered_embeddings.py OUT_DIR   # writes OUT_DIR/embeddings.parquet
"""

from __future__ import annotations

import sys

import numpy as np


def gen_arrays(
    n: int = 4000, dim: int = 64, k: int = 10, sigma: float = 0.18, seed: int = 7
):
    """Deterministic (vec_id, embedding, label) arrays."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = (np.arange(n) % k).astype(np.int32)
    vecs = centers[labels] + sigma * rng.standard_normal((n, dim))
    return np.arange(n, dtype=np.int64), vecs.astype(np.float32), labels


def write_parquet(
    path: str,
    n: int = 4000,
    dim: int = 64,
    k: int = 10,
    sigma: float = 0.18,
    seed: int = 7,
) -> None:
    """Write the fixture with the driver table's exact schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vec_id, vecs, labels = gen_arrays(n, dim, k, sigma, seed)
    table = pa.table(
        {
            "vec_id": pa.array(vec_id, pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clustered"
    import os

    os.makedirs(out, exist_ok=True)
    write_parquet(f"{out}/embeddings.parquet")
    print(f"wrote {out}/embeddings.parquet")
