"""Round-7 batch: training-corpus lifecycle operators.

Three pipeline shapes a 100 TB pre-training corpus needs that the
suite did not yet name as first-class queries:

- llm_dedup_semantic — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  cluster embeddings around a fixed centroid set, then drop any vector
  that sits within cosine τ of a LOWER-id vector in the SAME cluster.
  The cluster id is the candidate-blocking key — pairs are only formed
  inside a cluster, never across the corpus, so the shuffle key is
  `cluster` and per-cluster candidate sets stay bounded when K scales
  with n (the paper uses ~0.1%·n clusters).
- llm_shuffle_shards — the deterministic epoch shuffle in its
  exact-balance form (llm_epoch_shuffle in round4.py is the
  expected-balance hash-shard sibling): every doc gets
  a pseudorandom position from a seeded affine transform of its
  content hash, the global ordinal over that position is the epoch
  order, and round-robin over the ordinal yields exactly-balanced
  (±1 row) shard files. Rides operators/ordinals.global_ordinals, so
  no single-partition sort exists at any size; a new seed is a new
  epoch permutation.
- llm_chunk_fixed_overlap — retrieval-ingestion chunking: fixed
  windows with overlap, provenance columns, a content hash per chunk.
  Entirely map-side (sequence+explode in the scan task, zero
  shuffles) — runs at scan speed at any corpus size.

Parity rules as registry.py: identical IEEE expression trees in both
engines (the dot/norm folds seed identically), exactly-representable
thresholds (0.375 = 3/8), every computed column aliased identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.operators.ordinals import global_ordinals
from banksy_spark.suite.llm import _DOT_DUCK, _DOT_SPARK, _NORM_DUCK, _NORM_SPARK, _POLY_DUCK, _POLY_SPARK
from banksy_spark.suite.registry import T, fan_out, query

# --- SemDeDup: cluster-blocked embedding dedup ------------------------------

# Centroid count scales with the corpus: K = greatest(8, n/1000), the
# paper's ~0.1%·n rule (arXiv:2303.09540 §3). With fixed K the
# within-cluster pair join is O(n²/K) — all-pairs over a K-th of the
# corpus at 100 TB; with K ∝ n the expected cluster size is a constant
# (~1000), so total pair work stays LINEAR in n. Computed as a lazy
# 1-row broadcast aggregate (the llm_pack_sequences shard-count
# pattern), identically in the oracle — no driver action, no constant.
_SEM_K_DUCK = "(SELECT GREATEST(8, COUNT(*) // 1000) AS semk FROM embeddings)"
_SEM_TAU = 0.375  # exactly representable (3/8); drops ~23% at sf0.1


@query(
    "llm_dedup_semantic",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (SELECT vec_id, v, {_NORM_DUCK.format(v='v')} AS nrm FROM e),
    c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn
          FROM n, {_SEM_K_DUCK} k WHERE vec_id < k.semk),
    sims AS (
      SELECT vec_id, cid,
             {_DOT_DUCK.format(a='v', b='cv')} / (nrm * cn) AS s
      FROM n CROSS JOIN c
    ),
    asg AS (
      SELECT vec_id, CAST(cid AS BIGINT) AS cluster
      FROM (SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
            FROM sims)
      WHERE rn = 1
    ),
    m AS (SELECT n.vec_id, cluster, v, nrm FROM asg JOIN n USING (vec_id)),
    drp AS (
      SELECT DISTINCT b.vec_id
      FROM m a JOIN m b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       AND {_DOT_DUCK.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) >= {_SEM_TAU}
    )
    SELECT m.vec_id, cluster, (drp.vec_id IS NULL) AS is_kept
    FROM m LEFT JOIN drp ON m.vec_id = drp.vec_id
    """,
    note="SemDeDup (arXiv:2303.09540): nearest-centroid cluster assignment "
    "(broadcast K centroids, map-side-combinable argmax hash agg — nothing "
    "sorts), then within-cluster cosine pruning keeping the lowest id. The "
    "cluster id blocks the pair join; no cross-cluster pair ever forms, and "
    "K = greatest(8, n/1000) scales with the corpus (the paper's ~0.1%·n "
    "rule, via a lazy 1-row broadcast aggregate) so expected cluster size — "
    "and with it per-cluster pair work — stays CONSTANT as n grows "
    "(tools/bench_semdedup.py records the counterfactual vs fixed K).",
)
def llm_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the n×K centroid dot products run right on top of the
    # scan; a single-file scan would compute them on one core (r13 opt).
    e = fan_out(
        T(spark, sf_dir, "embeddings").select(
            "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
        )
    )
    n = e.withColumn("nrm", F.expr(_NORM_SPARK.format(v="v")))
    # K = greatest(8, n/1000) — same formula the oracle computes in SQL.
    # The row count comes from ONE bounded, memoized driver count (the
    # ordinals statistics cache: once per table per session), so K is a
    # LITERAL in the plan — the vec_id < K centroid filter pushes down
    # to the parquet scan, which a lazy broadcast-scalar K forfeits
    # (measured +0.3-0.5s at sf0.1 for an otherwise identical plan).
    from banksy_spark.operators.ordinals import memoized_count

    n_vec = memoized_count(e, "semdedup_n")
    k = max(8, n_vec // 1000)
    cents = n.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    sim = F.expr(_DOT_SPARK.format(a="v", b="cv")) / (F.col("nrm") * F.col("cn"))
    # argmax(sim) with lowest-cid tie-break as a hash aggregate (the
    # kmeans._assign pattern: max over a (sim, -cid) struct == the
    # row_number()=1 row of the oracle's sort, without sorting n×K rows).
    assigned = (
        n.crossJoin(F.broadcast(cents))
        .withColumn("_s", sim)
        .groupBy("vec_id")
        .agg(F.max(F.struct(F.col("_s").alias("s"), (-F.col("cid")).alias("nc"))).alias("m"))
        .select("vec_id", (-F.col("m.nc")).cast("bigint").alias("cluster"))
    )
    # membership feeds BOTH sides of the pair join AND the final
    # output — persist so the scan + centroid fan-out + argmax agg run
    # once, not three times (at 100 TB that's one corpus pass vs three)
    m = assigned.join(n, "vec_id").persist()  # vec_id, cluster, v, nrm
    # r13 opt: when K < cores (only at small corpus sizes — K scales
    # with n), the cluster-keyed pair join lands on K partitions and
    # the measured 2.8 s of pairwise dot products ran on ONE task.
    # Salt the a-side by a_id mod P and replicate the b-side P ways,
    # P = cores/K; at real scale K >> cores gives P = 1 — the identical
    # plan — so nothing here is tuned to local mode. The generated pair
    # set is unchanged (every (cluster, a, b) meets exactly once, at
    # salt = a_id mod P).
    p_rep = max(1, spark.sparkContext.defaultParallelism // max(k, 1))
    a = m.select(
        "cluster", F.col("vec_id").alias("a_id"), F.col("v").alias("av"), F.col("nrm").alias("an")
    ).withColumn("_salt", F.pmod(F.col("a_id"), F.lit(p_rep)).cast("int"))
    b = m.select(
        "cluster", F.col("vec_id").alias("b_id"), F.col("v").alias("bv"), F.col("nrm").alias("bn")
    ).withColumn("_salt", F.explode(F.expr(f"sequence(0, {p_rep - 1})"))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    # r14 opt: the r13 salt widened the KEY space but the event log
    # showed the pair stage still running as ONE 2.2 s task — the join's
    # post-shuffle partitions are only a few MB of vectors, so AQE's
    # byte-based coalescing collapsed them (guide §2.5: small-bytes /
    # high-CPU shuffle). Pinning the exchange with an explicit
    # user-specified repartition on the SAME join keys keeps the join
    # zero extra exchanges (co-partitioned inputs) and is exempt from
    # AQE coalescing. Width = defaultParallelism, so on a real cluster
    # this is the exchange the join needed anyway, at the same width
    # the session's shuffle.partitions posture gives it.
    n_pair_parts = spark.sparkContext.defaultParallelism
    a = a.repartition(n_pair_parts, "cluster", "_salt")
    b = b.repartition(n_pair_parts, "cluster", "_salt")
    pair_cos = F.expr(_DOT_SPARK.format(a="av", b="bv")) / (F.col("an") * F.col("bn"))
    dropped = (
        a.join(b, ["cluster", "_salt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(pair_cos >= _SEM_TAU)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return (
        m.join(dropped, "vec_id", "left")
        .select("vec_id", "cluster", F.col("_d").isNull().alias("is_kept"))
    )


# --- Deterministic epoch shuffle + exactly-balanced shards ------------------

_SHUF_SEED = 17
_SHUF_SHARDS = 8
# affine scramble of the content hash: h*A + seed (mod P). A is odd and
# P prime, so the map is a bijection on [0, P) — a reshuffle is a seed
# change, not a new hash pass.
_SHUF_A = 2654435761  # Knuth's multiplicative constant; h*A < 2^63


@query(
    "llm_shuffle_shards",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             (({_POLY_DUCK.format(s='text')} * {_SHUF_A}) + {_SHUF_SEED}) % 1000000007 AS pos
      FROM documents
    )
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (ORDER BY pos, doc_id) AS epoch_pos,
           CAST((ROW_NUMBER() OVER (ORDER BY pos, doc_id) - 1) % {_SHUF_SHARDS} AS INT) AS shard,
           CAST((ROW_NUMBER() OVER (ORDER BY pos, doc_id) - 1) // {_SHUF_SHARDS} AS BIGINT)
             AS shard_pos
    FROM d
    """,
    note="Deterministic epoch shuffle, exact-balance form: seeded affine "
    "scramble of the content hash gives every doc a pseudorandom position; "
    "the global ordinal over (pos, doc_id) is the epoch order; round-robin "
    "over the ordinal yields EXACTLY-balanced (±1) shards with a defined "
    "within-shard order. Complements llm_epoch_shuffle (round4.py), whose "
    "hash-mod shards are uniform only in expectation — this form pays one "
    "ordinal pass to guarantee every shard file is the same size, the "
    "contract data-parallel trainers want per step. The oracle is the naive "
    "global window; the engine rides the bucketed ordinal operator — every "
    "window partitioned at any size. A new seed is a new permutation "
    "without rehashing the payload.",
)
def llm_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_POLY_SPARK.format(s="text")).alias("h")
    )
    d = d.select(
        "doc_id",
        ((F.col("h") * F.lit(_SHUF_A) + F.lit(_SHUF_SEED)) % F.lit(1_000_000_007)).alias("pos"),
    )
    out = global_ordinals(d, ["pos", "doc_id"], row_number="epoch_pos")
    rn0 = F.col("epoch_pos") - 1
    return out.select(
        "doc_id",
        "pos",
        "epoch_pos",
        (rn0 % _SHUF_SHARDS).cast("int").alias("shard"),
        F.floor(rn0 / _SHUF_SHARDS).cast("bigint").alias("shard_pos"),
    )


# --- Fixed-window overlapping chunking (RAG / retrieval ingestion) ----------

_CHUNK_W = 200  # chunk width, chars
_CHUNK_S = 150  # stride -> 50-char overlap between neighbors


@query(
    "llm_chunk_fixed_overlap",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             unnest(range(0,
               greatest((length(text) - {_CHUNK_W} + {_CHUNK_S - 1}) // {_CHUNK_S}, 0) + 1
             )) AS k,
             text
      FROM documents
    )
    SELECT doc_id,
           CAST(k AS INT) AS chunk_id,
           CAST(1 + k * {_CHUNK_S} AS INT) AS start,
           length(substr(text, CAST(1 + k * {_CHUNK_S} AS INT), {_CHUNK_W})) AS chunk_len,
           md5(substr(text, CAST(1 + k * {_CHUNK_S} AS INT), {_CHUNK_W})) AS chunk_hash
    FROM c
    """,
    note="Retrieval-ingestion chunking: fixed 200-char windows at stride 150 "
    "(50-char overlap so no boundary sentence is lost), every chunk carrying "
    "provenance (doc_id, chunk_id, start) and a content hash for downstream "
    "dedup (composes with llm_dedup_exact on chunk_hash). Entirely map-side "
    "— sequence+explode inside the scan task, zero shuffles, so at 100 TB "
    "it runs at scan speed with no exchange at all. The negative-operand "
    "integer-division hazard (Spark DIV truncates toward zero, DuckDB // "
    "floors) is fenced by greatest(0, ·), which maps both conventions to "
    "the same chunk count for short docs.",
)
def llm_chunk_fixed_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    kmax = F.greatest(
        F.lit(0),
        F.expr(f"(length(text) - {_CHUNK_W} + {_CHUNK_S - 1}) DIV {_CHUNK_S}"),
    )
    chunks = d.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0), kmax)).alias("k")
    )
    start = (F.lit(1) + F.col("k") * _CHUNK_S).cast("int")
    chunk = F.expr(f"substr(text, CAST(1 + k * {_CHUNK_S} AS INT), {_CHUNK_W})")
    return chunks.select(
        "doc_id",
        F.col("k").cast("int").alias("chunk_id"),
        start.alias("start"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk.cast("binary")).alias("chunk_hash"),
    )
