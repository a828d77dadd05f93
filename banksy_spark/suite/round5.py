"""Round-5 expansion queries: capabilities a reference user (or a
training-data pipeline) would reach for next, each oracle-verified.

- j_asof_tolerance: the as-of join surface completed with pandas
  ``merge_asof(tolerance=...)`` semantics — a staleness cap on the
  backward match (stream_asof_join is the uncapped form).
- llm_cdc_chunks: content-defined chunking — rolling-hash boundaries
  make chunk identity robust to insertions/shifts, the unit real
  dedup pipelines hash instead of fixed windows.
- ml_kmeans_step: one deterministic spherical-k-means Lloyd step over
  the embeddings table with exact DECIMAL centroid means — the
  trained-quantizer building block the IVF family (suite.llm) notes
  as its production upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.llm import (
    _DOT_DUCK,
    _DOT_SPARK,
    _NORM_DUCK,
    _NORM_SPARK,
    _POLY_DUCK,
    _POLY_SPARK,
)
from banksy_spark.suite.registry import T, query

# --- As-of join with tolerance (merge_asof semantics) ----------------------

_ASOF_TOL_US = 7 * 24 * 3600 * 1_000_000  # 7 days


@query(
    "j_asof_tolerance",
    oracle=f"""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_at,
           CASE WHEN s.event_id IS NOT NULL
                 AND epoch_us(e.ts) - epoch_us(s.ts) <= {_ASOF_TOL_US}
                THEN s.event_id END AS signup_id,
           CASE WHEN s.event_id IS NOT NULL
                 AND epoch_us(e.ts) - epoch_us(s.ts) <= {_ASOF_TOL_US}
                THEN epoch_us(e.ts) - epoch_us(s.ts) END AS staleness_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
    note="As-of join with tolerance (pandas merge_asof(tolerance=7d)): each "
    "error matches the most recent prior signup of the same user ONLY if it "
    "is at most 7 days old — an older match is nulled, not replaced (an "
    "older candidate is strictly staler, so null is the unique correct "
    "answer). Spark composition: the same union + last(ignorenulls) "
    "forward-fill as stream_asof_join, then a conditional null on the "
    "exact integer-microsecond staleness; oracle: DuckDB's native ASOF "
    "LEFT JOIN with the cap applied post-match. One shuffle on user_id, "
    "no range explosion — the 100 TB shape for slowly-changing context "
    "attachment with a freshness SLA.",
)
def j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("bigint").alias("s_id"),
        F.lit(None).cast("timestamp").alias("s_ts"),
        F.lit(1).alias("is_err"),
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts",
        F.col("event_id").alias("s_id"),
        F.col("ts").alias("s_ts"),
        F.lit(0).alias("is_err"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_err", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        errors.unionByName(signups)
        .withColumn("last_id", F.last("s_id", ignorenulls=True).over(w))
        .withColumn("last_ts", F.last("s_ts", ignorenulls=True).over(w))
    )
    stale = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_ts"))
    fresh = F.col("last_id").isNotNull() & (stale <= F.lit(_ASOF_TOL_US))
    return filled.filter(F.col("is_err") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("error_at"),
        F.when(fresh, F.col("last_id")).alias("signup_id"),
        F.when(fresh, stale).alias("staleness_us"),
    )


# --- Content-defined chunking (rolling-hash boundaries) --------------------

_CDC_MOD = 16  # boundary when token-hash % 16 == 0 → ~16-token chunks


@query(
    "llm_cdc_chunks",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ),
    fl AS (
      SELECT doc_id, tok, pos,
             CASE WHEN ({_POLY_DUCK.format(s="tok")}) % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS is_b
      FROM tk
    ),
    ch AS (
      SELECT doc_id, tok, pos,
             COALESCE(SUM(is_b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS chunk_id
      FROM fl
    ),
    agg AS (
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      FROM ch GROUP BY doc_id, chunk_id
    )
    SELECT doc_id, chunk_id, n_tokens, chunk_text,
           ({_POLY_DUCK.format(s="chunk_text")}) AS chunk_hash
    FROM agg
    """,
    note="Content-defined chunking: a token ends a chunk when its shared "
    f"polynomial hash ≡ 0 (mod {_CDC_MOD}) — boundaries depend only on "
    "content, so inserting a sentence shifts ONE chunk instead of every "
    "fixed window downstream (the property FastCDC/rsync exploit; this is "
    "the gear-hash idea with the suite's verifiable hash). Emits "
    "(chunk_id, n_tokens, chunk_text, chunk_hash) per document; chunk_hash "
    "is what a shift-robust dedup joins on. Spark: posexplode + one "
    "prefix-sum window + ordered reassembly (array_sort over (pos, tok) "
    "structs — collect_list alone has no order contract); both engines "
    "compute identical boundaries via the shared hash. Scale: everything "
    "partitions by doc_id — window and groupBy share one exchange, and "
    "per-doc work is bounded by document length.",
)
def llm_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    h = F.expr(_POLY_SPARK.format(s="tok"))
    is_b = F.when(h % _CDC_MOD == 0, 1).otherwise(0)
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = tok.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(F.sum(is_b).over(wprev), F.lit(0)).alias("chunk_id"),
    )
    agg = ch.groupBy("doc_id", "chunk_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
            " ",
        ).alias("chunk_text"),
    )
    return agg.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "n_tokens",
        "chunk_text",
        F.expr(_POLY_SPARK.format(s="chunk_text")).alias("chunk_hash"),
    )


# --- One spherical-k-means Lloyd step (trained quantizer) ------------------

_KM_K = 8


@query(
    "ml_kmeans_step",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (SELECT vec_id, v, {_NORM_DUCK.format(v="v")} AS nrm FROM e),
    seeds AS (
      SELECT vec_id AS seed_id, v AS sv, nrm AS snrm FROM n
      WHERE vec_id < {_KM_K}
    ),
    assigned AS (
      SELECT vec_id, seed_id AS cell, v FROM (
        SELECT n.vec_id, s.seed_id, n.v,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {_DOT_DUCK.format(a="n.v", b="s.sv")} / (n.nrm * s.snrm) DESC,
                 s.seed_id) AS rk
        FROM n CROSS JOIN seeds s
      ) WHERE rk = 1
    ),
    dims AS (
      SELECT cell, i - 1 AS pos,
             CAST(floor(v[i] * 1000000000000.0) AS BIGINT) AS q
      FROM assigned, unnest(generate_series(1, 64)) AS t(i)
    )
    SELECT CAST(cell AS BIGINT) AS cell, CAST(pos AS BIGINT) AS pos,
           CAST(SUM(q) AS DOUBLE) / 1000000000000.0 / COUNT(*) AS c,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM dims GROUP BY cell, pos
    """,
    note=f"One spherical-k-means Lloyd step, k={_KM_K}: seeds are the first "
    "k vectors by vec_id (deterministic init), every vector assigns to its "
    "max-cosine seed (the same argmax tie-break machinery as the IVF "
    "family), and the updated centroid is an exact fixed-point mean "
    "(floor(x*1e12) integer sums — order-free and bit-identical in both "
    "engines, where a DECIMAL cast of a full-mantissa double is not: "
    "Spark rounds HALF_UP, DuckDB HALF_EVEN), so "
    "the whole training step (not just inference) is oracle-verified. "
    "Offline analysis (BASELINE.md round-5 ANN section) shows trained "
    "centroids are the upgrade path the label-mean IVF needs; iterating "
    "this step with a driver loop + localCheckpoint is the production "
    "k-means, exactly like the converged connected-components shape. "
    "Scale: assignment is a broadcast of k centroids against a narrow "
    "scan; the update is one (cell, pos) exchange of |V|·dims partial "
    "sums with map-side combine.",
)
def ml_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    n = e.withColumn("nrm", F.expr(_NORM_SPARK.format(v="v")))
    seeds = n.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("seed_id"),
        F.col("v").alias("sv"),
        F.col("nrm").alias("snrm"),
    )
    sim = F.expr(_DOT_SPARK.format(a="v", b="sv")) / (F.col("nrm") * F.col("snrm"))
    wa = Window.partitionBy("vec_id").orderBy(F.col("_sim").desc(), "seed_id")
    assigned = (
        n.crossJoin(F.broadcast(seeds))
        .withColumn("_sim", sim)
        .withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") == 1)
        .select(F.col("seed_id").alias("cell"), "v")
    )
    dims = assigned.select(
        "cell",
        F.posexplode("v").alias("pos", "val"),
    ).select(
        "cell",
        "pos",
        # fixed-point quantization at 1e-12: floor(x*1e12) is the same
        # IEEE multiply + floor in both engines (a DECIMAL cast is NOT —
        # Spark rounds HALF_UP, DuckDB HALF_EVEN, and a raw double's
        # mantissa actually hits the 18th decimal, unlike the 2dp money
        # columns the suite's DECIMAL convention was built for), so the
        # integer sum is associative-exact and order-free
        F.floor(F.col("val") * 1e12).cast("bigint").alias("q"),
    )
    return dims.groupBy("cell", "pos").agg(
        (F.sum("q").cast("double") / F.lit(1e12) / F.count("*")).alias("c"),
        F.count("*").cast("bigint").alias("n_members"),
    ).select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col("pos").cast("bigint").alias("pos"),
        "c",
        "n_members",
    )
