"""Round-5 continuation, batch 13: fill-in-middle training transform
and leakage-aware target encoding.

- llm_fim_transform: the fill-in-middle (FIM) reordering code-model
  pretraining applies — split each document into prefix/middle/suffix
  at deterministic content-derived points and emit
  <PRE>prefix<SUF>suffix<MID>middle — so the model learns infilling.
  Pure string arithmetic, hash-derived split points (no RNG).
- ml_target_encoding_loo: leave-one-out target encoding — each row's
  category is encoded as the mean target of its group EXCLUDING the
  row itself ((sum - y_i)/(n - 1)), the standard leakage guard naive
  target encoding lacks. One window pass, exact integer arithmetic
  until the final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

# --- fill-in-middle transform ----------------------------------------------


@query(
    "llm_fim_transform",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    cuts AS (
      SELECT doc_id, toks, n,
             1 + (CAST(doc_id * 2654435761 % 1000000007 AS BIGINT) % (n - 2))
               AS c1
      FROM t WHERE n >= 5
    ),
    cuts2 AS (
      SELECT doc_id, toks, n, c1,
             c1 + 1 + (CAST(doc_id * 40503 % 65537 AS BIGINT) % (n - c1 - 1))
               AS c2
      FROM cuts
    )
    SELECT doc_id, c1 AS cut_prefix, c2 AS cut_suffix,
           '<PRE>' || array_to_string(toks[1:c1], ' ')
             || '<SUF>' || array_to_string(toks[c2+1:n], ' ')
             || '<MID>' || array_to_string(toks[c1+1:c2], ' ')
             AS fim_text
    FROM cuts2
    """,
    note="Fill-in-middle (FIM) pretraining transform: each document "
    "splits at two deterministic hash-derived token cuts (Knuth "
    "multiplicative hashes of doc_id — reproducible, content-"
    "independent, no RNG) into prefix/middle/suffix, re-emitted as "
    "<PRE>prefix<SUF>suffix<MID>middle so an autoregressive model "
    "learns infilling (the code-model objective next to "
    "llm_span_corruption's T5 spans). Both engines slice the same "
    "1-based token ranges and join with single spaces. Pure map "
    "stage — no shuffle at any scale; the cut arithmetic is integer "
    "mod, the guard n≥5 keeps all three segments non-degenerate.",
)
def llm_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    n = F.size("toks")
    d = d.withColumn("n", n).filter(F.col("n") >= 5)
    c1 = 1 + (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000007)
    ).cast("bigint") % (F.col("n") - 2)
    d = d.withColumn("c1", c1)
    c2 = F.col("c1") + 1 + (
        (F.col("doc_id") * F.lit(40503)) % F.lit(65537)
    ).cast("bigint") % (F.col("n") - F.col("c1") - 1)
    d = d.withColumn("c2", c2)
    fim = F.concat(
        F.lit("<PRE>"),
        F.array_join(F.slice("toks", F.lit(1), F.col("c1")), " "),
        F.lit("<SUF>"),
        F.array_join(
            F.slice("toks", F.col("c2") + 1, F.col("n") - F.col("c2")), " "
        ),
        F.lit("<MID>"),
        F.array_join(
            F.slice("toks", F.col("c1") + 1, F.col("c2") - F.col("c1")), " "
        ),
    )
    return d.select(
        "doc_id",
        F.col("c1").alias("cut_prefix"),
        F.col("c2").alias("cut_suffix"),
        fim.alias("fim_text"),
    )


# --- leave-one-out target encoding -----------------------------------------


@query(
    "ml_target_encoding_loo",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(grp_pos - y AS DOUBLE) / (grp_n - 1) AS prio_loo_enc
    FROM (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               OVER (PARTITION BY o_orderpriority) AS grp_pos,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS grp_n
      FROM orders
    )
    """,
    note="Leave-one-out target encoding of order priority against the "
    "finished-status target: each row encodes as its group's positive "
    "rate EXCLUDING itself ((Σy − y_i)/(n − 1)) — the leakage guard "
    "that separates usable target encoding from train-time "
    "contamination. Integer window sums, one final division. Shape: "
    "one category-keyed window exchange; at 100 TB the two window "
    "aggregates collapse to a broadcast (category, sum, n) table "
    "joined back — identical math, no per-row window state.",
)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    # the note's 100 TB form, made real: the per-priority sums collapse
    # to a 5-row broadcast aggregate joined back — a partition-only
    # window over the fact would put a fifth of orders on one task
    base = o.select("o_orderkey", "o_orderpriority", y.alias("y"))
    grp = base.groupBy("o_orderpriority").agg(
        F.sum("y").alias("grp_pos"), F.count(F.lit(1)).alias("grp_n")
    )
    x = base.join(F.broadcast(grp), "o_orderpriority")
    return x.select(
        "o_orderkey",
        "o_orderpriority",
        (
            (F.col("grp_pos") - F.col("y")).cast("double")
            / (F.col("grp_n") - 1)
        ).alias("prio_loo_enc"),
    )
