"""Round-10 additions: the two remaining sequential-stat streaming
twins (round-9 verdict item 6).

- stream_capped_balance_stateful: the keyed-state saturating token
  bucket — w_capped_running_sum's clamp recurrence run from ONE double
  of state per user (the classic streaming primitive: rate limiters,
  inventory levels, prepaid balances).
- stream_markov_stateful: first-order transition matrix computed from
  per-user last-event state — stream_markov_transitions' lead() stage
  made state-incremental (one string of state per user), with the
  count/normalize tail an ordinary associative aggregation.

Both follow the round-9 Bollinger discipline — the state store form
(applyInPandasWithState, cross-micro-batch pytest), the batch replay
(registered here), and the window-form DuckDB oracle are all
bit-identical — with one round-10 refinement: the batch replays run
the identical recurrence in the repartition + sortWithinPartitions +
mapInPandas carry shape rather than per-group applyInPandas
(rate_limit_batch's documented reshape; per-group invocation overhead
dominated at ~1.5k users, measured 3.25→0.75 s and 3.17→1.08 s at
sf0.1). State carried across Arrow batches within a user-hashed
sorted partition is exactly the state the store carries across
micro-batches, and the three-SF oracle sweep plus the stream==batch
pytests pin all three forms equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query


@query(
    "stream_capped_balance_stateful",
    oracle="""
    SELECT event_id, user_id,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), l),
               (acc, x) -> GREATEST(CAST(0 AS DOUBLE),
                                    LEAST(CAST(100 AS DOUBLE), acc + x)))
             AS capped_balance
    FROM (
      SELECT event_id, user_id,
             list(value - 50e0) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    """,
    note="Capped running sum, CUSTOM-STATEFUL form: the batch replay "
    "of streaming/stateful.py:capped_balance_stateful "
    "(applyInPandasWithState, state = ONE double per user — the clamp "
    "saturates, so unlike every windowed twin no buffer is needed; "
    "this is the token-bucket/inventory-balance primitive). Verified "
    "against the SAME list_reduce oracle as w_capped_running_sum: the "
    "fold applies one IEEE add then min/max per event in the oracle's "
    "operation order, so stream, replay and the window-collect form "
    "are bit-identical; the cross-micro-batch contract is "
    "tests/test_streaming.py. The batch replay runs the recurrence in "
    "the repartition+sortWithinPartitions+mapInPandas carry shape "
    "(rate_limit_batch's documented reshape: per-group applyInPandas "
    "invocation overhead dominated at ~1.5k users — 3.25 s vs 1.2 s "
    "at sf0.1 — while the Python fold itself is ~30 ms/200k rows). "
    "Scale: state is O(active users) doubles, traffic shuffles once "
    "on user_id — strictly cheaper than the batch form's "
    "collect_list frame.",
)
def stream_capped_balance_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.streaming.stateful import capped_balance_batch

    e = T(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return capped_balance_batch(e)


@query(
    "stream_markov_stateful",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, COUNT(*) AS n FROM seq
      WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM cnt
    """,
    note="Markov transition matrix, CUSTOM-STATEFUL form: the batch "
    "replay of streaming/stateful.py:"
    "markov_pairs_stateful (applyInPandasWithState, state = the last "
    "event_type per user) emits each event's (prev, cur) pair — "
    "exactly lead() over the per-user total order, computed "
    "incrementally — and the count/row-normalize tail is an ordinary "
    "associative aggregation (streamable in update mode with no "
    "further state). Verified against the SAME lead()-window oracle "
    "as stream_markov_transitions; integer counts and one "
    "BIGINT/BIGINT->DOUBLE division, bit-exact. The batch replay uses "
    "the same mapInPandas carry shape as capped_balance_batch. Scale: "
    "state is one string per active user; pair traffic shuffles once "
    "on user_id then aggregates map-side onto the tiny |types|^2 "
    "matrix.",
)
def stream_markov_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.streaming.stateful import markov_pairs_batch

    e = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    pairs = markov_pairs_batch(e)
    cnt = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    wn = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wn)).alias("p"),
    )


@query(
    "llm_dedup_containment_g5",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                 || w[i+3] || ' ' || w[i+4]) AS h
      FROM w, unnest(generate_series(1, len(w) - 4)) AS t(i)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    mk AS (SELECT doc_id, MIN(h) AS mk FROM sh GROUP BY doc_id),
    cand AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM mk a JOIN mk b ON a.mk = b.mk AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS inter
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.a_id
      JOIN sh sb ON sb.doc_id = c.b_id AND sb.h = sa.h
      GROUP BY c.a_id, c.b_id
    )
    SELECT i.a_id, i.b_id, CAST(i.inter AS BIGINT) AS inter,
           CAST(za.sz AS BIGINT) AS sz_a, CAST(zb.sz AS BIGINT) AS sz_b,
           CAST(i.inter AS DOUBLE) / za.sz AS cont_a_in_b,
           CAST(i.inter AS DOUBLE) / zb.sz AS cont_b_in_a
    FROM inter i
    JOIN sz za ON za.doc_id = i.a_id
    JOIN sz zb ON zb.doc_id = i.b_id
    WHERE 5 * i.inter >= 4 * za.sz OR 5 * i.inter >= 4 * zb.sz
    """,
    note="Containment dedup over word 5-shingles — the MEASURED scale "
    "path for the containment family (round-9 verdict item 4; docs "
    "under 5 words are out of scope by construction, same as the "
    "3-gram form excludes under-3-word docs). The round-10 scale study "
    "(tools/bench_simjoin_scale.py, SCALE.md) settles the lever "
    "question empirically: k=3 min-hash banding "
    "(llm_dedup_containment_k3) is a RECALL dial — ~4x the candidates "
    "for +13-15% result pairs, never cheaper at any measured size in "
    "either vocabulary regime — while LENGTHENING the shingle is the "
    "COST dial: 5-gram single-min-hash candidates are near-LINEAR in "
    "corpus size (closed-vocab 158/441/2,239 at 5k/15k/50k docs vs "
    "10k/90k/963k for 3-gram, a 430x cut at 50k; Heaps-law regime "
    "301/1,257/7,487 vs 55k/331k/2.84M) because the 5-gram key space "
    "is vast in ANY vocabulary, so the global-minimum hash barely "
    "concentrates. Identical plan shape to llm_dedup_containment "
    "(min-hash bucket candidates, exact intersection only over "
    "candidates, integer tau=4/5 gate) — at 100 TB run THIS form, and "
    "add k-min banding on top only where recall is worth 4x "
    "verification.",
)
def llm_dedup_containment_g5(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    mk = sh.groupBy("doc_id").agg(F.min("h").alias("mk"))
    a, b = mk.alias("a"), mk.alias("b")
    cand = a.join(
        b, (F.col("a.mk") == F.col("b.mk")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
    sa = sh.select(F.col("doc_id").alias("a_id"), "h")
    sb = sh.select(F.col("doc_id").alias("b_id"), "h")
    inter = (
        cand.join(sa, "a_id")
        .join(sb, ["b_id", "h"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sz.select(F.col("doc_id").alias("a_id"), F.col("sz").alias("sz_a"))
    zb = sz.select(F.col("doc_id").alias("b_id"), F.col("sz").alias("sz_b"))
    keep = (5 * F.col("inter") >= 4 * F.col("sz_a")) | (
        5 * F.col("inter") >= 4 * F.col("sz_b")
    )
    return (
        inter.join(za, "a_id")
        .join(zb, "b_id")
        .filter(keep)
        .select(
            "a_id", "b_id", "inter", "sz_a", "sz_b",
            (F.col("inter").cast("double") / F.col("sz_a")).alias("cont_a_in_b"),
            (F.col("inter").cast("double") / F.col("sz_b")).alias("cont_b_in_a"),
        )
    )
