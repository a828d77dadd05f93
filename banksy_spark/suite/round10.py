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

Both follow the round-9 Bollinger discipline: ONE shared fold
(streaming/stateful.py) runs in three harnesses — the state store
(applyInPandasWithState, cross-micro-batch pytest), the batch replay
(applyInPandas, registered here), and the window-form DuckDB oracle —
and all three are bit-identical.
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
    note="Capped running sum, CUSTOM-STATEFUL form: the applyInPandas "
    "replay of streaming/stateful.py:capped_balance_stateful "
    "(applyInPandasWithState, state = ONE double per user — the clamp "
    "saturates, so unlike every windowed twin no buffer is needed; "
    "this is the token-bucket/inventory-balance primitive). Verified "
    "against the SAME list_reduce oracle as w_capped_running_sum: the "
    "fold applies one IEEE add then min/max per event in the oracle's "
    "operation order, so stream, replay and the window-collect form "
    "are bit-identical; the cross-micro-batch contract is "
    "tests/test_streaming.py. Scale: state is O(active users) doubles, "
    "traffic shuffles once on user_id — strictly cheaper than the "
    "batch form's collect_list frame.",
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
    note="Markov transition matrix, CUSTOM-STATEFUL form: the "
    "applyInPandas replay of streaming/stateful.py:"
    "markov_pairs_stateful (applyInPandasWithState, state = the last "
    "event_type per user) emits each event's (prev, cur) pair — "
    "exactly lead() over the per-user total order, computed "
    "incrementally — and the count/row-normalize tail is an ordinary "
    "associative aggregation (streamable in update mode with no "
    "further state). Verified against the SAME lead()-window oracle "
    "as stream_markov_transitions; integer counts and one "
    "BIGINT/BIGINT->DOUBLE division, bit-exact. Scale: state is one "
    "string per active user; pair traffic shuffles once on user_id "
    "then aggregates map-side onto the tiny |types|^2 matrix.",
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
