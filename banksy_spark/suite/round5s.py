"""Round-5 continuation, batch 18: DAU/MAU stickiness and a Merkle
partition-integrity root.

- a_dau_mau_stickiness: the product-health ratio — daily actives over
  trailing-30-day actives per day. Composes the a_rolling_dau_7d
  range-join shape at two window widths; the ratio is int/int.
- dq_merkle_root: a two-level Merkle checksum — order-insensitive
  row-level hash XOR per day partition, then a root hash over the
  sorted partition digests — so two table copies can be compared
  partition-by-partition (which day diverged) or root-to-root (did
  ANYTHING change) without moving data. Extends dq_partition_checksum
  with the tree level real lakehouse reconciliation uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

# --- DAU / MAU stickiness --------------------------------------------------


@query(
    "a_dau_mau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), spine AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1
    ),
    mau AS (
      SELECT s.day, COUNT(DISTINCT u.user_id) AS mau
      FROM spine s JOIN ud u ON u.day BETWEEN s.day - 29 AND s.day
      GROUP BY 1
    )
    SELECT d.day, d.dau, m.mau,
           CAST(d.dau AS DOUBLE) / m.mau AS stickiness
    FROM dau d JOIN mau m ON m.day = d.day
    """,
    note="DAU/MAU stickiness per day — the product-health ratio of daily "
    "actives to trailing-30-day actives. Both distinct counts ride the "
    "a_rolling_dau_7d shape (windowed COUNT DISTINCT isn't "
    "frame-mergeable, so the calendar spine broadcasts into a range "
    "join against the (user, day) grain; each activity row lands in "
    "≤30 windows). The ratio is integer/integer. Scale: the (user, "
    "day) distinct is the only fact-sized exchange; an HLL-register "
    "variant (llm_distinct_sketch_hll) swaps in when 30× row "
    "amplification matters more than exactness.",
)
def a_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    spine = ud.select(F.col("day").alias("s_day")).distinct()
    mau = (
        ud.join(
            F.broadcast(spine),
            (F.col("day") >= F.date_sub(F.col("s_day"), 29))
            & (F.col("day") <= F.col("s_day")),
        )
        .groupBy(F.col("s_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return dau.join(mau, "day").select(
        "day",
        "dau",
        "mau",
        (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
    )


# --- Merkle partition-integrity root ---------------------------------------


@query(
    "dq_merkle_root",
    oracle="""
    WITH rows_h AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(('0x' || substring(
               md5(CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
                   || '|' || event_type), 1, 15)) AS BIGINT) AS h
      FROM events
    ),
    parts AS (
      SELECT day, bit_xor(h) AS part_digest, COUNT(*) AS n_rows
      FROM rows_h GROUP BY 1
    )
    SELECT day, part_digest, n_rows,
           (SELECT md5(string_agg(CAST(part_digest AS VARCHAR), '|'
                                  ORDER BY day))
            FROM parts) AS table_root
    FROM parts
    """,
    note="Two-level Merkle integrity tree over the events table: each "
    "row hashes to a 60-bit integer (md5 prefix — identical parse in "
    "both engines), partitions fold rows with XOR (order-insensitive, "
    "so partition digests are partial-agg safe by construction), and "
    "the table root is the hash of the day-ordered digest list. Two "
    "copies of a 100 TB table compare root-to-root for 'did anything "
    "change', then digest-to-digest for WHICH partition diverged — "
    "no data movement, one scan each side. Extends the flat "
    "dq_partition_checksum with the tree level lakehouse "
    "reconciliation uses.",
)
def dq_merkle_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.col("user_id").cast("string"),
                    F.col("event_type"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    parts = (
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"), h.alias("h")
        )
        .groupBy("day")
        .agg(
            F.expr("bit_xor(h)").alias("part_digest"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    root = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("day", "part_digest")).over(w)
                ),
                lambda x: x["part_digest"].cast("string"),
            ),
            "|",
        )
    )
    return parts.select(
        "day", "part_digest", "n_rows", root.alias("table_root")
    )
