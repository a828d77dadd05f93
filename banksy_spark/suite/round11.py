"""Round-11 additions: storage-layer and market-data aggregate shapes.

- o_file_skipping_stats: the min/max file-pruning manifest every
  columnar lakehouse keeps (parquet row-group stats, Iceberg/Delta
  file stats) computed as data, with per-file skip verdicts for a
  clustered-key predicate vs an unclustered-date predicate — the
  measurable storage lesson (clustering prunes; uncorrelated columns
  don't) expressed as one map-side-combinable aggregate.
- w_ohlc_resample: OHLC candle resampling (open/high/low/close per
  (series, hour)) via min_by/max_by over a (ts, event_id) order
  struct — the window-free form of "first/last value per bucket":
  a single partial-aggregable groupBy, no per-bucket sort, no window.

Both are beyond-reference training/analytics-pipeline operators in the
same spirit as the llm_* family (the reference, a single-node odds
scraper, has no storage or market-data layer); design notes cite the
brief's scale bar instead of reference lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, query

_FILE_ROWS = 2048  # synthetic file grain: ~one ingestion batch per 2048 keys
_KEY_LO, _KEY_HI = 10_000, 14_000
_DATE_LO, _DATE_HI = "1996-01-01", "1996-03-31"


@query(
    "o_file_skipping_stats",
    oracle=f"""
    WITH manifest AS (
      SELECT o_orderkey // {_FILE_ROWS} AS file_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
             MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
      FROM orders GROUP BY 1
    )
    SELECT file_id, n_rows, min_key, max_key, min_date, max_date,
           (max_key < {_KEY_LO} OR min_key > {_KEY_HI}) AS skip_key_scan,
           (max_date < DATE '{_DATE_LO}' OR min_date > DATE '{_DATE_HI}')
             AS skip_date_scan
    FROM manifest
    """,
    note="Min/max file-skipping manifest: per-synthetic-file (orderkey "
    "range = ingestion batch) row count and min/max stats for the "
    "clustering key and an uncorrelated date column, plus the planner's "
    "skip verdict for one predicate on each. The verdicts demonstrate "
    "the storage fact that matters at 100 TB: a key-range predicate "
    "skips every file but the overlapping few (stats ranges are "
    "disjoint because the key IS the layout), while the same-shaped "
    "date predicate skips nothing (TPC-H dates are uniform within any "
    "key range — the z-order/sort-by-ingestion lesson, see "
    "o_zorder_key). Scale: ONE map-side-combinable aggregate producing "
    "a metadata-sized manifest; a real table computes it at write time "
    "and the planner prunes against the manifest alone, never the "
    "data.",
)
def o_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    manifest = o.groupBy(
        F.expr(f"o_orderkey DIV {_FILE_ROWS}").alias("file_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )
    return manifest.select(
        "file_id",
        "n_rows",
        "min_key",
        "max_key",
        "min_date",
        "max_date",
        (
            (F.col("max_key") < _KEY_LO) | (F.col("min_key") > _KEY_HI)
        ).alias("skip_key_scan"),
        (
            (F.col("max_date") < F.lit(_DATE_LO).cast("date"))
            | (F.col("min_date") > F.lit(_DATE_HI).cast("date"))
        ).alias("skip_date_scan"),
    )


@query(
    "w_ohlc_resample",
    oracle="""
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, date_trunc('hour', ts))
               AS cnt
      FROM events
    )
    SELECT event_type, hour,
           MAX(CASE WHEN rn = 1 THEN value END) AS open_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           MAX(CASE WHEN rn = cnt THEN value END) AS close_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY 1, 2
    """,
    note="OHLC candle resampling per (series, hour): open/close are the "
    "value at the earliest/latest (ts, event_id) — min_by/max_by over "
    "the order STRUCT, the window-free form of first/last-per-bucket. "
    "The oracle states the naive window form (rank the bucket, pick "
    "rn=1 and rn=cnt); Spark's arg-min/arg-max aggregate is "
    "PARTIAL-AGGREGABLE (each map task keeps one candidate per bucket, "
    "merge keeps the smaller/larger key), so no per-bucket sort and no "
    "window ever runs — at 100 TB the shuffle carries one candidate "
    "row per (series, hour, task), not the fact. event_id breaks ts "
    "ties (tie-heavy streams are a fuzz regime), so both engines pick "
    "the identical row; high/low/count are plain min/max/count. Values "
    "pass through unsummed — no float-accumulation hazard.",
)
def w_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.min_by("value", okey).alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max_by("value", okey).alias("close_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
