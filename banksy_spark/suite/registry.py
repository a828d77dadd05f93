"""Query registry: names → (spark_fn, duckdb_oracle_sql).

Numeric-parity conventions used across the suite (SURVEY.md §4.3.3):

 - Money-ish doubles (2dp sources like prices, balances, discounts) are
   cast to DECIMAL before SUM so the aggregate is associative-exact and
   independent of partial-aggregation order; the final value is cast
   back to DOUBLE so both engines emit the identical IEEE value.
   Derived products get the scale of their exact decimal width
   (price×(1-disc) = 4dp, ×(1+tax) = 6dp).
 - Row-level arithmetic stays plain DOUBLE: IEEE ops are deterministic,
   both engines produce bit-identical results for the same expression.
 - Every computed column is aliased identically in the Spark query and
   the oracle SQL (driver hashes sort columns by name).
 - DECIMAL→DOUBLE cast hazard: when the decimal carries more significant
   digits than a double holds (~16), the engines' conversions can differ
   by one ulp (DuckDB multiplies by an inexact 10^-scale; Spark rounds
   the exact value). Route such conversions through a string —
   decimal→VARCHAR→DOUBLE is a correctly-rounded parse in both engines
   (see a_corr_manual, where the direct cast diverged at sf0.001).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None → driver runs rows-only check
    note: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (lazy parquet scan; Catalyst prunes/pushes).

    Two session-level accommodations, safe to set at runtime:
     - ANSI off: suite semantics are the reference's coercing pandas
       semantics (SURVEY §4.3.5), and the driver's session may default
       ANSI on (Spark 4).
     - events.ts precision varies by testdata generation: TIMESTAMP(NANOS)
       (vectorized reader rejects it → read as nano-longs, truncate to
       micros like DuckDB does) or TIMESTAMP(MICROS) (arrives as
       TIMESTAMP_NTZ → cast to session-TZ timestamp; identical wall-clock
       under the pinned UTC session).
    """
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # DuckDB reads the naive parquet timestamps as wall-clock; a Spark
    # session in a non-UTC zone would shift to_date/date_trunc results.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(raw.dtypes)["ts"]
        if ts_type == "bigint":  # NANOS file read under nanosAsLong
            return raw.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor for CPU-heavy per-row work.

    A small parquet file scans as ONE partition (sf0.1's documents table
    is a single 594 KB file → 1 task), so expression-heavy pipelines —
    shingling, MinHash, deletion neighborhoods, frame decoding — run on
    one core of the machine. This round-robin-repartitions the frame up
    to the session's default parallelism, but ONLY when the frame has
    fewer partitions than that: a real-scale scan (thousands of splits)
    makes it a provable no-op, so nothing here is tuned to local mode.
    Apply it between a scan and heavy per-row expressions; never before
    a plain aggregate (it would shuffle raw rows the partial agg would
    otherwise collapse map-side).

    The shuffle it inserts moves only the columns the downstream plan
    needs (Catalyst prunes through Repartition) and is deterministic
    (sortBeforeRepartition is on by default; no suite query depends on
    row order or partition ids — grep-verified, oracle hashes are order-
    insensitive).
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def query(name: str, oracle: str | None = None, note: str = ""):
    """Register a suite query. ``oracle`` is DuckDB SQL over the
    pre-registered testdata views, or None for non-SQL-expressible ops."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, note=note)
        return fn

    return deco
