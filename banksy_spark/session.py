"""SparkSession factory.

One place to pin the engine's execution posture:
 - AQE on (runtime shuffle coalescing + skew-join splitting — the 100 TB
   posture; at local scale it mostly coalesces tiny shuffles).
 - ANSI off: the reference's semantics are pandas' coercing semantics
   (``to_numeric(errors='coerce')`` → NULL on garbage, see SURVEY.md
   §4.3.5); Spark 4 defaults ANSI on, so we pin it off and use
   ``try_cast`` where coercion is the *point* of the operator.
 - Session timezone UTC: testdata timestamps are naive; both Spark and
   the DuckDB oracle must read the same wall-clock values.
 - Arrow enabled for pandas interchange (vectorized UDF path).

The reference pins ``America/Phoenix`` for its notification log
(arbitrage_scanner.py:509); the pipeline layer exposes
``phoenix_wall_ts`` (a fixed UTC-7 shift — Arizona has no DST) for
callers stamping log rows from a UTC instant, so the engine default
stays UTC and every stored pipeline timestamp is a Phoenix wall value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _bool_env(name: str, default: str) -> str:
    """Read a boolean env override, accepting only true/false (any
    case). Anything else raises immediately with the offending value —
    passing it through verbatim would only fail later, mid-session-
    build, with Spark's less pointed config error."""
    raw = os.environ.get(name, default).strip().lower()
    if raw not in ("true", "false"):
        raise ValueError(
            f"{name} must be 'true' or 'false', got {raw!r}"
        )
    return raw


def get_spark(
    app_name: str = "banksy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to the local core
    count — on a real cluster you'd size this to ~2-3× total cores and
    let AQE coalesce.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r13 opt): a 64 KB coalescePartitions.minPartitionSize
        # was trialed to keep small-bytes/high-CPU shuffles parallel and
        # REVERTED: the interleaved A/B measured it costing more across
        # multi-stage queries (graph_pagerank 3.97→5.73 s, containment
        # 1.66→2.27 s — many more tiny tasks per AQE stage) than it
        # saved; the fan_out operator below captures the parallelism
        # wins without inflating every stage's task count.
        # let AQE re-plan downstream of persisted frames (iterative ops:
        # connected components, IVF centroid loops keep cached inputs);
        # default false pins cached-plan output partitioning and leaves
        # 3x32-partition union stages unoalesced over tiny graphs
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # Prefer shuffled-hash join over sort-merge when a side fits the
        # per-partition build budget (guide §3.1/§9): skips both sorts.
        # The planner's size conditions still gate it, so a build side
        # that cannot fit per-partition falls back to SMJ; AQE can also
        # rewrite SMJ→SHJ at runtime under the local-map threshold.
        # TRADEOFF (guide §5): SHJ's per-partition hash build cannot
        # spill — a skewed or size-underestimated build partition that
        # passes the planner's gate can OOM where SMJ would have
        # spilled. BANKSY_PREFER_SMJ=true is the cluster escape hatch;
        # the value is validated so a typo fails here, not at session
        # build (r13 ADVICE).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            _bool_env("BANKSY_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("BANKSY_SHJ_LOCALMAP_THRESHOLD", "64MB"),
        )
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BANKSY_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # columnar parquet reader + pushdown are on by default; stated for intent
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_caches(spark: SparkSession) -> int:
    """Release EVERY cached/persisted artifact the session holds:
    DataFrame-layer caches (``catalog.clearCache``) AND the
    persistent-RDD registry, which additionally contains
    ``localCheckpoint`` RDDs that the CacheManager cannot see
    (operators/graph.py truncates the dup-graph lineage with lazy
    local checkpoints; kmeans.py likewise). Returns the number of
    registry entries released.

    Call between queries, never mid-query: a localCheckpointed RDD's
    lineage is truncated, so unpersisting it destroys the only copy —
    any still-live plan built on it would fail on its next action.
    Every harness (bench.py, tools/check.py, tools/ansi_check.py,
    tools/plan_audit.py, tests/conftest.py) rebuilds each query's
    DataFrame from scratch per run, so between-query release is safe;
    tests/test_persist_hygiene.py pins that this leaves the registry
    empty after the heaviest persisting queries.
    """
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in list(jmap.values()):
        jrdd.unpersist(False)
        n += 1
    return n
