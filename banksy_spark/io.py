"""Sources & sinks (SURVEY.md §2.1).

The reference's sources are scrapes + CSVs + a spreadsheet; its sinks are
spreadsheet overwrite/append and a push-notification POST
(arbitrage_scanner.py:44-58,188-191,296-320,493-514). In Spark terms the
analytics inputs are tables; the scrape/HTTP edges are driver-side
adapters (see ``banksy_spark.pipelines``). This module is the table
layer: parquet/CSV in, parquet overwrite/append out.

At 100 TB the same functions hold: ``spark.read.parquet`` over a
partitioned directory tree prunes partitions from the path filter, and
the writers below take ``partition_by`` so big facts land
hash/date-partitioned instead of as one directory of files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast unconditionally. The
# reference's dims are 30-32 rows (mlb/nba/nfl_teams.csv); here region,
# nation, supplier play that role.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Read the testdata star schema: one lazy DataFrame per table.

    Nothing materializes here; Catalyst prunes columns and pushes
    predicates into each scan per consuming query.
    """
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load tables and register them as temp views for the SQL surface."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def read_csv_dim(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Dimension CSV scan (SURVEY §2.1 S3; arbitrage_scanner.py:188-191).

    The reference's dim CSVs have heterogeneous schemas (nfl_teams.csv
    carries 2 extra columns); ``columns`` selects the common subset the
    way arbitrage_scanner.py:191 does.
    """
    df = spark.read.csv(path, header=True, inferSchema=True)
    if columns:
        df = df.select(*columns)
    return df


def read_jsonl_tolerant(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Tolerant JSON-lines scan: well-formed rows parse against
    ``schema``; malformed lines survive in ``_corrupt_record`` instead
    of failing the job (PERMISSIVE mode) so a cleanup/alerting branch
    can count or quarantine them. The scraped-feed analog of the
    reference's try/except row tolerance (bovada_pull.py's skip-on-
    parse-failure), expressed as engine semantics instead of a loop.

    Spark restriction: a query that references ONLY the corrupt-record
    column of a raw JSON scan is disallowed — cache() the frame before
    splitting it into good/quarantine branches."""
    return spark.read.schema(schema + ", _corrupt_record STRING").option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)


def write_overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Full-refresh sink (SURVEY §2.1 K1; arbitrage_scanner.py:307-320)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Append sink (SURVEY §2.1 K2; arbitrage_scanner.py:506-514)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_partition_overwrite(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Backfill sink: overwrite ONLY the partitions present in ``df``,
    leaving every other partition untouched (dynamic partition
    overwrite). This is how a 100 TB date-partitioned fact is
    backfilled — re-running one day replaces that day's directory
    atomically instead of truncating the table (static overwrite) or
    duplicating rows (append). Session-conf scoped to the write and
    restored afterwards."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def upsert_batch(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str | None = None,
) -> None:
    """Idempotent keyed upsert (last-write-wins merge): rows in ``df``
    replace same-key rows at ``path``; other rows survive. Because the
    result is a pure function of (current state, batch contents),
    REPLAYING a batch converges to the identical state — the
    exactly-once property a ``foreachBatch`` streaming sink needs under
    Structured Streaming's at-least-once batch redelivery. Use as:
    ``q.writeStream.foreachBatch(lambda b, _id: upsert_batch(b, path,
    keys))``.

    ``version_col``: when a batch can carry MULTIPLE rows per key, pass
    the column naming the winner — the highest version per key survives
    (per-key partitioned window, deterministic when versions are unique
    within a key). Without it, the batch must hold at most one row per
    key or the merged table keeps all of them.

    Durability: existence is probed and the swap performed through the
    Hadoop FileSystem API of ``path`` (works on HDFS/S3A/local alike —
    a driver-local ``os.path`` check would silently truncate remote
    tables). The merge writes to a staging directory first, then
    delete+rename: the crash window shrinks to the two metadata ops
    (atomic on HDFS; object stores narrow it further with committers).
    A table format (Delta/Iceberg MERGE) replaces the whole
    read-union-rewrite with a transactional merge, same semantics.

    Scale: the anti-join keys on ``key_cols`` (broadcastable for a
    micro-batch-sized ``df``)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if version_col:
        w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
        df = (
            df.withColumn("_ub_rn", F.row_number().over(w))
            .filter(F.col("_ub_rn") == 1)
            .drop("_ub_rn")
        )
    df = df.localCheckpoint(eager=True)  # sever lineage from `path` pre-read

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    target = jvm.org.apache.hadoop.fs.Path(path)
    fs = target.getFileSystem(hconf)
    staging_recover = jvm.org.apache.hadoop.fs.Path(path + "__staging__")
    if fs.exists(staging_recover) and not fs.exists(target):
        # a previous call died between delete(target) and rename: the
        # ONLY copy of the table is the staging dir. Complete the
        # interrupted swap before reading/merging — without this, the
        # merge below would take the new batch as the full state and
        # the staging delete would erase the orphaned table.
        if not fs.rename(staging_recover, target):
            raise IOError(
                f"upsert_batch: crash recovery rename {staging_recover} "
                f"-> {target} failed"
            )
    if fs.exists(target):
        current = spark.read.parquet(path)
        keep = current.join(df.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = keep.unionByName(df)
    else:
        merged = df
    staging = jvm.org.apache.hadoop.fs.Path(path + "__staging__")
    fs.delete(staging, True)
    merged.write.mode("overwrite").parquet(path + "__staging__")
    fs.delete(target, True)
    if not fs.rename(staging, target):
        raise IOError(f"upsert_batch: rename {staging} -> {target} failed")


def upsert_versioned(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str | None = None,
    keep_versions: int = 2,
) -> int:
    """``upsert_batch`` with a manifest-pointer commit: NO window in
    which the table does not exist.

    Layout: ``path/v{N}/`` parquet snapshot dirs plus ``path/_CURRENT``
    — a one-line pointer file naming the live snapshot.  A commit is
    (1) write ``v{N+1}`` fully, (2) atomically swing ``_CURRENT`` via
    a sibling temp file + rename (a single metadata op on HDFS/local;
    object stores give read-after-write PUT semantics for the tiny
    pointer).  A reader (``read_current``) that resolves the pointer
    at ANY instant sees a complete snapshot: either the old one or the
    new one — never a half-written directory, unlike delete+rename
    whose two-op window leaves no table at all.  A crash before the
    swing leaves an orphan ``v{N+1}`` that the next commit simply
    overwrites-past; replaying a batch converges (same merge
    function).  This is the hand-rolled form of what Delta/Iceberg's
    transaction log does — production tables should use those formats'
    MERGE, same semantics.

    Returns the committed version number.  Old snapshots beyond
    ``keep_versions`` are deleted AFTER the pointer swing (readers of
    ancient pointers are the same hazard Delta's VACUUM documents).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if version_col:
        w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
        df = (
            df.withColumn("_ub_rn", F.row_number().over(w))
            .filter(F.col("_ub_rn") == 1)
            .drop("_ub_rn")
        )
    df = df.localCheckpoint(eager=True)

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    cur = _read_pointer(spark, path)
    if cur is not None:
        current = spark.read.parquet(f"{path}/v{cur}")
        keep = current.join(df.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = keep.unionByName(df)
        nxt = cur + 1
    else:
        merged, nxt = df, 1
    merged.write.mode("overwrite").parquet(f"{path}/v{nxt}")
    # atomic pointer swing: write sibling temp, then rename over
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/_CURRENT.tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(str(nxt).encode("ascii")))
    out.close()
    ptr = jvm.org.apache.hadoop.fs.Path(f"{path}/_CURRENT")
    fs.delete(ptr, False)
    if not fs.rename(tmp, ptr):
        raise IOError(f"upsert_versioned: pointer swing failed at {path}")
    for v in range(nxt - keep_versions, 0, -1):
        old = jvm.org.apache.hadoop.fs.Path(f"{path}/v{v}")
        if not fs.delete(old, True):
            break
    return nxt


def _read_pointer(spark: SparkSession, path: str) -> int | None:
    """Resolve the live snapshot version: the ``_CURRENT`` pointer,
    or — if a crash landed exactly inside the pointer's own
    delete+rename window — the highest version dir carrying a
    ``_SUCCESS`` marker (every complete snapshot has one; taking a
    fully-written-but-unswung snapshot commits it post-hoc, which the
    idempotent merge converges over on replay).  Either way, no state
    leads back to an empty table while snapshot dirs exist."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    ptr = jvm.org.apache.hadoop.fs.Path(f"{path}/_CURRENT")
    fs = ptr.getFileSystem(hconf)
    if fs.exists(ptr):
        stream = fs.open(ptr)
        try:
            data = bytes(stream.readAllBytes()).decode("ascii").strip()
        finally:
            stream.close()
        return int(data)
    root = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(root):
        return None
    best = None
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            v = int(name[1:])
            ok = jvm.org.apache.hadoop.fs.Path(f"{path}/v{v}/_SUCCESS")
            if fs.exists(ok) and (best is None or v > best):
                best = v
    return best


def read_current(spark: SparkSession, path: str) -> DataFrame:
    """Resolve the ``_CURRENT`` pointer of an ``upsert_versioned``
    table and read the live snapshot."""
    cur = _read_pointer(spark, path)
    if cur is None:
        raise FileNotFoundError(f"read_current: no _CURRENT pointer at {path}")
    return spark.read.parquet(f"{path}/v{cur}")


def write_sorted_shards(
    df: DataFrame,
    path: str,
    order: list[str],
    n_shards: int,
) -> list[dict]:
    """Globally-sorted export: ``n_shards`` range-disjoint parquet
    shard directories, each internally sorted, plus a returned manifest
    (shard id, row count, min/max ordinal) — the layout a downstream
    consumer needs to merge-read 100 TB in total order, or to binary-
    search a shard by key range.

    The shard id is the ordinal operator's EXACT global NTILE (equal
    fill ±1 row guaranteed regardless of key skew — a plain
    ``repartitionByRange`` gives approximate balance and no per-shard
    row-count contract), so every window in the plan is partitioned and
    the sort work is n balanced per-shard sorts, never one task.
    ``order`` uses the ordinal spec ("-col" = DESC; leading column must
    cast monotonically to double).
    """
    from banksy_spark.operators.ordinals import global_ordinals

    sharded = global_ordinals(
        df, order, row_number="_ws_rn", ntile=(n_shards, "shard")
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ws_rn")
        .drop("_ws_rn")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    back = spark.read.parquet(path)
    lead = order[0].lstrip("-")
    from pyspark.sql import functions as F

    manifest = [
        r.asDict()
        for r in back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(lead).alias("lo"),
            F.max(lead).alias("hi"),
        )
        .orderBy("shard")
        .collect()
    ]
    return manifest


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC full-refresh sink. ORC is the second columnar format Spark
    ships natively (no extra package, unlike Avro) — the interchange
    path for Hive/Trino-resident warehouses. Same pushdown posture as
    parquet: predicate pushdown and column pruning reach the ORC
    reader (spark.sql.orc.filterPushdown defaults true), so a
    migrating user keeps the scan-level guarantees PLANS.md audits
    for the parquet path."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan twin of the parquet readers; schema comes from the ORC
    footer. tests/test_sources.py roundtrips every testdata table
    through ORC and asserts value- and schema-identical frames."""
    return spark.read.orc(path)
