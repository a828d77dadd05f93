"""Round-3 scale-technique operators: time-series gap-fill, runtime
bloom-filter join pruning, duplicate-cluster canonical selection,
systematic PPS sampling, incremental aggregate maintenance, and a
register-exact HyperLogLog distinct sketch.

These are the techniques a 100 TB training-data pipeline leans on once
correctness is settled: resampling sparse per-key time series without
a cross-key shuffle, pruning a fact scan with a broadcast bit
signature before the exact join, choosing which duplicate to KEEP
after dedup finds the clusters, drawing weighted samples whose
selection is reproducible under any partitioning, refreshing a
materialized daily aggregate from a late-arriving delta without
rescanning the base, and estimating distinct counts with a mergeable
64-register sketch.

Determinism rules match suite.llm: integer/decimal arithmetic
end-to-end (BIGINT bit-ops and cumulative sums, DECIMAL partial
aggregates), md5/shared-polynomial hashes for any value the oracle
must reproduce, and engine-specific hashes (xxhash64) only where the
value provably cannot affect the result (the bloom filter is an
over-approximation that a final exact join corrects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.llm import _POLY_DUCK, _POLY_SPARK, _lsh_oracle_ctes
from banksy_spark.suite.registry import T, query

# --- Time-series gap fill / resample ---------------------------------------


@query(
    "w_gap_fill_resample",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,6))) AS day_sum
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT user_id,
             CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1)
    )
    SELECT s.user_id, s.day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           CAST(last_value(d.day_sum IGNORE NULLS)
                OVER (PARTITION BY s.user_id ORDER BY s.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS value_ffill,
           d.day_sum IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    """,
    note="Time-series resample: per-user daily calendar spine (sequence+explode "
    "between that user's min and max day) left-joined to the daily aggregate, gaps "
    "forward-filled with last(ignorenulls) — the distributed form of pandas "
    "asfreq('D')+ffill (reference ffill: arbitrage_scanner.py:369). Scale: the spine "
    "is generated map-side from one tiny per-user bounds row, the daily aggregate "
    "and the fill window share the user_id key, and no cross-user data ever meets — "
    "1000 executors each own a disjoint user range. DECIMAL day sums keep the "
    "forward-filled value bit-exact under any partial-agg order.",
)
def w_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("day_sum"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    )
    res = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return res.select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("day_sum", ignorenulls=True).over(w).cast("double").alias("value_ffill"),
        F.col("day_sum").isNull().alias("is_gap"),
    )


# --- Runtime bloom-filter join pruning -------------------------------------

_BLOOM_BITS = 1 << 16  # 65536 bits = 1024 64-bit words; ~2.8 bits/key at sf1


def _bloom_pos(key: str, seed: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(_BLOOM_BITS))


@query(
    "j_bloom_prune_join",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
    note="Runtime bloom-filter join pruning: the filtered orders side builds a 64 Kbit "
    "bloom signature (two xxhash64 probes, bit_or-aggregated into 1024 words), the "
    "1024-row word table is broadcast, and lineitem rows are discarded by bit test "
    "BEFORE the exact shuffle join. The bloom is an over-approximation, so the final "
    "equi-join restores exactness — the oracle is the plain join, and false positives "
    "provably cannot affect the result (which is why engine-specific xxhash64 is safe "
    "here). This is the hand-built form of Spark's runtime row-level filtering, shown "
    "explicitly so the pruning survives plans AQE's injected bloom doesn't reach. "
    "Scale: roughly 4/5 of lineitem (the non-URGENT share) never enters the shuffle.",
)
def j_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    bloom = (
        o.select(
            F.explode(F.array(_bloom_pos("o_orderkey", 0), _bloom_pos("o_orderkey", 1))).alias(
                "p"
            )
        )
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    for seed in (0, 1):
        bw = F.broadcast(
            bloom.select(F.col("w").alias(f"w{seed}"), F.col("bits").alias(f"bits{seed}"))
        )
        li = (
            li.withColumn(f"p{seed}", _bloom_pos("l_orderkey", seed))
            .join(bw, F.expr(f"CAST(p{seed} DIV 64 AS INT) = w{seed}"), "inner")
            .filter(
                F.expr(
                    f"bits{seed} & shiftleft(CAST(1 AS BIGINT), CAST(p{seed} % 64 AS INT))"
                )
                != 0
            )
            .drop(f"w{seed}", f"bits{seed}", f"p{seed}")
        )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- Duplicate-cluster canonical selection ---------------------------------

_EST_DUCK = " + ".join(
    f"(CASE WHEN a.sig[{i + 1}] = b.sig[{i + 1}] THEN 1 ELSE 0 END)" for i in range(16)
)

# Shared DuckDB CTE chain ending in ``canon`` (doc_id, cluster_id,
# canonical_doc_id, keep) — the oracle twin of :func:`_canonical_map`.
# Callers prepend WITH RECURSIVE.
_CANONICAL_CTES = f"""{_lsh_oracle_ctes(with_hs=False)},
    dup AS (
      SELECT p.doc_a, p.doc_b
      FROM pairs p
      JOIN sigs a ON a.doc_id = p.doc_a
      JOIN sigs b ON b.doc_id = p.doc_b
      WHERE ({_EST_DUCK}) / 16.0 >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dup
      UNION ALL
      SELECT doc_b, doc_a FROM dup
    ),
    reach(doc_id, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst
    ),
    labels AS (SELECT doc_id, MIN(lab) AS lab FROM reach GROUP BY doc_id),
    canon AS (
      SELECT doc_id, cluster_id,
             first_value(doc_id) OVER (PARTITION BY cluster_id
                                       ORDER BY n_chars DESC, doc_id) AS canonical_doc_id,
             doc_id = first_value(doc_id) OVER (PARTITION BY cluster_id
                                                ORDER BY n_chars DESC, doc_id) AS keep
      FROM (
        SELECT d.doc_id, COALESCE(l.lab, d.doc_id) AS cluster_id, d.n_chars
        FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
      )
    )"""


@query(
    "llm_dedup_canonical",
    oracle=f"""
    WITH RECURSIVE {_CANONICAL_CTES}
    SELECT doc_id, cluster_id, canonical_doc_id, keep FROM canon
    """,
    note="Dedup resolution, step 2: after connected components labels each duplicate "
    "cluster (llm_dedup_clusters), pick the document to KEEP — longest text wins "
    "(n_chars desc, doc_id tiebreak), every loser maps to its cluster's canonical. "
    "Singletons are their own canonical. This is the 'which copy survives' policy a "
    "training pipeline needs after any fuzzy dedup; swapping the ORDER BY swaps the "
    "policy (quality score, recency, source priority) without touching the plan. "
    "Scale: the window partitions by cluster_id — the same key the component labels "
    "already shuffled on — and clusters are near-cliques of duplicates, so no "
    "partition exceeds the duplicate multiplicity.",
)
def llm_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _canonical_map(spark, sf_dir)


def _canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared derivation: every document labeled with its duplicate
    cluster (CC over the LSH dup graph; singletons = own id) and the
    cluster's canonical doc (longest n_chars, doc_id tiebreak).
    Columns: doc_id, cluster_id, canonical_doc_id, keep."""
    from banksy_spark.operators.graph import connected_components
    from banksy_spark.suite.llm import _band_pairs, _lsh_sigs

    d = _lsh_sigs(spark, sf_dir, with_hs=False)
    pairs = _band_pairs(d)
    sa = d.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = d.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))").cast("int")
        / 16.0
    )
    dup = pairs.join(sa, "doc_a").join(sb, "doc_b").filter(est >= 0.5).select("doc_a", "doc_b")
    labels = connected_components(dup, src="doc_a", dst="doc_b")
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = docs.join(
        labels.select(F.col("node").alias("doc_id"), "lab"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("lab", "doc_id").alias("cluster_id"), "n_chars"
    )
    wc = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    canonical = F.first("doc_id").over(wc)
    return labeled.select(
        "doc_id",
        "cluster_id",
        canonical.alias("canonical_doc_id"),
        (F.col("doc_id") == canonical).alias("keep"),
    )


# --- Systematic PPS (probability-proportional-to-size) sampling ------------

_PPS_K = 10  # samples per language stratum
# md5-prefix bucket width in hex digits: 2 → 256 cells per stratum.
# Raise to 3-4 at 100 TB so each bucket cell stays task-sized (the
# directory stays tiny: |langs| * 16^width rows).
_PPS_BUCKET_HEX = 2


@query(
    "llm_sample_pps",
    oracle=f"""
    SELECT lang, doc_id, weight, cum_w, (({_PPS_K} * cum_w) // tot_w) AS pick_idx
    FROM (
      SELECT lang, doc_id, n_chars AS weight,
             CAST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY md5(text), doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w,
             CAST(SUM(n_chars) OVER (PARTITION BY lang) AS BIGINT) AS tot_w
      FROM documents
    )
    WHERE ({_PPS_K} * cum_w) // tot_w > ({_PPS_K} * (cum_w - weight)) // tot_w
    """,
    note=f"Weighted sampling: systematic probability-proportional-to-size draw of "
    f"{_PPS_K} documents per language stratum. Docs are laid on a line in md5(text) "
    "order (a deterministic pseudo-random permutation both engines reproduce), each "
    "occupying an interval equal to its n_chars weight; a doc is selected iff its "
    "interval crosses a multiple of total_weight/k — all BIGINT arithmetic (k*cum DIV "
    "total), zero floating point, so selection is bit-stable under any partitioning. "
    "Scale: strata partition the windows (lang here; date buckets at 100 TB). Because "
    "the order column IS a uniform hash, the in-stratum cumulative window uses FIXED "
    "equal-width buckets on the hash prefix (balanced by construction — no sampled "
    "sketch, no driver job): per-(lang,bucket) subtotals roll into exclusive prefix "
    "offsets over the tiny directory, broadcast back, and each row's cum_w is "
    "offset + an intra-bucket running sum. One action, one fact-side shuffle; raise "
    "_PPS_BUCKET_HEX to 3-4 at 100 TB so each bucket cell stays task-sized.",
)
def llm_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.col("n_chars").alias("weight"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    # md5 is uniform, so a fixed-width prefix bucket is balanced with no
    # sketch: _PPS_BUCKET_HEX hex digits = 16^width cells per stratum.
    pre = d.withColumn(
        "_b",
        F.expr(f"CAST(conv(substring(h, 1, {_PPS_BUCKET_HEX}), 16, 10) AS INT)"),
    )
    # tiny directory: per-(lang,bucket) weight subtotal -> exclusive
    # prefix offset + stratum grand total (<= |langs| * 16^_PPS_BUCKET_HEX
    # rows, so the lang-keyed windows run over the directory, not the corpus)
    wlang = Window.partitionBy("lang").orderBy("_b")
    bdir = pre.groupBy("lang", "_b").agg(F.sum("weight").alias("_bw"))
    offs = bdir.select(
        "lang",
        "_b",
        F.coalesce(
            F.sum("_bw").over(wlang.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("bigint"),
        ).alias("_off"),
        F.sum("_bw").over(Window.partitionBy("lang")).alias("tot_w"),
    )
    # cum_w = bucket offset + intra-bucket running sum; (h, doc_id)
    # within a bucket extends the global (md5, doc_id) order because
    # _b is a prefix of h
    wcell = (
        Window.partitionBy("lang", "_b")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = pre.join(F.broadcast(offs), ["lang", "_b"]).withColumn(
        "cum_w", F.col("_off") + F.sum("weight").over(wcell)
    )
    pick = F.expr(f"({_PPS_K} * cum_w) DIV tot_w")
    prev_pick = F.expr(f"({_PPS_K} * (cum_w - weight)) DIV tot_w")
    return scored.filter(pick > prev_pick).select(
        "lang", "doc_id", "weight", "cum_w", pick.alias("pick_idx")
    )


# --- Incremental aggregate maintenance (materialized-view delta merge) -----


@query(
    "a_incremental_view",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
    note="Incremental view maintenance: the daily aggregate is maintained as a stored "
    "partial-agg table (count + DECIMAL sum per (day, event_type)); a late-arriving "
    "delta batch (modeled as the odd event_ids, which hit the SAME groups as the "
    "even-id base) is aggregated alone and merged via full-outer join + combiner "
    "(n_a+n_b, s_a+s_b) — never rescanning the base fact data. The oracle recomputes "
    "from scratch, so the check proves merge(partials) == recompute exactly — which "
    "is precisely why the stored sums are DECIMAL, not DOUBLE. Scale: refresh cost is "
    "O(delta + touched groups), not O(history); the same combiner serves streaming "
    "foreachBatch upserts.",
)
def a_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")

    def partial(df: DataFrame, n: str, s: str) -> DataFrame:
        return df.groupBy(day, "event_type").agg(
            F.count("*").alias(n),
            F.sum(F.col("value").cast("decimal(18,6)")).alias(s),
        )

    base = partial(e.filter(F.col("event_id") % 2 == 0), "n_b", "s_b")
    delta = partial(e.filter(F.col("event_id") % 2 == 1), "n_d", "s_d")
    zero = F.lit(0).cast("decimal(28,6)")
    return base.join(delta, ["day", "event_type"], "full").select(
        "day",
        "event_type",
        (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0))).alias("n_events"),
        (F.coalesce("s_b", zero) + F.coalesce("s_d", zero)).cast("double").alias("value_sum"),
    )


# --- HyperLogLog-shaped distinct sketch (register-exact) -------------------

_HLL_M = 64  # registers; bucket = h % 64, sub-hash w = h DIV 64 (< 2^24)
_HLL_CAP = 25  # rho cap: w < 2^24 so trailing-zero count <= 23; w == 0 -> cap


def _rho_case(w: str) -> str:
    """rho = 1 + trailing zeros of the sub-hash (a geometric variable),
    as a portable integer CASE chain: w % 2^k == 2^(k-1) <=> exactly
    k-1 trailing zeros. No log2/floating point, so both engines agree."""
    arms = " ".join(
        f"WHEN {w} % {1 << k} = {1 << (k - 1)} THEN {k}" for k in range(1, _HLL_CAP)
    )
    return f"(CASE WHEN {w} = 0 THEN {_HLL_CAP} {arms} ELSE {_HLL_CAP} END)"


@query(
    "llm_distinct_sketch_hll",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), h AS (
      SELECT {_POLY_DUCK.format(s="tok")} AS hv FROM toks
    ), reg AS (
      SELECT hv % {_HLL_M} AS bucket, MAX({_rho_case(f"(hv // {_HLL_M})")}) AS r
      FROM h GROUP BY 1
    ), full_reg AS (
      SELECT s.bucket, COALESCE(reg.r, 0) AS r
      FROM (SELECT UNNEST(generate_series(0, {_HLL_M - 1})) AS bucket) s
      LEFT JOIN reg ON reg.bucket = s.bucket
    ), truth AS (SELECT COUNT(DISTINCT hv) AS true_distinct FROM h)
    SELECT bucket, CAST(r AS BIGINT) AS r,
           CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_CAP} - r)) OVER () AS BIGINT) AS s_scaled,
           (709 * {_HLL_M} * {_HLL_M} * (CAST(1 AS BIGINT) << {_HLL_CAP}))
             // CAST(1000 * SUM(CAST(1 AS BIGINT) << ({_HLL_CAP} - r)) OVER () AS BIGINT)
             AS est_distinct,
           true_distinct
    FROM full_reg, truth
    """,
    note="HyperLogLog-shaped distinct sketch over token hashes: 64 registers, bucket "
    "= h mod 64, register = max over tokens of (1 + trailing zeros of h div 64) — "
    "trailing zeros via an integer CASE chain, never log2, so the register table is "
    "bit-identical in both engines. The estimate keeps HLL's harmonic mean in exact "
    "integer arithmetic: S = sum of 2^(cap - r) as BIGINT, est = alpha64 * m^2 * "
    "2^cap DIV S with alpha64 = 709/1000 — no float ever materializes, which is what "
    "makes a *sketch* oracle-checkable at all (cf. llm_distinct_sketch_kmv). Scale: "
    "registers are mergeable by MAX, so per-partition (or per-day, or per-stream-"
    "batch) sketches combine into the global one without touching raw data — the "
    "whole point of HLL at 100 TB; true_distinct is a lazy broadcast 1-row aggregate "
    "kept only so the suite records sketch error alongside the sketch.",
)
def llm_distinct_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    hv = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .select(F.expr(_POLY_SPARK.format(s="tok")).alias("hv"))
    )
    rho = F.expr(_rho_case(f"(hv DIV {_HLL_M})"))
    reg = hv.groupBy((F.col("hv") % _HLL_M).alias("bucket")).agg(F.max(rho).alias("r"))
    spine = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    full_reg = spine.join(reg, "bucket", "left").select(
        "bucket", F.coalesce("r", F.lit(0)).cast("bigint").alias("r")
    )
    truth = hv.agg(F.countDistinct("hv").alias("true_distinct"))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_CAP} - r AS INT))")
    s_scaled = F.sum(term).over(Window.partitionBy())
    return full_reg.crossJoin(F.broadcast(truth)).select(
        "bucket",
        "r",
        s_scaled.alias("s_scaled"),
        F.expr(
            f"(709 * {_HLL_M} * {_HLL_M} * shiftleft(CAST(1 AS BIGINT), {_HLL_CAP}))"
        ).cast("bigint").alias("_num"),
        "true_distinct",
    ).select(
        "bucket",
        "r",
        "s_scaled",
        F.expr("_num DIV (1000 * s_scaled)").alias("est_distinct"),
        "true_distinct",
    )


# --- Time-weighted average (TWAP-style) ------------------------------------


@query(
    "w_time_weighted_avg",
    oracle="""
    SELECT user_id, day, n_intervals,
           CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(den AS DOUBLE) AS twa
    FROM (
      SELECT user_id, day,
             COUNT(dt) AS n_intervals,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(dt AS DECIMAL(20,0))) AS num,
             CAST(SUM(dt) AS BIGINT) AS den
      FROM (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                        ORDER BY ts, event_id) - epoch_us(ts) AS dt
        FROM events
      )
      GROUP BY 1, 2
    )
    WHERE den > 0
    """,
    note="Time-weighted average (TWAP shape): each observation is weighted by the "
    "integer microseconds it was in force (until the key's next event that day); the "
    "numerator accumulates value x duration as exact DECIMAL, the denominator as "
    "BIGINT, and only the final ratio touches floating point (the wide-decimal -> "
    "double conversion is string-routed per the registry parity rule). This is the "
    "operator behind duration-weighted prices, session-weighted engagement, and "
    "time-in-state metrics. Scale: one window + one aggregate, both keyed on "
    "(user_id, day) — a single exchange; irregular sampling needs no resample pass.",
)
def w_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    dt = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    weighted = e.select(
        "user_id",
        "day",
        "value",
        dt.alias("dt"),
    )
    agg = (
        weighted.groupBy("user_id", "day")
        .agg(
            F.count("dt").alias("n_intervals"),
            F.sum(
                F.col("value").cast("decimal(18,6)") * F.col("dt").cast("decimal(20,0)")
            ).alias("num"),
            F.sum("dt").alias("den"),
        )
        .filter(F.col("den") > 0)
    )
    return agg.select(
        "user_id",
        "day",
        "n_intervals",
        F.expr("CAST(CAST(num AS STRING) AS DOUBLE) / CAST(den AS DOUBLE)").alias("twa"),
    )


# --- End-to-end corpus cleaning (the composed training-data pipeline) ------


@query(
    "llm_corpus_clean",
    oracle=f"""
    WITH RECURSIVE {_CANONICAL_CTES},
    exact AS (
      SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS exact_keep
      FROM documents
    ),
    qual AS (
      SELECT doc_id, n_tok, stop_ratio FROM (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
               len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the')))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
        FROM documents
      )
    ),
    bench AS (
      SELECT array_to_string(string_split(text, ' ')[1:5], ' ') AS phrase
      FROM documents WHERE doc_id = 0
    )
    SELECT d.doc_id,
           CASE WHEN NOT e.exact_keep THEN 'exact_dup'
                WHEN d.doc_id <> c.canonical_doc_id THEN 'near_dup'
                WHEN q.n_tok < 20 THEN 'too_short'
                WHEN q.n_tok > 380 THEN 'too_long'
                WHEN q.stop_ratio > 0.12 THEN 'too_stoppy'
                WHEN contains(d.text, b.phrase) THEN 'contaminated'
                ELSE 'keep' END AS reason,
           CASE WHEN NOT e.exact_keep THEN 'exact_dup'
                WHEN d.doc_id <> c.canonical_doc_id THEN 'near_dup'
                WHEN q.n_tok < 20 THEN 'too_short'
                WHEN q.n_tok > 380 THEN 'too_long'
                WHEN q.stop_ratio > 0.12 THEN 'too_stoppy'
                WHEN contains(d.text, b.phrase) THEN 'contaminated'
                ELSE 'keep' END = 'keep' AS keep
    FROM documents d
    JOIN exact e ON e.doc_id = d.doc_id
    JOIN canon c ON c.doc_id = d.doc_id
    JOIN qual q ON q.doc_id = d.doc_id
    CROSS JOIN bench b
    """,
    note="The composed training-data cleaning pipeline, one DAG: exact dedup (md5 "
    "keep-first) -> fuzzy dedup canonical selection (MinHash-LSH candidates -> CC "
    "clusters -> longest-wins) -> quality gate (length + stopword density) -> "
    "benchmark decontamination (broadcast phrase set), with a first-match-wins "
    "reason code per document. This is the 'switch your corpus pipeline to this "
    "engine' query: every stage is the already-verified operator, composed exactly "
    "as a 100 TB run would compose them — hash/candidate shuffles only, dimension "
    "sides broadcast, no all-pairs anywhere.",
)
def llm_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    exact_keep = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy(F.md5(F.col("text").cast("binary")))
    )
    exact = d.select("doc_id", exact_keep.alias("exact_keep"))
    canon = _canonical_map(spark, sf_dir).select("doc_id", "canonical_doc_id")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    stop_ratio = F.size(
        F.expr("filter(split(text, ' '), t -> t IN ('a', 'the'))")
    ) / n_tok.cast("double")
    qual = d.select("doc_id", n_tok.alias("n_tok"), stop_ratio.alias("stop_ratio"))
    bench = (
        d.filter(F.col("doc_id") == 0)
        .select(F.array_join(F.slice(F.split("text", " "), 1, 5), " ").alias("phrase"))
    )
    joined = (
        d.select("doc_id", "text")
        .join(exact, "doc_id")
        .join(canon, "doc_id")
        .join(qual, "doc_id")
        .crossJoin(F.broadcast(bench))
    )
    reason = (
        F.when(~F.col("exact_keep"), "exact_dup")
        .when(F.col("doc_id") != F.col("canonical_doc_id"), "near_dup")
        .when(F.col("n_tok") < 20, "too_short")
        .when(F.col("n_tok") > 380, "too_long")
        .when(F.col("stop_ratio") > 0.12, "too_stoppy")
        .when(F.col("text").contains(F.col("phrase")), "contaminated")
        .otherwise("keep")
    )
    return joined.select(
        "doc_id", reason.alias("reason"), (reason == "keep").alias("keep")
    )
