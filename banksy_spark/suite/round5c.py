"""Round-5 continuation, batch 2: exact similarity join (prefix
filtering), blocked fuzzy string matching, k-anonymity audit, and
exact stratified splitting.

- j_similarity_prefix_join: the EXACT set-similarity ε-join (AllPairs /
  PPJoin family, Bayardo et al., WWW'07) — candidates from rarest-token
  prefixes under a global frequency order, verified with exact Jaccard.
  Complements the MinHash-LSH family (probabilistic recall) with a
  completeness GUARANTEE: the oracle is the brute-force quadratic join
  and the prefix filter must reproduce it bit-for-bit.
- j_fuzzy_edit1_join: edit-distance-1 entity matching via
  deletion-neighborhood blocking (FastSS) — O(n·L) generated keys
  instead of O(n²) pairs, Levenshtein verification on candidates only.
- dq_k_anonymity: privacy audit — quasi-identifier groups smaller than
  k (the re-identifiable ones) over the customer table.
- llm_stratified_split: exact per-stratum 80/10/10 split (counted, not
  expected-value like llm_split_assign's hash thresholds), deterministic
  via md5 ordering; integer-arithmetic thresholds so no float boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.registry import T, fan_out, query

# --- exact set-similarity join via prefix filtering ------------------------

_SEP = "\x1f"
_TAU_NUM, _TAU_DEN = 3, 5  # tau = 0.6 held as a rational: no float ceil


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → distinct 3-gram word-shingle strings (the element
    universe the LSH family also uses — single words are stop-tokens
    on this corpus)."""
    # fan_out: the shingle transform is the CPU wall of the similarity
    # joins; a single-file scan would run it on one core (r13 opt).
    d = fan_out(T(spark, sf_dir, "documents")).select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 3)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 3),
            lambda i: F.concat_ws(
                _SEP,
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
                F.element_at(F.col("toks"), i + 3),
            ),
        )
    )
    return d.select("doc_id", sh.alias("sh"))


_SHINGLE_DUCK = """
    sets AS (
      SELECT doc_id,
             list_distinct([toks[i] || chr(31) || toks[i+1] || chr(31) || toks[i+2]
                            for i in generate_series(1, len(toks) - 2)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      WHERE len(toks) >= 3
    )
"""


@query(
    "j_similarity_prefix_join",
    oracle=f"""
    WITH {_SHINGLE_DUCK}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             AS jaccard
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
    """,
    note="EXACT set-similarity join, Jaccard ≥ 0.6, via prefix filtering "
    "(AllPairs/PPJoin, Bayardo et al. WWW'07): order each doc's shingles "
    "by global document frequency (rarest first, df ties broken "
    "lexically), keep only the first n − ⌈τn⌉ + 1 as the prefix — any "
    "pair with J ≥ τ provably shares a prefix token — then equi-join on "
    "prefix tokens, prune with the length filter (τ·max ≤ min, integer "
    "form 3·n_max ≤ 5·n_min), and verify exact Jaccard on the survivors. "
    "The oracle is the brute-force O(n²) join: the filter must reproduce "
    "it exactly — unlike MinHash-LSH there is NO recall loss. ⌈τn⌉ is "
    "computed as (3n+4) div 5 so no float-ceiling boundary case can "
    "shorten a prefix. Scale: candidates shuffle on shingle (bounded by "
    "real prefix collisions, rarest-first keeps hot tokens out of "
    "prefixes); the per-doc prefix needs only a doc-keyed window, never "
    "a global vocabulary sort.",
)
def j_similarity_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the set table feeds three consumers (df-count, and both verify
    # sides); persist it once rather than re-shingling per branch
    sets = _shingle_sets(spark, sf_dir).withColumn("n", F.size("sh")).persist()
    toks = sets.select(
        "doc_id", "n", F.explode("sh").alias("tok")
    )
    df_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(df_tok, "tok")
    # prefix_len = n - ceil(tau*n) + 1, integer-exact for tau = 3/5
    prefix_len = F.col("n") - F.floor(
        (F.lit(_TAU_NUM) * F.col("n") + F.lit(_TAU_DEN - 1)) / F.lit(_TAU_DEN)
    ) + 1
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    # the candidate equi-join keys on xxhash64(tok), not the shingle
    # string: 8-byte shuffle rows, and a hash collision can only ADD
    # candidates (every survivor is re-verified with exact Jaccard, and
    # any extra pair passing J >= tau is in the brute-force oracle by
    # definition). The PREFIX ORDER stays on the real (df, tok) pair —
    # completeness needs one total order consistent across docs, which
    # a colliding hash tie-break would not guarantee.
    prefix = (
        ranked.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "n", F.xxhash64("tok").alias("tok"))
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        # length filter: tau * max(na, nb) <= min(na, nb)
        .filter(
            F.lit(_TAU_NUM) * F.greatest(F.col("a.n"), F.col("b.n"))
            <= F.lit(_TAU_DEN) * F.least(F.col("a.n"), F.col("b.n"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _verify_pairs(spark, cand, sets)


def _verify_pairs(
    spark: SparkSession, cand: DataFrame, sets: DataFrame
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against the persisted shingle-set table. Shared by
    j_similarity_prefix_join and j_similarity_ppjoin_pos.

    r14 opt: the verify stage is the classic small-bytes/high-CPU
    shuffle (guide §2.5) — candidate pairs with both shingle arrays
    attached are a few MB at sf0.1, so AQE's byte-based coalescing ran
    the whole array_intersect pass as a 3-5-task stage (event log:
    1.95 s of the query's 3.7 s in ONE such stage). The two verify
    joins now sit on EXPLICIT repartitions of the pair table at the
    session's shuffle parallelism: a user-specified repartition on the
    join key is the exchange the join needs anyway (no extra shuffle)
    and is exempt from AQE coalescing. Width = the shuffle.partitions
    conf, i.e. exactly the pre-AQE default any cluster session gets —
    AQE could only have made these partitions COARSER. Tradeoff: the
    pinned exchange also opts out of AQE skew-splitting; per-doc
    candidate counts are bounded by the rarest-first prefix filter, so
    no single doc_b group can dominate the way a raw token join could.
    """
    n_ver = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.repartition(n_ver, "doc_a")
        .join(sa, "doc_a")
        .repartition(n_ver, "doc_b")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter),
        )
        .filter(F.col("jaccard") >= 0.6)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- edit-distance-1 fuzzy join via deletion-neighborhood blocking ---------


@query(
    "j_fuzzy_edit1_join",
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) = 1
    """,
    note="Edit-distance-1 entity matching via deletion-neighborhood "
    "blocking (FastSS): every name generates |s|+1 keys (itself plus "
    "each single-character deletion); two strings within edit distance 1 "
    "(substitution, insertion, or deletion) MUST share a key, so the "
    "candidate set is an equi-join on generated keys — O(n·L) keyed rows "
    "instead of the oracle's O(n²) Levenshtein calls — then exact "
    "levenshtein == 1 verifies (deletions at different positions can "
    "produce distance-2 collisions). The join key is xxhash64 of the "
    "deletion string (8-byte shuffle rows instead of L-char strings; a "
    "hash collision can only ADD candidates, and every emitted pair is "
    "re-verified, so correctness is collision-proof), and verification "
    "uses the threshold form levenshtein(a, b, 1) — O(L·1) early-exit "
    "DP instead of the full O(L²) table, same integer result as the "
    "oracle's full DP at distance 1. Scale: the shuffle keys on hashed "
    "deletion strings; key-group sizes are bounded by alphabet size at "
    "the deleted position, never by corpus size.",
)
def j_fuzzy_edit1_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: deletion-neighborhood explode + levenshtein verify are
    # CPU-bound; the single-file customer scan is 1 task (r13 opt).
    c = fan_out(T(spark, sf_dir, "customer").select("c_custkey", "c_name"))
    # keys: the name itself + every single-deletion variant
    keys = c.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array_union(
                F.array(F.col("c_name")),
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.length("c_name")),
                        lambda i: F.concat(
                            F.substring(F.col("c_name"), F.lit(1), i - 1),
                            F.col("c_name").substr(
                                i + 1, F.length("c_name") - i
                            ),
                        ),
                    )
                ),
            )
        ).alias("blk"),
    )
    hashed = keys.select(
        "c_custkey", "c_name", F.xxhash64("blk").alias("h")
    )
    a = hashed.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"), "h"
    )
    b = hashed.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"), "h"
    )
    # verify BEFORE the distinct: levenshtein on an 18-char pair is
    # cheaper than shuffling duplicate candidates (a pair can collide on
    # up to L shared deletion keys), and the dedup then carries only the
    # surviving 2-int tuples
    return (
        a.join(b, "h")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.expr("levenshtein(name_a, name_b, 1) = 1"))
        .select("key_a", "key_b")
        .distinct()
    )


# --- k-anonymity audit -----------------------------------------------------


@query(
    "dq_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(*) AS group_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < 5
    """,
    note="k-anonymity audit (k=5) over the quasi-identifier tuple "
    "(nation, market segment, account-balance bucket): any group smaller "
    "than k re-identifies its members, so the release gate is 'this "
    "query returns 0 rows'. One exchange on the quasi-identifier key "
    "with map-side combine; the bucket floor is deterministic IEEE "
    "division in both engines. The training-data analog is auditing "
    "metadata columns before publishing a corpus.",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < 5)
    )


# --- exact stratified split ------------------------------------------------


@query(
    "llm_stratified_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN 10 * rn <= 8 * n THEN 'train'
                WHEN 10 * rn <= 9 * n THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    """,
    note="EXACT stratified 80/10/10 split per language: rank docs inside "
    "each stratum by md5(doc_id) (deterministic, uncorrelated with "
    "content) and cut at integer-arithmetic thresholds (10·rn ≤ 8·n — no "
    "float 0.8·n boundary), so every stratum's split sizes are exact "
    "counts, not the expected values llm_split_assign's global hash "
    "thresholds give. Scale: one exchange on the stratum key; the "
    "rank+count share a single window frame. Strata far larger than "
    "executors are fine (the window sorts within a lang partition); a "
    "single colossal stratum would use the two-phase global-rownum "
    "decomposition instead (o_global_rownum).",
)
def llm_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from banksy_spark.operators.ordinals import grouped_ordinals

    d = T(spark, sf_dir, "documents").select("doc_id", "lang")
    # Few huge strata over the whole corpus: rank rides grouped_ordinals.
    # The hash order key is a hex string, so bucketing goes through a
    # monotone numeric prefix (first 13 hex digits = 52 bits, exactly
    # representable as DOUBLE; hex-lexicographic == numeric order), with
    # the full hash as the intra-bucket tie-break — same total order.
    keyed = d.withColumn("h", F.md5(F.col("doc_id").cast("string"))).withColumn(
        "pfx", F.expr("CAST(conv(substring(h, 1, 13), 16, 10) AS DOUBLE)")
    )
    ranked = grouped_ordinals(
        keyed, ["lang"], ["pfx", "h", "doc_id"], row_number="rn", group_count="n"
    )
    return ranked.select(
        "doc_id",
        "lang",
        F.when(10 * F.col("rn") <= 8 * F.col("n"), "train")
        .when(10 * F.col("rn") <= 9 * F.col("n"), "val")
        .otherwise("test")
        .alias("split"),
    )
