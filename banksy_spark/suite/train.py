"""Training-data preparation operators, batch 2 (extension surface):
context chunking, tokenizer-training statistics, frozen-weight quality
classification, importance weighting, dedup-quality measurement.

Same parity rules as the rest of the suite (registry.py docstring):
integer/decimal arithmetic wherever an aggregate is involved; row-level
double expressions written with identical association in both engines;
every computed column aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from banksy_spark.suite.llm import (
    BAND_ROWS,
    N_BANDS,
    _POLY_DUCK,
    _POLY_SPARK,
    _SH2_DUCK,
    _band_pairs,
    _lsh_sigs,
    _minhash_sql_parts,
)
from banksy_spark.suite.registry import T, fan_out, query

# --- RAG-style overlapping context chunking --------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 32, 24


@query(
    "llm_chunk_overlap",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               (greatest(0, n - {_CHUNK_SIZE}) + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE}
             )) AS chunk_id
      FROM d
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, chunk_id * {_CHUNK_STRIDE} + 1,
                               chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE})) AS BIGINT)
             AS n_tok_chunk,
           array_to_string(list_slice(toks, chunk_id * {_CHUNK_STRIDE} + 1,
                                      chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ')
             AS chunk_text
    FROM c
    """,
    note=f"Context chunking for RAG / training-window assembly: split each "
    f"document into overlapping {_CHUNK_SIZE}-token windows with stride "
    f"{_CHUNK_STRIDE} (8-token overlap), final short chunk kept. Pure "
    "narrow-scan explode — no shuffle, no UDF; at 100 TB this is a map-only "
    "stage whose output partitioning follows the input.",
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    n_last = f"(greatest(0, n - {_CHUNK_SIZE}) + {_CHUNK_STRIDE - 1}) DIV {_CHUNK_STRIDE}"
    c = d.select(
        "doc_id",
        "toks",
        F.explode(F.expr(f"sequence(0, {n_last})")).alias("chunk_id"),
    )
    chunk = F.expr(f"slice(toks, chunk_id * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE})")
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tok_chunk"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --- Tokenizer-training statistics (BPE first-merge candidates) ------------

_BPE_TOPK = 20


@query(
    "llm_bpe_pairs",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    p AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                                   i -> substr(word, i, 2))) AS pair
      FROM w WHERE length(word) >= 2
    ),
    counted AS (SELECT pair, COUNT(*) AS cnt FROM p GROUP BY pair)
    SELECT pair, cnt, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT pair, cnt,
             row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
      FROM counted
    ) WHERE rnk <= {_BPE_TOPK}
    """,
    note=f"Tokenizer-training statistics: global adjacent-character-pair "
    f"frequencies (the first BPE merge iteration's candidate table), top "
    f"{_BPE_TOPK} with a deterministic (count, pair) tie-break. Scale shape: "
    "map-side explode feeds a partial-aggregated pair count (pair cardinality "
    "is bounded by the alphabet squared, so the final exchange is tiny); the "
    "top-k window runs on that already-small aggregate.",
)
def llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    # top-k via orderBy+limit → TakeOrderedAndProject (per-partition heaps,
    # driver merges k rows) instead of a single-partition global window;
    # the rank window then runs over just the k survivors.
    top = counted.orderBy(F.col("cnt").desc(), F.col("pair")).limit(_BPE_TOPK)
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair"))
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "pair", "cnt", "rnk"
    )


# --- Frozen-weight linear quality classifier -------------------------------

# fastText-style quality model reduced to its inference form: a fixed
# linear score over cheap text features, thresholded at 0. (Logistic
# sigmoid is monotone, so score>0 ⟺ p>0.5 — the transcendental exp is
# deliberately avoided to keep cross-engine bit-parity.)
_QW = {"bias": -0.5, "tok": 0.0006, "stop": 1.8, "digit": -3.5, "upper": -1.2}


@query(
    "llm_quality_classifier",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('a', 'the'))) AS BIGINT) AS n_stop,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS n_digit,
             CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                  AS BIGINT) AS n_upper,
             CAST(length(text) AS BIGINT) AS n_chars_calc
      FROM documents
    )
    SELECT doc_id, n_tok, n_stop, n_digit, n_upper,
           ((({_QW['bias']} + ({_QW['tok']} * CAST(n_tok AS DOUBLE)))
             + ({_QW['stop']} * (CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE))))
             + ({_QW['digit']} * (CAST(n_digit AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE))))
             + ({_QW['upper']} * (CAST(n_upper AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE)))
             AS score,
           ((({_QW['bias']} + ({_QW['tok']} * CAST(n_tok AS DOUBLE)))
             + ({_QW['stop']} * (CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE))))
             + ({_QW['digit']} * (CAST(n_digit AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE))))
             + ({_QW['upper']} * (CAST(n_upper AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE)))
             > 0.0 AS keep
    FROM f
    """,
    note="Quality classification, model-inference form: a frozen-weight "
    "linear classifier (fastText-style reduced to inference) over token "
    "count, stopword ratio, digit ratio and uppercase ratio; thresholded "
    "at 0 (sigmoid is monotone, so this IS the p>0.5 decision without the "
    "transcendental). Row-level doubles with identical association both "
    "engines; no shuffle, no UDF — a pure map stage at any scale.",
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    n_stop = F.size(F.expr("filter(split(text, ' '), t -> t IN ('a', 'the'))")).cast("bigint")
    n_digit = (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))).cast("bigint")
    n_upper = (F.length("text") - F.length(F.regexp_replace("text", "[A-Z]", ""))).cast("bigint")
    f = d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
        n_digit.alias("n_digit"),
        n_upper.alias("n_upper"),
        F.length("text").cast("bigint").alias("n_chars_calc"),
    )
    denom = F.greatest("n_chars_calc", F.lit(1)).cast("double")
    score = (
        (
            (F.lit(_QW["bias"]) + (F.lit(_QW["tok"]) * F.col("n_tok").cast("double")))
            + (F.lit(_QW["stop"]) * (F.col("n_stop").cast("double") / F.col("n_tok").cast("double")))
        )
        + (F.lit(_QW["digit"]) * (F.col("n_digit").cast("double") / denom))
    ) + (F.lit(_QW["upper"]) * (F.col("n_upper").cast("double") / denom))
    return f.select(
        "doc_id",
        "n_tok",
        "n_stop",
        "n_digit",
        "n_upper",
        score.alias("score"),
        (score > 0.0).alias("keep"),
    )


# --- DSIR-shaped hashed importance weighting -------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET = "en"


@query(
    "llm_dsir_importance",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, lang,
             list_transform(string_split(text, ' '), t -> {_POLY_DUCK.format(s='t')}) AS th
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             unnest([((th[i] * 131 + th[i + 1]) % 1000000007) % {_DSIR_BUCKETS}
                     for i in generate_series(1, len(th) - 1)]) AS bucket
      FROM tk
    ),
    raw_c AS (SELECT bucket, COUNT(*) AS cr FROM feat GROUP BY bucket),
    tgt_c AS (SELECT bucket, COUNT(*) AS ct FROM feat
              WHERE lang = '{_DSIR_TARGET}' GROUP BY bucket),
    tot AS (SELECT COUNT(*) AS nr,
                   COUNT(*) FILTER (lang = '{_DSIR_TARGET}') AS nt
            FROM feat),
    ftab AS (
      SELECT r.bucket,
             CAST(COALESCE(t.ct, 0) + 1 AS DECIMAL(19,0))
               * CAST(tot.nr + {_DSIR_BUCKETS} AS DECIMAL(19,0)) AS num,
             CAST(r.cr + 1 AS DECIMAL(19,0))
               * CAST(tot.nt + {_DSIR_BUCKETS} AS DECIMAL(19,0)) AS den
      FROM raw_c r LEFT JOIN tgt_c t USING (bucket) CROSS JOIN tot
    )
    SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_feat,
           CAST(CAST(SUM(num) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(den) AS VARCHAR) AS DOUBLE) AS dsir_ratio,
           CAST(CAST(SUM(num) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(den) AS VARCHAR) AS DOUBLE) > 1.0 AS keep
    FROM feat JOIN ftab USING (bucket)
    GROUP BY doc_id, lang
    """,
    note=f"DSIR-shaped importance weighting for data selection: hashed word-bigram "
    f"features ({_DSIR_BUCKETS} buckets), per-feature Laplace-smoothed "
    f"target('{_DSIR_TARGET}')-vs-raw likelihood ratio, per-document "
    "multiplicity-weighted score, keep = more-target-like-than-raw. The classic "
    "log-ratio sum is replaced by an exact rational mean (DECIMAL(38,0) "
    "numerator/denominator sums, VARCHAR-routed to double) so both engines emit "
    "bit-identical values — ln() is not cross-engine reproducible. Scale shape: "
    "the feature table is ≤256 rows (broadcast); totals are lazy cross-joined "
    "1-row aggregates; the only data-sized shuffles are the bucket count and the "
    "per-doc aggregate — exactly how DSIR runs over a 100 TB corpus.",
)
def llm_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: bigram hash explode runs 4x (raw/target/total/score
    # branches) on a single-task scan without it (r13 opt).
    d = fan_out(T(spark, sf_dir, "documents")).withColumn(
        "th", F.expr(f"transform(split(text, ' '), t -> {_POLY_SPARK.format(s='t')})")
    )
    feat = d.select(
        "doc_id",
        "lang",
        # CASE-guarded: Spark's sequence(1, 0) is the DESCENDING
        # [1, 0] (DuckDB's generate_series(1, 0) is empty), so an
        # unguarded transform would hit element_at(th, 0) →
        # INVALID_INDEX_OF_ZERO on a single-token document (found by
        # the randomized differential sweep's advtext regime)
        F.explode(
            F.expr(
                "CASE WHEN size(th) >= 2 THEN"
                " transform(sequence(1, size(th) - 1),"
                f" i -> ((element_at(th, i) * 131 + element_at(th, i + 1))"
                f" % 1000000007) % {_DSIR_BUCKETS})"
                " ELSE array() END"
            )
        ).alias("bucket"),
    )
    raw_c = feat.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt_c = (
        feat.filter(F.col("lang") == _DSIR_TARGET)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    tot = feat.agg(
        F.count("*").alias("nr"),
        F.count(F.when(F.col("lang") == _DSIR_TARGET, 1)).alias("nt"),
    )
    ftab = (
        raw_c.join(tgt_c, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                (F.coalesce("ct", F.lit(0)) + 1).cast("decimal(19,0)")
                * (F.col("nr") + _DSIR_BUCKETS).cast("decimal(19,0)")
            ).alias("num"),
            (
                (F.col("cr") + 1).cast("decimal(19,0)")
                * (F.col("nt") + _DSIR_BUCKETS).cast("decimal(19,0)")
            ).alias("den"),
        )
    )
    scored = (
        feat.join(F.broadcast(ftab), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_feat"),
            F.sum("num").alias("s_num"),
            F.sum("den").alias("s_den"),
        )
    )
    ratio = F.col("s_num").cast("string").cast("double") / F.col("s_den").cast(
        "string"
    ).cast("double")
    return scored.select(
        "doc_id",
        "lang",
        "n_feat",
        ratio.alias("dsir_ratio"),
        (ratio > 1.0).alias("keep"),
    )


# --- Dedup-quality measurement: LSH candidate recall vs exact truth --------

_RECALL_SAMPLE = 200  # bounded ground-truth sample: doc_id < 200
_RECALL_THR = 0.5


def _recall_oracle() -> str:
    _, sig_list = _minhash_sql_parts("duck")
    band_selects = " UNION ALL ".join(
        f"SELECT {j} AS band_id, "
        + " || ',' || ".join(
            f"CAST(sig[{j * BAND_ROWS + r + 1}] AS VARCHAR)" for r in range(BAND_ROWS)
        )
        + " AS band_key, doc_id FROM sigs"
        for j in range(N_BANDS)
    )
    return f"""
    WITH s AS (
      SELECT doc_id, {_SH2_DUCK} AS hs
      FROM (SELECT doc_id,
                   list_transform(string_split(text, ' '),
                                  t -> {_POLY_DUCK.format(s='t')}) AS th
            FROM documents WHERE doc_id < {_RECALL_SAMPLE}
              AND len(string_split(text, ' ')) >= 3)
    ),
    truth AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS j
        FROM s a JOIN s b ON a.doc_id < b.doc_id
      ) WHERE j >= {_RECALL_THR}
    ),
    tk2 AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < {_RECALL_SAMPLE}
    ),
    sh_t AS (
      SELECT doc_id, toks,
             list_transform(toks, t -> {_POLY_DUCK.format(s='t')}) AS th
      FROM tk2 WHERE len(toks) >= 3
    ),
    shingled AS (
      SELECT doc_id,
             list_distinct([((th[i] * 131 + th[i + 1]) % 1000000007 * 131 + th[i + 2])
                            % 1000000007 for i in generate_series(1, len(toks) - 2)]) AS sh
      FROM sh_t
    ),
    sigs AS (
      SELECT doc_id, {sig_list} AS sig FROM shingled
    ),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    hit AS (SELECT COUNT(*) AS n_hit FROM truth JOIN cand USING (doc_a, doc_b)),
    tc AS (SELECT COUNT(*) AS n_truth FROM truth),
    cc AS (SELECT COUNT(*) AS n_cand FROM cand)
    SELECT CAST(tc.n_truth AS BIGINT) AS n_truth,
           CAST(cc.n_cand AS BIGINT) AS n_cand,
           CAST(hit.n_hit AS BIGINT) AS n_hit,
           CAST(hit.n_hit AS DOUBLE) / tc.n_truth AS recall,
           CAST(hit.n_hit AS DOUBLE) / cc.n_cand AS precision
    FROM tc CROSS JOIN cc CROSS JOIN hit
    """


@query(
    "llm_dedup_lsh_recall",
    oracle=_recall_oracle(),
    note=f"Dedup-quality measurement (the fuzzy-dedup analog of llm_ann_recall): "
    f"recall and precision of the MinHash-LSH band-collision candidate set "
    f"against exact 2-gram-shingle jaccard ≥ {_RECALL_THR} ground truth on a "
    f"bounded sample (doc_id < {_RECALL_SAMPLE}). The truth computation is "
    "all-pairs BY DESIGN — it is a measurement harness whose cost is capped by "
    "the fixed sample size, never by corpus size; the candidate side reuses the "
    "production _lsh_sigs/_band_pairs derivation, so this measures the exact "
    "pipeline that ships. The truth set covers INDEXABLE docs only (>= 3 "
    "tokens, the 3-gram minhash index's own floor, mirrored on both engines): "
    "this measures the LSH banding's recall, not the indexing filter — "
    "sub-3-token docs can never be candidates and would deflate recall by a "
    "constant unrelated to band/row tuning (surfaced by the randomized "
    "differential sweep: a 2-token doc has a valid 2-gram truth shingle set "
    "but no 3-gram signature).",
)
def llm_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _lsh_sigs(spark, sf_dir, with_hs=True).filter(
        F.col("doc_id") < _RECALL_SAMPLE
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    i = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = i.cast("double") / (F.size("hs_a") + F.size("hs_b") - i)
    truth = (
        a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("j"))
        .filter(F.col("j") >= _RECALL_THR)
        .select("doc_a", "doc_b")
    )
    cand = _band_pairs(sigs)
    n_hit = truth.join(cand, ["doc_a", "doc_b"]).agg(F.count("*").alias("n_hit"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_cand = cand.agg(F.count("*").alias("n_cand"))
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.col("n_cand").cast("bigint").alias("n_cand"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            (F.col("n_hit").cast("double") / F.col("n_truth")).alias("recall"),
            (F.col("n_hit").cast("double") / F.col("n_cand")).alias("precision"),
        )
    )


# --- N-gram LM fluency scoring ---------------------------------------------


@query(
    "llm_lm_fluency",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '), t -> {_POLY_DUCK.format(s='t')}) AS th
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest([struct_pack(h1 := th[i], h2 := th[i + 1])
                     for i in generate_series(1, len(th) - 1)]) AS b
      FROM tk
    ),
    dbg AS (SELECT doc_id, b.h1 AS h1, b.h2 AS h2 FROM bg),
    uni AS (
      SELECT unnest(th) AS h FROM tk
    ),
    c1 AS (SELECT h, COUNT(*) AS n1 FROM uni GROUP BY h),
    c2 AS (SELECT h1, h2, COUNT(*) AS n2 FROM dbg GROUP BY h1, h2),
    model AS (
      SELECT c2.h1, c2.h2, c2.n2, c1.n1
      FROM c2 JOIN c1 ON c1.h = c2.h1
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(m.n2) AS DOUBLE) / CAST(SUM(m.n1) AS DOUBLE) AS familiarity,
           MIN(CAST(m.n2 AS DOUBLE) / CAST(m.n1 AS DOUBLE)) AS min_cond
    FROM dbg d JOIN model m ON m.h1 = d.h1 AND m.h2 = d.h2
    GROUP BY d.doc_id
    """,
    note="Perplexity-style fluency scoring with an in-engine bigram LM: "
    "train MLE bigram/unigram counts over the corpus itself, then score each "
    "document by pooled conditional frequency Σc₂/Σc₁ (familiarity) and by "
    "its weakest transition min c₂/c₁ (the rare-bigram flag perplexity "
    "filtering targets). Log-likelihood sums are deliberately replaced by "
    "these exact forms: integer sums and MIN over per-row doubles are "
    "order-independent, ln() is not cross-engine reproducible. Scale shape: "
    "model tables are vocab-sized aggregates; every join is keyed on token "
    "hashes (h1 or (h1,h2)) — the standard shuffle-join LM-scoring layout.",
)
def llm_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 opt note: fan_out was trialed here and REVERTED — c1/c2
    # group on near-unique token-hash keys, so the added exchange of
    # raw hash arrays was pure cost (measured 1.02 -> 1.35 s).
    tk = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"transform(split(text, ' '), t -> {_POLY_SPARK.format(s='t')})").alias("th"),
    )
    dbg = tk.select(
        "doc_id",
        # CASE-guarded bigrams: sequence(1, size-1) yields [1, 0] on a
        # single-token doc (descending sequence) and would crash on
        # element_at(th, 0); the guard degrades to an empty list
        F.explode(
            F.expr(
                "CASE WHEN size(th) >= 2 THEN"
                " transform(sequence(1, size(th) - 1),"
                " i -> struct(element_at(th, i) AS h1, element_at(th, i + 1) AS h2))"
                " ELSE array() END"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.h1").alias("h1"), F.col("b.h2").alias("h2"))
    c1 = (
        tk.select(F.explode("th").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("n1"))
    )
    c2 = dbg.groupBy("h1", "h2").agg(F.count("*").alias("n2"))
    model = c2.join(c1, c2.h1 == c1.h).select("h1", "h2", "n2", "n1")
    return (
        dbg.join(model, ["h1", "h2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            (F.sum("n2").cast("double") / F.sum("n1").cast("double")).alias("familiarity"),
            F.min(F.col("n2").cast("double") / F.col("n1").cast("double")).alias("min_cond"),
        )
    )


# --- Co-occurrence association mining (PMI-shaped lift) --------------------

_PMI_MIN_COOC = 5
_PMI_TOPK = 25


@query(
    "llm_pmi_cooc",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    sg AS (
      SELECT unnest(
               [struct_pack(w1 := toks[i], w2 := toks[i + 1])
                for i in generate_series(1, len(toks) - 1)]
               || [struct_pack(w1 := toks[i], w2 := toks[i + 2])
                   for i in generate_series(1, len(toks) - 2)]) AS p
      FROM tk
    ),
    pairs AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM sg),
    uni AS (SELECT unnest(toks) AS w FROM tk),
    cw AS (SELECT w, COUNT(*) AS n FROM uni GROUP BY w),
    nt AS (SELECT COUNT(*) AS n_tok FROM uni),
    cooc AS (
      SELECT w1, w2, COUNT(*) AS n_ab FROM pairs GROUP BY w1, w2
      HAVING COUNT(*) >= {_PMI_MIN_COOC}
    ),
    lifted AS (
      SELECT c.w1, c.w2, c.n_ab,
             CAST(CAST(CAST(c.n_ab AS DECIMAL(19,0)) * CAST(nt.n_tok AS DECIMAL(19,0))
                  AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(a.n AS DECIMAL(19,0)) * CAST(b.n AS DECIMAL(19,0))
                  AS VARCHAR) AS DOUBLE) AS lift
      FROM cooc c
      JOIN cw a ON a.w = c.w1
      JOIN cw b ON b.w = c.w2
      CROSS JOIN nt
    )
    SELECT w1, w2, n_ab, lift, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT w1, w2, n_ab, lift,
             row_number() OVER (ORDER BY lift DESC, w1, w2) AS rnk
      FROM lifted
    ) WHERE rnk <= {_PMI_TOPK}
    """,
    note=f"Word-association mining (word2vec/GloVe-era preprocessing): "
    f"skip-gram co-occurrence counts (window ≤2, linear 2× amplification — "
    f"never per-document quadratic), PMI-shaped lift = N·c(a,b)/(c(a)·c(b)) "
    f"for pairs with ≥{_PMI_MIN_COOC} co-occurrences, top {_PMI_TOPK} with "
    "deterministic tie-break. The lift ratio is computed through exact "
    "DECIMAL products VARCHAR-routed to double (log-PMI dropped for the same "
    "reproducibility reason as elsewhere; log is monotone so the ranking is "
    "identical). Scale shape: marginals are vocab-sized; co-occurrence agg "
    "partial-aggregates map-side on the pair key; the top-k window runs on "
    "the ≥min-count survivors only.",
)
def llm_pmi_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    sg = tk.select(
        # CASE-guarded skip-grams: sequence(1, size-k) is DESCENDING
        # when size <= k (sequence(1, 0) = [1, 0]), so 1-2-token docs
        # would crash on element_at(toks, 0); guards degrade to empty
        F.explode(
            F.expr(
                "concat("
                " CASE WHEN size(toks) >= 2 THEN"
                "  transform(sequence(1, size(toks) - 1),"
                "   i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
                "  ELSE array() END,"
                " CASE WHEN size(toks) >= 3 THEN"
                "  transform(sequence(1, size(toks) - 2),"
                "   i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 2) AS w2))"
                "  ELSE array() END)"
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = tk.select(F.explode("toks").alias("w"))
    cw = uni.groupBy("w").agg(F.count("*").alias("n"))
    nt = uni.agg(F.count("*").alias("n_tok"))
    cooc = (
        sg.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_COOC)
    )
    a = cw.select(F.col("w").alias("w1"), F.col("n").alias("n_a"))
    b = cw.select(F.col("w").alias("w2"), F.col("n").alias("n_b"))
    lifted = (
        cooc.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(nt))
        .select(
            "w1",
            "w2",
            "n_ab",
            (
                (F.col("n_ab").cast("decimal(19,0)") * F.col("n_tok").cast("decimal(19,0)"))
                .cast("string")
                .cast("double")
                / (F.col("n_a").cast("decimal(19,0)") * F.col("n_b").cast("decimal(19,0)"))
                .cast("string")
                .cast("double")
            ).alias("lift"),
        )
    )
    # survivors of the min-count filter can still be vocab²-ish at scale:
    # orderBy+limit plans as TakeOrderedAndProject (distributed top-k),
    # and the rank window touches only the k rows that remain.
    top = lifted.orderBy(F.col("lift").desc(), F.col("w1"), F.col("w2")).limit(_PMI_TOPK)
    w = Window.orderBy(F.col("lift").desc(), F.col("w1"), F.col("w2"))
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "w1", "w2", "n_ab", "lift", "rnk"
    )


# --- Embedding generation via the hashing trick ----------------------------

_FH_DIM = 8


def _feat_hash_terms(dialect: str) -> list[str]:
    """Per-dimension signed-count expressions over token-hash list `th`:
    bucket = h mod DIM, sign = parity of (h div DIM)."""
    out = []
    for j in range(_FH_DIM):
        body = (
            f"CASE WHEN h % {_FH_DIM} = {j} THEN"
            f" (CASE WHEN (h // {_FH_DIM}) % 2 = 0 THEN 1 ELSE -1 END)"
            " ELSE 0 END"
        )
        if dialect == "spark":
            body = body.replace("//", "DIV")
            out.append(f"aggregate(transform(th, h -> {body}), 0L, (acc, v) -> acc + v)")
        else:
            out.append(f"list_sum(list_transform(th, h -> {body}))")
    return out


@query(
    "llm_embed_feature_hash",
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '), t -> {_POLY_DUCK.format(s='t')}) AS th
      FROM documents
    )
    SELECT doc_id,
           {", ".join(f"CAST({e} AS BIGINT) AS dim_{j}"
                      for j, e in enumerate(_feat_hash_terms("duck")))}
    FROM th_t
    """,
    note=f"Embedding generation via the hashing trick (signed feature "
    f"hashing): each token's polynomial hash picks a bucket (mod {_FH_DIM}) "
    "and a ±1 sign (div-parity), per-document dimension = signed count — "
    "the fastText/Vowpal-Wabbit input layer as a pure expression. Width "
    f"{_FH_DIM} is a demo constant; the shape is width-independent: a "
    "map-only narrow scan, zero shuffles, zero UDFs — at 100 TB it runs at "
    "scan speed next to the other per-document featurizers.",
)
def llm_embed_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").withColumn(
        "th", F.expr(f"transform(split(text, ' '), t -> {_POLY_SPARK.format(s='t')})")
    )
    return d.select(
        "doc_id",
        *[
            F.expr(e).cast("bigint").alias(f"dim_{j}")
            for j, e in enumerate(_feat_hash_terms("spark"))
        ],
    )


# --- Token-id encoding with a frozen vocab ---------------------------------

_VOCAB_SIZE = 100


@query(
    "llm_tokenize_ids",
    oracle=f"""
    WITH uni AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term, CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS id
      FROM (SELECT term, COUNT(*) AS cnt FROM uni GROUP BY term)
      QUALIFY id <= {_VOCAB_SIZE}
    ),
    pos_t AS (
      SELECT doc_id, unnest(generate_series(1, len(w))) AS pos, w
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    tok AS (
      SELECT p.doc_id, p.pos, COALESCE(v.id, 0) AS id
      FROM (SELECT doc_id, pos, w[pos] AS term FROM pos_t) p
      LEFT JOIN vocab v ON v.term = p.term
    )
    SELECT doc_id,
           string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(COUNT(*) FILTER (id = 0) AS BIGINT) AS n_oov
    FROM tok GROUP BY doc_id
    """,
    note=f"Tokenization into ids with a frozen vocabulary: vocab = top "
    f"{_VOCAB_SIZE} corpus terms (count-desc, term tie-break → stable ids), "
    "each document becomes its ordered id sequence with OOV→0 — the "
    "tokenize step that precedes llm_pack_sequences. Scale shape: the "
    "vocab is a top-k aggregate (TakeOrdered, broadcastable by "
    "construction); the encode is a broadcast hash join per exploded "
    "token; reassembly shuffles once on doc_id with the ordered-collect "
    "struct-sort trick (no string_agg-ORDER BY dependency in Spark).",
)
def llm_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    uni = T(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    counted = uni.groupBy("term").agg(F.count("*").alias("cnt"))
    vocab = (
        counted.orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(_VOCAB_SIZE)
        .withColumn(
            "id",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("term")))
            .cast("bigint"),
        )
        .select("term", "id")
    )
    tok = (
        T(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
        .join(F.broadcast(vocab), "term", "left")
        .select("doc_id", "pos", F.coalesce("id", F.lit(0)).alias("id"))
    )
    return tok.groupBy("doc_id").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, CAST(id AS STRING) AS s))),"
                " x -> x.s)"
            ),
            ",",
        ).alias("ids"),
        F.count("*").cast("bigint").alias("n_tok"),
        F.count(F.when(F.col("id") == 0, 1)).cast("bigint").alias("n_oov"),
    )
