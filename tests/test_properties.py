"""Property-style invariants for round-5 operators: facts that must
hold for EVERY row/doc, checked exhaustively at the smoke scale factor
(stronger than example-based asserts, cheaper than a second oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_cdc_chunks_reassemble_to_original_text(spark):
    """Lossless-ness: concatenating a document's chunks in chunk order
    must reproduce the original text exactly, for every document —
    content-defined chunking may never drop, duplicate, or reorder a
    token."""
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    chunks = REGISTRY["llm_cdc_chunks"].fn(spark, SF_SMOKE)
    rebuilt = chunks.groupBy("doc_id").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(chunk_id, chunk_text))),"
                " x -> x.chunk_text)"
            ),
            " ",
        ).alias("rebuilt")
    )
    docs = T(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bad = (
        docs.join(rebuilt, "doc_id", "left")
        .filter(
            F.col("rebuilt").isNull() | (F.col("rebuilt") != F.col("text"))
        )
        .count()
    )
    assert bad == 0
    # and chunking is non-trivial: some doc has >1 chunk
    assert chunks.groupBy("doc_id").count().agg(F.max("count")).first()[0] > 1


def test_asof_tolerance_never_matches_stale_or_future(spark):
    """Every match must be a PRIOR signup within the 7-day cap, and
    every null must be correct: no signup of that user exists in the
    (error_ts - 7d, error_ts] window."""
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    TOL = 7 * 24 * 3600 * 1_000_000
    out = REGISTRY["j_asof_tolerance"].fn(spark, SF_SMOKE)
    matched = out.filter(F.col("signup_id").isNotNull())
    assert (
        matched.filter(
            (F.col("staleness_us") < 0) | (F.col("staleness_us") > TOL)
        ).count()
        == 0
    )

    e = T(spark, SF_SMOKE, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.unix_micros("ts").alias("s_us")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("e_us")
    )
    has_fresh = (
        errors.join(
            signups,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("s_us") <= F.col("e_us"))
            & (F.col("e_us") - F.col("s_us") <= TOL),
            "left_semi",
        )
        .select("event_id")
    )
    nulls = out.filter(F.col("signup_id").isNull()).select("event_id")
    wrongly_null = nulls.join(has_fresh, "event_id").count()
    assert wrongly_null == 0
    assert matched.count() > 0 and nulls.count() > 0, "fixture exercises both arms"


def test_cusum_is_nonnegative_and_clips(spark):
    """S_t >= 0 everywhere (the one-sided reset), S_t is bounded by the
    running sum of positive excursions, and at least one series value
    actually clips to exactly 0 after a negative excursion (the reset
    arm executes on this data)."""
    from banksy_spark.suite import REGISTRY

    out = REGISTRY["w_cusum_changepoint"].fn(spark, SF_SMOKE).cache()
    assert out.filter(F.col("s_pos") < 0).count() == 0
    assert out.filter(F.col("s_pos") == 0).count() > 0
    # drift flag consistency: drift <=> s_pos > 4 sigma is internal to
    # the query; here check drift rows have strictly positive s_pos
    assert out.filter(F.col("drift") & (F.col("s_pos") <= 0)).count() == 0
    out.unpersist()


def test_interval_overlap_is_nonnegative_and_within_window(spark):
    """Every emitted overlap is >= 0 (exactly 0 only for zero-length
    single-event sessions strictly inside a window — a point-in-window
    containment, which the open-interval predicate admits by design)
    and can never exceed the 2-hour window length."""
    from banksy_spark.suite import REGISTRY

    out = REGISTRY["j_interval_overlap"].fn(spark, SF_SMOKE).cache()
    assert out.count() > 0, "fixture produces overlaps"
    assert out.filter(F.col("overlap_us") < 0).count() == 0
    assert out.filter(F.col("overlap_us") > 0).count() > 0
    assert out.filter(F.col("overlap_us") > 2 * 3600 * 1_000_000).count() == 0
    out.unpersist()


def test_dedup_cdc_pairs_are_symmetric_free_and_bounded(spark):
    """Candidate pairs are canonical (doc_a < doc_b, no duplicates) and
    jaccard lies in (0, 1]."""
    from banksy_spark.suite import REGISTRY

    out = REGISTRY["llm_dedup_cdc"].fn(spark, SF_SMOKE).cache()
    assert out.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert out.groupBy("doc_a", "doc_b").count().filter("count > 1").count() == 0
    assert out.filter((F.col("jaccard") <= 0) | (F.col("jaccard") > 1)).count() == 0
    assert (
        out.filter(F.col("shared_chunks") > F.least("n_a", "n_b")).count() == 0
    )
    out.unpersist()


def test_prefix_filter_completeness_on_adversarial_corpus(spark):
    """The AllPairs prefix filter must find EVERY pair with Jaccard >=
    tau — checked against a python brute force on a purpose-built
    corpus: near-dup clone clusters, shared-boilerplate docs, and
    random chaff (the shapes that break naive blocking). The oracle at
    sf0.01 proves the production corpus; this proves adversarial ones."""
    import itertools
    import random

    from banksy_spark.suite.round5c import _TAU_DEN, _TAU_NUM

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    docs = {}
    did = 0
    # clone clusters with small edits
    for c in range(6):
        base = rng.sample(vocab, 12)
        for v in range(3):
            d = list(base)
            for _ in range(v):
                d[rng.randrange(len(d))] = rng.choice(vocab)
            docs[did] = " ".join(d + base[:3])  # len >= 3 tokens
            did += 1
    # boilerplate: common prefix + distinct tails
    boiler = rng.sample(vocab, 8)
    for _ in range(6):
        docs[did] = " ".join(boiler + rng.sample(vocab, 8))
        did += 1
    # chaff
    for _ in range(10):
        docs[did] = " ".join(rng.choices(vocab, k=rng.randrange(3, 20)))
        did += 1

    def shingles(text):
        t = text.split(" ")
        return {
            "\x1f".join(t[i : i + 3]) for i in range(len(t) - 2)
        } if len(t) >= 3 else set()

    tau = _TAU_NUM / _TAU_DEN
    want = set()
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = shingles(docs[a]), shingles(docs[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= tau:
            want.add((a, b))

    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs],
         "lang": "en", "source": "t", "n_chars": [len(v) for v in docs.values()]}
    )
    tmpdir = spark._jvm.java.lang.System.getProperty("java.io.tmpdir")
    path = f"{tmpdir}/prefix_prop_{id(docs)}"
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    from banksy_spark.suite import REGISTRY

    got = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["j_similarity_prefix_join"].fn(spark, path).collect()
    }
    assert got == want, (
        f"prefix filter missed {want - got} / hallucinated {got - want}"
    )


def test_fastss_edit1_completeness_on_adversarial_names(spark):
    """Deletion-neighborhood blocking must surface EVERY pair at edit
    distance exactly 1 (substitution, insertion, deletion) — python
    brute-force Levenshtein is the truth on a name set dense in
    near-misses."""
    import itertools

    def lev(a, b):
        if abs(len(a) - len(b)) > 1:
            return 2
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = [
        "alpha", "alpah", "alphaa", "alph", "blpha", "alpha",  # dup too
        "beta", "betta", "bet", "bea", "zeta", "zeta1", "eta",
        "gamma", "gamm", "gama", "gammma", "amma",
    ]
    # unique ids; duplicate strings get distinct keys (dist 0, excluded)
    rows = [(i, n) for i, n in enumerate(names)]
    want = {
        (a, b)
        for (a, na), (b, nb) in itertools.combinations(rows, 2)
        if lev(na, nb) == 1
    }
    df = spark.createDataFrame(rows, "c_custkey bigint, c_name string")
    tmpdir = spark._jvm.java.lang.System.getProperty("java.io.tmpdir")
    path = f"{tmpdir}/fastss_prop_{len(names)}"
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/customer.parquet")
    from banksy_spark.suite import REGISTRY

    got = {
        (r["key_a"], r["key_b"])
        for r in REGISTRY["j_fuzzy_edit1_join"].fn(spark, path).collect()
    }
    assert got == want, (
        f"FastSS missed {want - got} / hallucinated {got - want}"
    )


def test_crossing_number_sql_matches_python_raycast_reference(spark):
    """The generated crossing-number SQL (suite/round12._crossings_sql,
    the expression under f_point_in_polygon / a_geofence_dwell and the
    relational form in j_polygon_grid_join) must agree with an
    INDEPENDENT pure-Python ray-cast on random polygons and probe
    points. Polygons are random simple-star constructions with
    vertices on the x.25 grid and no horizontal edges (the operator's
    stated contract); probes live on the x.01 grid so they never sit
    on a vertex. The Python reference uses the identical open/closed
    ray convention ((y1 > py) != (y2 > py), strict px < intercept), so
    any disagreement is an expression-generation bug, not a boundary
    convention."""
    import math
    import random

    from banksy_spark.suite.round12 import _crossings_sql

    rng = random.Random(424242)

    def random_polygon(n_verts: int) -> list[tuple[float, float]]:
        # star polygon: vertices at sorted angles, radii random — always
        # simple (non-self-intersecting); nudge to the x.25 grid and
        # retry until no edge is horizontal
        while True:
            cx, cy = rng.randint(20, 60) + 0.25, rng.randint(20, 60) + 0.25
            angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n_verts))
            verts = []
            for a in angles:
                r = rng.randint(4, 60)
                vx = round((cx + r * math.cos(a)) * 4) / 4
                vy = round((cy + r * math.sin(a)) * 4) / 4
                verts.append((vx, vy))
            ok = len({v for v in verts}) == len(verts) and all(
                verts[i][1] != verts[(i + 1) % len(verts)][1]
                for i in range(len(verts))
            )
            if ok:
                return verts

    def ref_crossings(verts, px, py) -> int:
        c = 0
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                    c += 1
        return c

    for trial in range(6):
        verts = random_polygon(rng.choice([3, 5, 8, 11]))
        pts = [
            (
                i,
                rng.randint(0, 12000) / 100.0,
                rng.randint(0, 12000) / 100.0,
            )
            for i in range(200)
        ]
        df = spark.createDataFrame(pts, "id INT, x DOUBLE, y DOUBLE")
        got = {
            r.id: r.c
            for r in df.select(
                "id", F.expr(_crossings_sql(verts, "x", "y")).alias("c")
            ).collect()
        }
        want = {i: ref_crossings(verts, x, y) for i, x, y in pts}
        assert got == want, f"trial {trial} polygon {verts}"


def test_cuped_statistics_match_numpy_reference(spark):
    """ml_cuped_adjustment's theta / adjusted means / rho^2 must match
    an INDEPENDENT numpy implementation of CUPED on the same fixture
    data. The DuckDB oracle shares the SQL's algebra, so an
    identical-in-both-engines formula bug would pass the differential
    gate — this pins the semantics against a reference that computes
    population cov/var directly from per-user arrays. Tolerance 1e-9
    relative: numpy accumulates doubles while the SQL path uses exact
    integer moments, so tiny representation differences are expected
    but anything larger is a real algebra bug."""
    import math

    import numpy as np

    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    rows = {r.arm: r for r in REGISTRY["ml_cuped_adjustment"].fn(spark, SF_SMOKE).collect()}

    e = T(spark, SF_SMOKE, "events").select("user_id", "ts", "value").toPandas()
    split = np.datetime64("2024-01-15")
    cents = np.round(e["value"].to_numpy() * 100).astype(np.int64)
    pre_mask = e["ts"].to_numpy() < split
    users = e["user_id"].to_numpy()
    uids = np.unique(users)
    pre = np.array([cents[(users == u) & pre_mask].sum() for u in uids], dtype=float)
    post = np.array([cents[(users == u) & ~pre_mask].sum() for u in uids], dtype=float)
    arm = uids % 2

    cov = np.mean(pre * post) - pre.mean() * post.mean()
    varp = np.mean(pre * pre) - pre.mean() ** 2
    vart = np.mean(post * post) - post.mean() ** 2
    theta = 0.0 if varp == 0 else cov / varp
    rho2 = 0.0 if varp == 0 or vart == 0 else cov * cov / (varp * vart)

    for a in (0, 1):
        m = arm == a
        mean_post = post[m].mean() / 100
        mean_adj = (post[m].mean() - theta * (pre[m].mean() - pre.mean())) / 100
        r = rows[a]
        assert r.n_users == int(m.sum())
        # abs_tol alongside rel_tol: a regime whose adjusted mean lands
        # near zero would fail pure-relative isclose spuriously (ADVICE r12)
        assert math.isclose(r.mean_post, mean_post, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r.mean_adjusted, mean_adj, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r.theta, theta, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r.rho2, rho2, rel_tol=1e-9, abs_tol=1e-12)
