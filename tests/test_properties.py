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


def test_cuped_stratified_matches_numpy_reference(spark):
    """ml_cuped_stratified's per-stratum thetas and post-stratified
    adjusted arm means must match an INDEPENDENT numpy implementation
    on the same fixture data (the identical-formula-bug class: the
    DuckDB oracle shares the SQL's algebra, so only an outside
    reference pins the semantics — same argument as the plain-CUPED
    pin above)."""
    import math

    import numpy as np

    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    rows = {
        r.arm: r
        for r in REGISTRY["ml_cuped_stratified"].fn(spark, SF_SMOKE).collect()
    }

    e = T(spark, SF_SMOKE, "events").select("user_id", "ts", "value").toPandas()
    split = np.datetime64("2024-01-15")
    cents = np.round(e["value"].to_numpy() * 100).astype(np.int64)
    pre_mask = e["ts"].to_numpy() < split
    users = e["user_id"].to_numpy()
    uids = np.unique(users)
    pre = np.array(
        [cents[(users == u) & pre_mask].sum() for u in uids], dtype=float
    )
    post = np.array(
        [cents[(users == u) & ~pre_mask].sum() for u in uids], dtype=float
    )
    arm = uids % 2
    strat = uids % 3
    n = len(uids)

    theta = {}
    for s in range(3):
        ms = strat == s
        cov = np.mean(pre[ms] * post[ms]) - pre[ms].mean() * post[ms].mean()
        varp = np.mean(pre[ms] * pre[ms]) - pre[ms].mean() ** 2
        theta[s] = 0.0 if varp == 0 else cov / varp

    for a in (0, 1):
        ma = arm == a
        adj = 0.0
        for s in range(3):
            mc = ma & (strat == s)
            ms = strat == s
            if not mc.any():
                continue
            cell = post[mc].mean() - theta[s] * (
                pre[mc].mean() - pre[ms].mean()
            )
            adj += (ms.sum() / n) * cell
        r = rows[a]
        assert r.n_users == int(ma.sum())
        assert math.isclose(
            r.mean_post, post[ma].mean() / 100, rel_tol=1e-9, abs_tol=1e-12
        )
        assert math.isclose(
            r.mean_adjusted, adj / 100, rel_tol=1e-9, abs_tol=1e-12
        )
        for s in range(3):
            assert math.isclose(
                getattr(r, f"theta_s{s}"), theta[s], rel_tol=1e-9,
                abs_tol=1e-12,
            )


def test_psi_drift_matches_numpy_reference(spark):
    """ml_psi_drift's per-bin counts and PSI terms must match an
    independent numpy implementation: reference-period decile bounds
    by nearest-rank over the (x, orderkey) total order, bins closed on
    the right, psi_term = (cur% - ref%) * ln(cur% / ref%). Counts are
    exact; psi_term tolerances absorb the query's 12-decimal ln
    quantization."""
    import math

    import numpy as np

    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    out = {
        r.bin: r for r in REGISTRY["ml_psi_drift"].fn(spark, SF_SMOKE).collect()
    }

    o = (
        T(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .toPandas()
    )
    x = o["o_totalprice"].to_numpy()
    cur = o["o_orderdate"].to_numpy().astype("datetime64[D]") >= np.datetime64(
        "1999-01-01"
    )
    refx = x[~cur]
    refk = o["o_orderkey"].to_numpy()[~cur]
    order = np.lexsort((refk, refx))
    sx = refx[order]
    nref = len(sx)
    bounds = [sx[(i * nref + 9) // 10 - 1] for i in range(1, 10)]

    def binify(v):
        for i, b in enumerate(bounds):
            if v <= b:
                return i
        return 9

    bins = np.array([binify(v) for v in x])
    ref_t = int((~cur).sum())
    cur_t = int(cur.sum())
    for b in range(10):
        if b not in out:
            assert ((bins == b) & ~cur).sum() == 0
            assert ((bins == b) & cur).sum() == 0
            continue
        r = out[b]
        ref_n = int(((bins == b) & ~cur).sum())
        cur_n = int(((bins == b) & cur).sum())
        assert r.ref_n == ref_n and r.cur_n == cur_n, f"bin {b}"
        if ref_n == 0 or cur_n == 0:
            assert r.psi_term is None
            continue
        want = (cur_n / cur_t - ref_n / ref_t) * math.log(
            (cur_n * ref_t) / (ref_n * cur_t)
        )
        assert math.isclose(r.psi_term, want, rel_tol=1e-9, abs_tol=1e-11), (
            f"bin {b}"
        )


def test_seasonal_strength_matches_numpy_reference(spark):
    """a_seasonal_strength's variance decomposition must match an
    independent numpy ANOVA on the daily series: SS_total =
    sum((x - mean)^2), SS_resid = sum over dow groups of within-group
    squared deviations, strength = 1 - SS_resid/SS_total. The SQL path
    runs exact DECIMAL moments with fixed-order float combination, so
    1e-9 relative agreement or the algebra is wrong."""
    import math

    import numpy as np
    import pandas as pd

    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    out = {
        r.event_type: r
        for r in REGISTRY["a_seasonal_strength"].fn(spark, SF_SMOKE).collect()
    }

    e = T(spark, SF_SMOKE, "events").select("event_type", "ts", "value").toPandas()
    e["day"] = e["ts"].dt.date
    e["cents"] = np.round(e["value"].to_numpy() * 100).astype(np.int64)
    daily = e.groupby(["event_type", "day"], as_index=False)["cents"].sum()
    # Sunday=0 convention (Spark dayofweek-1 == DuckDB EXTRACT(dow))
    daily["dow"] = (pd.to_datetime(daily["day"]).dt.weekday + 1) % 7

    for et, g in daily.groupby("event_type"):
        xs = g["cents"].to_numpy(dtype=float)
        ss_total = float(((xs - xs.mean()) ** 2).sum())
        ss_resid = 0.0
        for d in range(7):
            gd = g[g["dow"] == d]["cents"].to_numpy(dtype=float)
            if len(gd):
                ss_resid += float(((gd - gd.mean()) ** 2).sum())
        r = out[et]
        assert r.n_days == len(xs)
        assert math.isclose(r.ss_total, ss_total, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(r.ss_resid, ss_resid, rel_tol=1e-9, abs_tol=1e-9)
        if ss_total > 0:
            want = 1.0 - ss_resid / ss_total
            assert math.isclose(
                r.seasonal_strength, want, rel_tol=1e-9, abs_tol=1e-12
            )
        else:
            assert r.seasonal_strength is None


def test_polygon_overlap_flags_match_exact_fraction_reference(spark):
    """j_polygon_overlap_join's generated vertex-parity and edge-pair
    crossing expressions must match an EXACT rational-arithmetic
    reference on random rhombus pairs. Coordinates live on the x.25
    grid, so Fraction arithmetic is exact and any disagreement is a
    generator bug, not float noise (double evaluation of these
    magnitudes is itself exact for the products involved)."""
    import random
    from fractions import Fraction

    from banksy_spark.suite.round13 import (
        _POV_FLAG_EXPRS,
        _POV_VERT_EXPRS,
        _POV_VIN_AB,
        _POV_VIN_BA,
        _POV_NCROSS,
    )

    rng = random.Random(1337)
    rows = []
    for i in range(300):
        rows.append(
            (
                i,
                rng.randint(0, 400) / 4.0,
                rng.randint(0, 400) / 4.0,
                rng.randint(4, 40) / 4.0,
                rng.randint(4, 40) / 4.0,
                rng.randint(0, 400) / 4.0,
                rng.randint(0, 400) / 4.0,
                rng.randint(4, 40) / 4.0,
                rng.randint(4, 40) / 4.0,
            )
        )
    df = spark.createDataFrame(
        rows,
        "pid INT, acx DOUBLE, acy DOUBLE, adx DOUBLE, ady DOUBLE,"
        " bcx DOUBLE, bcy DOUBLE, bdx DOUBLE, bdy DOUBLE",
    )
    got = {
        r.pid: (r.vin_ab, r.vin_ba, r.n_cross)
        for r in df.selectExpr("pid", *_POV_VERT_EXPRS)
        .selectExpr("pid", *_POV_FLAG_EXPRS)
        .selectExpr(
            "pid",
            f"{_POV_VIN_AB} AS vin_ab",
            f"{_POV_VIN_BA} AS vin_ba",
            f"{_POV_NCROSS} AS n_cross",
        )
        .collect()
    }

    def verts(cx, cy, dx, dy):
        cx, cy, dx, dy = map(Fraction, (cx, cy, dx, dy))
        return [(cx + dx, cy), (cx, cy + dy), (cx - dx, cy), (cx, cy - dy)]

    def inside(px, py, vs):
        c = 0
        for k in range(4):
            x1, y1 = vs[k]
            x2, y2 = vs[(k + 1) % 4]
            if (y1 > py) != (y2 > py):
                if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                    c += 1
        return c % 2 == 1

    def ccw(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    for pid, acx, acy, adx, ady, bcx, bcy, bdx, bdy in rows:
        va = verts(acx, acy, adx, ady)
        vb = verts(bcx, bcy, bdx, bdy)
        vin_ab = sum(inside(px, py, va) for px, py in vb)
        vin_ba = sum(inside(px, py, vb) for px, py in va)
        ncross = 0
        for k in range(4):
            a1, a2 = va[k], va[(k + 1) % 4]
            for m in range(4):
                b1, b2 = vb[m], vb[(m + 1) % 4]
                if (
                    ccw(*a1, *a2, *b1) * ccw(*a1, *a2, *b2) < 0
                    and ccw(*b1, *b2, *a1) * ccw(*b1, *b2, *a2) < 0
                ):
                    ncross += 1
        assert got[pid] == (vin_ab, vin_ba, ncross), f"pair {pid}"


def test_label_propagation_matches_python_reference(spark):
    """graph_label_propagation's community histogram must match an
    INDEPENDENT pure-Python implementation of the same recurrence
    (self-inclusive neighbor vote, (count DESC, label ASC) tie-break,
    3 synchronous rounds) over the raw orders fixture. The reference
    builds its own edge set from the parquet via duckdb — any
    disagreement is a vote/tie-break defect in the Spark plan or the
    oracle SQL, the identical-formula-bug class the differential gate
    cannot see."""
    from collections import Counter

    import duckdb

    from banksy_spark.suite.round13b import _LPA_R, graph_label_propagation
    from tests.conftest import SF_SMOKE

    orders = duckdb.sql(
        f"SELECT o_custkey, o_orderkey FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    e0 = set()
    for c, o in orders:
        u, v = c % 500, o % 500
        if u != v and ((u // 50 == v // 50 and o % 3 == 0) or o % 97 == 0):
            e0.add((u, v))
    nbrs: dict[int, list[int]] = {}
    for u, v in e0:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    # symmetrized-DISTINCT: dedupe each node's neighbor list
    nbrs = {n: sorted(set(vs)) for n, vs in nbrs.items()}
    lbl = {n: n for n in nbrs}
    for _ in range(_LPA_R):
        new = {}
        for n, vs in nbrs.items():
            votes = Counter(lbl[v] for v in vs)
            votes[lbl[n]] += 1
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        lbl = new
    hist: dict[int, list[int]] = {}
    for n, l in lbl.items():
        hist.setdefault(l, []).append(n)
    want = {l: (len(ns), min(ns)) for l, ns in hist.items()}

    got = {
        r.community: (r.n_nodes, r.min_node)
        for r in graph_label_propagation(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_nearest_edge_join_matches_python_reference(spark):
    """j_nearest_edge_join must match an INDEPENDENT pure-Python
    reference that rebuilds the bounded candidate set (point cell vs
    one-ring-dilated edge cover) and evaluates the clamped-projection
    distance with the same expression structure — Python floats ARE
    IEEE doubles, so with matching operation order the d2 values and
    therefore the argmin picks are bit-identical. Near-ties (several
    candidates within 1e-9 of the minimum) skip the pick assertion
    and check only the distance value."""
    import math

    import duckdb

    from banksy_spark.suite.round13b import _NE_CELL, j_nearest_edge_join
    from tests.conftest import SF_SMOKE

    edges = []
    for (nk,) in duckdb.sql(
        f"SELECT n_nationkey FROM '{SF_SMOKE}/nation.parquet'"
    ).fetchall():
        cx = 10.5 + (nk % 5) * 40
        cy = 10.5 + (nk // 5) * 18
        dx = 3.5 + (nk % 7)
        dy = 2.5 + (nk % 5)
        vs = [(cx + dx, cy), (cx, cy + dy), (cx - dx, cy), (cx, cy - dy)]
        for ei in range(4):
            (x1, y1), (x2, y2) = vs[ei], vs[(ei + 1) % 4]
            edges.append((nk, ei, x1, y1, x2, y2))

    dil: dict[tuple[int, int], list[tuple]] = {}
    for nk, ei, x1, y1, x2, y2 in edges:
        cells = set()
        for ix in range(
            math.floor(min(x1, x2) / _NE_CELL),
            math.floor(max(x1, x2) / _NE_CELL) + 1,
        ):
            for iy in range(
                math.floor(min(y1, y2) / _NE_CELL),
                math.floor(max(y1, y2) / _NE_CELL) + 1,
            ):
                for di in (-1, 0, 1):
                    for dj in (-1, 0, 1):
                        cells.add((ix + di, iy + dj))
        for c in cells:
            dil.setdefault(c, []).append((nk, ei, x1, y1, x2, y2))

    def d2_of(px, py, x1, y1, x2, y2):
        # mirrors _NE_D2's structure: clamp(dot/len2) then residual
        t = ((px - x1) * (x2 - x1) + (py - y1) * (y2 - y1)) / (
            (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)
        )
        tc = min(max(t, 0.0), 1.0)
        ddx = px - (x1 + tc * (x2 - x1))
        ddy = py - (y1 + tc * (y2 - y1))
        return ddx * ddx + ddy * ddy

    pts = duckdb.sql(
        "SELECT event_id, value, CAST(user_id % 100 AS DOUBLE)"
        f" FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    want = {}
    for eid, px, py in pts:
        cell = (math.floor(px / _NE_CELL), math.floor(py / _NE_CELL))
        cands = dil.get(cell, [])
        if not cands:
            continue
        scored = sorted(
            (d2_of(px, py, *c[2:]), c[0], c[1]) for c in cands
        )
        near_tie = len(scored) > 1 and math.isclose(
            scored[0][0], scored[1][0], rel_tol=1e-9, abs_tol=1e-12
        )
        want[eid] = (scored[0], near_tie)

    rows = j_nearest_edge_join(spark, SF_SMOKE).collect()
    assert {r.event_id for r in rows} == set(want)
    for r in rows:
        (d2, pid, eid), near_tie = want[r.event_id]
        assert math.isclose(r.d2, d2, rel_tol=1e-9, abs_tol=1e-12)
        if not near_tie:
            assert (r.poly_id, r.edge_id) == (pid, eid), r


def test_connected_components_query_matches_bfs_reference(spark):
    """graph_connected_components' histogram must match an INDEPENDENT
    pure-Python BFS over the same intra-block edge set rebuilt from the
    raw orders parquet — exercising the large-star/small-star operator
    (or its bounded-driver union-find shortcut) against a from-scratch
    traversal. Any disagreement is a merge defect the differential gate
    can't see if the oracle's recursive CTE shared it."""
    import collections

    import duckdb

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    orders = duckdb.sql(
        f"SELECT o_custkey, o_orderkey FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for c, o in orders:
        u, v = c % 500, o % 500
        if u != v and u // 50 == v // 50 and o % 3 == 0:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    seen: dict[int, int] = {}
    for s in sorted(adj):
        if s in seen:
            continue
        q = collections.deque([s])
        seen[s] = s
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in seen:
                    seen[y] = s
                    q.append(y)
    hist: dict[int, list[int]] = {}
    for n, root in seen.items():
        hist.setdefault(root, []).append(n)
    # BFS from ascending start nodes makes each root the component min
    want = {root: (len(ns), max(ns)) for root, ns in hist.items()}

    got = {
        r.component: (r.n_nodes, r.max_node)
        for r in REGISTRY["graph_connected_components"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def _pu_cents(sf_dir):
    """Per-user (arm, total exact cents) — the resampling fixtures'
    shared user-grain frame, rebuilt independently via duckdb."""
    import duckdb

    rows = duckdb.sql(
        f"""SELECT user_id, user_id % 2,
              CAST(SUM(CAST(CAST(value * 100 AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT)
            FROM '{sf_dir}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    return [(int(u), int(a), int(c)) for u, a, c in rows]


def test_permutation_test_matches_python_reference(spark):
    """ml_permutation_test's p-value and extreme count must match a
    pure-Python replay of the SAME deterministic draws (Knuth scramble
    mod 2) — Python ints are exact, so any disagreement is a hash or
    aggregation defect shared between the engines."""
    import math

    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.round13c import _RS_A, _RS_B, _RS_P
    from tests.conftest import SF_SMOKE

    pu = _pu_cents(SF_SMOKE)
    s1 = sum(c for _, a, c in pu if a == 1)
    n1 = sum(1 for _, a, _ in pu if a == 1)
    s0 = sum(c for _, a, c in pu if a == 0)
    n0 = sum(1 for _, a, _ in pu if a == 0)
    obs = s1 / n1 - s0 / n0
    n_extreme = 0
    for b in range(1, _RS_B + 1):
        t1 = tn1 = t0 = tn0 = 0
        for u, _, c in pu:
            flip = ((abs(u) % 100003) * _RS_A + b * 40507) % _RS_P % 2
            if flip == 1:
                t1 += c
                tn1 += 1
            else:
                t0 += c
                tn0 += 1
        if tn1 > 0 and tn0 > 0:
            if abs(t1 / tn1 - t0 / tn0) >= abs(obs):
                n_extreme += 1
    r = REGISTRY["ml_permutation_test"].fn(spark, SF_SMOKE).collect()[0]
    assert r.n_users == len(pu)
    assert r.n_extreme == n_extreme
    assert math.isclose(r.obs_diff, obs / 100, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(
        r.p_value, (1 + n_extreme) / (_RS_B + 1), rel_tol=1e-12, abs_tol=1e-12
    )


def test_bootstrap_ci_matches_python_reference(spark):
    """ml_bootstrap_poisson_ci's CI endpoints must match a pure-Python
    replay of the deterministic truncated-Poisson weights and the
    order-statistic extraction. Weighted sums are exact ints; the
    per-replicate means are IEEE doubles with the same structure."""
    import math

    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.round13c import _RS_A, _RS_B, _RS_P
    from tests.conftest import SF_SMOKE

    pu = _pu_cents(SF_SMOKE)
    diffs = []
    for b in range(1, _RS_B + 1):
        w1 = wc1 = w0 = wc0 = 0
        for u, a, c in pu:
            h = ((abs(u) % 100003) * _RS_A + b * 48611 + 7919) % _RS_P
            uu = h / _RS_P
            if uu < 0.36787944117144233:
                w = 0
            elif uu < 0.7357588823428847:
                w = 1
            elif uu < 0.9196986029286058:
                w = 2
            elif uu < 0.9810118431238462:
                w = 3
            else:
                w = 4
            if a == 1:
                w1 += w
                wc1 += w * c
            else:
                w0 += w
                wc0 += w * c
        if w1 > 0 and w0 > 0:
            diffs.append((wc1 / w1 - wc0 / w0, b))
    diffs.sort()
    nv = len(diffs)
    lo_rk = math.ceil(0.025 * nv)
    lo = diffs[lo_rk - 1][0]
    hi = diffs[nv - lo_rk][0]
    r = REGISTRY["ml_bootstrap_poisson_ci"].fn(spark, SF_SMOKE).collect()[0]
    assert r.n_reps == nv
    assert math.isclose(r.diff_lo, lo / 100, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(r.diff_hi, hi / 100, rel_tol=1e-12, abs_tol=1e-12)
    assert r.covers_zero == (lo <= 0 <= hi)


def test_tost_equivalence_matches_python_reference(spark):
    """ml_tost_equivalence's z pair must match an independent Python
    Welch-TOST on per-user cents grouped by stratum — exact integer
    moments, IEEE scalar tail, same CASE guards."""
    import math

    import duckdb

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"""SELECT user_id % 3, user_id % 2,
              CAST(SUM(CAST(CAST(value * 100 AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT)
            FROM '{SF_SMOKE}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    cells: dict[tuple[int, int], list[int]] = {}
    for st, a, c in rows:
        cells.setdefault((int(st), int(a)), []).append(int(c))
    got = {
        r.stratum: r
        for r in REGISTRY["ml_tost_equivalence"].fn(spark, SF_SMOKE).collect()
    }
    for st in (0, 1, 2):
        c1 = cells.get((st, 1), [])
        c0 = cells.get((st, 0), [])
        n1, n0 = len(c1), len(c0)
        s1, s0 = sum(c1), sum(c0)
        q1 = sum(x * x for x in c1)
        q0 = sum(x * x for x in c0)
        diff = s1 / n1 - s0 / n0
        se2 = (n1 * q1 - s1 * s1) / (n1 * (n1 - 1)) / n1 + (
            n0 * q0 - s0 * s0
        ) / (n0 * (n0 - 1)) / n0
        z_lo = (diff + 50.0) / math.sqrt(se2)
        z_hi = (diff - 50.0) / math.sqrt(se2)
        r = got[st]
        assert (r.n_c, r.n_t) == (n0, n1)
        assert math.isclose(r.mean_diff, diff / 100, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r.z_lower, z_lo, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r.z_upper, z_hi, rel_tol=1e-9, abs_tol=1e-12)
        assert r.equivalent == (z_lo > 1.6448536269514722 and z_hi < -1.6448536269514722)


def test_t_closeness_matches_python_reference(spark):
    """dq_t_closeness' ordered EMD must match an independent Python
    computation of mean |cumulative P - cumulative Q| over the literal
    balance bands, for every quasi-identifier group."""
    import math

    import duckdb

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment, c_acctbal"
        f" FROM '{SF_SMOKE}/customer.parquet'"
    ).fetchall()

    def band(x):
        return 0 if x < 1000 else 1 if x < 3000 else 2 if x < 5000 else 3 if x < 7000 else 4

    groups: dict[tuple, list[int]] = {}
    gtot = [0] * 5
    for nk, seg, bal in rows:
        b = band(bal)
        groups.setdefault((nk, seg), [0] * 5)[b] += 1
        gtot[b] += 1
    gn = sum(gtot)
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in REGISTRY["dq_t_closeness"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(groups)
    for key, ks in groups.items():
        n = sum(ks)
        cum = 0.0
        tot = 0.0
        for i in range(4):
            cum += ks[i] / n - gtot[i] / gn
            tot += abs(cum)
        t = tot / 4
        r = got[key]
        assert r.group_size == n
        assert math.isclose(r.t_emd, t, rel_tol=1e-9, abs_tol=1e-15)
        assert r.breach == (r.t_emd > 0.2)


def test_kde_matches_python_reference(spark):
    """a_kde_epanechnikov's quantized densities must match a pure-Python
    scatter over the same 3x3 ring — Python floats ARE IEEE doubles and
    the per-row floor quantization makes the comparison EXACT (integer
    equality, no tolerance)."""
    import math

    import duckdb

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    pts = duckdb.sql(
        f"SELECT value, CAST(user_id % 100 AS DOUBLE)"
        f" FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    dens: dict[tuple[int, int], int] = {}
    npts: dict[tuple[int, int], int] = {}
    for px, py in pts:
        ix, iy = math.floor(px / 8.0), math.floor(py / 8.0)
        npts[(ix, iy)] = npts.get((ix, iy), 0) + 1
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                d2 = (px - (jx + 0.5) * 8.0) * (px - (jx + 0.5) * 8.0) + (
                    py - (jy + 0.5) * 8.0
                ) * (py - (jy + 0.5) * 8.0)
                k = max(0.0, 1 - d2 / 64.0)
                dens[(jx, jy)] = dens.get((jx, jy), 0) + math.floor(k * 1000000)
    want = {
        cell: (npts[cell], dens.get(cell, 0)) for cell in npts
    }
    got = {
        (r.ix, r.iy): (r.n_pts, r.density_ppm)
        for r in REGISTRY["a_kde_epanechnikov"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_auc_delong_matches_numpy_reference(spark):
    """ml_auc_delong_ci's AUC/SE must match an INDEPENDENT numpy DeLong
    implementation computing the structural components per observation
    (midranks via scipy-free average ranking) — the doubled-integer
    tie-group algebra must agree with the textbook per-row form."""
    import math

    import numpy as np

    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T
    from tests.conftest import SF_SMOKE

    o = (
        T(spark, SF_SMOKE, "orders")
        .select("o_totalprice", "o_orderstatus")
        .toPandas()
    )
    score = o["o_totalprice"].to_numpy()
    y = (o["o_orderstatus"] == "F").to_numpy()

    def midranks(x):
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x), dtype=float)
        sx = x[order]
        i = 0
        while i < len(sx):
            j = i
            while j < len(sx) and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    pos, neg = score[y], score[~y]
    n1, n0 = len(pos), len(neg)
    r_all = midranks(score)
    r_pos = midranks(pos)
    r_neg = midranks(neg)
    v10 = (r_all[y] - r_pos) / n0
    v01 = 1.0 - (r_all[~y] - r_neg) / n1
    auc = v10.mean()
    se = math.sqrt(v10.var(ddof=1) / n1 + v01.var(ddof=1) / n0)

    r = REGISTRY["ml_auc_delong_ci"].fn(spark, SF_SMOKE).collect()[0]
    assert (r.n_pos, r.n_neg) == (n1, n0)
    assert math.isclose(r.auc, auc, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(r.se, se, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(r.ci_lo, auc - 1.959963984540054 * se, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(r.ci_hi, auc + 1.959963984540054 * se, rel_tol=1e-9, abs_tol=1e-12)


def test_jaccard_linkpred_matches_python_reference(spark):
    """graph_jaccard_linkpred must match a pure-Python neighbor-set
    computation over the same LPA fixture graph: exact candidate set
    (distance-2 non-edges) and exact Jaccard for every pair."""
    import math

    import duckdb

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    orders = duckdb.sql(
        f"SELECT o_custkey, o_orderkey FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    nbrs: dict[int, set[int]] = {}
    for c, o in orders:
        u, v = c % 500, o % 500
        if u != v and ((u // 50 == v // 50 and o % 3 == 0) or o % 97 == 0):
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
    want = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if b in nbrs[a]:
                continue
            cn = len(nbrs[a] & nbrs[b])
            if cn >= 1:
                want[(a, b)] = (cn, len(nbrs[a]), len(nbrs[b]),
                                cn / (len(nbrs[a]) + len(nbrs[b]) - cn))
    got = {
        (r.u, r.w): (r.n_common, r.deg_u, r.deg_w, r.jaccard)
        for r in REGISTRY["graph_jaccard_linkpred"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for k, (cn, du, dw, j) in want.items():
        g = got[k]
        assert (g[0], g[1], g[2]) == (cn, du, dw)
        assert math.isclose(g[3], j, rel_tol=1e-12, abs_tol=1e-15)


def test_esd_outliers_matches_python_reference(spark):
    """a_esd_outliers must match a pure-Python sequential max-deviate
    trim on the daily cents series: same refit-remove recurrence, same
    tie-break, same studentized deviates."""
    import math

    import duckdb

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    days = duckdb.sql(
        f"""SELECT CAST(ts AS DATE) AS day,
              CAST(SUM(CAST(CAST(value * 100 AS DECIMAL(18,2)) AS BIGINT))
                AS BIGINT) AS c
            FROM '{SF_SMOKE}/events.parquet' GROUP BY 1"""
    ).fetchall()
    pts = [(d, int(c)) for d, c in days]
    want = []
    for rnd in (1, 2, 3):
        n = len(pts)
        s = sum(c for _, c in pts)
        q = sum(c * c for _, c in pts)
        sd = None
        if n > 2 and n * q - s * s > 0:
            sd = math.sqrt((n * q - s * s) / (n * (n - 1)))
        scored = sorted(
            ((abs(c - s / n), d, c) for d, c in pts),
            key=lambda t: (-t[0], t[1]),
        )
        dev, day, c = scored[0]
        r_stat = dev / sd if sd else None
        want.append((rnd, day, c / 100, r_stat))
        pts = [(d2, c2) for _, d2, c2 in scored[1:]]

    got = sorted(
        REGISTRY["a_esd_outliers"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.round,
    )
    for (rnd, day, val, r_stat), r in zip(want, got):
        assert r.round == rnd and str(r.day) == str(day)
        assert math.isclose(r.value, val, rel_tol=1e-12, abs_tol=1e-12)
        if r_stat is None:
            assert r.r_stat is None and r.flagged is False
        else:
            assert math.isclose(r.r_stat, r_stat, rel_tol=1e-9, abs_tol=1e-12)
            assert r.flagged == (r.r_stat > 3.0)


def test_sample_reservoir_matches_python_reference(spark):
    """llm_sample_reservoir's selected set must match a pure-Python
    A-ES replay: same uniforms, same 12th-power keys (Python floats
    ARE IEEE doubles with the same parenthesization), same top-50."""
    import duckdb

    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    docs = duckdb.sql(
        f"SELECT doc_id, LENGTH(text) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    scored = []
    for doc_id, ln in docs:
        w = min(4, 1 + int((ln or 0) // 256))
        u = ((abs(doc_id) % 100003) * 2654435761 + 31) % 1000000007 / 1000000007
        if w == 1:
            key = (((u * u) * (u * u)) * ((u * u) * (u * u))) * ((u * u) * (u * u))
        elif w == 2:
            key = ((u * u) * (u * u)) * (u * u)
        elif w == 3:
            key = (u * u) * (u * u)
        else:
            key = (u * u) * u
        scored.append((key, doc_id, w))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = {
        doc_id: (w, key, rk + 1)
        for rk, (key, doc_id, w) in enumerate(scored[:50])
    }
    got = {
        r.doc_id: (r.weight, r.es_key, r.smp_rank)
        for r in REGISTRY["llm_sample_reservoir"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
