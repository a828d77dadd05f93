"""operators/folds.py: the Arrow-batched per-series folds must be
BIT-IDENTICAL to the aggregate-HOF array_append expressions they
replaced (r14 optimization — the O(n²) accumulator-copy fix), on
series far longer than any testdata key produces."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def _one_series_df(spark, values):
    return spark.createDataFrame(
        [(1, list(map(float, values)))], "k INT, xs ARRAY<DOUBLE>"
    )


def test_ewma_scan_matches_old_fold(spark):
    from banksy_spark.operators.folds import ewma_scan

    rng = random.Random(7)
    xs = [rng.uniform(-1e6, 1e6) for _ in range(5000)]
    df = _one_series_df(spark, xs)
    old = df.select(
        F.expr(
            "transform(sequence(1, size(xs)),"
            " t -> aggregate(slice(xs, 1, t), CAST(0 AS DOUBLE),"
            "                (acc, x) -> acc * 0.75D + 0.25D * x))"
        ).alias("o")
    ).first()["o"]
    new = df.select(ewma_scan("xs").alias("n")).first()["n"]
    assert len(old) == len(new) == len(xs)
    # bit-exact: compare through repr (shortest round-trip, ±0.0-aware)
    assert [repr(v) for v in old] == [repr(v) for v in new]


def test_cusum_scan_matches_old_fold(spark):
    from banksy_spark.operators.folds import cusum_scan

    rng = random.Random(11)
    xs = [float(rng.randrange(10**9)) for _ in range(5000)]
    mu, sigma = 4.87e8, 2.9e8
    df = _one_series_df(spark, xs).select(
        "xs", F.lit(mu).alias("mu"), F.lit(sigma).alias("sigma")
    )
    old = df.select(
        F.expr(
            "aggregate(xs,"
            " struct(CAST(array() AS ARRAY<DOUBLE>) AS out, CAST(0 AS DOUBLE) AS acc),"
            " (st, x) -> struct("
            "   array_append(st.out,"
            "     greatest(CAST(0 AS DOUBLE), st.acc + x - mu - 0.5D * sigma)),"
            "   greatest(CAST(0 AS DOUBLE), st.acc + x - mu - 0.5D * sigma)),"
            " st -> st.out)"
        ).alias("o")
    ).first()["o"]
    new = df.select(cusum_scan("xs", "mu", "sigma").alias("n")).first()["n"]
    assert [repr(v) for v in old] == [repr(v) for v in new]


def test_holt_scan_matches_old_fold(spark):
    from banksy_spark.operators.folds import holt_scan

    rng = random.Random(13)
    xs = [float(rng.randrange(10**12)) for _ in range(4000)]
    df = _one_series_df(spark, xs)
    old = df.select(
        F.expr(
            "aggregate(xs,"
            " struct(CAST(array() AS ARRAY<STRUCT<l: DOUBLE, b: DOUBLE>>) AS out,"
            "        0 AS t, CAST(0 AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b),"
            " (st, x) -> struct("
            "   array_append(st.out, struct("
            "     CASE WHEN st.t = 0 THEN x"
            "          ELSE 0.5D * x + 0.5D * (st.l + st.b) END AS l,"
            "     CASE WHEN st.t = 0 THEN CAST(0 AS DOUBLE)"
            "          ELSE 0.5D * (0.5D * x + 0.5D * (st.l + st.b) - st.l)"
            "               + 0.5D * st.b END AS b)),"
            "   st.t + 1,"
            "   CASE WHEN st.t = 0 THEN x"
            "        ELSE 0.5D * x + 0.5D * (st.l + st.b) END,"
            "   CASE WHEN st.t = 0 THEN CAST(0 AS DOUBLE)"
            "        ELSE 0.5D * (0.5D * x + 0.5D * (st.l + st.b) - st.l)"
            "             + 0.5D * st.b END),"
            " st -> st.out)"
        ).alias("o")
    ).first()["o"]
    new = df.select(holt_scan("xs").alias("n")).first()["n"]
    assert len(old) == len(new)
    for o, n in zip(old, new):
        assert repr(o["l"]) == repr(n["l"]) and repr(o["b"]) == repr(n["b"])


def test_capped_sessions_scan_matches_old_fold(spark):
    from banksy_spark.operators.folds import capped_sessions_scan

    gap, cap = 1_800_000_000, 14_400_000_000
    rng = random.Random(17)
    ts, t = [], 0
    for _ in range(5000):
        t += rng.choice([30_000_000, 600_000_000, 1_900_000_000, 3_600_000_000])
        ts.append(t)
    df = spark.createDataFrame([(1, ts)], "k INT, ts ARRAY<BIGINT>")
    old = df.select(
        F.expr(
            f"aggregate(ts,"
            f" struct(CAST(array() AS ARRAY<BIGINT>) AS out,"
            f"        CAST(0 AS BIGINT) AS sid,"
            f"        CAST(NULL AS BIGINT) AS prev_us,"
            f"        CAST(NULL AS BIGINT) AS anchor_us),"
            f" (st, x) -> struct("
            f"   array_append(st.out,"
            f"     CASE WHEN st.prev_us IS NULL OR x - st.prev_us > {gap}L"
            f"            OR x - st.anchor_us > {cap}L"
            f"          THEN st.sid + 1L ELSE st.sid END),"
            f"   CASE WHEN st.prev_us IS NULL OR x - st.prev_us > {gap}L"
            f"          OR x - st.anchor_us > {cap}L"
            f"        THEN st.sid + 1L ELSE st.sid END,"
            f"   x,"
            f"   CASE WHEN st.prev_us IS NULL OR x - st.prev_us > {gap}L"
            f"          OR x - st.anchor_us > {cap}L"
            f"        THEN x ELSE st.anchor_us END),"
            f" st -> st.out)"
        ).alias("o")
    ).first()["o"]
    new = df.select(
        capped_sessions_scan("ts", F.lit(gap), F.lit(cap)).alias("n")
    ).first()["n"]
    assert list(old) == list(new)


def test_km_scan_matches_old_fold(spark):
    from banksy_spark.operators.folds import km_scan

    rng = random.Random(19)
    d = [rng.randrange(1, 50) for _ in range(3000)]
    n_total = sum(d)
    n_at_risk, acc = [], n_total
    for di in d:
        n_at_risk.append(acc)
        acc -= di
    df = spark.createDataFrame(
        [(1, d, n_at_risk)], "k INT, d ARRAY<BIGINT>, n ARRAY<BIGINT>"
    )
    old = df.select(
        F.expr(
            "aggregate(arrays_zip(d, n),"
            " struct(CAST(array() AS ARRAY<DOUBLE>) AS out, CAST(1 AS DOUBLE) AS acc),"
            " (st, x) -> struct("
            "   array_append(st.out, st.acc * (1.0D - CAST(x.d AS DOUBLE) / x.n)),"
            "   st.acc * (1.0D - CAST(x.d AS DOUBLE) / x.n)),"
            " st -> st.out)"
        ).alias("o")
    ).first()["o"]
    new = df.select(km_scan("d", "n").alias("n2")).first()["n2"]
    assert [repr(v) for v in old] == [repr(v) for v in new]


def test_scan_edge_cases(spark):
    """Empty series and length-1 series round-trip through every scan."""
    from banksy_spark.operators.folds import (
        capped_sessions_scan,
        cusum_scan,
        ewma_scan,
        holt_scan,
        km_scan,
    )

    df = spark.createDataFrame(
        [(1, [], []), (2, [5.0], [3])],
        "k INT, xs ARRAY<DOUBLE>, ts ARRAY<BIGINT>",
    )
    rows = df.select(
        ewma_scan("xs").alias("e"),
        cusum_scan("xs", F.lit(1.0), F.lit(1.0)).alias("c"),
        holt_scan("xs").alias("h"),
        capped_sessions_scan("ts", F.lit(10), F.lit(100)).alias("s"),
        km_scan("ts", "ts").alias("m"),
    ).collect()
    by_len = {len(r["e"]): r for r in rows}
    assert len(by_len[0]["h"]) == 0 and len(by_len[0]["s"]) == 0
    r1 = by_len[1]
    assert r1["e"] == [0.0 * 0.75 + 0.25 * 5.0]
    assert r1["h"][0]["l"] == 5.0 and r1["h"][0]["b"] == 0.0
    assert list(r1["s"]) == [1]
    assert r1["m"] == [1.0 * (1.0 - 3.0 / 3.0)]
    assert not math.isnan(r1["c"][0])
