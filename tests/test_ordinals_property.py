"""Property-based check: global_ordinals must equal the naive
single-partition window forms for ARBITRARY data — duplicates, negative
and extreme values, heavy skew, any bucket count. Complements the
fixed-dataset tests in test_ordinals.py.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from banksy_spark.operators.ordinals import global_ordinals

_vals = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.sampled_from([0, 0, 0, 7, 7, 7, 7, -999999, 999999]),  # forced ties/skew
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(_vals, min_size=1, max_size=120),
    n_buckets=st.sampled_from([2, 4, 16]),
    desc=st.booleans(),
    n_tiles=st.sampled_from([1, 3, 8]),
)
def test_ordinals_match_naive_on_random_data(spark, rows, n_buckets, desc, n_tiles):
    df = spark.createDataFrame(
        [(int(v), i) for i, v in enumerate(rows)], "v long, k long"
    ).repartition(5)
    order = ["-v", "k"] if desc else ["v", "k"]
    got = global_ordinals(
        df,
        order,
        row_number="rn",
        ntile=(n_tiles, "t"),
        cumsum=[("v", "cs")],
        total_count="n",
        n_buckets=n_buckets,
    ).select("k", "rn", "t", "cs", "n")
    w = Window.orderBy(F.col("v").desc() if desc else F.col("v").asc(), "k")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select(
        "k",
        F.row_number().over(w).alias("rn"),
        F.ntile(n_tiles).over(w).alias("t"),
        F.sum("v").over(wrun).alias("cs"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    g = {r["k"]: (r["rn"], r["t"], r["cs"], r["n"]) for r in got.collect()}
    e = {r["k"]: (r["rn"], r["t"], r["cs"], r["n"]) for r in want.collect()}
    assert g == e
