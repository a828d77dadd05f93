"""Linear-time ordered folds for the per-series recurrence family
(w_ewma, w_cusum_changepoint, w_holt_linear, w_capped_sessions,
a_survival_km).

Each of these queries computes a TRUE recurrence — the per-element
update reads the previous element's state — so no window function can
express it and both engines define the result as a left fold in
event order. Until round 14 the Spark side ran the fold with the
``aggregate`` higher-order function whose accumulator carried the
per-step outputs in an immutable ARRAY: every step's ``array_append``
copies the whole accumulator, so a series of length n paid O(n²)
element copies (guide §5 memory/CPU hazard — invisible at sf0.1 where
series are short, quadratic for long per-key histories at scale).

Here the fold runs inside an Arrow-batched Python UDF (guide §4.2:
hand whole batches across the boundary once, do the sequential work in
native code): the carried state is O(1) Python scalars, the output is
built with an amortized-O(1) ``list.append`` builder the result values
never see, and each step performs the IDENTICAL IEEE-754 operation
sequence as the JVM expression it replaces (documented per fold, and
pinned bit-exact by the DuckDB oracle hashes at every SF plus
tests/test_folds.py against the old expression). Python floats are
IEEE binary64 with the same +,-,*,/ rounding as the JVM, so replaying
the same operation order yields the same bits.

Scale: one Arrow crossing per series row, carrying exactly the columns
the fold needs (the callers pass plain numeric arrays, not the full
struct sequence); state never grows with series length. The arrays
themselves are the same ``collect_list`` payloads the old expression
folded over — the per-series-in-one-row posture (and its streaming
twin for unbounded histories) is unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _series_udf(ret_type):
    """pandas_udf factory: per-row sequential folds over array columns."""

    def deco(fn):
        return F.pandas_udf(fn, returnType=ret_type)

    return deco


# --- EWMA: acc = acc*0.75 + 0.25*x, zero-seeded -----------------------------
# JVM expression replaced: aggregate(lst, 0.0D, (acc, x) -> acc * 0.75D +
# 0.25D * x) per expanding frame. Op order per step: (acc*0.75) + (0.25*x)
# — two multiplies then one add, exactly as below. A NULL element never
# enters the old fold (collect_list drops nulls from the frame) but its
# row still emits the running acc — replicated by the `is not None` guard.
@_series_udf(T.ArrayType(T.DoubleType()))
def ewma_scan(values: pd.Series) -> pd.Series:
    out_all = []
    for arr in values:
        acc = 0.0
        out = []
        push = out.append
        for x in arr:
            if x is not None:
                acc = acc * 0.75 + 0.25 * x
            push(acc)
        out_all.append(out)
    return pd.Series(out_all)


# --- CUSUM: S_t = greatest(0, ((S + x) - mu) - 0.5*sigma) -------------------
# JVM expression replaced (round5.py): per step
#   v = st.acc + CAST(x.cents AS DOUBLE) - mu - 0.5D * sigma
# which parses left-associative as ((acc + x) - mu) - (0.5*sigma), then
# greatest(0.0, v). Spark's greatest treats NaN as largest, i.e. returns
# v unless v < 0.0 — the branch below preserves that (NaN < 0.0 is false).
@_series_udf(T.ArrayType(T.DoubleType()))
def cusum_scan(xs: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
    out_all = []
    for arr, m, s in zip(xs, mu, sigma):
        m = float(m)
        hs = 0.5 * float(s)
        acc = 0.0
        out = []
        push = out.append
        for x in arr:
            v = ((acc + x) - m) - hs
            acc = 0.0 if v < 0.0 else v
            push(acc)
        out_all.append(out)
    return pd.Series(out_all)


# --- Holt linear: l_1 = x_1, b_1 = 0; then ----------------------------------
#   l' = 0.5*x + 0.5*(l + b)
#   b' = 0.5*(l' - l) + 0.5*b     [the JVM form re-inlines l' textually:
#                                  0.5*(0.5*x + 0.5*(l+b) - l) + 0.5*b —
#                                  same bits, l' is the same rounded value]
@_series_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("l", T.DoubleType()),
                T.StructField("b", T.DoubleType()),
            ]
        )
    )
)
def holt_scan(xs: pd.Series) -> pd.Series:
    out_all = []
    for arr in xs:
        lvl = 0.0
        trd = 0.0
        first = True
        out = []
        push = out.append
        for x in arr:
            if first:
                lvl, trd, first = x, 0.0, False
            else:
                nl = 0.5 * x + 0.5 * (lvl + trd)
                trd = 0.5 * (nl - lvl) + 0.5 * trd
                lvl = nl
            push({"l": lvl, "b": trd})
        out_all.append(out)
    return pd.Series(out_all)


# --- Capped sessionization: new session iff first event, gap, or cap -------
# Integer microsecond arithmetic end-to-end — no rounding anywhere, so
# only the branch structure must match (it is the JVM CASE verbatim).
@_series_udf(T.ArrayType(T.LongType()))
def capped_sessions_scan(
    ts: pd.Series, gap_us: pd.Series, cap_us: pd.Series
) -> pd.Series:
    out_all = []
    for arr, gap, cap in zip(ts, gap_us, cap_us):
        gap = int(gap)
        cap = int(cap)
        sid = 0
        prev = None
        anchor = 0
        out = []
        push = out.append
        for t in arr:
            t = int(t)
            if prev is None or t - prev > gap or t - anchor > cap:
                sid += 1
                anchor = t
            prev = t
            push(sid)
        out_all.append(out)
    return pd.Series(out_all)


# --- Kaplan-Meier product-limit: S *= (1 - d/n_at_risk) ---------------------
# Op order per step: q = 1.0 - (d / n); acc = acc * q — the JVM form
# st.acc * (1.0D - CAST(x.d AS DOUBLE) / x.n_at_risk) evaluates the
# division first (double / bigint promotes the bigint), then the
# subtraction, then the multiply; ints < 2^53 convert exactly.
@_series_udf(T.ArrayType(T.DoubleType()))
def km_scan(d: pd.Series, n_at_risk: pd.Series) -> pd.Series:
    out_all = []
    for darr, narr in zip(d, n_at_risk):
        acc = 1.0
        out = []
        push = out.append
        for di, ni in zip(darr, narr):
            acc = acc * (1.0 - float(di) / float(ni))
            push(acc)
        out_all.append(out)
    return pd.Series(out_all)
