"""Stateful streaming Holt smoothing: the two-state (level, trend)
recursion of suite.round5d.w_holt_linear run incrementally with
``applyInPandasWithState`` — per-series state carries (t, l, b) across
micro-batches, so an unbounded metric stream maintains exactly the
level/trend/forecast the batch fold computes over its prefix.

alpha = beta = 0.5 (exact binary halvings) exactly as the batch twin;
tests/test_streaming.py proves stream == batch on a time-split
two-file stream of the daily revenue series.

Scale: state is two doubles + a counter per series key; same
cross-batch ordering contract as the EWMA/CUSUM folds (a key's
timeline must not interleave across batches).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "pri string, day timestamp_ntz, cents bigint,"
    " level double, trend double, forecast_next double"
)
_STATE_SCHEMA = "t bigint, l double, b double"


def _holt_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    t, l, b = state.get if state.exists else (0, 0.0, 0.0)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values("day").reset_index(drop=True)
        levels, trends = [], []
        for x in pdf["cents"].astype("float64"):
            x = float(x)
            if t == 0:
                l, b = x, 0.0
            else:
                # identical expression order to the batch fold /
                # recursive-CTE oracle: association changes ulps
                l_new = 0.5 * x + 0.5 * (l + b)
                b = 0.5 * (l_new - l) + 0.5 * b
                l = l_new
            t += 1
            levels.append(l)
            trends.append(b)
        yield pd.DataFrame(
            {
                "pri": key[0],
                "day": pdf["day"],
                "cents": pdf["cents"],
                "level": levels,
                "trend": trends,
                "forecast_next": [lv + tr for lv, tr in zip(levels, trends)],
            }
        )
    state.update((t, l, b))


def holt_stream(daily: DataFrame) -> DataFrame:
    """Incremental Holt level+trend over a (pri, day, cents) stream."""
    return (
        daily.select("pri", "day", "cents")
        .groupBy("pri")
        .applyInPandasWithState(
            _holt_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
