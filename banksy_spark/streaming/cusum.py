"""Stateful streaming CUSUM: the recursive fold of
suite.round5.w_cusum_changepoint run incrementally with
``applyInPandasWithState`` — per-key state carries the running S
across micro-batches, so an unbounded metric stream maintains exactly
the value the batch fold computes over its prefix.

Deployment shape: (mu, sigma) are TRAINED on history (the batch
query's exact-DECIMAL moments) and frozen as parameters of the online
detector — the standard sequential-test split (fit offline, monitor
online). tests/test_streaming.py proves stream == batch on a
time-split two-file stream with the parameters fitted by
``suite.round5.cusum_parts``.

Scale: state is one double per series key; the same cross-batch
ordering contract as the EWMA fold (a key's timeline must not
interleave across batches — Kafka keyed by series gives this free).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "pri string, day timestamp_ntz, cents bigint, s_pos double, drift boolean"
_STATE_SCHEMA = "acc double"


def make_cusum_fold(params: dict[str, tuple[float, float]]):
    """Build the per-group CUSUM fold with the fitted (mu, sigma) per
    key frozen in the closure (cloudpickle ships it to the workers).
    S_t = max(0, S_{t-1} + (x_t - mu - 0.5 sigma)); drift at S > 4 sigma
    — identical IEEE sequence to the batch aggregate() fold."""

    def _cusum_group(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (acc,) = state.get if state.exists else (0.0,)
        mu, sigma = params[key[0]]
        # materialize + order globally: chunks of one key arrive in
        # arbitrary order (same contract as ewma/attribution folds)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values("day").reset_index(drop=True)
            out, flags = [], []
            for x in pdf["cents"].astype("float64"):
                # left-associated exactly like the batch fold's
                # `acc + x - mu - 0.5D * sigma` — association changes ulps
                acc = max(0.0, acc + float(x) - mu - 0.5 * sigma)
                out.append(acc)
                flags.append(acc > 4.0 * sigma)
            yield pd.DataFrame(
                {
                    "pri": key[0],
                    "day": pdf["day"],
                    "cents": pdf["cents"],
                    "s_pos": out,
                    "drift": flags,
                }
            )
        state.update((acc,))

    return _cusum_group


def cusum_stream(
    daily: DataFrame, params: dict[str, tuple[float, float]]
) -> DataFrame:
    """Incremental CUSUM over a (pri, day, cents) stream with frozen
    per-key (mu, sigma)."""
    return (
        daily.select("pri", "day", "cents")
        .groupBy("pri")
        .applyInPandasWithState(
            make_cusum_fold(params),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
