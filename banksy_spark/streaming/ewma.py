"""Stateful streaming EWMA: the recursive fold of suite.round4.w_ewma
run incrementally with ``applyInPandasWithState`` — the acc carries
across micro-batches in a per-user ValueState, so an unbounded stream
maintains the exact same value the batch fold computes over its prefix.

The batch twin is the registered query ``w_ewma`` (alpha=0.25,
zero-seeded, (ts, event_id) order); tests/test_streaming.py proves
stream == batch on a time-split two-file stream.

Scale: state is one double per user, hash-partitioned by the groupBy
key; within a batch the fold is a vectorized pandas pass per key. The
cross-batch correctness contract is the file/source ordering one every
event-time fold needs: batches must not interleave a key's timeline
(here: time-split files processed in modification order; in production
a Kafka source partitioned by the same key gives this for free).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_ALPHA = 0.25

_OUT_SCHEMA = "user_id bigint, event_id bigint, ewma double"
_STATE_SCHEMA = "acc double"


def _ewma_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (acc,) = state.get if state.exists else (0.0,)
    # Spark only clusters rows by the grouping key — when one key's batch
    # spans multiple Arrow record batches the chunks arrive in arbitrary
    # order, so the group must be materialized and ordered globally before
    # the fold (sorting each chunk independently is NOT enough).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out = []
        # plain python float fold == IEEE double sequence == the
        # aggregate()/list_reduce fold in the batch/oracle twins
        for v in pdf["value"].astype("float64"):
            acc = acc * (1.0 - EWMA_ALPHA) + EWMA_ALPHA * float(v)
            out.append(acc)
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": pdf["event_id"],
                "ewma": out,
            }
        )
    state.update((acc,))


def ewma_stream(events: DataFrame) -> DataFrame:
    """Per-user incremental EWMA over an event stream."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
