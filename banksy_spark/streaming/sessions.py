"""Stateful streaming capped sessionization: the anchor-fed fold of
suite.round5e.w_capped_sessions run incrementally with
``applyInPandasWithState`` — per-user state carries (session_id,
last-event µs, session-start anchor µs) across micro-batches, so an
unbounded stream assigns the exact session ids the batch fold computes
over its prefix.

The batch twin is the registered query ``w_capped_sessions`` (30-min
inactivity gap OR 4-h max session length, (ts, event_id) order);
tests/test_streaming.py proves stream == batch on a time-split
two-file stream.

Scale: state is three bigints per user, hash-partitioned by the
groupBy key. Same cross-batch ordering contract as every event-time
fold here: batches must not interleave a key's timeline (file source
in modification order locally; a key-partitioned Kafka source in
production).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from banksy_spark.suite.round5e import _CAP_US, _GAP_US

_OUT_SCHEMA = "user_id bigint, event_id bigint, session_id bigint"
_STATE_SCHEMA = "sid bigint, prev_us bigint, anchor_us bigint"


def _session_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    sid, prev_us, anchor_us = state.get if state.exists else (0, None, None)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        # materialize + order the whole group: chunk order is arbitrary
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        out = []
        for ts_us in pdf["ts_us"].astype("int64"):
            ts_us = int(ts_us)
            if (
                prev_us is None
                or ts_us - prev_us > _GAP_US
                or ts_us - anchor_us > _CAP_US
            ):
                sid += 1
                anchor_us = ts_us
            prev_us = ts_us
            out.append(sid)
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": pdf["event_id"],
                "session_id": out,
            }
        )
    state.update((sid, prev_us, anchor_us))


def capped_sessions_stream(events: DataFrame) -> DataFrame:
    """Per-user incremental gap+cap session assignment over a stream."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
