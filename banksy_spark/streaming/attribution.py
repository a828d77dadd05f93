"""Stateful streaming last-touch attribution: the window pass of
suite.round4c.stream_attribution run incrementally with
``applyInPandasWithState`` — per-user state carries the most recent
click/view touchpoint (type + event-time) across micro-batches, and
each purchase is emitted already attributed, exactly as the batch
last(ignorenulls) window computes it over the full timeline.

The batch twin is the registered query ``stream_attribution`` (7-day
lookback, (ts, event_id) order); tests/test_streaming.py proves the
stream's attributed purchases re-aggregate to the identical per-channel
(purchases, revenue-cents) the batch query reports.

Scale: state is one (string, int64) pair per user, hash-partitioned by
the groupBy key — the smallest possible attribution state; the same
cross-batch ordering contract as the EWMA fold applies (a key's
timeline must not interleave across batches; Kafka keyed by user gives
this for free).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000
_TOUCH_TYPES = ("click", "view")

_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, channel string, value double"
)
_STATE_SCHEMA = "ch_type string, ch_ts_us bigint"


def _attr_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ch_type, ch_ts = state.get if state.exists else (None, None)
    # Materialize and globally order the group before folding: Spark only
    # clusters by the grouping key, so a key spanning multiple Arrow
    # record batches would otherwise fold chunks out of event-time order.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        rows = []
        for ev_id, etype, ts_us, value in zip(
            pdf["event_id"], pdf["event_type"], pdf["ts_us"], pdf["value"]
        ):
            if etype == "purchase":
                if ch_type is not None and ts_us <= ch_ts + _LOOKBACK_US:
                    rows.append((key[0], int(ev_id), ch_type, float(value)))
            if etype in _TOUCH_TYPES:
                ch_type, ch_ts = etype, int(ts_us)
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "channel", "value"]
            )
    state.update((ch_type, ch_ts))


def attribution_stream(events: DataFrame) -> DataFrame:
    """Per-user incremental last-touch attribution over an event stream;
    emits one row per attributed purchase."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _attr_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
