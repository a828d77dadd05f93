"""Spark 4 native stateful operator exemplar:
``transformWithStateInPandas`` (the successor API to
``applyInPandasWithState`` — typed per-state variables on a
``StatefulProcessorHandle`` instead of one opaque state tuple).

Operator: **first-seen dedup** — emit each key's earliest event
exactly once across the life of the stream, suppress every later
occurrence. This is the unbounded-state cousin of
``dropDuplicatesWithinWatermark`` (streaming.core): no watermark
bounds the memory, the state store remembers every key ever seen — the
shape used for "have we ever ingested this document/entity id" gates
in a training-data pipeline, where TTL (the ``ttlDurationMs`` argument
on the state variable) rather than a watermark bounds retention.

Scale: state is one boolean per key, hash-partitioned by the groupBy
key like any shuffle; the RocksDB state-store backend spills it off
heap in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_OUT_SCHEMA = "user_id bigint, event_id bigint, ts timestamp"


class FirstSeenProcessor(StatefulProcessor):
    """Per-key ValueState('seen') flips true on first arrival; only
    that batch emits (the key's earliest row by (ts, event_id))."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "seen boolean")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        best: pd.DataFrame | None = None
        for pdf in rows:
            if not len(pdf):
                continue
            cand = pdf.sort_values(["ts", "event_id"]).head(1)
            if best is None or (
                (cand["ts"].iloc[0], cand["event_id"].iloc[0])
                < (best["ts"].iloc[0], best["event_id"].iloc[0])
            ):
                best = cand
        if best is None:
            return
        self._seen.update((True,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": best["event_id"].to_numpy(),
                "ts": best["ts"].to_numpy(),
            }
        )

    def close(self) -> None:
        pass


def first_seen_stream(events: DataFrame) -> DataFrame:
    """Streaming first-seen dedup via transformWithStateInPandas."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=FirstSeenProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def _first_seen_group(key, pdfs, state) -> Iterator[pd.DataFrame]:
    """GroupState form of :class:`FirstSeenProcessor`: one boolean per
    key; the first batch that sees the key emits its earliest row by
    (ts, event_id), every later batch is suppressed."""
    if state.exists:
        return
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True)
    best = pdf.sort_values(["ts", "event_id"]).head(1)
    state.update((True,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": best["event_id"].to_numpy(),
            "ts": best["ts"].to_numpy(),
        }
    )


def first_seen_stream_gs(events: DataFrame) -> DataFrame:
    """Streaming first-seen dedup via ``applyInPandasWithState`` — the
    dependency-free twin of :func:`first_seen_stream` (the typed-state
    ``transformWithStateInPandas`` protocol needs ``google.protobuf``,
    which some runtimes lack; GroupState ships in-protocol). Identical
    semantics: per-key boolean state, earliest (ts, event_id) row
    emitted exactly once across the life of the stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _first_seen_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def first_seen_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the key's earliest row by (ts, event_id) — what the
    stateful stream must converge to when it has consumed every event
    that the batch frame holds (first micro-batch contains each key's
    earliest arrival, which for a replayed-in-order source is also its
    event-time minimum)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", "event_id", "ts")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
