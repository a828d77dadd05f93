"""Streaming-native scrape source (SURVEY.md §2.1 S2 as a stream).

The reference's scrape loop (bovada_pull.py:14-42) is an imperative
retry loop: fetch, check ``len >= 250``, sleep 2 s, give up after 60 s.
``sources.adapters.poll_until_valid`` is its batch/driver form; this
module is the Structured-Streaming form: a ``rate`` source provides the
retry ticks, each micro-batch performs ONE driver-side fetch (scraping
is not distributed work — the cluster never sees the network edge),
the validity predicate gates the write, and the first valid payload is
appended to a parquet sink that downstream parse pipelines
(pipelines.bovada) read — streaming or batch.

Semantics contract (stream-equals-batch, tested in
tests/test_sources.py): for the same scripted fetch sequence the sink
holds exactly the rows ``blob_to_df(poll_until_valid(fetch, ...))``
would hold — one payload row on success, zero rows on give-up.

Scale: the tick stream is one row per interval and the fetch happens on
the driver; the heavy work (parse, normalize, join) stays a DataFrame
pipeline over the sink files, which distributes like any other file
source. Multiple scrape targets = multiple queries, each with its own
checkpoint — state is O(1) per target.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = "attempt int, payload string"


def start_scrape_stream(
    spark: SparkSession,
    fetch: Callable[[], str | None],
    out_path: str,
    checkpoint: str,
    is_valid: Callable[[str], bool] | None = None,
    min_len: int = 250,
    timeout_s: float = 60.0,
    interval_s: float = 2.0,
    clock: Callable[[], float] = time.monotonic,
):
    """Start the scrape stream; returns ``(StreamingQuery, state)``.

    ``state`` is a dict the foreachBatch hook mutates:
    ``done`` (terminal: valid payload written or timeout hit),
    ``attempts`` (fetch count), ``payload`` (the accepted payload or
    None). The caller (or :func:`scrape_until_valid`) watches ``done``
    and stops the query — a StreamingQuery cannot stop itself from
    inside its own batch function.

    The retry cadence is the trigger interval (reference: 2 s,
    bovada_pull.py:40); the give-up budget is ``timeout_s`` measured
    from the first attempt (:34-38). The rate ticks only schedule
    fetches — their content is discarded.
    """
    if is_valid is None:
        is_valid = lambda payload: len(payload) >= min_len  # noqa: E731

    state: dict = {"done": False, "attempts": 0, "payload": None, "start": None}

    def process(_batch: DataFrame, _batch_id: int) -> None:
        if state["done"]:
            return
        if state["start"] is None:
            state["start"] = clock()
        payload = fetch()
        state["attempts"] += 1
        if payload is not None and is_valid(payload):
            spark.createDataFrame(
                [(state["attempts"], payload)], PAYLOAD_SCHEMA
            ).write.mode("append").parquet(out_path)
            state["payload"] = payload
            state["done"] = True
        elif clock() - state["start"] >= timeout_s:
            # give up (reference's skip_bovada arm): zero rows written,
            # downstream parse yields an empty frame
            state["done"] = True

    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    query = (
        ticks.writeStream.foreachBatch(process)
        .trigger(processingTime=f"{max(1, int(interval_s * 1000))} milliseconds")
        .option("checkpointLocation", checkpoint)
        .start()
    )
    return query, state


def read_payloads(spark: SparkSession, out_path: str) -> DataFrame:
    """The scrape sink as a DataFrame — empty frame with the payload
    schema when the scrape gave up (nothing was ever written), matching
    ``blob_to_df(spark, None)`` downstream behavior."""
    if not os.path.isdir(out_path) or not any(
        f.endswith(".parquet") for f in os.listdir(out_path)
    ):
        return spark.createDataFrame([], PAYLOAD_SCHEMA)
    return spark.read.schema(PAYLOAD_SCHEMA).parquet(out_path)


def scrape_until_valid(
    spark: SparkSession,
    fetch: Callable[[], str | None],
    out_path: str,
    checkpoint: str,
    poll_every_s: float = 0.05,
    await_s: float = 60.0,
    **kwargs,
) -> DataFrame:
    """Run the scrape stream to its terminal state (first valid payload
    or give-up) and return the payload frame — the streaming twin of
    ``blob_to_df(spark, poll_until_valid(fetch, ...))``.
    """
    query, state = start_scrape_stream(spark, fetch, out_path, checkpoint, **kwargs)
    try:
        deadline = time.monotonic() + await_s
        while query.isActive and not state["done"]:
            if time.monotonic() > deadline:
                raise TimeoutError("scrape stream did not reach a terminal state")
            time.sleep(poll_every_s)
    finally:
        query.stop()
    query.awaitTermination(30)
    return read_payloads(spark, out_path).select("payload", F.col("attempt"))
