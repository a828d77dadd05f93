"""Scrape-edge and alert-edge adapters (SURVEY.md §2.1 S1/S2/S5/K3).

These are deliberately driver-side: scraping and push notifications are
not distributed work. The analytics engine sees only DataFrames; the
network edges are injected as plain callables so tests (and the batch
harness) swap in fakes — the reference hard-wires Selenium and Pushover
instead (bovada_pull.py:14-42, arbitrage_scanner.py:493-502).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


def poll_until_valid(
    fetch: Callable[[], str],
    is_valid: Callable[[str], bool] | None = None,
    min_len: int = 250,
    timeout_s: float = 60.0,
    interval_s: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> str | None:
    """S2: the reference's scrape retry loop (bovada_pull.py:14-42):
    re-fetch every ``interval_s`` until the payload is valid (default:
    length ≥ 250 chars, :34), give up after ``timeout_s`` (:34-38) and
    return None — the downstream parse then yields zero rows, which is
    exactly how parse_bovada treats an invalid payload.

    ``sleep``/``clock`` are injectable for deterministic tests.
    """
    if is_valid is None:
        is_valid = lambda payload: len(payload) >= min_len  # noqa: E731
    start = clock()
    while True:
        payload = fetch()
        if payload is not None and is_valid(payload):
            return payload
        if clock() - start >= timeout_s:
            return None
        sleep(interval_s)


def blob_to_df(spark: SparkSession, payload: str | None) -> DataFrame:
    """S5: one scraped text blob → a one-row DataFrame seeding the
    parse expression tree (bovada_pull.py:52 analog). None (scrape gave
    up) becomes an empty frame with the same schema."""
    rows = [(payload,)] if payload is not None else []
    return spark.createDataFrame(rows, "payload string")


def rows_to_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """S1/S5: parsed scrape rows → DataFrame (the HTML-table scrape's
    list-of-lists at arbitrage_scanner.py:44-58)."""
    return spark.createDataFrame(rows, schema)


def send_notifications(
    alerts: DataFrame,
    post: Callable[[str], None],
    message_col: str = "combined",
    min_batch: int = 2,
) -> int:
    """K3: the notification sink (arbitrage_scanner.py:478-502): join
    the (tiny, already-aggregated) alert rows into one message and POST
    it. The reference requires >1 row to send (:434, min_batch=2).

    The collect here is intentional and bounded: decide_alerts already
    reduced to the per-day rate-limited alert set; a sink that POSTs to
    a phone is driver-side by nature. Returns the number of alert lines
    sent (0 = below min_batch, nothing sent).
    """
    lines: Iterable[str] = [r[message_col] for r in alerts.select(message_col).collect()]
    lines = list(lines)
    if len(lines) < min_batch:
        return 0
    post("\n".join(lines))
    return len(lines)
