"""Custom stateful streaming operator exemplar:
``applyInPandasWithState`` (SURVEY.md §2.9 / driver brief: "custom
stateful operators").

The operator is the streaming-native form of the reference's
notification rate limiter (arbitrage_scanner.py:434-461): per key it
remembers how many alerts each calendar day has already consumed and
passes events through only while the day's quota lasts — but unlike the
foreachBatch variant (streaming.core), the counter lives in Spark's
state store, so there is no external log table and no per-batch join.

Scale: state is partitioned by user_id (the groupBy key), one state row
per active user; a GroupStateTimeout would expire idle users in a
production deployment.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id bigint, event_id bigint, day string, nth_today int"
_STATE_SCHEMA = "day string, n int"


def _make_limiter(max_per_day: int):
    """Build the per-group quota counter with the quota captured in the
    closure (cloudpickle ships closures to the workers fine)."""

    def _limit_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # State = (current day, sends so far)
        day, n = state.get if state.exists else (None, 0)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for r in pdf.itertuples(index=False):
                r_day = str(r.ts.date())
                if r_day != day:  # midnight rollover resets the quota
                    day, n = r_day, 0
                if n < max_per_day:
                    n += 1
                    out_rows.append((key[0], r.event_id, r_day, n))
        state.update((day, n))
        yield pd.DataFrame(out_rows, columns=["user_id", "event_id", "day", "nth_today"])

    return _limit_group


def rate_limit_stateful(events: DataFrame, max_per_day: int = 3) -> DataFrame:
    """Stateful rate limiter over a (possibly streaming) events frame.

    The per-group Python runs on Arrow batches (pandas), the state store
    holds one tiny tuple per user — this is the pattern for operators
    Spark lacks natively (SURVEY brief: applyInPandasWithState for
    custom stateful semantics).
    """
    return events.select("user_id", "event_id", "ts").groupBy("user_id").applyInPandasWithState(
        _make_limiter(max_per_day),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
