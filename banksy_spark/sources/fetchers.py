"""Deterministic fetcher factories for the DSv2 scrape source
(``sources.scrape_source``). The source takes a ``module:function``
factory path because callables can't ride through DSv2's string-only
options; these doubles mirror the reference's scrape edge
(bovada_pull.py:14-42 — a page that renders late, then settles) and
are what the stream==batch tests script against. A production
deployment points ``fetcher`` at its own factory wrapping Selenium /
requests; the engine only ever sees the returned payload string.
"""

from __future__ import annotations

from collections.abc import Callable

# payload the parse pipeline accepts: long enough for min_len gates
VALID_PAYLOAD = "GAME Phoenix Suns -110 +105 OVER 215.5 " * 8


def flaky_then_valid() -> Callable[[], str | None]:
    """Fails twice (short/None payload — the page still rendering),
    then returns a stable valid payload forever: the common real
    sequence the retry loop exists for."""
    state = {"n": 0}

    def fetch() -> str | None:
        state["n"] += 1
        if state["n"] == 1:
            return None
        if state["n"] == 2:
            return "loading..."
        return VALID_PAYLOAD

    return fetch


def never_valid() -> Callable[[], str | None]:
    """Always returns a too-short payload — drives the give-up arm."""
    return lambda: "stub"
