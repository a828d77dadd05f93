#!/usr/bin/env python
"""Driver-verification backlog: diff union(CORRECTNESS_r*.json) against
the live registry and print what has never been inside a driver window.

The round-8 judge computed 173/319 by hand; this makes it a one-liner:

    python tools/backlog.py            # summary + per-module counts
    python tools/backlog.py --names    # also list the backlog names
    python tools/backlog.py --window   # cross-check the current _FRONT
                                       # window against the backlog

"Driver-verified" counts GREEN rows only (rows_match AND schema_match
AND hash_match, no err) — a name whose only driver rows were red is
NOT verified; it lands in the separate "red-only" bucket and must
re-enter a window (round-11 verdict item 3: the old union-of-names
count hid f_array_hof's checker-crash red as verified).

Exit 0, except --window exits 1 if the current window wastes slots on
already-verified names (adjudicated re-entries in RECHECK are exempt:
a name whose only driver rows were red re-enters deliberately) or if
a red-only name is queued in no window.
"""

from __future__ import annotations

import argparse
import collections
import glob
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Adjudicated re-entries: names that appeared in a driver window but
# whose row was red for a non-engine reason, re-entered to earn the
# green row. round 10: ml_brier_score (CORRECTNESS_r09 hash_match
# false — DuckDB HUGEINT rendering of a >int64 DECIMAL output;
# value-exact, string-routed in suite/round8.py). round 12:
# f_array_hof (CORRECTNESS_r11 err — the driver's pandas canonicalizer
# crashed on its then-ARRAY<DOUBLE> head3 column; rewritten with
# scalar head_1..head_3 in both engines).
RECHECK = {"ml_brier_score", "f_array_hof"}


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def driver_verified(repo: str) -> tuple[set[str], set[str], dict[str, list[str]]]:
    """(green union, red-only set, per-round membership). Green = every
    match flag true and no err in at least one round; red-only = name
    appeared in some window but never earned a green row."""
    green: set[str] = set()
    appeared: set[str] = set()
    rounds: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            d = json.load(f)
        rounds[os.path.basename(path)] = sorted(d)
        appeared.update(d)
        green.update(n for n, row in d.items() if _green(row))
    return green, appeared - green, rounds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", action="store_true", help="list backlog names")
    ap.add_argument(
        "--window", action="store_true",
        help="check the current _FRONT window spends all 50 slots on backlog",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import banksy_spark.suite as suite

    green, red_only, rounds = driver_verified(repo)
    names = list(suite.REGISTRY)
    backlog = [n for n in names if n not in green and n not in red_only]
    stale = sorted((green | red_only) - set(names))  # verified under an old name

    print(f"registry:          {len(names)}")
    print(f"driver-verified:   {len(green & set(names))} "
          f"(green union over {len(rounds)} rounds)")
    print(f"red-only:          {len(red_only & set(names))} (needs re-entry)"
          + (f": {sorted(red_only & set(names))}" if red_only & set(names) else ""))
    print(f"backlog:           {len(backlog)} (never windowed)")
    if stale:
        print(f"stale (renamed?):  {len(stale)}: {stale}")

    per_mod = collections.Counter()
    for n in backlog:
        mod = inspect.getmodule(suite.REGISTRY[n].fn)
        per_mod[mod.__name__.rsplit(".", 1)[-1] if mod else "?"] += 1
    if per_mod:
        print("backlog by module:")
        for m, c in per_mod.most_common():
            print(f"  {m:12s} {c}")

    if args.names:
        print("backlog names:")
        for n in backlog:
            print(f"  {n}")

    if args.window:
        # Once the never-windowed backlog is smaller than the 50-slot
        # window, the balance is deliberately spent on the risk-ranked
        # re-check plans (rotation_plan.R12_RECHECK_FILL, and the pure
        # re-check R13/R14 windows) — those are planned re-checks, not
        # wasted slots.
        planned_fill: set[str] = set()
        try:
            sys.path.insert(0, os.path.join(repo, "tools"))
            import rotation_plan

            planned_fill = (
                set(getattr(rotation_plan, "R12_RECHECK_FILL", ()))
                | set(getattr(rotation_plan, "R13", ()))
                | set(getattr(rotation_plan, "R14_RECHECK_FILL", ()))
            )
        except ImportError:
            pass
        front = suite._FRONT
        # If the newest CORRECTNESS file already covers exactly the
        # live window, the window LANDED and the only pending action is
        # `tools/rotate.py --apply` — counting its slots "wasted" in
        # that state indicts a window that just succeeded (round-12
        # verdict item 6). Banner and exit clean instead.
        newest = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
        if newest:
            with open(newest[-1]) as fh:
                landed = set(json.load(fh))
            if landed == set(front):
                print(
                    f"window landed ({os.path.basename(newest[-1])} covers "
                    f"the live {len(front)}-name window) — rotation pending: "
                    "run `python tools/rotate.py --apply`"
                )
                return 0
        wasted = [
            n for n in front
            if n in green and n not in RECHECK and n not in planned_fill
        ]
        fresh = [n for n in front if n not in green and n not in red_only]
        recheck = [
            n for n in front
            if n in green and (n in RECHECK or n in planned_fill)
        ]
        reentry = [n for n in front if n in red_only]
        unqueued_red = sorted((red_only & set(names)) - set(front))
        print(f"window: {len(front)} names, {len(fresh)} first-timers, "
              f"{len(reentry)} red-only re-entries, "
              f"{len(recheck)} adjudicated green re-checks, "
              f"{len(wasted)} wasted")
        if reentry:
            print(f"  red-only re-entries: {reentry}")
        if recheck:
            print(f"  green re-checks: {recheck}")
        if wasted:
            print(f"  wasted slots: {wasted}")
            return 1
        if unqueued_red:
            print(f"  RED-ONLY NAMES IN NO WINDOW (must re-enter): {unqueued_red}")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
