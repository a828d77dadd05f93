#!/usr/bin/env python
"""Driver-verification backlog: diff union(CORRECTNESS_r*.json) against
the live registry and print what has never been inside a driver window.

The round-8 judge computed 173/319 by hand; this makes it a one-liner:

    python tools/backlog.py            # summary + per-module counts
    python tools/backlog.py --names    # also list the backlog names
    python tools/backlog.py --window   # cross-check the current _FRONT
                                       # window against the backlog

Exit 0, except --window exits 1 if the current window wastes slots on
already-verified names (adjudicated re-entries in RECHECK are exempt:
a name whose only driver rows were red re-enters deliberately).
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
# value-exact, string-routed in suite/round8.py).
RECHECK = {"ml_brier_score"}


def driver_verified(repo: str) -> tuple[set[str], dict[str, list[str]]]:
    """Union of names in every driver CORRECTNESS_r*.json, plus the
    per-round membership (for 'first verified in' reporting)."""
    seen: set[str] = set()
    rounds: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            d = json.load(f)
        rounds[os.path.basename(path)] = sorted(d)
        seen.update(d)
    return seen, rounds


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

    seen, rounds = driver_verified(repo)
    names = list(suite.REGISTRY)
    backlog = [n for n in names if n not in seen]
    stale = sorted(seen - set(names))  # verified under an old name, gone now

    print(f"registry:          {len(names)}")
    print(f"driver-verified:   {len(seen & set(names))} (union over {len(rounds)} rounds)")
    print(f"backlog:           {len(backlog)}")
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
        front = suite._FRONT
        wasted = [n for n in front if n in seen and n not in RECHECK]
        fresh = [n for n in front if n not in seen]
        recheck = [n for n in front if n in seen and n in RECHECK]
        print(f"window: {len(front)} names, {len(fresh)} first-timers, "
              f"{len(recheck)} adjudicated re-entries, "
              f"{len(wasted)} wasted")
        if recheck:
            print(f"  re-entries: {recheck}")
        if wasted:
            print(f"  wasted slots: {wasted}")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
