#!/usr/bin/env python
"""Apply the next pre-committed driver-window rotation.

The driver verifies the FIRST 50 registry entries (suite/__init__.py
`_FRONT`). tools/rotation_plan.py pins the windows by name; this tool
rewrites the `_FRONT` block to the next pending window so the round-11
rotation is one command instead of a hand edit:

    python tools/rotate.py          # dry-run: show the pending window
    python tools/rotate.py --apply  # rewrite suite/__init__.py

"Next pending" follows the CORRECTNESS files: R10 until
CORRECTNESS_r10.json exists, then R11, then R12 (the post-plan
additions padded to 50 with rotation_plan.R12_RECHECK_FILL — see
rotation_plan.window_r12()), then R13 (pure re-checks — the R12 window
completed full-registry driver coverage), then R14 (round-13-born
queries padded with rotation_plan.R14_RECHECK_FILL — see
rotation_plan.window_r14()).

tests/test_contract.py enforces the same schedule: once a new
CORRECTNESS file lands, the suite fails until this rotation is applied.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

INIT = os.path.join(REPO, "banksy_spark", "suite", "__init__.py")

HEADER_BY_WINDOW = {
    "R11": """# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 11 = backlog-retirement window 3 of 3: the pre-committed R11
# rotation (tools/rotation_plan.py), applied by tools/rotate.py once
# CORRECTNESS_r10.json landed. After this window the driver-verified
# union covers the ENTIRE pre-round-10 registry; round-12+ windows
# rotate in the post-plan additions (rotation_plan.R12) and re-checks.
# Every name below passed the vanilla-ANSI driver-simulation probe
# (tools/ansi_check.py) and the tuned-session three-SF sweeps.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation.
_FRONT = [
""",
    "R12": """# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 12 = gap-closing window: every post-plan addition that has
# never been in a driver window (rotation_plan.R12), padded to 50 with
# the highest-residual-risk re-checks (rotation_plan.R12_RECHECK_FILL).
# After this window the driver-verified union covers the FULL registry
# including all post-plan additions. Applied by tools/rotate.py once
# CORRECTNESS_r11.json landed.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation.
_FRONT = [
""",
    "R13": """# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 13 = pure re-check window: the R12 gap-closing window completed
# driver coverage of the FULL registry, so all 50 slots re-verify the
# highest-residual-risk names not already re-checked inside the R12
# window (rotation_plan.R13 states the risk ranking). Applied by
# tools/rotate.py once CORRECTNESS_r12.json landed.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation.
_FRONT = [
""",
    "R14": """# Rotate the newest / highest-risk queries into the driver's ~50-query
# verification window (it samples the FIRST 50 registry entries).
# Round 14 = round-13-born queries first (rotation_plan.R14 — every
# query registered during round 13, never driver-verified), padded to
# 50 with the highest-residual-risk re-checks not covered by the R12
# or R13 windows (rotation_plan.R14_RECHECK_FILL). Applied by
# tools/rotate.py once CORRECTNESS_r13.json landed.
# Python dicts preserve insertion order, so rebuilding the dict IS the
# rotation.
_FRONT = [
""",
}


def pending_window():
    import rotation_plan

    if os.path.exists(os.path.join(REPO, "CORRECTNESS_r14.json")):
        return None, None
    if os.path.exists(os.path.join(REPO, "CORRECTNESS_r13.json")):
        return "R14", rotation_plan.window_r14()
    if os.path.exists(os.path.join(REPO, "CORRECTNESS_r12.json")):
        return "R13", rotation_plan.R13
    if os.path.exists(os.path.join(REPO, "CORRECTNESS_r11.json")):
        return "R12", rotation_plan.window_r12()
    if os.path.exists(os.path.join(REPO, "CORRECTNESS_r10.json")):
        return "R11", rotation_plan.R11
    return "R10", rotation_plan.R10


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()

    name, window = pending_window()
    if name is None:
        print("nothing to rotate: R14 already consumed (CORRECTNESS_r14.json)")
        return 0

    import banksy_spark.suite as suite

    if list(suite._FRONT) == list(window):
        print(f"{name} already live ({len(window)} names) — no-op")
        return 0
    print(f"pending window: {name} ({len(window)} names)")
    if not args.apply:
        for n in window:
            print(f"  {n}")
        print("dry-run; use --apply to rewrite suite/__init__.py")
        return 1

    src = open(INIT).read()
    m = re.search(r"# Rotate the newest.*?_FRONT = \[\n(?:    \"[a-z0-9_]+\",\n)+\]\n", src, re.S)
    assert m, "_FRONT block not found"
    body = "".join(f'    "{n}",\n' for n in window) + "]\n"
    header = HEADER_BY_WINDOW[name]
    open(INIT, "w").write(src[: m.start()] + header + body + src[m.end():])
    print(f"rotated _FRONT to {name}; re-run pytest tests/test_contract.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
