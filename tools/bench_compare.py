"""Compare a fresh bench run against a recorded baseline JSON.

Usage:
    python tools/bench_compare.py NEW.json BASELINE.json [--bar 2.0]

Accepts either bench.py's native one-line JSON ({"queries": {...}}) or
the driver's BENCH_r{N}.json wrapper (whose "tail" field holds a
truncated fragment of that line — pairs are regex-recovered). Prints
shared-query count, geo-mean ratio, the worst offenders, and exits 1
if any query exceeds the regression bar (default 2x, the bar
BASELINE.md sets for round gates).
"""

from __future__ import annotations

import json
import math
import re
import sys


def load(path: str) -> dict[str, float]:
    raw = json.load(open(path))
    if "queries" in raw:
        return {k: float(v) for k, v in raw["queries"].items()}
    if "tail" in raw:
        return {
            k: float(v)
            for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', raw["tail"])
        }
    raise SystemExit(f"{path}: neither a bench line nor a driver wrapper")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bar = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--bar"):
            bar = float(a.split("=", 1)[1]) if "=" in a else bar
    new, base = load(args[0]), load(args[1])
    shared = [k for k in base if k in new and base[k] > 0]
    if not shared:
        raise SystemExit("no shared queries between the two files")
    ratios = {k: new[k] / base[k] for k in shared}
    geo = math.exp(sum(math.log(v) for v in ratios.values()) / len(ratios))
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    over = [k for k, v in ratios.items() if v > bar]
    print(
        json.dumps(
            {
                "shared": len(shared),
                "geomean": round(geo, 3),
                "worst": [
                    {"q": k, "ratio": round(v, 2), "base": base[k], "new": new[k]}
                    for k, v in worst
                ],
                "over_bar": over,
                "bar": bar,
            }
        )
    )
    return 1 if over else 0


if __name__ == "__main__":
    sys.exit(main())
