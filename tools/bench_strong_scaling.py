#!/usr/bin/env python
"""Strong scaling: same data, fewer cores. Runs the data-bound scale-up
queries at $SCALEUP_BIG (default the 18M-row sf3r replica set) under
local[8] and local[32] in separate JVMs and reports the speedup.

Near-4× speedup from 8→32 cores means the plan is executor-bound (the
shape that profits from a 1000-executor cluster); a flat ratio would
mean driver-side or single-partition serialization is hiding somewhere.

    python tools/make_sf1.py --k 30 --out /root/repo/.scratch/sf3r
    python tools/bench_strong_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

QUERIES = [
    "graph_kcore",
    "a_exact_median",
    "llm_ann_ivf",
    "j_basket_lift",
    "graph_pagerank",
    "a_rfm_segmentation",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from banksy_spark.session import get_spark, release_caches
from banksy_spark.suite import REGISTRY
cores, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
spark = get_spark("strong-scaling", master=f"local[{cores}]",
                  shuffle_partitions=int(cores))
def run(n):
    release_caches(spark)
    t0 = time.time()
    REGISTRY[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0
run("a_grouped_sum")  # warm-up
print(json.dumps({n: round(min(run(n), run(n)), 2) for n in names}))
"""


def main() -> None:
    sf_dir = os.environ.get("SCALEUP_BIG", "/root/repo/.scratch/sf3r")
    results: dict[str, dict[str, float]] = {}
    for cores in ("8", "32"):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, cores, sf_dir, *QUERIES],
            capture_output=True,
            text=True,
            check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    for n in QUERIES:
        t8, t32 = results["8"][n], results["32"][n]
        print(
            json.dumps(
                {n: {"local8_s": t8, "local32_s": t32, "speedup": round(t8 / t32, 2)}}
            )
        )


if __name__ == "__main__":
    main()
