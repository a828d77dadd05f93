"""Shared pytest fixtures: one session-scoped SparkSession."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def visible_plan(plan: str) -> str:
    """Strip ``InMemoryRelation`` stored-build subtrees from a plan
    string.  A persisted directory (ordinals' ``materialize_directory``)
    prints its build plan inline under every ``InMemoryRelation`` node,
    so naive scan/exchange counts double-count work that executes at
    most once (and zero times on cache hits)."""
    out: list[str] = []
    skip_prefix: int | None = None
    for line in plan.splitlines():
        prefix = len(line) - len(line.lstrip(" :+-"))
        if skip_prefix is not None:
            if prefix > skip_prefix:
                continue
            skip_prefix = None
        if "InMemoryRelation" in line:
            skip_prefix = prefix
            continue
        out.append(line)
    return "\n".join(out)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from banksy_spark.session import get_spark

    warehouse = tmp_path_factory.mktemp("warehouse")
    spark = get_spark(
        "banksy-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _release_persisted_frames(request):
    """Unpersist everything a test's queries cached (round-8 verdict
    polish: suite queries persist shared intermediates — pagerank's
    edges/degree, MinHash signature frames — and, returning lazy
    DataFrames, cannot unpersist them in-function without killing the
    cache before the caller's action). bench.py and tools/check.py
    release_caches per query; this gives the pytest session the same
    no-leak guarantee. release_caches (banksy_spark.session) also
    drains the persistent-RDD registry, which holds the localCheckpoint
    RDDs (graph.py lineage cuts) that catalog.clearCache cannot see."""
    yield
    if "spark" in request.fixturenames:
        from banksy_spark.session import release_caches

        release_caches(request.getfixturevalue("spark"))
