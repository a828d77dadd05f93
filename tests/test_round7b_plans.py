"""Plan assertions for the round-7 batch B queries (TPC-H Q3)."""

from __future__ import annotations

import re


def _plan(spark, name: str) -> str:
    from banksy_spark.suite import REGISTRY
    from tests.conftest import SF_SMOKE

    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_top10_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "j_q3_shipping_priority")
    # the global "ORDER BY revenue LIMIT 10" must be per-partition
    # heaps + a 10-row driver merge, never a single-task global sort
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"Sort[^\n]*\n[^\n]*Exchange SinglePartition", plan)
    # customer is a broadcast semi-filter; the only shuffle join key is
    # the two facts' orderkey
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # both date filters reach their scans (pushed past the joins)
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    assert len(scans) == 3
