"""The driver contract: registry populated, entry() runs, names align."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_suite_imports_and_is_populated():
    from banksy_spark.suite import REGISTRY

    assert len(REGISTRY) >= 60
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.note, f"{name} has no provenance note"


def test_entry_contract(spark):
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "game_id", "best0", "best1", "arb_sum", "d0", "d1", "stake1", "margin_pct",
    ]


def test_every_query_runs_at_smoke_sf(spark):
    """Every registered query executes (schema resolves, no runtime
    error) at sf0.001. Value parity vs DuckDB is tools/check.py's job;
    this guards against queries that only work at one scale."""
    from banksy_spark.suite import REGISTRY

    for name, spec in REGISTRY.items():
        n = spec.fn(spark, SF_SMOKE).count()
        assert n >= 0, name
