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


def test_coverage_md_cites_every_registry_query_and_no_phantoms():
    """COVERAGE.md is the audit trail mapping SURVEY §2 + extensions to
    registered queries — it must cite every REGISTRY key and must not
    cite query-shaped names that don't exist (VERDICT r4 item 3)."""
    import re

    from banksy_spark.suite import REGISTRY

    cov = open("COVERAGE.md").read()
    cited = set(re.findall(r"`([a-z0-9_]+)`", cov))
    missing = sorted(set(REGISTRY) - cited)
    assert not missing, f"registered queries missing from COVERAGE.md: {missing}"

    prefixes = tuple(
        p + "_" for p in sorted({k.split("_", 1)[0] for k in REGISTRY})
    )
    phantom = sorted(
        c
        for c in cited
        if c.startswith(prefixes) and "_" in c and c not in REGISTRY
        # non-query helper citations (functions/files) are fine unless
        # they look exactly like a query name family member
        and not re.search(rf"[a-z_]*{c}[a-z_]*\(", cov)
    )
    assert not phantom, f"COVERAGE.md cites unregistered query names: {phantom}"
