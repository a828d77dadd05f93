"""Guard: no registry oracle may emit a DuckDB HUGEINT/UHUGEINT column.

DuckDB's ``SUM`` over an INTEGER column widens to HUGEINT (int128). The
driver's correctness harness hashes rendered values, and HUGEINT renders
differently from Spark's BIGINT — producing hash_match=false on
bitwise-identical results (round-7 verdict: 6 red + 22 latent queries,
all value-exact). Every oracle must CAST such outputs to BIGINT. This
test binds ALL registry oracles (types only — no execution) so a new
oracle with an uncast integer SUM fails CI before the driver sees it.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

BAD = {"HUGEINT", "UHUGEINT"}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_no_hugeint_oracle_outputs(con):
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        flagged = [
            (c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) in BAD
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracles emitting HUGEINT/UHUGEINT (driver hash hazard — wrap in "
        f"CAST(... AS BIGINT)): {offenders}"
    )


def test_no_nested_oracle_output_types(con):
    """Round-11 verdict item 3: the driver's pandas-based canonicalizer
    sorts result columns with ``sort_values``, which factorizes each
    column — and list/struct/map cells are unhashable, so ANY nested
    output column crashes the checker (f_array_hof's ARRAY<DOUBLE>
    head3 was red in R11 despite passing three SF sweeps and ANSI
    probes, because the builder's own checker canonicalizes lists and
    the driver's does not). Rule: every oracle output column must be a
    scalar type — serialize arrays at the boundary (array_join /
    per-element scalar columns) in BOTH engines."""
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        for c, t in zip(rel.columns, rel.types):
            ts = str(t)
            if "[]" in ts or ts.startswith(("STRUCT", "MAP", "LIST", "UNION")):
                offenders.setdefault(name, []).append((c, ts))
    assert not offenders, (
        "nested-typed oracle output columns (the driver's pandas "
        "canonicalizer cannot hash list/struct/map cells — serialize to "
        f"scalars at the boundary, see f_array_hof round 12): {offenders}"
    )


def test_no_decimal_output_exceeding_int64(con):
    """Round-9 verdict item 1: the HUGEINT hash-rendering class also
    covers OUTPUT columns, not just uncast integer SUMs. ml_brier_score
    emitted sq_cents as DECIMAL(38,0) with a value > 2^63-1; DuckDB
    materializes such decimals on an int128 (HUGEINT-backed) path whose
    driver hash rendering differs from Spark's DECIMAL even when the
    values are bit-identical. Rule: no oracle may emit a DECIMAL column
    whose integer-digit capacity (precision - scale) exceeds 18 — i.e.
    whose magnitude can exceed int64. Such columns must be string-routed
    (CAST(... AS VARCHAR) on both engines) or narrowed."""
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        for c, t in zip(rel.columns, rel.types):
            ts = str(t)
            if ts.startswith("DECIMAL"):
                p, s = map(int, ts[ts.index("(") + 1:ts.index(")")].split(","))
                if p - s > 18:
                    offenders.setdefault(name, []).append((c, ts))
    assert not offenders, (
        "oracle DECIMAL outputs whose magnitude can exceed int64 (driver "
        "HUGEINT hash hazard — string-route with CAST(... AS VARCHAR) on "
        f"both engines, see ml_brier_score): {offenders}"
    )


def _paren_span(sql: str, open_idx: int) -> tuple[int, int]:
    """[open_idx, close] span of the balanced paren starting there."""
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return (open_idx, i)
    return (open_idx, len(sql))


def test_transcendental_oracle_outputs_are_quantized():
    """ln/exp are transcendental — no IEEE correct-rounding guarantee, and
    Spark (StrictMath/fdlibm) vs DuckDB (glibc libm) were measured to
    disagree by 1 ulp (ml_mutual_info's grid, arg 0x3ff2d69b208d768e).
    Any oracle emitting them must quantize (ROUND(..., n) or a DECIMAL
    cast) so ulp-level disagreement can't reach the driver's value hash.
    sqrt and the four arithmetic ops ARE correctly rounded — exempt.

    Checked PER OCCURRENCE (round-8 ADVICE): every ln/exp call site
    must sit inside an enclosing ROUND(...) or CAST(... AS DECIMAL)
    span — an oracle with one quantized ln and a second bare one no
    longer slips through on the file-level grep.
    """
    import re

    offenders = []
    for name, sql in entry.oracle_sql().items():
        calls = list(re.finditer(r"\b(ln|exp)\s*\(", sql, re.I))
        if not calls:
            continue
        spans = []
        for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
            spans.append(_paren_span(sql, m.end() - 1))
        for m in re.finditer(r"\bCAST\s*\(", sql, re.I):
            span = _paren_span(sql, m.end() - 1)
            if re.search(r"\bAS\s+DECIMAL\b", sql[span[0]:span[1]], re.I):
                spans.append(span)
        for c in calls:
            if not any(lo <= c.start() <= hi for lo, hi in spans):
                offenders.append((name, sql[c.start():c.start() + 40]))
    assert not offenders, (
        f"unquantized transcendental call sites in oracles: {offenders}"
    )
