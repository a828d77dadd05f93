#!/usr/bin/env python
"""Plan audit: for every registered query, count the physical-plan
operators that matter at scale (exchanges, joins by strategy, scans,
windows) and flag anti-patterns (CartesianProduct, SortMergeJoin where
a dimension should broadcast). Writes PLANS.md.

Usage: python tools/plan_audit.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

# A Window planned as Sort-over-Exchange-SinglePartition serializes its
# whole input through ONE task — the canonical 100 TB scale-killer.
# The audit flags every occurrence; queries listed here are the audited
# exceptions where the window input is BOUNDED BY CONSTRUCTION (a
# preceding aggregation to a fixed, data-size-independent grain), with
# the reason recorded.  Anything else with a count > 0 fails the audit.
GLOBAL_WINDOW_RE = re.compile(
    r"Window[^\n]*\n[^\n]*Sort[^\n]*\n[^\n]*Exchange SinglePartition"
)
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    "o_global_rownum": "window runs over the 64-row bucket-offset table "
    "(the pedagogical two-phase decomposition itself; operators/"
    "ordinals.py is the reusable form and computes offsets driver-side)",
    "ml_lift_gains": "running-gains windows over the 10 POST-AGG decile "
    "rows (fixed grain; the fact-scale NTILE is ordinal-decomposed)",
    "a_ddsketch_log2": "window over the sketch's ≤64 bit-length buckets "
    "(bounded by bigint width, independent of data size)",
    "a_survival_km": "suffix-sum over |distinct lifetime days| rows — "
    "bounded by the calendar observation window, not the event count "
    "(the curve itself is that small by definition)",
    "ml_group_sequential": "cumulative window over the <= 5 POST-AGG "
    "interim-look rows — bounded by the alpha-spending schedule K, "
    "not data size (same class as ml_lift_gains' decile frame)",
    "ml_bootstrap_poisson_ci": "order-statistic ranking window over "
    "the <= 200 POST-AGG replicate rows — bounded by the replicate "
    "constant B, not data size (same class as ml_lift_gains' decile "
    "frame)",
    "a_esd_outliers": "three per-round max-deviate ranking windows "
    "over the calendar-bounded daily series (<= 31 rows) — bounded "
    "by the calendar, not the event count (a_changepoint_binseg's "
    "class)",
}


def global_windows(plan: str) -> int:
    return len(GLOBAL_WINDOW_RE.findall(plan))


# A Window partitioned ONLY by a fixed-low-cardinality key (3 return
# flags, 5 priorities, a handful of languages/sources/segments) is the
# gwin hazard divided by a small constant: at 100 TB each group still
# lands on ONE task.  The audit flags every Window node whose partition
# spec consists solely of these columns, EXCEPT windows Spark protects
# with WindowGroupLimit (rank<=K pushdown: per-map-partition top-K
# bounds what any task sorts).  Remaining hits must be allowlisted with
# a bounded-grain reason.
LOWCARD_COLS = {
    "lang",
    "source",
    "l_returnflag",
    "flag",
    "o_orderpriority",
    "pri",
    "priority",
    "seg",
    "part",
    "o_orderstatus",
    "l_linestatus",
    "split",
}
KEYED_WINDOW_ALLOWLIST: dict[str, str] = {
    "a_histogram_quantiles": "cumulative window runs over the 64-bin "
    "per-flag histogram (bounded by the bin constant, not the fact)",
    "llm_sample_pps": "lang-keyed prefix-offset window runs over the "
    "per-(lang,bucket) weight DIRECTORY (≤ |langs|·256 rows, bounded "
    "by the bucket constant, not the corpus); the corpus-side window "
    "is keyed (lang, bucket)",
    "a_changepoint_binseg": "windows run over the per-(priority, day) "
    "daily series — bounded by the calendar, not the event count",
    "w_control_chart": "trailing 8-row window over the same calendar-"
    "bounded daily series",
    "w_bollinger_bands": "trailing k-row window over the daily series",
    "w_cusum_changepoint": "ordered fold over the daily series",
    "w_holt_linear": "ordered fold over the daily series",
    "w_peak_detection": "lead/lag over the daily series",
    "w_linear_interpolate": "gap interpolation over the daily series",
    "w_rolling_median_7": "trailing 7-row window over the daily series",
    "o_compaction_plan": "bin-packing cursor over the file MANIFEST "
    "(~10^6 listing rows at 100 TB), not the data",
    "stream_late_rows_audit": "per-source-partition watermark replay — "
    "the sequential-by-construction semantics of a streaming source "
    "partition; partition count scales with the source, not a constant",
    "a_seasonal_anomaly": "windows over the per-(dow, hour) 168-cell "
    "seasonal profile / daily series",
    "w_gap_alerts": "lag over the daily series",
    "a_runs_test": "median rank + lag over the per-(priority, day) "
    "daily series — calendar-bounded",
}


def keyed_windows(plan: str) -> int:
    """Window nodes whose partition spec is non-empty and entirely
    low-cardinality columns, minus WindowGroupLimit-protected specs."""
    protected: set[tuple[str, ...]] = set()
    hits = []
    for line in plan.split("\n"):
        stripped = line.lstrip(" +-:*")
        brackets = re.findall(r"\[([^\]]*)\]", line)
        def names(spec: str) -> tuple[str, ...]:
            out = []
            for part in spec.split(","):
                part = part.strip()
                m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)#\d+", part)
                out.append(m.group(1) if m else part or "<expr>")
            return tuple(sorted(out))
        if stripped.startswith("WindowGroupLimit") and brackets:
            protected.add(names(brackets[0]))
        elif stripped.startswith("Window ") and len(brackets) >= 3:
            # a keyed window prints [funcs],[partSpec],[orderSpec]; a
            # GLOBAL window prints only [funcs],[orderSpec] — with two
            # brackets, brackets[1] is the ORDER spec, and reading it as
            # a partition spec double-flags global windows (once as
            # gwin, once here) whenever the order column is
            # low-cardinality-named
            part_spec = names(brackets[1])
            if part_spec and all(n in LOWCARD_COLS for n in part_spec):
                hits.append(part_spec)
    return sum(1 for h in hits if h not in protected)


def visible(plan: str) -> str:
    """Strip ``InMemoryRelation`` stored-build subtrees (same rule as
    tests/conftest.visible_plan): a persisted frame's build plan prints
    inline under EVERY InMemoryTableScan consumer, so raw scan/exchange
    counts multiply once-executed (or zero-executed, on cache hit) work
    by its consumer count — a_tile_pyramid's single fact scan read as 3
    before this (round 12)."""
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/root/repo/PLANS.md")
    args = ap.parse_args()

    from banksy_spark.session import get_spark, release_caches
    from banksy_spark.suite import REGISTRY

    spark = get_spark("plan-audit")
    rows = []
    for name, spec in sorted(REGISTRY.items()):
        # building ordinal plans runs bounded driver jobs that persist
        # directory frames — release them per query (see tools/check.py)
        release_caches(spark)
        df = spec.fn(spark, args.sf)
        plan = visible(df._jdf.queryExecution().executedPlan().toString())
        rows.append(
            {
                "name": name,
                "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
                "bhj": plan.count("BroadcastHashJoin"),
                "bnlj": plan.count("BroadcastNestedLoopJoin"),
                "smj": plan.count("SortMergeJoin"),
                "cartesian": plan.count("CartesianProduct"),
                "scans": plan.count("FileScan parquet"),
                "windows": plan.count("Window"),
                "gwin": global_windows(plan),
                "kwin": keyed_windows(plan),
                # executedPlan().toString() renders codegen spans as
                # "*(n)" prefixes, not the word WholeStageCodegen —
                # count DISTINCT span ids (the literal-string count
                # read 0 for every query through round 11)
                "wsc": len(set(re.findall(r"\*\((\d+)\)", plan))),
            }
        )

    lines = [
        "# PLANS — physical-plan audit of every suite query",
        "",
        f"Generated by `tools/plan_audit.py` at sf dir `{args.sf}`.",
        "Counts exclude `InMemoryRelation` stored-build subtrees (a",
        "persisted frame's build prints under every consumer; it executes",
        "at most once — same rule as tests/conftest.visible_plan).",
        "The codegen column counts `*(n)` span ids; AQE-wrapped plans",
        "(anything with an exchange) print `AdaptiveSparkPlan` without",
        "span annotations before execution, so it is meaningful only for",
        "single-stage plans — tests/test_plans.py asserts codegen",
        "directly on executed plans where it matters.",
        "Columns: hash-partition exchanges (shuffles), joins by strategy,",
        "parquet scans, window operators, single-partition global windows",
        "(gwin — Sort over Exchange SinglePartition under a Window; the",
        "100 TB scale-killer, must be 0 outside the audited bounded-input",
        "allowlist below), low-cardinality-keyed windows (kwin — Window",
        "partitioned ONLY by a fixed-few-values key and not protected by",
        "a WindowGroupLimit top-K pushdown: the same serialized-sort",
        "hazard divided by a small constant; must be 0 outside its",
        "bounded-grain allowlist), whole-stage-codegen spans.",
        "",
        "| query | shuffles | BHJ | BNLJ | SMJ | cartesian | scans | windows | gwin | kwin | codegen |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            "| {name} | {exchanges} | {bhj} | {bnlj} | {smj} | {cartesian} | {scans} "
            "| {windows} | {gwin} | {kwin} | {wsc} |".format(**r)
        )
    n_cart = sum(r["cartesian"] for r in rows)
    offenders = [
        r["name"]
        for r in rows
        if r["gwin"] > 0 and r["name"] not in GLOBAL_WINDOW_ALLOWLIST
    ]
    n_gwin = sum(r["gwin"] for r in rows)
    k_offenders = [
        r["name"]
        for r in rows
        if r["kwin"] > 0 and r["name"] not in KEYED_WINDOW_ALLOWLIST
    ]
    n_kwin = sum(r["kwin"] for r in rows)
    lines += [
        "",
        f"**Summary:** {len(rows)} queries; total cartesian products: {n_cart} "
        "(must be 0); every dimension join resolves to a broadcast strategy "
        "(exception by design: j_salted_skew_join hints the broadcast OFF to "
        "exercise the salted shuffle-join fallback).",
        "",
        f"**Global windows:** {n_gwin} occurrences across "
        f"{sum(1 for r in rows if r['gwin'])} queries; "
        f"non-allowlisted offenders: {offenders or 'NONE'} (must be none). "
        "Audited bounded-input exceptions:",
        "",
    ]
    for q, why in sorted(GLOBAL_WINDOW_ALLOWLIST.items()):
        lines.append(f"- `{q}` — {why}")
    lines += [
        "",
        f"**Low-cardinality-keyed windows:** {n_kwin} occurrences across "
        f"{sum(1 for r in rows if r['kwin'])} queries; non-allowlisted "
        f"offenders: {k_offenders or 'NONE'} (must be none; rank<=K "
        "windows protected by WindowGroupLimit pushdown are excluded "
        "structurally). Audited bounded-grain exceptions:",
        "",
    ]
    for q, why in sorted(KEYED_WINDOW_ALLOWLIST.items()):
        lines.append(f"- `{q}` — {why}")
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(
        f"wrote {args.out}: {len(rows)} queries, cartesian={n_cart}, "
        f"global-window offenders={offenders}, "
        f"keyed-window offenders={k_offenders}"
    )
    if offenders or k_offenders:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
