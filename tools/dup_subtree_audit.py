"""Registry-wide duplicate-subtree audit (r15, VERDICT item 5).

Round 14's biggest win class was lazy-reuse re-execution: a DataFrame
consumed twice recomputes its whole subtree per consumer (18-scan
SemDeDup, 6-scan funnel, the double pipeline under repartitionByRange).
This tool sweeps EVERY registry query's physical plan and ranks by the
tell-tale signal: the same parquet table scanned more times than the
query has distinct tables.

Columns: scans = parquet scan operators in the plan; tables = distinct
parquet paths; ratio = scans/tables (1.0 = every table read once);
dup_scans = scans - tables (extra full reads of some table); plan_kb =
formatted-plan size (a proxy for repeated expression subtrees).

A ratio > 1 is a LEAD, not a verdict — re-scanning a pruned sub-second
table twice is often cheaper than a checkpoint job (the r14 negative
experiments), and self-joins legitimately scan twice. Rank, then
measure the top offenders individually.

Usage: python tools/dup_subtree_audit.py [sf_dir] > plans/r15/dup_subtree_audit.md
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402

SCAN = re.compile(r"Scan parquet\b")
PATH = re.compile(r"Location:.*?\[([^\]]*)\]|file:[^\s,\]]*?/([a-z0-9_]+\.parquet)")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dup-subtree-audit")
    rows = []
    skipped = []
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # streaming-only gates etc.
            skipped.append((name, str(exc).splitlines()[0][:80]))
            continue
        scans = len(SCAN.findall(plan))
        tables = set(re.findall(r"file:[^\s,\]]*?/([a-zA-Z0-9_.-]+\.parquet)", plan))
        n_tables = max(1, len(tables))
        rows.append(
            (
                scans / n_tables,
                scans - len(tables),
                scans,
                len(tables),
                len(plan) / 1024,
                name,
            )
        )
    rows.sort(reverse=True)
    print("# Duplicate-subtree audit — all registry queries")
    print()
    print(f"Plans built at `{sf_dir}` (shapes are SF-independent).")
    print(f"{len(rows)} queries audited, {len(skipped)} skipped.")
    print()
    print("| query | scans | tables | ratio | dup scans | plan KB |")
    print("|---|---|---|---|---|---|")
    for ratio, dup, scans, tables, kb, name in rows:
        if scans == 0:
            continue
        print(f"| {name} | {scans} | {tables} | {ratio:.1f} | {dup} | {kb:.0f} |")
    if skipped:
        print()
        print("Skipped (no batch plan):")
        for name, why in skipped:
            print(f"- {name}: {why}")


if __name__ == "__main__":
    main()
