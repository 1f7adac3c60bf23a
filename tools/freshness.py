"""Driver-row freshness report — the staleness queue for rotation upkeep.

Reads every committed CORRECTNESS_r*.json, computes each registry
query's most recent driver-green round, and prints:

1. the last-green histogram (the "no row older than N rounds" health
   metric the round-5 verdict tracks),
2. the staleness queue — registry queries ordered oldest-driver-row
   first (ties in registry order), ready to paste into the next
   round's ``_R{N}_RECHECK`` block in plans/rotation.py,
3. names with a driver row but no registry entry (stale artifacts) and
   registry entries with no driver row ever (must go to
   UNCHECKED_PRIORITY).

Run at the START of each round, before editing rotation.py.

Usage: python tools/freshness.py [--queue N]   (N = queue rows to print)
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402


def green(row: dict) -> bool:
    """A driver row counts as green only on an explicit full match.
    hash_match must be literally True (round-7 ADVICE follow-up): a
    missing key is a degraded row — counting it green would let the
    staleness queue be satisfied by a weaker check than the one the
    round goal demands. (Every committed driver row today carries
    hash_match; rows-only checks for oracle-less queries would need a
    deliberate carve-out here, keyed on the registry spec, not on key
    absence.)"""
    return (
        row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def main() -> int:
    n_queue = 60
    if "--queue" in sys.argv:
        n_queue = int(sys.argv[sys.argv.index("--queue") + 1])
    last: dict[str, int] = {}
    rounds = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    for path in rounds:
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        for name, row in json.load(open(path)).items():
            if green(row):
                last[name] = rnd
    latest = int(re.search(r"r(\d+)", rounds[-1].name).group(1)) if rounds else 0
    hist = Counter(last[n] for n in last if n in REGISTRY)
    print(f"registry: {len(REGISTRY)}; driver rounds found: r1..r{latest}")
    print("last-green histogram:", dict(sorted(hist.items())))
    never = [n for n in REGISTRY if n not in last]
    if never:
        print(f"NEVER driver-green ({len(never)}) -> UNCHECKED_PRIORITY:", never)
    orphans = sorted(set(last) - set(REGISTRY))
    if orphans:
        print(f"driver rows with no registry entry ({len(orphans)}):", orphans)
    queue = sorted(
        (n for n in REGISTRY if n in last),
        key=lambda n: (last[n], list(REGISTRY).index(n)),
    )
    print(f"\nstaleness queue (oldest first, top {n_queue}):")
    for n in queue[:n_queue]:
        print(f"  r{last[n]}  {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
