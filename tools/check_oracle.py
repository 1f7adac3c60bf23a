"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__ on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as
views), then compares row count, column names, and values
(order-insensitive, exact — including float bits, since the engine's
aggregates are decimal-exact by design).

Usage: python tools/check_oracle.py [--json OUT] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(rows, columns):
    """Sort columns by name, rows by value; stringify for stable compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(v):
        if v is None:
            return "\x00"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    out = [tuple(key(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from lfb_data_warehouse_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            results[name] = {"ok": False, "error": f"spark: {e}"[:200]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = {"ok": True, "rows": len(s_rows), "rows_only": True}
            print(f"ok   {name}: rows={len(s_rows)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            results[name] = {"ok": False, "error": f"duckdb: {e}"[:200]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if len(s_rows) != len(o_rows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if ok:
            _, sn = normalize(s_rows, s_cols)
            _, on_ = normalize(o_rows, o_cols)
            if sn != on_:
                ok = False
                diffs = [(a, b) for a, b in zip(sn, on_) if a != b]
                print(f"FAIL {name}: {len(diffs)} differing rows; first: ")
                for a, b in diffs[:3]:
                    print(f"   spark:  {a}\n   oracle: {b}")
        if ok:
            print(f"ok   {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
        results[name] = {
            "ok": ok,
            "rows": len(s_rows),
            "oracle_rows": len(o_rows),
            "secs": round(time.time() - t0, 2),
        }

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_ok": len(results) - len(failures),
                 "n_fail": len(failures), "queries": results},
                f, indent=1,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
