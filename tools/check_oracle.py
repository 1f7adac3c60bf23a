"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__ on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as
views), then compares row count, column names, and values.

CRITICAL: both sides are canonicalized THROUGH PANDAS, exactly like the
driver (Spark ``toPandas()`` / DuckDB ``.df()`` → sort columns by name
→ ``sort_values`` over all columns → per-cell stringify). That is what
makes this a faithful mirror: DuckDB HUGEINT becomes pandas float64
(so an un-CAST ``SUM(int)`` oracle fails here the same way it fails on
the driver), and list-typed columns crash pandas' sort (so an
array-valued output fails here before the driver ever sees it). A
``fetchall()`` tuple compare — the round-1/2 implementation — can
never catch either hazard class; see VERDICT.md round 2, "What's
wrong" items 1-5.

Usage: python tools/check_oracle.py [--json OUT] [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs the Spark side in a PLAIN SparkSession (no engine
confs) exactly like the driver does — the full-fidelity rehearsal;
the default engine session is faster for iteration.
"""

from __future__ import annotations

import datetime
import json
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _cell(v) -> str:
    """Stringify one pandas cell, dtype-sensitively.

    ``str(np.int64(557)) == '557'`` but ``str(np.float64(557.0)) ==
    '557.0'`` — the driver's hash distinguishes those, so we must too.
    All NULL spellings (None / NaN / NaT / pd.NA) collapse to one
    sentinel because pandas itself collapses them per-dtype.

    Datetime-likes normalize through pd.Timestamp: Spark DATE arrives
    as datetime.date objects while DuckDB DATE arrives as datetime64
    (midnight) — the driver treats those as EQUAL (date_spine_orders
    was driver-green in round 1 with exactly that dtype split), so the
    mirror must too.
    """
    try:
        if pd.isna(v):
            return "\x00<NA>"
    except (TypeError, ValueError):  # arrays/lists: isna is elementwise
        pass
    if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
        return str(pd.Timestamp(v))
    return str(v)


def canon(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """Driver-equivalent canonical form: sorted columns, sorted rows,
    stringified cells. Raises (like the driver) on unsortable columns,
    e.g. lists."""
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    if len(df):
        df = df.sort_values(cols, kind="mergesort")
    rows = [
        tuple(_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return cols, rows


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    vanilla = False
    if argv and argv[0] == "--vanilla":
        vanilla = True
        argv = argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    else:
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
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            results[name] = {"ok": False, "error": f"spark: {e}"[:200]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = {"ok": True, "rows": len(spdf), "rows_only": True}
            print(f"ok   {name}: rows={len(spdf)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            results[name] = {"ok": False, "error": f"duckdb: {e}"[:200]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if len(spdf) != len(opdf):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(spdf)} oracle={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            ok = False
            print(
                f"FAIL {name}: columns spark={sorted(spdf.columns)}"
                f" oracle={sorted(opdf.columns)}"
            )
        if ok:
            try:
                _, sn = canon(spdf)
                _, on_ = canon(opdf)
            except Exception as e:  # driver-equivalent canonicalizer crash
                failures.append(name)
                results[name] = {"ok": False, "error": f"canon: {e}"[:200]}
                print(f"FAIL {name}: canonicalizer crash (driver would too): {e}")
                continue
            if sn != on_:
                ok = False
                diffs = [(a, b) for a, b in zip(sn, on_) if a != b]
                print(f"FAIL {name}: {len(diffs)} differing rows; first: ")
                for a, b in diffs[:3]:
                    print(f"   spark:  {a}\n   oracle: {b}")
        if ok:
            print(f"ok   {name}: rows={len(spdf)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
        results[name] = {
            "ok": ok,
            "rows": len(spdf),
            "oracle_rows": len(opdf),
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
