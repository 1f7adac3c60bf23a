"""Dump full ``explain("formatted")`` output for bench queries.

Writes ``plans/<round>/<query>_<suffix>.txt`` for every headline
registry query plus bench.py's EXTRA_BENCH rows — the before/after
plan evidence an optimization round commits alongside its bench
numbers.

Usage: python tools/plan_dump.py <round> <suffix> [query ...]
e.g.   python tools/plan_dump.py r14 before
       python tools/plan_dump.py r14 after dedup_keep_canonical
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    rnd, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)

    import importlib.util

    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    spec = importlib.util.spec_from_file_location("bench", bench_path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    spark = get_spark("plan-dump")
    runners = {n: s.fn for n, s in REGISTRY.items() if s.headline}
    runners.update({n: getattr(bench, n) for n in bench.EXTRA_BENCH})
    # named non-headline registry queries are dumpable on request (r15:
    # the optimization targets include oracle-gate-only paths like the
    # kmeans trainers); the default no-args sweep stays headline+extra
    for n in only - set(runners):
        if n in REGISTRY:
            runners[n] = REGISTRY[n].fn
    for name, fn in runners.items():
        if only and name not in only:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
