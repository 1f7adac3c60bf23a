"""Full-registry soak: execute EVERY registry query at a larger scale
factor than the correctness gate uses (default sf0.1 — 10× the oracle
SF) and record wall-clock per query.

The oracle gate proves VALUES at sf0.01; the bench proves headline
THROUGHPUT at sf0.1; this closes the gap between them — every
non-headline battery (text, sampling, multimodal, streaming, IO
round-trips) also executes at the bigger SF, so a scale-sensitive
landmine (accidental quadratic HOF, driver collect that grows with
data, state blow-up) surfaces here instead of on a cluster.

Usage: python tools/soak.py [sf_dir] → one JSON line
  {"sf": ..., "total_sec": ..., "queries": {name: sec},
   "slowest": [[name, sec] ...]}

Queries run in registry order, one pass, noop sink (streaming queries
execute their real bounded runs internally). No best-of-N — this is a
smoke/soak, not a benchmark; read the bench for ratios.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--rocksdb"]
    rocksdb = "--rocksdb" in sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("soak")
    if rocksdb:
        # run the whole registry with the PRODUCTION state backend
        # pinned (VERDICT r6 item 7): the provider conf is read at
        # streaming-query start, so the 13 streaming gates execute
        # their bounded runs on RocksDB while batch queries ignore it —
        # the soak then measures the state backend a cluster deployment
        # would actually run, not just the pinned-correct unit path.
        from lfb_data_warehouse_spark.plans.streaming_queries import _rocksdb_state

        state_ctx = _rocksdb_state(spark)
    else:
        state_ctx = contextlib.nullcontext()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    # `with`, not a bare __enter__ (r7 ADVICE): the conf override must
    # end with the registry loop, or anything added below would
    # silently run under the overridden state store.
    with state_ctx:
        for name, spec in REGISTRY.items():
            t0 = time.time()
            try:
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                timings[name] = round(time.time() - t0, 2)
            except Exception as e:  # record and continue: a soak maps ALL holes
                failures[name] = str(e)[:200]
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "state_store": "rocksdb" if rocksdb else "default (HDFS-backed)",
                "n_queries": len(timings),
                "n_failures": len(failures),
                "total_sec": round(sum(timings.values()), 1),
                "queries": timings,
                "slowest": slowest,
                "failures": failures,
            }
        )
    )


if __name__ == "__main__":
    main()
