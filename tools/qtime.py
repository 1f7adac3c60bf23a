"""Time individual bench queries in isolation (noop sink, warm).

Mirrors bench.py's methodology for ONE (or a few) queries: sf0.001
warmup pass first (codegen/Arrow-pool warm), then N timed noop-sink
runs at $SPARK_GRAFT_SF_DIR, reporting every rep and the min. Use for
the tight optimize-measure loop; the full bench.py run stays the
round's committed evidence.

Usage: python tools/qtime.py [-n reps] query [query ...]
       python tools/qtime.py --naive -n 5 dedup_keep_canonical
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    reps = 3
    use_naive = False
    if "--naive" in args:
        use_naive = True
        args.remove("--naive")
    if "-n" in args:
        i = args.index("-n")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    runners = {n: s.fn for n, s in REGISTRY.items()}
    runners.update({n: getattr(bench, n) for n in bench.EXTRA_BENCH})
    if use_naive:
        naive = bench._load_naive()

    spark = get_spark("qtime")
    spark.range(spark.sparkContext.defaultParallelism * 2).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    try:
        print(f"# loadavg {os.getloadavg()[0]:.2f}")
    except OSError:
        pass
    for name in names:
        fn = naive[name] if use_naive else runners[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        label = f"{name}{' (naive)' if use_naive else ''}"
        print(
            f"{label}: min={min(times):.3f}  "
            + " ".join(f"{t:.3f}" for t in times)
        )


if __name__ == "__main__":
    main()
