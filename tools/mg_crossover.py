"""Misra-Gries vs exact top-k: the vocabulary crossover, measured.

This measurement is WHY the former `heavy_hitters_sketch_bench` row
(~1.8-2.1× its exact twin, straddling the 2× bar) was demoted to
correctness-gate-only in round 7 (`heavy_hitters_sketch` stays; the
decision is recorded in BASELINE.md): the probe below proves no
single-node vocabulary will ever invert that race, so any local twin
re-shape that did would be a strawman. SHUFFLE.md argues the regimes
from row counts (sketch traffic CAPACITY-bounded, exact traffic
VOCABULARY-bounded). This tool
probes the claim as a single-node timing curve: a synthetic stream
with FIXED row count and GROWING vocabulary — 50% of rows over 100
hot terms (so a true exact top-10 exists and clears the MG threshold
at the chosen capacity; verified via check_exact on the smallest V),
the rest uniform over V tail terms — timed through both paths at
V = 1e3 … 1e6.

MEASURED RESULT (the honest one): on one node the exact path wins at
EVERY vocabulary that fits (~0.6-0.7 s flat to V = 1e6, sketch ~2×),
because a local "shuffle" of V rows moves through memory at
scan speed while the sketch pays an O(N) Arrow pass regardless of V.
The sketch's regime is therefore NOT single-node CPU at any
vocabulary — it is the cluster boundary, where the exact path's
V-sized exchange becomes network traffic and a V-sized reducer hash
table, and the sketch's exchange stays partitions × capacity
(SHUFFLE.md's row counts are the transferable evidence: those scale
with the deployment; single-node seconds do not). This probe exists
so that boundary is stated from measurement, not vibes.

Usage: python tools/mg_crossover.py [N_rows] [V ...]
Prints one markdown row per V for BASELINE.md/SHUFFLE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.operators.sketches import mg_exact_topk  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402

CAPACITY = 256
K = 10
HOT = 100  # hot terms carrying 50% of rows


def stream(spark, n: int, v: int):
    """Deterministic mixture stream: even ids → one of HOT hot terms,
    odd ids → uniform over a V-term tail. xxhash64 spreads ids so hot
    term frequencies are near-equal (each ≈ n/(2·HOT), comfortably
    above n/(CAPACITY+1) for the exactness guarantee)."""
    base = spark.range(n)
    h = F.abs(F.xxhash64("id"))
    term = F.when(
        F.col("id") % 2 == 0, F.concat(F.lit("hot"), (h % HOT).cast("string"))
    ).otherwise(F.concat(F.lit("t"), (h % v).cast("string")))
    return base.select(F.lit("src").alias("k"), term.alias("item"))


def exact_topk(df):
    counts = df.groupBy("k", "item").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("k").orderBy(F.col("n").desc(), F.col("item").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= K)
    )


def timed(fn) -> float:
    fn().write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args else 2_000_000
    vs = [int(a) for a in args[1:]] or [1_000, 10_000, 100_000, 1_000_000]
    spark = get_spark("mg-crossover")
    # prove both paths agree (and the MG threshold holds) once, at the
    # smallest V — the timing loop then times identical-result plans
    df0 = stream(spark, n, vs[0])
    got = {
        (r["rank"], r["item"], r["n"])
        for r in mg_exact_topk(
            df0, "k", "item", k=K, capacity=CAPACITY, check_exact=True
        ).collect()
    }
    want = {(r["rank"], r["item"], r["n"]) for r in exact_topk(df0).collect()}
    assert got == want, "sketch and exact top-k disagree — fixture broken"
    print(f"rows fixed at {n:,}; capacity {CAPACITY}; k {K}; hot terms {HOT}")
    print("| vocabulary V | exact s | sketch s | sketch/exact |")
    print("|---|---|---|---|")
    for v in vs:
        df = stream(spark, n, v)
        t_exact = timed(lambda: exact_topk(df))
        t_sketch = timed(
            lambda: mg_exact_topk(df, "k", "item", k=K, capacity=CAPACITY)
        )
        print(
            f"| {v:,} | {t_exact:.2f} | {t_sketch:.2f} | "
            f"{t_sketch / t_exact:.2f} |"
        )


if __name__ == "__main__":
    main()
