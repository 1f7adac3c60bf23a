"""Hot-key crossover measurement for the ``salted_agg_events`` row.

The bench row has trended 1.6-2.0x its single-exchange naive twin for
five rounds and crossed 2x in the driver's BENCH_r11 run. This tool
answers the adjudication question the round-11 verdict posed: is there
an amplification of the hot key at which the unsalted plan's single
reducer inverts the ratio — or is the salted plan's second exchange
pure overhead at EVERY scale for these measures?

The physics says the latter, and the measurement is the proof: for
ALGEBRAIC measures (count/sum/min/max) Spark's map-side partial
aggregation is itself the skew insurance — each map task pre-combines
the hot key to ONE partial row, so the "hot" reducer receives
n_map_tasks tiny rows no matter how many input rows the key holds.
Amplifying the hot key makes both plans' SCAN grow identically while
the naive plan's shuffle stays ~n_tasks x n_keys rows; the salted
plan just pays a second (tiny) exchange and a 16x wider phase-1 hash.
Expected curve: ratio flat >= 1 forever, no crossover.

The second table races the shape where a two-phase salted plan IS the
insurance: a HOLISTIC aggregate (collect_set-based exact distinct-user
count) whose partial state is proportional to the key's value count,
so the naive plan's one hot reducer must merge every map task's set
for the hot key while the salted plan spreads that merge over 16
reducers and only flatten-dedups 16 pre-shrunk arrays at the end.
(This is the composition documented in operators/skew.py for measures
outside salted_agg's count/sum/min/max algebra.)

Prints one markdown table per race, suitable for BASELINE.md.

Usage: python tools/skew_crossover.py [sf_dir] [A ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.functions.exact import (  # noqa: E402
    scale_to_long,
    unscale,
)
from lfb_data_warehouse_spark.operators.skew import (  # noqa: E402
    salt_column,
    salted_agg,
)
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402

HOT_KEY = "view"


def staged_amplified(spark, sf_dir: str, a: int, base: str) -> str:
    """events with the HOT_KEY rows replicated xA (event_ids re-keyed,
    user/value distributions preserved) — one key holding up to
    a/(a+4) of all rows, the pathological shape salting targets."""
    out = os.path.join(base, f"x{a}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        events = load_table(spark, sf_dir, "events")
        cold = events.filter(F.col("event_type") != HOT_KEY)
        hot = events.filter(F.col("event_type") == HOT_KEY)
        amp = hot.crossJoin(
            spark.range(a).withColumnRenamed("id", "rep")
        ).select(
            (F.col("event_id") * a + F.col("rep")).alias("event_id"),
            # distinct users scale WITH the hot key so the holistic
            # race's per-key state actually grows (else collect_set's
            # map-side dedup caps the merge at the original 1.5k users)
            (F.col("user_id") * a + F.col("rep")).alias("user_id"),
            *[c for c in events.columns if c not in ("event_id", "user_id")],
        )
        cold.unionByName(amp).repartition(32).write.mode("overwrite").parquet(out)
    return out


def _measures():
    return [
        ("value", "count", "event_count"),
        ("value_s", "sum", "total_s"),
        ("value", "min", "min_value"),
        ("value", "max", "max_value"),
    ]


def run_salted(spark, src: str) -> float:
    t0 = time.time()
    ev = spark.read.parquet(src).withColumn(
        "value_s", scale_to_long(F.col("value"), "decimal(18,4)")
    )
    out = salted_agg(ev, ["event_type"], _measures(), "event_id", 16)
    out.select(
        "event_type",
        F.col("event_count").cast("long"),
        unscale(F.col("total_s"), "decimal(18,4)").alias("total_value"),
        "min_value",
        "max_value",
    ).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_naive(spark, src: str) -> float:
    t0 = time.time()
    ev = spark.read.parquet(src).withColumn(
        "value_s", scale_to_long(F.col("value"), "decimal(18,4)")
    )
    out = ev.groupBy("event_type").agg(
        F.count("value").alias("event_count"),
        F.sum("value_s").alias("total_s"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    out.select(
        "event_type",
        F.col("event_count").cast("long"),
        unscale(F.col("total_s"), "decimal(18,4)").alias("total_value"),
        "min_value",
        "max_value",
    ).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_holistic_salted(spark, src: str) -> float:
    """Exact distinct users per type via the two-phase salted shape:
    per-(key, salt) collect_set (16-way parallel dedup of the hot
    key's users), then flatten + array_distinct over <=16 pre-shrunk
    arrays per key. Output-invariant vs the naive collect_set."""
    t0 = time.time()
    ev = spark.read.parquet(src)
    partial = ev.withColumn("_salt", salt_column("user_id", 16)).groupBy(
        "event_type", "_salt"
    ).agg(F.collect_set("user_id").alias("users"))
    out = partial.groupBy("event_type").agg(
        F.size(
            F.array_distinct(F.flatten(F.collect_list("users")))
        ).alias("n_users")
    )
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_holistic_naive(spark, src: str) -> float:
    t0 = time.time()
    ev = spark.read.parquet(src)
    out = ev.groupBy("event_type").agg(
        F.size(F.collect_set("user_id")).alias("n_users")
    )
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def race(spark, srcs, engine_fn, naive_fn, label: str) -> None:
    print(f"\n### {label}")
    print("| total rows | hot-key rows | salted s | naive s | ratio |")
    print("|---|---|---|---|---|")
    for a, src in srcs:
        df = spark.read.parquet(src)
        n = df.count()
        nh = df.filter(F.col("event_type") == HOT_KEY).count()
        te = min(engine_fn(spark, src) for _ in range(2))
        tn = min(naive_fn(spark, src) for _ in range(2))
        print(f"| {n:,} | {nh:,} | {te:.2f} | {tn:.2f} | {te / tn:.2f} |")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    amps = [int(a) for a in args[1:]] or [1, 8, 64, 256]
    base = os.environ.get("SKEW_CROSSOVER_TMP", "/tmp/skew_crossover")
    spark = get_spark("skew-crossover")
    srcs = [(a, staged_amplified(spark, sf_dir, a, base)) for a in amps]
    race(spark, srcs, run_salted, run_naive,
         "algebraic measures (the bench row's shape)")
    race(spark, srcs, run_holistic_salted, run_holistic_naive,
         "holistic measure (collect_set distinct users)")


if __name__ == "__main__":
    main()
