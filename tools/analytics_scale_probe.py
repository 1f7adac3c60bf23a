"""Fact-amplification probe for the entity-collapse analytics gates.

SHUFFLE.md shows the round-5/6 analytics gates (EWMA, rolling anomaly,
RFM, order-gap stats, basket affinity) collapsing the fact table to
entity/day/brand rows BEFORE any ordered or pairwise work; this probe
turns that plan property into a measured curve, the way
scale_linearity.py does for the documents pipeline. Amplify the
orders/lineitem facts ×K in two distinct directions:

- mode "history": o_custkey unchanged — the SAME 15k entities each get
  K× deeper order histories (the grouped-collect / per-entity-window
  stress axis; history_length_audit's HISTORY_CAP contract is the
  guard this exercises: at ×16 the max history is still ~24·16 ≈ 384
  ≪ 10k).
- mode "entities": o_custkey remapped — K× MORE entities with the
  original history depth (the global-window row-count stress axis:
  RFM's NTILE sort and the collapse aggregations grow with entities).

In BOTH modes the day count is unchanged, so anomaly_daily_revenue's
global ordered window stays |days|-sized no matter K — its slope is
the direct measurement of "the window is entity-bounded, not
fact-bounded". Slopes ≪ 1 mean the added facts are absorbed by the
scan + partial aggregation (the shape a 1000-executor scale-up
absorbs by adding executors); a slope near 1 marks the linear
per-fact work (the EWMA fold's history arrays), and anything
super-linear would expose a pair/window blow-up the plan pins missed.

basket_brand_affinity amplifies lineitem (orderkeys remapped → K× more
baskets, same brand mix): pair work per basket is unchanged, so the
distinct-(order, brand) collapse should hold the growth linear.

Usage: python tools/analytics_scale_probe.py [sf_dir] [K ...]
Prints one markdown row per (query, mode, K) for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402

ORDERS_QUERIES = (
    "ewma_customer_spend",
    "anomaly_daily_revenue",
    "rfm_customer_scores",
    "customer_order_gap_stats",
    "history_length_audit",
)


def amplified_orders(spark, sf_dir: str, k: int, mode: str, base: str) -> str:
    out = os.path.join(base, f"{mode}_x{k}")
    o = load_table(spark, sf_dir, "orders")
    rep = spark.range(k).withColumnRenamed("id", "rep")
    cust = (
        (F.col("o_custkey") * k + F.col("rep"))
        if mode == "entities"
        else F.col("o_custkey")
    )
    amp = o.crossJoin(rep).select(
        (F.col("o_orderkey") * k + F.col("rep")).alias("o_orderkey"),
        cust.alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    amp.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "orders.parquet"))
    return out


def amplified_lineitem(spark, sf_dir: str, k: int, base: str) -> str:
    out = os.path.join(base, f"baskets_x{k}")
    li = load_table(spark, sf_dir, "lineitem")
    rep = spark.range(k).withColumnRenamed("id", "rep")
    amp = li.crossJoin(rep).select(
        (F.col("l_orderkey") * k + F.col("rep")).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    ).drop("rep")
    amp.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "lineitem.parquet"))
    # part is the broadcast dimension — copied as-is
    load_table(spark, sf_dir, "part").write.mode("overwrite").parquet(
        os.path.join(out, "part.parquet")
    )
    return out


def timed(fn, spark, d) -> float:
    fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ks = [int(a) for a in args[1:]] or [1, 4, 16]
    base = os.environ.get("SCALE_PROBE_TMP", "/tmp/lfb_analytics_probe")
    spark = get_spark("analytics-scale")
    hi, lo = ks[-1], ks[0]
    print("| query | mode | " + " | ".join(f"x{k} s" for k in ks) + " | slope |")
    print("|---|---|" + "---|" * (len(ks) + 1))
    for mode in ("history", "entities"):
        dirs = {k: amplified_orders(spark, sf_dir, k, mode, base) for k in ks}
        for name in ORDERS_QUERIES:
            fn = REGISTRY[name].fn
            times = [timed(fn, spark, dirs[k]) for k in ks]
            slope = (times[-1] / times[0]) / (hi / lo)
            cells = " | ".join(f"{t:.2f}" for t in times)
            print(f"| {name} | {mode} | {cells} | {slope:.2f} |")
    dirs = {k: amplified_lineitem(spark, sf_dir, k, base) for k in ks}
    fn = REGISTRY["basket_brand_affinity"].fn
    times = [timed(fn, spark, dirs[k]) for k in ks]
    slope = (times[-1] / times[0]) / (hi / lo)
    cells = " | ".join(f"{t:.2f}" for t in times)
    print(f"| basket_brand_affinity | baskets | {cells} | {slope:.2f} |")


if __name__ == "__main__":
    main()
