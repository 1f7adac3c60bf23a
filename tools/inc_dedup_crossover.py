"""Incremental-vs-full dedup crossover measurement.

The bench row `incremental_dedup_daily` races the daily increment
against a full from-scratch dedup at the SAME corpus size, where both
scale together and job overhead dominates (1.29× at 2k docs). The
actual production claim is different: the DAILY BATCH IS FIXED while
the corpus grows, so the full recompute's cost grows with the corpus
and the increment's cost stays bounded by the batch (+ its
shingle-matched old docs). This tool measures exactly that.

Protocol: the OLD corpus is the sf-dir documents' old slice amplified
×K — each copy gets a distinct `copyN` marker token appended so copies
of DIFFERENT docs still never pair, while copies of the SAME doc do
(clusters grow ×K, like a real corpus accumulating near-dups). The NEW
batch is the sf-dir's unamplified new slice (FIXED SIZE at every K).
Yesterday's labels are materialized to parquet once (untimed — the
state a deployment already has). Then two contenders race, best-of-3:

  full:      pair ALL docs (old∪new) from scratch → components →
             survivors  (the nightly job)
  increment: incremental_jaccard_pairs(old, new) → fold into labels →
             survivors  (the daily job)

Usage: python tools/inc_dedup_crossover.py [sf_dir] [K ...]
Prints one markdown row per K for BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.operators.dedup import (  # noqa: E402
    all_pairs_jaccard,
    incremental_jaccard_pairs,
)
from lfb_data_warehouse_spark.operators.graph import (  # noqa: E402
    connected_components_star,
    incremental_components,
)
from lfb_data_warehouse_spark.plans.datapipe_queries import (  # noqa: E402
    JACCARD_N,
    JACCARD_THRESHOLD,
    NEWBATCH_MOD,
    NEWBATCH_REM,
)
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402


def amplified_old(spark, sf_dir: str, k: int, path: str) -> str:
    """Materialize the ×k old corpus: copy c of doc d keeps d's text
    plus a ` copyc` marker token (same-doc copies stay near-dups,
    cross-doc copies don't pair through the marker because a single
    shared shingle never clears the Jaccard threshold)."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(~(F.col("doc_id") % NEWBATCH_MOD == NEWBATCH_REM))
    out = (
        old.crossJoin(spark.range(k).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" copy"), F.col("rep")).alias("text"),
            "source",
        )
    )
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def survivors(docs, labels):
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    drop = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    canon = (
        labels.filter(F.col("node") == F.col("component"))
        .join(sizes, "component")
        .select(F.col("node").alias("doc_id"), "cluster_size")
    )
    return (
        docs.join(drop, "doc_id", "left_anti")
        .join(canon, "doc_id", "left")
        .select(
            "doc_id", "source",
            F.coalesce("cluster_size", F.lit(1).cast("long")).alias("represents"),
        )
    )


def timed(make_df) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ks = [int(a) for a in args[1:]] or [1, 4, 16]
    spark = get_spark("inc-dedup-crossover")
    base = os.environ.get("INC_CROSSOVER_TMP", "/tmp/inc_dedup_crossover")
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % NEWBATCH_MOD == NEWBATCH_REM).select(
        # new ids offset past every amplified old id space
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "source"
    )
    n_new = new.count()
    print(f"new batch: {n_new} docs (fixed at every K)")
    print("| old corpus | full recompute s | increment s | ratio |")
    print("|---|---|---|---|")
    for k in ks:
        path = amplified_old(spark, sf_dir, k, f"{base}/x{k}")
        old = spark.read.parquet(path)
        n_old = old.count()
        # yesterday's labels: untimed bootstrap, materialized
        lp = f"{base}/x{k}_labels"
        connected_components_star(
            all_pairs_jaccard(
                old, "doc_id", "text",
                shingle_n=JACCARD_N, threshold=JACCARD_THRESHOLD, group_col="source",
            ),
            src="id_a", dst="id_b",
        ).write.mode("overwrite").parquet(lp)
        labels = spark.read.parquet(lp)
        alldocs = old.unionByName(new)

        def full():
            pairs = all_pairs_jaccard(
                alldocs, "doc_id", "text",
                shingle_n=JACCARD_N, threshold=JACCARD_THRESHOLD, group_col="source",
            )
            return survivors(alldocs, connected_components_star(pairs, src="id_a", dst="id_b"))

        def increment():
            edges = incremental_jaccard_pairs(
                old, new, "doc_id", "text",
                shingle_n=JACCARD_N, threshold=JACCARD_THRESHOLD, group_col="source",
            ).select("id_a", "id_b")
            return survivors(
                alldocs, incremental_components(labels, edges, src="id_a", dst="id_b")
            )

        # correctness spot-check once per K: same survivor count
        nf, ni = full().count(), increment().count()
        assert nf == ni, f"K={k}: full {nf} != increment {ni}"
        tf, ti = timed(full), timed(increment)
        print(f"| {n_old:,} | {tf:.2f} | {ti:.2f} | {ti / tf:.2f} |")


if __name__ == "__main__":
    main()
