"""Hot-shingle skew probe for the exact pair kernels (r15, VERDICT #3).

The exact Jaccard/containment kernels (`_shingle_pair_counts`,
`incremental_jaccard_pairs`) pair docs via a shingle equi-join: a
shingle shared by d docs contributes d^2 join rows, and in the
shuffle-join regime every row of one shingle lands in ONE task — the
classic single-hot-key straggler (guide §2.5).

This probe builds a synthetic corpus where one shingle appears in 10%
of docs (d = N/10 → d^2/2 pair rows through one key), runs the kernel
through a noop sink, and reports the join stage's per-task time
distribution (max/median) from the local UI REST API under three
conditions:

  A. broadcast-hash regime (local default): the small side broadcasts,
     pair generation happens map-side in the probe tasks — the hot
     key's work is spread across every scan partition; no straggler
     by construction.
  B. shuffle regime (SMJ forced via autoBroadcastJoinThreshold=-1),
     AQE skew-join OFF: the at-scale shape with no insurance — the
     straggler this probe exists to exhibit.
  C. shuffle regime, AQE skew-join ON with thresholds scaled to the
     fixture. MEASURED RESULT (r15): AQE does NOT fix this straggler —
     the skew detector is map-output-SIZE-based, and a hot shingle's
     d rows are only ~40·d shuffled bytes; the d^2 blow-up happens at
     join time, invisible to AQE. The hot partition never crosses any
     size threshold, so the single-key straggler survives case C.
  D. shuffle regime, AQE skew OFF, the kernel's r15 hot-key salting
     engaged (hot_cap below the fixture's hot frequency): the d^2 pair
     generation spreads over S = ceil(d^2/4M) tasks.

Prints one markdown table. Usage: python tools/shingle_skew_probe.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture(spark, n_docs: int):
    """10% of docs share one 3-token phrase; the rest of every doc is
    unique filler, so the hot shingle is the ONLY cross-doc key."""
    from pyspark.sql import functions as F

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0,
            F.concat(
                F.lit("alpha beta gamma u"),
                F.col("id").cast("string"),
                F.lit(" v"),
                F.col("id").cast("string"),
                F.lit(" w"),
                F.col("id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("x"),
                F.col("id").cast("string"),
                F.lit(" y"),
                F.col("id").cast("string"),
                F.lit(" z"),
                F.col("id").cast("string"),
                F.lit(" q"),
                F.col("id").cast("string"),
                F.lit(" r"),
                F.col("id").cast("string"),
            )
        )
        .alias("body"),
    )
    return docs


def stage_task_stats(ui: str, app_id: str):
    """Per-stage (stage_id, n_tasks, max_ms, median_ms, total_ms,
    shuffle_read_mb) for every completed stage with >1 task."""
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    out = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        turl = (
            f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}"
            "/taskList?length=5000"
        )
        tasks = json.load(urllib.request.urlopen(turl))
        durs = sorted(t.get("duration", 0) for t in tasks)
        if len(durs) < 2:
            continue
        med = durs[len(durs) // 2]
        out.append(
            (
                sid,
                len(durs),
                durs[-1],
                med,
                sum(durs),
                st.get("shuffleReadBytes", 0) / 1e6,
            )
        )
    return sorted(out)


def run_case(label: str, n_docs: int, extra: dict[str, str], hot_cap: int = 0):
    from lfb_data_warehouse_spark.operators.dedup import all_pairs_jaccard
    from lfb_data_warehouse_spark.session import get_spark
    from pyspark.sql import SparkSession

    conf = {
        "spark.ui.enabled": "true",
        "spark.ui.port": "4050",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        **extra,
    }
    spark = get_spark(f"skew-probe-{label}", extra_conf=conf)
    try:
        docs = fixture(spark, n_docs).repartition(32).localCheckpoint(eager=True)
        spark.sparkContext.setJobDescription(f"shingle-skew {label}")
        t0 = time.time()
        pairs = all_pairs_jaccard(docs, "doc_id", "body", 3, 0.0, hot_cap=hot_cap)
        pairs.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        app_id = spark.sparkContext.applicationId
        stats = stage_task_stats("http://localhost:4050", app_id)
        return label, wall, stats
    finally:
        spark.stop()
        SparkSession.builder._options = {}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    print(f"# hot-shingle probe: {n_docs} docs, hot shingle in 10% "
          f"(d={n_docs // 10} → {(n_docs // 10) ** 2 // 2:,} pair rows "
          "through one key)")
    print(f"# loadavg {os.getloadavg()[0]:.2f}")
    cases = [
        ("A-broadcast", {}),
        (
            "B-smj-noskew",
            {
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.skewJoin.enabled": "false",
            },
        ),
        (
            "C-smj-aqeskew",
            {
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                # fixture-scaled thresholds: the hot partition here is
                # a few MB where the at-scale one is >256 MB; same ratio
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            },
        ),
        (
            "D-smj-salted",
            {
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.skewJoin.enabled": "false",
            },
        ),
    ]
    rows = []
    for label, extra in cases:
        hot_cap = 1000 if label.endswith("salted") else 0
        rows.append(run_case(label, n_docs, extra, hot_cap=hot_cap))
    print("| case | wall s | stage | tasks | max ms | median ms | max/med | shuf-read MB |")
    print("|---|---|---|---|---|---|---|---|")
    for label, wall, stats in rows:
        for sid, n, mx, med, tot, srd in stats:
            ratio = mx / med if med else float("inf")
            print(
                f"| {label} | {wall:.2f} | {sid} | {n} | {mx} | {med} "
                f"| {ratio:.1f} | {srd:.1f} |"
            )


if __name__ == "__main__":
    main()
