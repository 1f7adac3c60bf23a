"""IVF-vs-brute-force crossover measurement.

The headline gate query ``ann_ivf_topk`` runs on the test corpus
(2 000 vectors at sf0.1), where the IVF index build — centroids plus
inverted list, two extra shuffles — cannot amortize over 40k dot
products, so the benchmark ratio vs the brute-force naive twin is > 1
BY CONSTRUCTION at that size. The claim that IVF is the 100 TB path is
a scaling claim, so this tool measures it: the sf0.1 embeddings corpus
is amplified ×K (cross-join against ``spark.range(K)``, ids re-keyed,
labels re-salted so the inverted lists stay balanced as the corpus
grows) and the SAME two plans race at each size — the engine's
:func:`ivf_topk` vs the naive whole-corpus brute-force scan used by
``tools/baseline_bench.py``.

Prints one markdown table row per corpus size (best-of-3, warm
session), suitable for pasting into BASELINE.md.

Usage: python tools/ivf_crossover.py [sf_dir] [K ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.operators.similarity import (  # noqa: E402
    ivf_build,
    ivf_pq_build,
    ivf_pq_search,
    ivf_search,
    pq_adc_score,
    pq_codebook,
    pq_encode,
    pq_probe_luts,
    quantize,
)
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402

N_PROBES = 20
K_NEIGHBORS = 5
NLIST = 40  # re-salted label count: lists stay ~corpus/NLIST deep


def amplified(spark, sf_dir: str, k: int, path: str) -> str:
    """Materialize the ×k corpus to parquet once so both contenders scan
    identical files (in-memory lineage would re-run the amplification
    inside every timed pass and charge it to whichever side runs first)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = (
        emb.crossJoin(spark.range(k).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
            "embedding",
            # deterministic re-salt keeps NLIST balanced lists at any K
            F.pmod(F.xxhash64(F.col("vec_id") * k + F.col("rep")), F.lit(NLIST))
            .cast("int")
            .alias("label"),
        )
    )
    out.repartition(spark.sparkContext.defaultParallelism).write.mode("overwrite").parquet(path)
    return path


def brute_force(spark, path: str, probe_ids, k: int):
    emb = spark.read.parquet(path)
    norm = F.sqrt(
        F.aggregate(
            F.zip_with("embedding", "embedding", lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    v = emb.select("vec_id", "embedding", norm.alias("nm"))
    probes = v.filter(F.col("vec_id").isin(list(probe_ids))).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pv"),
        F.col("nm").alias("pnm"),
    )
    dot = F.aggregate(
        F.zip_with("embedding", "pv", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        v.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), (dot / (F.col("nm") * F.col("pnm"))).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def timed(df) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ks = [int(a) for a in args[1:]] or [1, 8, 32, 128]
    spark = get_spark("ivf-crossover")
    base = os.environ.get("IVF_CROSSOVER_TMP", "/tmp/ivf_crossover")
    print(
        "| corpus | index build s (once) | brute-force search s | ivf search s "
        "| ivf ratio | pq encode s (once) | pq adc search s | pq ratio "
        "| ivfpq build s (once) | ivfpq search s | ivfpq ratio |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for k in ks:
        path = amplified(spark, sf_dir, k, f"{base}/x{k}")
        emb = spark.read.parquet(path)
        n = emb.count()
        probe_ids = list(range(0, N_PROBES * k, k))  # originals' first copies
        # Build ONCE, persist partitioned by list (the production layout:
        # probe-centroid broadcast pruning then skips unprobed lists at
        # the scan); search timings read the materialized index.
        t0 = time.time()
        inv, cents = ivf_build(emb, "vec_id", "embedding", "label")
        inv.write.mode("overwrite").partitionBy("assigned_label").parquet(f"{base}/x{k}_inv")
        cents.write.mode("overwrite").parquet(f"{base}/x{k}_cents")
        t_build = time.time() - t0
        inv_p = spark.read.parquet(f"{base}/x{k}_inv")
        cents_p = spark.read.parquet(f"{base}/x{k}_cents")
        probes = (
            quantize(emb.filter(F.col("vec_id").isin(probe_ids)), "vec_id", "embedding")
            .select(F.col("vec_id").alias("probe_id"), F.col("q").alias("pq"), F.col("norm").alias("pnorm"))
        )
        ivf = ivf_search(inv_p, cents_p, probes, k=K_NEIGHBORS, nprobe=2)
        bf = brute_force(spark, path, probe_ids, K_NEIGHBORS)
        # PQ: encode ONCE to parquet (codes only — the 64×-compressed
        # candidate payload), time the ADC search over the code table
        t0 = time.time()
        cw = pq_codebook(emb, "vec_id", "embedding")
        pq_encode(emb, "vec_id", "embedding", cw).select(
            F.col("vec_id").alias("neighbor_id"), "codes"
        ).write.mode("overwrite").parquet(f"{base}/x{k}_codes")
        t_encode = time.time() - t0
        luts = pq_probe_luts(
            quantize(emb.filter(F.col("vec_id").isin(probe_ids)), "vec_id", "embedding"),
            cw,
            id_col="vec_id",
        )
        from pyspark.sql import Window

        wnd = Window.partitionBy("probe_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc()
        )
        pq = (
            pq_adc_score(spark.read.parquet(f"{base}/x{k}_codes"), luts, cw)
            .withColumn("rank", F.row_number().over(wnd))
            .filter(F.col("rank") <= K_NEIGHBORS)
        )
        # IVF x PQ composed: lists pruned AND payloads shrunk — build
        # once (codes-only index, partitioned by list), time the search
        t0 = time.time()
        pinv, pcents, pcw = ivf_pq_build(emb, "vec_id", "embedding", "label")
        pinv.write.mode("overwrite").partitionBy("assigned_label").parquet(
            f"{base}/x{k}_pqinv"
        )
        pcents.write.mode("overwrite").parquet(f"{base}/x{k}_pqcents")
        t_pq_build = time.time() - t0
        ivfpq = ivf_pq_search(
            spark.read.parquet(f"{base}/x{k}_pqinv"),
            spark.read.parquet(f"{base}/x{k}_pqcents"),
            probes,
            pcw,
            k=K_NEIGHBORS,
            nprobe=2,
        )
        tb, ti, tp, tip = timed(bf), timed(ivf), timed(pq), timed(ivfpq)
        print(
            f"| {n:,} | {t_build:.2f} | {tb:.2f} | {ti:.2f} | {ti / tb:.2f} "
            f"| {t_encode:.2f} | {tp:.2f} | {tp / tb:.2f} "
            f"| {t_pq_build:.2f} | {tip:.2f} | {tip / tb:.2f} |"
        )


if __name__ == "__main__":
    main()
