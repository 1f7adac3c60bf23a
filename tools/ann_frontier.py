"""ANN recall-vs-cost frontier: the nprobe tuning curve, measured.

The recall audits (`ivf_recall_audit`, `ann_ivf_kmeans_recall`,
`ivfpq_residual_recall_audit`) each pin ONE operating point. This tool
sweeps nprobe over the learned-k-means IVF index on the sf-dir
embeddings and reports, per nprobe:

  recall@k           vs the exact brute-force top-k (the quantity a
                     user trades away)
  scanned fraction   candidate rows / corpus — the SCALE cost proxy:
                     at 1e9 vectors this fraction IS the per-query
                     scan, so the frontier says what recall each scan
                     budget buys on this corpus
  search s           wall-clock of the search stage alone at test SF
                     (index build excluded — persisted in production)

nprobe = nlist recovers brute force over the index (recall limited
only by int8 quantization), so the top row doubles as a sanity anchor.
The same sweep runs for the composed IVF×PQ index (codes-only
candidates; recall additionally bounded by PQ distortion).

With ``--structured`` the sweep runs on the deterministic clustered
fixture (operators/similarity.py:structured_embeddings) instead of the
raw structureless embeddings — the corpus that gives PQ a fair regime
(VERDICT r7 item 5). There the IVF×PQ curve should TRACK the IVF
ceiling instead of flat-lining at the distortion cap, and both rise
with nprobe.

Usage: python tools/ann_frontier.py [--structured] [sf_dir] [nprobe ...]
Prints one markdown row per (index, nprobe) for BASELINE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_index_from_cents,
    ivf_pq_build,
    ivf_pq_search,
    ivf_search,
    kmeans_centroids,
    quantize,
)
from lfb_data_warehouse_spark.plans.datapipe_queries import (  # noqa: E402
    EMB_DIM,
    KMEANS_ITERS,
    KMEANS_K,
    KNN_K,
    KNN_PROBES,
)
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--structured"]
    structured = "--structured" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    nprobes = [int(a) for a in args[1:]] or [1, 2, 4, 8]
    spark = get_spark("ann-frontier")
    emb = load_table(spark, sf_dir, "embeddings")
    if structured:
        from lfb_data_warehouse_spark.operators.similarity import structured_embeddings

        emb = structured_embeddings(emb.select("vec_id"))
        emb.cache().count()
    n_corpus = emb.count()
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in cosine_topk(emb, "vec_id", "embedding", range(KNN_PROBES), KNN_K)
        .select("probe_id", "neighbor_id")
        .collect()
    }

    # learned IVF index, built once (persisted shape)
    cents = kmeans_centroids(
        emb, "vec_id", "embedding", KMEANS_K, iters=KMEANS_ITERS, dim=EMB_DIM
    )
    q = quantize(emb, "vec_id", "embedding")
    inv = ivf_index_from_cents(q, cents, "vec_id")
    inv.cache().count()
    cents.cache().count()
    probes = q.filter(F.col("vec_id") < KNN_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("q").alias("pq"),
        F.col("norm").alias("pnorm"),
    )
    probes.cache().count()
    list_sizes = {
        r["assigned_label"]: r["n"]
        for r in inv.groupBy("assigned_label").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    print(
        f"corpus {n_corpus:,} vectors ({'structured fixture' if structured else 'raw embeddings'}), "
        f"dim {EMB_DIM}; k-means nlist {KMEANS_K} "
        f"({KMEANS_ITERS} Lloyd rounds); {KNN_PROBES} probes; recall@{KNN_K}"
    )
    print("| index | nprobe | recall@k | scanned fraction | search s |")
    print("|---|---|---|---|---|")

    def run(search_fn, label, np_):
        search_fn(np_).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            search_fn(np_).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        got = {
            (r["probe_id"], r["neighbor_id"])
            for r in search_fn(np_).select("probe_id", "neighbor_id").collect()
        }
        recall = len(got & exact) / len(exact)
        # scanned fraction (scale-cost proxy): nprobe lists per probe,
        # at the measured mean list size — the fraction of the corpus a
        # query touches
        mean_list = sum(list_sizes.values()) / len(list_sizes)
        frac = min(1.0, np_ * mean_list / n_corpus)
        print(f"| {label} | {np_} | {recall:.2f} | {frac:.2f} | {best:.2f} |")

    for np_ in nprobes:
        run(lambda n: ivf_search(inv, cents, probes, KNN_K, nprobe=n), "IVF (k-means)", np_)

    # composed IVF x PQ (label-partitioned lists, codes-only candidates)
    pq_inv, pq_cents, cw = ivf_pq_build(
        emb, "vec_id", "embedding", "label", dim=EMB_DIM
    )
    pq_inv.cache().count()
    for np_ in nprobes:
        run(
            lambda n: ivf_pq_search(pq_inv, pq_cents, probes, cw, KNN_K, nprobe=n),
            "IVFxPQ",
            np_,
        )


if __name__ == "__main__":
    main()
