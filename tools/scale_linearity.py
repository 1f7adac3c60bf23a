"""Wall-clock linearity probe for the documents-pipeline operators.

The correctness gates run at sf0.01 and the bench/soak at sf0.1; the
crossover tools already measure the two algorithmic scale stories
(incremental dedup vs corpus growth, IVF/PQ vs corpus size). This
probe covers the remaining question — do the CURATION-PIPELINE plans
scale linearly in corpus size? — by amplifying the sf-dir documents
table ×K (each copy with a distinct marker token appended, same
recipe as inc_dedup_crossover: same-doc copies stay near-dups,
cross-doc copies never pair) into a temp sf-dir and timing registry
queries against it, best-of-2 after an untimed warm pass.

A plan whose time grows ~K× is scan-bound (the shape that survives a
1000-executor scale-up by adding executors); super-linear growth
exposes a pair/window blow-up. NOTE the near-dup CHAIN queries are
expected to grow mildly super-linearly HERE because amplification
multiplies every duplicate cluster's size by K (pair verification per
cluster is quadratic in cluster size — real corpora grow by adding
documents, not by multiplying every cluster).

Usage: python tools/scale_linearity.py [sf_dir] [K ...]
Prints one markdown row per (query, K) for SCALE.md.
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

QUERIES = (
    "gopher_quality_gates",  # map-only HOF battery
    "text_char_entropy",  # map-only entropy
    "dedup_exact_documents",  # hash groupBy
    "heavy_hitters_sketch",  # MG summaries + recount
    "pack_sequences_documents",  # two-phase prefix sum
    "dedup_keep_canonical",  # MinHash→LSH→components→survivors
    "dedup_components_star",  # exact-pair chain + O(log n) star rounds
    "crawl_to_corpus",  # r11: WARC→HTML→gates→dedup→packing, one plan
)


def amplified_docs(spark, sf_dir: str, k: int, base: str) -> str:
    out = os.path.join(base, f"x{k}")
    docs = load_table(spark, sf_dir, "documents")
    amp = docs.crossJoin(spark.range(k).withColumnRenamed("id", "rep")).select(
        (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copy"), F.col("rep")).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    amp.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "documents.parquet"))
    return out


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ks = [int(a) for a in args[1:]] or [1, 4, 16]
    base = os.environ.get("SCALE_PROBE_TMP", "/tmp/lfb_scale_probe")
    spark = get_spark("scale-linearity")
    dirs = {k: amplified_docs(spark, sf_dir, k, base) for k in ks}
    n1 = spark.read.parquet(os.path.join(dirs[ks[0]], "documents.parquet")).count()
    print(f"docs at K={ks[0]}: {n1:,}")
    print("| query | " + " | ".join(f"x{k} s" for k in ks) + " | slope (xK time / K) |")
    print("|---|" + "---|" * (len(ks) + 1))
    for name in QUERIES:
        fn = REGISTRY[name].fn
        times = []
        for k in ks:
            d = dirs[k]
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times.append(best)
        hi_k, lo_k = ks[-1], ks[0]
        slope = (times[-1] / times[0]) / (hi_k / lo_k)
        cells = " | ".join(f"{t:.2f}" for t in times)
        print(f"| {name} | {cells} | {slope:.2f} |")

    # -- incremental_dedup_step: FIXED batch vs a xK old corpus --------
    # The batch-bounded claim: the daily step's cost scales with the
    # batch (+ its matched old docs), not the corpus. The batch
    # predicate widens its modulus by K so the ABSOLUTE batch size
    # stays fixed while the old side grows xK; yesterday's labels are
    # materialized untimed per dir (the state production already has).
    # A slope << 1 here is the claim; contrast with the full-recompute
    # chain rows above, whose slope is ~K-linear-plus.
    import tempfile

    from lfb_data_warehouse_spark.operators.dedup import (
        all_pairs_jaccard,
        incremental_jaccard_pairs,
    )
    from lfb_data_warehouse_spark.operators.graph import (
        connected_components_star,
        incremental_components,
    )
    from lfb_data_warehouse_spark.plans.datapipe_queries import (
        JACCARD_N,
        JACCARD_THRESHOLD,
        NEWBATCH_MOD,
        NEWBATCH_REM,
    )

    def inc_step(docs, is_new, labels):
        old, new = docs.filter(~is_new), docs.filter(is_new)
        edges = incremental_jaccard_pairs(
            old, new, "doc_id", "text",
            shingle_n=JACCARD_N, threshold=JACCARD_THRESHOLD, group_col="source",
        ).select("id_a", "id_b")
        return incremental_components(labels, edges, src="id_a", dst="id_b")

    times = []
    batch_sizes = []
    for k in ks:
        d = dirs[k]
        docs = load_table(spark, d, "documents")
        is_new = F.col("doc_id") % (NEWBATCH_MOD * k) == NEWBATCH_REM
        batch_sizes.append(docs.filter(is_new).count())
        lbl_dir = tempfile.mkdtemp(prefix=f"lfb_scale_labels_x{k}_")
        pairs = all_pairs_jaccard(
            docs.filter(~is_new), "doc_id", "text",
            shingle_n=JACCARD_N, threshold=JACCARD_THRESHOLD, group_col="source",
        )
        connected_components_star(pairs, src="id_a", dst="id_b").write.mode(
            "overwrite"
        ).parquet(lbl_dir)
        labels = spark.read.parquet(lbl_dir)
        inc_step(docs, is_new, labels).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            inc_step(docs, is_new, labels).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        times.append(best)
    slope = (times[-1] / times[0]) / (ks[-1] / ks[0])
    cells = " | ".join(f"{t:.2f}" for t in times)
    print(
        f"| incremental_dedup_step (fixed batch {min(batch_sizes)}-"
        f"{max(batch_sizes)} docs) | {cells} | {slope:.2f} |"
    )


if __name__ == "__main__":
    main()
