"""Blocked-vs-unblocked edit-distance join measurement.

`dedup_edit_distance_pairs` (round 13) makes blocking part of the
operator contract. This tool prices that choice: at a given sf-dir it
races the gate's blocked plan against coarser blocking and against the
unblocked all-pairs join, amplifying the corpus ×K (each copy's
doc_id/lang offset so blocks scale in COUNT, not size — the shape a
growing corpus actually has) to show the slopes.

  blocked   (lang, len_bucket)  — the gate plan; candidates bounded by
                                  block size, constant as the corpus
                                  grows if blocks stay bounded
  coarse    (lang)              — one blocking key dropped: candidate
                                  count grows with the square of the
                                  per-lang slice
  unblocked (all pairs)         — the O(n²) floor every ER system
                                  exists to avoid

Candidate counts are computed exactly (the length-difference prune is
applied in all three, as in the operator); times are best-of-2 to the
noop count() sink. The found near-dup pairs of the blocked plan are a
subset of coarse/unblocked BY CONSTRUCTION (same threshold, fewer
candidates) — the tool asserts the blocked results are identical to
filtering the unblocked results to same-block pairs, so the speed
table never hides a correctness drift.

Usage: python tools/edit_blocking_probe.py [sf_dir] [K ...]
Prints one markdown row per (plan, K) for SCALE.md.
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
    edit_distance_pairs,
)
from lfb_data_warehouse_spark.plans.datapipe_queries import (  # noqa: E402
    EDIT_LEN_BUCKET,
    EDIT_PREFIX_LEN,
    EDIT_THRESHOLD,
)
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402


def amplified(spark, sf_dir: str, k: int):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    n = docs.count()
    copies = spark.range(k).select(F.col("id").alias("copy"))
    return (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * (n + 1)).alias("doc_id"),
            "text",
            # distinct lang per copy: block COUNT scales, block SIZE fixed
            F.concat_ws("_", "lang", F.col("copy").cast("string")).alias("lang"),
            "n_chars",
        )
        .withColumn(
            "len_bucket", (F.col("n_chars") / EDIT_LEN_BUCKET).cast("long")
        )
    )


def race(df, block_cols):
    best = None
    for _ in range(2):
        t0 = time.time()
        n = edit_distance_pairs(
            df,
            "doc_id",
            "text",
            block_cols=block_cols,
            prefix_len=EDIT_PREFIX_LEN,
            threshold=EDIT_THRESHOLD,
        ).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    ks = [int(a) for a in argv[1:]] or [1, 2, 4]
    spark = get_spark("edit-blocking-probe")

    print("| plan | xK | docs | candidate pairs | found | best-of-2 s |")
    print("|---|---|---|---|---|---|")
    for k in ks:
        df = amplified(spark, sf_dir, k).cache()
        n_docs = df.count()

        def candidates(block_cols):
            d = df.select(
                "doc_id", *block_cols, F.substring("text", 1, EDIT_PREFIX_LEN).alias("p")
            )
            a = d.select(
                F.col("doc_id").alias("ia"), *block_cols, F.col("p").alias("pa")
            )
            b = d.select(
                F.col("doc_id").alias("ib"),
                *[F.col(c).alias(f"{c}_b") for c in block_cols],
                F.col("p").alias("pb"),
            )
            cond = [F.col(c) == F.col(f"{c}_b") for c in block_cols] or [F.lit(True)]
            j = a.join(b, on=F.expr("true"))
            for c in cond:
                j = j.filter(c)
            return (
                j.filter(F.col("ia") < F.col("ib"))
                .filter(
                    F.abs(F.length("pa") - F.length("pb")) <= F.lit(EDIT_THRESHOLD)
                )
                .count()
            )

        for label, cols in (
            ("blocked", ["lang", "len_bucket"]),
            ("coarse", ["lang"]),
            ("unblocked", []),
        ):
            if cols:
                secs, found = race(df, cols)
                cand = candidates(cols)
            else:
                # all-pairs: same operator with a constant block key
                allb = df.withColumn("one", F.lit(1))
                secs, found = race(allb, ["one"])
                cand = candidates([])
            print(
                f"| {label} | {k} | {n_docs:,} | {cand:,} | {found} | {secs:.2f} |"
            )
        # correctness: blocked results == unblocked results restricted
        # to same-block pairs (blocking changes RECALL scope, never
        # the distances of the pairs it does consider)
        blocked = edit_distance_pairs(
            df, "doc_id", "text", ["lang", "len_bucket"],
            EDIT_PREFIX_LEN, EDIT_THRESHOLD,
        ).select("id_a", "id_b", "dist")
        meta = df.select("doc_id", "lang", "len_bucket")
        unb = edit_distance_pairs(
            df.withColumn("one", F.lit(1)), "doc_id", "text", ["one"],
            EDIT_PREFIX_LEN, EDIT_THRESHOLD,
        ).select("id_a", "id_b", "dist")
        restricted = (
            unb.join(meta.withColumnRenamed("doc_id", "id_a"), "id_a")
            .join(
                meta.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("lang").alias("lang_b"),
                    F.col("len_bucket").alias("lb_b"),
                ),
                "id_b",
            )
            .filter(
                (F.col("lang") == F.col("lang_b"))
                & (F.col("len_bucket") == F.col("lb_b"))
            )
            .select("id_a", "id_b", "dist")
        )
        diff = blocked.exceptAll(restricted).count() + restricted.exceptAll(blocked).count()
        assert diff == 0, f"blocked != restricted unblocked at K={k}"
        print(f"|  (check) | {k} | blocked == unblocked∩same-block: OK | | | |")
        df.unpersist()


if __name__ == "__main__":
    main()
