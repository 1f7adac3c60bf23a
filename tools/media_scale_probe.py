"""×K wall-clock probe for the round-11 media gates (SCALE.md rows).

Same recipe as the earlier media tier measurements: amplify the
sf-dir documents table ×K (distinct doc_ids so every synthesized
payload is distinct), time each gate best-of-3 after an untimed warm
pass, print markdown-ready numbers. The gates are zero-exchange Arrow
map passes, so the expectation is flat-to-sublinear growth while the
32 local threads absorb the extra per-doc decode work.

Usage: python tools/media_scale_probe.py [sf_dir] [K]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402

QUERIES = (
    "adpcm_decode_stats",
    "flac_decode_stats",
    "jpeg_311_decode_stats",
    "jpeg12_progressive_stats",
    # round-12 gates: stereo/decorrelated FLAC and the five-format
    # sniff-and-dispatch battery
    "flac_stereo_decode_stats",
    "media_poison_battery",
    # round-14: the AVI/MJPEG walk (video) — adpcm_decode_stats above
    # already carries the new MS ADPCM leg
    "avi_mjpeg_decode_stats",
    # round-14 documents-table gates riding the same ×K amplification
    # (not media, but the probe's recipe applies): the seeded epoch
    # shuffle (expectation: near-linear — the range exchange carries
    # (id, 64-char hash)) and the bigram-LM scorer (near-linear: two
    # bounded count shuffles + a map-only scoring pass)
    "training_order_shuffle",
    "text_unigram_logprob",
    # round-14 late additions: AVI-leg frame sampling (decode only
    # kept frames) and perceptual-hash image dedup
    "multimodal_frame_sample",
    "image_ahash_dedup",
    # round 14c: the VAD leg rides the downsample pass (expectation:
    # flat — zero-exchange map pass with per-clip CPU)
    "audio_downsample_stats",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("media-scale-probe")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    base = tempfile.mkdtemp(prefix="media_scale_")
    amp_dir = os.path.join(base, f"x{k}")
    docs = load_table(spark, sf_dir, "documents")
    amp = docs.crossJoin(spark.range(k).withColumnRenamed("id", "rep")).select(
        (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    amp.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(os.path.join(amp_dir, "documents.parquet"))

    def best_of(fn, d: str, n: int = 3) -> float:
        fn(spark, d).count()  # warm
        times = []
        for _ in range(n):
            t0 = time.time()
            fn(spark, d).count()
            times.append(time.time() - t0)
        return min(times)

    for name in QUERIES:
        t1 = best_of(queries[name], sf_dir)
        tk = best_of(queries[name], amp_dir)
        print(
            f"{name}: x1 {t1:.2f} s -> x{k} {tk:.2f} s "
            f"(ratio x{tk / t1:.2f})"
        )


if __name__ == "__main__":
    main()
