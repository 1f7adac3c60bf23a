"""Streaming-vs-recompute crossover measurement for the
``stream_sliding_bench`` row.

The bench's 100k-row corpus prices the stream's PER-TRIGGER machinery
(state-store commits, micro-batch planning) against a naive batch
recompute whose scans are nearly free at that size — so the engine
reads over 2x the twin there BY CONSTRUCTION, the same regime artifact
as the demoted ``ivfpq_search_persisted`` row. The streaming claim is
a scaling claim: the stream reads every event ONCE while the
per-arrival recompute reads N*(K+1)/2 rows for the same K dashboard
refreshes, so the ratio must invert once scan volume rivals trigger
overhead. This tool measures WHERE: the sf-dir events corpus is
amplified xA (ids re-keyed; window/event_type/value distributions
preserved), staged into the same K arrival files the bench uses, and
the SAME two computations race at each A — the engine's one streaming
query (state partitions sized to state, as in
``plans/streaming_queries.py:sliding_bench_stream``) vs the
per-arrival full batch recompute used by ``tools/baseline_bench.py``.

Prints one markdown row per amplification, suitable for BASELINE.md.

Usage: python tools/stream_crossover.py [sf_dir] [A ...]
"""

from __future__ import annotations

import glob
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.plans.streaming_queries import (  # noqa: E402
    SLIDE_BENCH_FILES,
    _state_partitions,
)
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402
from lfb_data_warehouse_spark.streaming.ops import stream_windowed_agg  # noqa: E402


def staged_amplified(spark, sf_dir: str, a: int, base: str) -> str:
    out = os.path.join(base, f"x{a}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        events = load_table(spark, sf_dir, "events")
        amp = events.crossJoin(
            spark.range(a).withColumnRenamed("id", "rep")
        ).select(
            (F.col("event_id") * a + F.col("rep")).alias("event_id"),
            *[c for c in events.columns if c != "event_id"],
        )
        amp.repartition(SLIDE_BENCH_FILES).write.mode("overwrite").parquet(out)
    return out


def run_engine(spark, schema, src: str) -> float:
    t0 = time.time()
    with _state_partitions(spark, 2):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stream_windowed_agg(
            stream, "ts", window="1 hour", keys=["event_type"], slide="30 minutes"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("stream_crossover")
            .outputMode("complete")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    spark.table("stream_crossover").write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_naive(spark, schema, src: str) -> float:
    t0 = time.time()
    files = sorted(glob.glob(src + "/part-*"))
    for i in range(1, len(files) + 1):
        df = spark.read.schema(schema).parquet(*files[:i])
        agg = (
            df.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("event_count"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "event_count",
                "total_value",
            )
        )
        agg.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    amps = [int(a) for a in args[1:]] or [1, 4, 16]
    base = os.environ.get("STREAM_CROSSOVER_TMP", "/tmp/stream_crossover")
    spark = get_spark("stream-crossover")
    schema = load_table(spark, sf_dir, "events").schema
    print("| rows (per K files) | stream s | per-arrival recompute s | ratio |")
    print("|---|---|---|---|")
    for a in amps:
        src = staged_amplified(spark, sf_dir, a, base)
        n = spark.read.schema(schema).parquet(src).count()
        # warm both paths once at the smallest size semantics (plan
        # compile, codegen) via a single untimed naive pass at A=first
        te = min(run_engine(spark, schema, src) for _ in range(2))
        tn = min(run_naive(spark, schema, src) for _ in range(2))
        print(f"| {n:,} | {te:.2f} | {tn:.2f} | {te / tn:.2f} |")


if __name__ == "__main__":
    main()
