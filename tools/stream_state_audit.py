"""Measure the STATE budget of the stateful streaming shapes.

SCALE.md claims watermarks bound streaming state lifetime; the late-
data gate (stream_late_data_drop) proves the VALUE semantics. This
tool measures the STATE itself: each stateful shape runs over the
five-tranche late-replay staging (day-1 events → rest of corpus →
flush spacer → day-1 again as late duplicates → flush), and the
per-micro-batch ``stateOperators`` progress metrics are aggregated
into

  peak state rows   (max numRowsTotal across batches — the memory
                     high-water mark a state store must hold)
  end state rows    (numRowsTotal after the final batch — what
                     survives once the watermark passed everything)
  dropped-late rows (sum numRowsDroppedByWatermark — the late tranche
                     being refused admission to state)
  evicted rows      (sum numRowsRemoved — windows/keys aged out as
                     the watermark advanced)

The claim made measurable: peak state is bounded by the LIVE HORIZON
(windows or keys inside the watermark), not by stream length — so a
100 TB/day ingest holds state proportional to (horizon × key
cardinality) while input grows without bound, and the entire late
tranche lands in dropped-late instead of state.

Usage: python tools/stream_state_audit.py [sf_dir]  →  markdown table
(committed as part of SCALE.md's streaming section).
"""

from __future__ import annotations

import json
import os
import sys
import uuid
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lfb_data_warehouse_spark.plans.streaming_queries import (  # noqa: E402
    SESSION_GAP,
    _stage_late_tranches,
    _state_partitions,
)
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402
from lfb_data_warehouse_spark.sources.testdata import load_table  # noqa: E402
from lfb_data_warehouse_spark.streaming.ops import (  # noqa: E402
    stream_dedup_within_watermark,
    stream_session_agg,
    stream_windowed_agg,
)


def run_and_meter(out, mode: str) -> dict[str, int]:
    name = f"audit_{uuid.uuid4().hex[:8]}"
    with _state_partitions(out.sparkSession):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .start()
        )
        q.processAllAvailable()
        progress = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
    tot = {"input": 0, "peak_state": 0, "end_state": 0, "dropped_late": 0, "evicted": 0}
    for p in progress:
        tot["input"] += int(p.get("numInputRows", 0))
        for op in p.get("stateOperators", []):
            rows = int(op.get("numRowsTotal", 0))
            tot["peak_state"] = max(tot["peak_state"], rows)
            tot["end_state"] = rows  # last batch wins
            tot["dropped_late"] += int(op.get("numRowsDroppedByWatermark", 0))
            tot["evicted"] += int(op.get("numRowsRemoved", 0))
    return tot


def stage_daily_tranches(spark, sf_dir: str) -> str:
    """Stage events as one time-ordered file PER DAY (mtimes increasing,
    maxFilesPerTrigger=1 → one micro-batch per day). Unlike the
    late-replay staging, the watermark here advances once per day —
    the continuous-ingest cadence — so per-key state (sessions, dedup
    keys) should hold only the watermark horizon, not the corpus."""
    import shutil
    import tempfile

    events = load_table(spark, sf_dir, "events")
    days = [
        r[0]
        for r in events.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()
    ]
    src = tempfile.mkdtemp(prefix="lfb_stream_daily_")
    for i, day in enumerate(days):
        tmp = tempfile.mkdtemp(prefix="lfb_stream_daily_part_")
        events.filter(F.to_date("ts") == F.lit(day)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(p for p in sorted(os.listdir(tmp)) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.copyfile(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        shutil.rmtree(tmp, ignore_errors=True)
    return src


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-state-audit")
    events = load_table(spark, sf_dir, "events")
    src = _stage_late_tranches(spark, sf_dir)

    def stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    shapes = {
        "tumbling 1h agg (wm 1h)": (
            stream_windowed_agg(
                stream(), "ts", window="1 hour", keys=["event_type"], watermark="1 hour"
            ),
            "append",
        ),
        "sliding 1h/30m agg (wm 1h)": (
            stream_windowed_agg(
                stream(), "ts", window="1 hour", keys=["event_type"],
                watermark="1 hour", slide="30 minutes",
            ),
            "append",
        ),
        f"session windows (gap {SESSION_GAP}, wm 1h)": (
            stream_session_agg(
                stream(), "ts", gap=SESSION_GAP, keys=["user_id"], watermark="1 hour"
            ),
            "append",
        ),
        "dedup within watermark (1h)": (
            stream_dedup_within_watermark(
                stream(), ["event_id"], "ts", watermark="1 hour"
            ),
            "append",
        ),
    }
    print("| shape | input rows | peak state | end state | dropped late | evicted |")
    print("|---|---|---|---|---|---|")
    for label, (out, mode) in shapes.items():
        t = run_and_meter(out, mode)
        print(
            f"| {label} | {t['input']:,} | {t['peak_state']:,} | "
            f"{t['end_state']:,} | {t['dropped_late']:,} | {t['evicted']:,} |"
        )

    # continuous-ingest cadence: one micro-batch per day, watermark
    # advancing daily — the per-key shapes should now peak at the
    # horizon's keys, not the corpus's
    daily = stage_daily_tranches(spark, sf_dir)

    def daily_stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(daily)
        )

    daily_shapes = {
        f"session windows, daily batches (gap {SESSION_GAP}, wm 1h)": (
            stream_session_agg(
                daily_stream(), "ts", gap=SESSION_GAP, keys=["user_id"], watermark="1 hour"
            ),
            "append",
        ),
        "dedup within watermark, daily batches (1h)": (
            stream_dedup_within_watermark(
                daily_stream(), ["event_id"], "ts", watermark="1 hour"
            ),
            "append",
        ),
        "tumbling 1h agg, daily batches (wm 1h)": (
            stream_windowed_agg(
                daily_stream(), "ts", window="1 hour", keys=["event_type"], watermark="1 hour"
            ),
            "append",
        ),
    }
    for label, (out, mode) in daily_shapes.items():
        t = run_and_meter(out, mode)
        print(
            f"| {label} | {t['input']:,} | {t['peak_state']:,} | "
            f"{t['end_state']:,} | {t['dropped_late']:,} | {t['evicted']:,} |"
        )


if __name__ == "__main__":
    main()
