"""Per-gate trigger-cost audit for the streaming queries (r15).

SCALE.md/SHUFFLE.md claim the streaming shapes are bounded per
trigger: state-store partition count pinned (``_state_partitions``),
state volume bounded by the live horizon (tools/stream_state_audit),
and each micro-batch reads only its tranche — never a full rescan of
the source. This tool makes the per-TRIGGER cost visible: it attaches
a ``StreamingQueryListener`` and runs every registered stream gate
once, aggregating each gate's micro-batch progress events into

  batches            micro-batches executed end-to-end
  input rows         total rows ingested across batches (≈ staged
                     corpus size exactly once ⇒ no per-trigger rescans;
                     a gate re-reading the source each trigger would
                     multiply this)
  trigger ms         mean / max ``triggerExecution`` duration
  addBatch ms        mean time inside the batch's actual work
  peak state rows    max numRowsTotal across batches and operators

Usage: python tools/stream_trigger_audit.py [sf_dir]  →  markdown table
(committed as SHUFFLE.md's streaming section).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from lfb_data_warehouse_spark.session import get_spark  # noqa: E402

GATES = [
    "stream_tumbling_hourly",
    "stream_sessionize",
    "stream_interval_join",
    "stream_interval_join_outer",
    "stream_stateful_user_stats",
    "stream_static_enrich",
    "stream_upsert_idempotent",
    "stream_dedup_events",
    "stream_dedup_jittered",
    "stream_late_data_drop",
    "stream_sliding_halfhour",
]


class Collector(StreamingQueryListener):
    def __init__(self):
        self.progress = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append(
            {
                "batch": p.batchId,
                "rows": p.numInputRows,
                "trigger_ms": (p.durationMs or {}).get("triggerExecution", 0),
                "add_ms": (p.durationMs or {}).get("addBatch", 0),
                "state_rows": max(
                    (s.numRowsTotal for s in (p.stateOperators or [])), default=0
                ),
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-trigger-audit")
    print(f"# streaming trigger audit at {sf_dir} "
          f"(loadavg {os.getloadavg()[0]:.2f})")
    print()
    print("| gate | wall s | batches | input rows | trigger ms mean/max "
          "| addBatch ms mean | peak state rows |")
    print("|---|---|---|---|---|---|---|")
    for gate in GATES:
        col = Collector()
        spark.streams.addListener(col)
        t0 = time.time()
        try:
            REGISTRY[gate].fn(spark, sf_dir).collect()
        finally:
            wall = time.time() - t0
            # progress events are delivered asynchronously — drain
            # before detaching or short-lived queries report 0 batches
            deadline = time.time() + 5
            while not col.progress and time.time() < deadline:
                time.sleep(0.2)
            time.sleep(0.5)
            spark.streams.removeListener(col)
        rows = [p for p in col.progress if p["rows"] or p["trigger_ms"]]
        n = len(rows)
        tot_rows = sum(p["rows"] for p in rows)
        trig = [p["trigger_ms"] for p in rows]
        add = [p["add_ms"] for p in rows]
        peak = max((p["state_rows"] for p in rows), default=0)
        mean_t = sum(trig) / n if n else 0
        mean_a = sum(add) / n if n else 0
        print(
            f"| {gate} | {wall:.1f} | {n} | {tot_rows:,} "
            f"| {mean_t:.0f}/{max(trig, default=0)} | {mean_a:.0f} | {peak:,} |"
        )


if __name__ == "__main__":
    main()
