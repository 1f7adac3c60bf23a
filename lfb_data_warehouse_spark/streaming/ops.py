"""Structured Streaming operators.

The reference is batch-only; its "streaming" capability is hand-rolled
incremental loading — anti-join change detection + append
(SURVEY §2.9). These operators are the Structured Streaming twins of
the engine's batch semantics, so a pipeline can switch a source from
parquet-batch to a stream without changing meaning:

- :func:`stream_windowed_agg` ≡ plans.queries.tumbling_hourly_events
  (same F.window expression), plus watermark-bounded state.
- :func:`stream_session_agg` ≡ the batch gap-sessionization query,
  via native session_window.
- :func:`stream_dedup` ≡ batch dropDuplicates/anti-join idempotency;
  the watermark bounds the key state a 100 TB stream would otherwise
  accumulate forever.
- :func:`stream_incremental_upsert` ≡ operators.incremental as a
  foreachBatch sink: each micro-batch anti-joins the sink before
  append — exactly-once-per-key without MERGE support.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def stream_windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    keys: Sequence[str] = (),
    watermark: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (slide=None) or sliding windowed count/sum with a
    late-data bound. A sliding window assigns each event to
    window/slide overlapping windows — state grows by that factor, so
    the watermark (which bounds state eviction) matters window/slide
    times more than in the tumbling case."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("window.start").alias("window_start"), *keys, "event_count", "total_value")
    )


def stream_session_agg(
    stream: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native session windows (gap-based) — the streaming twin of the
    batch lag+cumsum sessionization."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            *keys,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "event_count",
        )
    )


def stream_dedup(
    stream: DataFrame, keys: Sequence[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """At-least-once → effectively-once: drop re-deliveries by key.
    The watermark lets Spark expire key state (unbounded otherwise).
    Exact-duplicate semantics: a re-delivery must carry the SAME event
    time (the time column is part of the dedup key — that inclusion is
    what lets the watermark evict state). For producers that re-send
    with a fresh timestamp, use :func:`stream_dedup_within_watermark`."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([*keys, ts_col])


def stream_dedup_within_watermark(
    stream: DataFrame, keys: Sequence[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """Dedup on the BUSINESS key alone (``dropDuplicatesWithinWatermark``):
    re-deliveries whose event time DIFFERS from the first copy — the
    retry-with-new-timestamp producer — still collapse, provided the
    copies arrive within the watermark delay of each other. Per-key
    state evicts once the watermark passes the first-seen time + delay,
    so state stays bounded without the time column in the key. This is
    the right tool when the time column is an ingestion timestamp
    rather than part of the event's identity."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: Sequence[str],
    window: str = "2 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right rows whose timestamp falls in
    [left_ts, left_ts + window], per equality key — the streaming twin
    of operators.temporal.interval_join (e.g. click attribution against
    a live purchase stream).

    Both sides carry watermarks and the join condition carries the time
    range, so Spark bounds the join state: a buffered left row is
    dropped once the right watermark passes left_ts + window. Without
    the range the state would grow forever on an unbounded stream.
    Caller must pre-rename colliding columns (streaming joins can't
    rename post-hoc without breaking the watermark lineage).

    ``how="leftOuter"`` (round 13): unmatched left rows ALSO emit, with
    NULL right columns, once the global watermark proves no match can
    still arrive — the attribution-with-nulls shape ("every purchase,
    with its click if any"). Emission timing is watermark-bound:
    Spark's join-state solver works in whole milliseconds with a
    left-value CEILING, so a left row emits null-joined only when
    ``ceil_ms(left_ts) + window < floor_ms(min stream max) − delay``
    (pinned empirically across 16 boundary cases in
    test_streaming.py::test_stream_interval_join_outer_eviction_boundary);
    rows inside that horizon stay buffered at stream end. Callers
    comparing against a batch twin should restrict both sides to a
    watermark-safe horizon (see plans.streaming_queries.
    stream_interval_join_outer).
    """
    keys = list(on)
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        c = l_wm[k] == r_wm[k]
        cond = c if cond is None else cond & c
    time_lo = r_wm[right_ts] >= l_wm[left_ts]
    time_hi = r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {window}")
    cond = (cond & time_lo & time_hi) if cond is not None else (time_lo & time_hi)
    return l_wm.join(r_wm, cond, how).drop(*(r_wm[k] for k in keys))


def stream_incremental_upsert(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint: str,
) -> DataStreamWriter:
    """foreachBatch sink: per micro-batch, anti-join the target on the
    natural key and append only new rows (idempotent under replay —
    the streaming twin of the reference's extract jobs)."""
    from ..operators.incremental import incremental_new_rows

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # intra-batch re-deliveries first (the sink anti-join can only
        # see previous batches), then new-vs-sink change detection
        batch = batch.dropDuplicates(list(keys))
        try:
            existing = spark.read.parquet(target_path)
        except Exception:
            existing = None
        new = batch if existing is None else incremental_new_rows(batch, existing, keys)
        new.write.mode("append").parquet(target_path)

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(upsert)
    )


def stream_running_user_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "1 hour",
    idle_timeout: str = "2 hours",
):
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-user accumulator (event count, value sum, last-seen) that emits
    an updated row per user per micro-batch and FINALIZES the user when
    it stays idle past ``idle_timeout`` in *event time* (the timeout row
    carries ``final=true``) — semantics no built-in aggregation
    expresses.

    The timeout anchors to the key's last event time, never to the
    processing-time watermark at update moment (the first batch's
    watermark is 0 — anchoring there finalizes every key in the
    trailing no-data batch). State is one tiny tuple per key,
    Arrow-batched per key group; at scale the state store shards by key
    across executors and the watermark bounds its lifetime.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, event_count long, value_sum double, last_seen timestamp, final boolean"
    )
    # total accumulates in integer ten-thousandths: float summation
    # order varies with Arrow batching, integer addition never does —
    # keeps value_sum bit-identical to a decimal(18,4) SQL sum
    state_schema = "count long, total long, last long"

    unit_ms = {"second": 1000, "minute": 60_000, "hour": 3_600_000}
    num, unit = idle_timeout.split()
    idle_ms = int(num) * unit_ms[unit.rstrip("s")]

    def update(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            count, total, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [uid],
                    "event_count": [count],
                    "value_sum": [total / 10000.0],
                    "last_seen": [pd.Timestamp(last, unit="us")],
                    "final": [True],
                }
            )
            return
        count, total, last = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            count += len(pdf)
            total += int((pdf[value_col] * 10000).round().astype("int64").sum())
            batch_last_us = int(pdf[ts_col].astype("datetime64[us]").astype("int64").max())
            last = max(last, batch_last_us)
        state.update((count, total, last))
        # event-time anchor; must stay ahead of the current watermark or
        # Spark rejects the timestamp
        state.setTimeoutTimestamp(
            max(last // 1000 + idle_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                key_col: [uid],
                "event_count": [count],
                "value_sum": [total / 10000.0],
                "last_seen": [pd.Timestamp(last, unit="us")],
                "final": [False],
            }
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_tws_user_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "1 hour",
):
    """The same running per-user accumulator as
    :func:`stream_running_user_stats`, on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (SPARK-46815, "Arbitrary State API v2"):
    state lives in named, individually-evolvable ValueState handles
    managed by the RocksDB state store instead of one opaque tuple, and
    the processor is an object with an explicit lifecycle (init /
    handleInputRows / close), which is what production pipelines need
    for state-schema migration.

    Both APIs stay registered: applyInPandasWithState pins the stable
    surface (plus its event-time idle-timeout semantics); this pins the
    v2 surface. Accumulation is in integer ten-thousandths / epoch
    micros for the same bit-exactness reasons."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key_col} long, event_count long, value_sum double, last_seen timestamp"

    class _UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", "count long, total long, last long")

        def handleInputRows(self, key, rows, timerValues):
            count, total, last = self._acc.get() if self._acc.exists() else (0, 0, 0)
            for pdf in rows:
                count += len(pdf)
                total += int((pdf[value_col] * 10000).round().astype("int64").sum())
                batch_last_us = int(
                    pdf[ts_col].astype("datetime64[us]").astype("int64").max()
                )
                last = max(last, batch_last_us)
            self._acc.update((count, total, last))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "event_count": [count],
                    "value_sum": [total / 10000.0],
                    "last_seen": [pd.Timestamp(last, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_UserStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="EventTime",
        )
    )
