"""Sequence packing — assign documents to fixed-token-budget training
sequences without a single-reducer prefix sum.

LLM pre-training consumes documents concatenated in a deterministic
order and chunked into fixed-length sequences (e.g. 2048 tokens); the
pack id of a document is ``floor(start_offset / seq_len)`` where
``start_offset`` is the running token total of everything before it in
its group. The naive formulation is one window cumsum per group
(``SUM(tok) OVER (PARTITION BY source ORDER BY doc_id)``) — with a
handful of sources that is a handful of reducers each swallowing a
whole source at 100 TB.

Scalable formulation (same two-phase prefix-sum as ids.assign_dense_ids,
generalized from counts to token sums):

1. ``repartitionByRange`` on (group, order) — globally ordered ranges,
   sampled boundaries, uniform task sizes regardless of group skew;
2. per (physical partition, group) token totals — one row per
   (partition, group) pair, collected to the driver;
3. driver-side prefix sum within each group → per-(partition, group)
   token offsets (tiny: partitions x groups rows, not the data);
4. broadcast the offsets back; each task computes its local cumsum via
   a window keyed by (partition id, group) — every window partition is
   at most one task's slice of one group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    token_col: str | Column,
    seq_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``start_offset`` (tokens before this row within its group, in
    the total order given by ``order_cols``) and ``pack_id`` =
    ``floor(start_offset / seq_len)``.

    ``order_cols`` must be a total order within each group (include a
    unique tiebreak). ``token_col`` may be a column name or an
    expression (e.g. ``F.size(tokens("text"))``).
    """
    spark = df.sparkSession
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    parts = num_partitions or spark.sparkContext.defaultParallelism
    rp = df.withColumn("__tok", tok.cast("long")).repartitionByRange(
        parts, F.col(group_col), *[F.col(c) for c in order_cols]
    )
    # pin ONE materialization of the range exchange (boundary sampling
    # must not rerun between the offsets pass and the cumsum pass)
    staged = rp.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=True)
    sums = staged.groupBy("__pid", group_col).agg(F.sum("__tok").alias("__t")).collect()
    offsets: list[tuple[int, object, int]] = []
    acc: dict[object, int] = {}
    for row in sorted(sums, key=lambda r: (str(r[group_col]), r["__pid"])):
        g = row[group_col]
        offsets.append((row["__pid"], g, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + row["__t"]
    off_df = spark.createDataFrame(
        [(p, g, o) for p, g, o in offsets],
        schema=staged.select("__pid", group_col).schema.add("__offset", "long"),
    )
    w_local = Window.partitionBy("__pid", group_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        staged.join(F.broadcast(off_df), ["__pid", group_col])
        .withColumn(
            "start_offset",
            (F.col("__offset") + F.sum("__tok").over(w_local) - F.col("__tok")).cast("long"),
        )
        .withColumn(
            # integer DIV, not floor(double/double): start_offset is a
            # nonnegative long, and double arithmetic loses exactness past
            # 2^53 token offsets — DIV on longs is exact for the full range
            "pack_id",
            F.expr(f"CAST(start_offset DIV {int(seq_len)} AS LONG)"),
        )
        .drop("__pid", "__offset", "__tok")
    )
