"""Top-K per group — SURVEY §2.5 W2 / §2.6 O3.

``row_number`` over (partition by group, order by value desc, tiebreak)
then ``rn <= k``. At scale this is one shuffle on the group key; Spark's
WindowExec sorts within partitions. For very hot groups AQE skew
handling applies; for k=1 prefer :func:`max_by_per_group` (hash
aggregate, no sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def max_by_per_group(df: DataFrame, group: Sequence[str], order_col: str, payload: Sequence[str]) -> DataFrame:
    """k=1 fast path: single hash aggregate via max(struct(order, payload)).
    No window sort, partial aggregation map-side."""
    s = F.max(F.struct(F.col(order_col), *[F.col(c) for c in payload])).alias("__s")
    out = df.groupBy(*group).agg(s)
    cols = [*group, F.col("__s").getField(order_col).alias(order_col)]
    cols += [F.col("__s").getField(c).alias(c) for c in payload]
    return out.select(*cols)
