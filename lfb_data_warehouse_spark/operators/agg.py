"""Rollup marts and pivot aggregation — SURVEY §2.4 A1/A2, §3.4.

The reference's four ``analytics.*`` marts are groupBy+agg+orderBy over
the fact table (load_sample_aggregates.py:23-164). Here the shape is a
parameterized mart builder. Spark's HashAggregateExec gives partial
(map-side) aggregation for free, so the shuffle moves one row per
(partition, key) — at 100 TB the mart cost is dominated by the fact
scan, which column pruning keeps to the referenced measures.

Pivot: the reference pivots air-quality species long→wide
(aq-cleanse.py:214-219) with an *observed* value list — schema then
depends on the data. :func:`pivot_agg` requires the value list
(SURVEY §7.4) so output schema is stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_mart(
    df: DataFrame,
    keys: Sequence[Column | str],
    measures: Sequence[Column],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    out = df.groupBy(*keys).agg(*measures)
    if order_by:
        out = out.orderBy(*order_by)
    return out


def pivot_agg(
    df: DataFrame,
    key: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """groupBy(key).pivot(pivot_col, values).agg(agg) with a fixed value
    list for schema stability. With the list supplied Spark skips the
    extra distinct-values job AND the plan stays a single aggregate."""
    return df.groupBy(*key).pivot(pivot_col, list(values)).agg(agg)
