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


def approx_ntile(
    df: DataFrame,
    value_col: str,
    n: int,
    out_col: str = "tile",
    accuracy: int = 10_000,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Scalable NTILE: exact ``NTILE(n) OVER (ORDER BY value)`` needs a
    single reducer to sort EVERY row of the (group's) frame — the plan
    that dies first at 100 TB. This variant computes the n-1 boundary
    quantiles with ``percentile_approx`` (mergeable sketch, one partial
    aggregation pass) and assigns tiles with a map-side when-chain —
    two scans, zero row-sorting, error bounded by the sketch accuracy
    (≤ 1/accuracy rank error per boundary; ties around a boundary may
    land one tile off vs the exact window, which is also true of exact
    NTILE under reordered ties).

    ``group_cols`` scopes the quantiles per group (boundaries become a
    broadcast join instead of plan literals). The exact-window twin
    stays the correctness anchor (ntile_quartile_acctbal); this is the
    shape to run when the frame does not fit one task.

    NULL policy (matches the exact window twin): Spark's default
    ascending ordering is NULLS FIRST, so ``NTILE(n) OVER (ORDER BY
    value)`` puts NULL values in tile 1 — this function does the same
    (``percentile_approx`` ignores NULLs, so they would otherwise fall
    through every boundary into tile n). Divergence: exact NTILE is
    positional, so when NULLs OUTNUMBER the first tile (e.g. an
    all-NULL group) it overflows them into tiles 2+; here they all stay
    in tile 1. NULL *group keys* are kept as
    their own group via a null-safe boundary join, exactly as the exact
    window's PARTITION BY treats NULL as one partition."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    probs = [i / n for i in range(1, n)]
    v = F.col(value_col)
    if not group_cols:
        row = df.agg(
            F.percentile_approx(v, probs, accuracy).alias("b")
        ).collect()[0]
        bounds = row["b"] or []
        tile: Column = F.lit(n)
        for i in reversed(range(len(bounds))):
            tile = F.when(v <= F.lit(bounds[i]), F.lit(i + 1)).otherwise(tile)
        tile = F.when(v.isNull(), F.lit(1)).otherwise(tile)
        return df.withColumn(out_col, tile.cast("long"))
    bdf = df.groupBy(*group_cols).agg(
        F.percentile_approx(v, probs, accuracy).alias("__bounds")
    )
    # null-safe equality so rows with a NULL group key keep their own
    # boundary row instead of dropping out of the inner join
    renamed = bdf.select(
        *[F.col(c).alias(f"__g_{c}") for c in group_cols], "__bounds"
    )
    cond = None
    for c in group_cols:
        eq = df[c].eqNullSafe(renamed[f"__g_{c}"])
        cond = eq if cond is None else cond & eq
    joined = df.join(F.broadcast(renamed), cond).drop(
        *[f"__g_{c}" for c in group_cols]
    )
    tile = F.lit(n)
    for i in reversed(range(n - 1)):
        tile = F.when(
            v <= F.element_at(F.col("__bounds"), i + 1), F.lit(i + 1)
        ).otherwise(tile)
    tile = F.when(v.isNull(), F.lit(1)).otherwise(tile)
    return joined.withColumn(out_col, tile.cast("long")).drop("__bounds")
