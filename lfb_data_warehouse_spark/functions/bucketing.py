"""Strategy-table → CASE/WHEN-chain bucketing (SURVEY §2.8).

The reference builds ordinal-label columns by folding ``[lo, hi, label)``
strategy tables into a ``when``-chain (weather-cleanse.py:117-137,
aq-cleanse.py:160-187, wb-cleanse.py:133-155). Two NULL policies exist:
NULL→"Unknown" (weather/aq) and NULL→NULL (well-being). Because the
result is a pure column *expression* (no UDF), Catalyst folds it into
whole-stage codegen — this is the fastest possible implementation at any
scale.

Bucket edges are half-open ``lo <= x < hi``; pass ``lo=None`` /
``hi=None`` for unbounded edges.
"""

from __future__ import annotations

import enum
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

Bucket = tuple[float | None, float | None, str]


class NullPolicy(enum.Enum):
    UNKNOWN = "unknown"  # NULL → "Unknown"  (weather/aq variant)
    NULL = "null"  # NULL → NULL      (well-being variant)


def bucketize(
    col: Column | str,
    buckets: Sequence[Bucket],
    null_policy: NullPolicy = NullPolicy.UNKNOWN,
    default: str | None = None,
) -> Column:
    """Fold a strategy table into a single when-chain expression."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    if null_policy is NullPolicy.UNKNOWN:
        expr = F.when(c.isNull(), F.lit("Unknown"))
    for lo, hi, label in buckets:
        cond = None
        if lo is not None:
            cond = c >= F.lit(lo)
        if hi is not None:
            upper = c < F.lit(hi)
            cond = upper if cond is None else (cond & upper)
        if cond is None:
            cond = F.lit(True)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None, "empty strategy table"
    return expr.otherwise(F.lit(default))


def bucketize_sql(col: str, buckets: Sequence[Bucket], null_policy: NullPolicy = NullPolicy.UNKNOWN,
                  default: str | None = None) -> str:
    """ANSI-SQL CASE chain with identical semantics — used to generate the
    DuckDB oracle from the *same* strategy table, so engine and oracle
    can never drift."""
    parts = ["CASE"]
    if null_policy is NullPolicy.UNKNOWN:
        parts.append(f"WHEN {col} IS NULL THEN 'Unknown'")
    for lo, hi, label in buckets:
        conds = []
        if lo is not None:
            conds.append(f"{col} >= {lo}")
        if hi is not None:
            conds.append(f"{col} < {hi}")
        cond = " AND ".join(conds) if conds else "TRUE"
        parts.append(f"WHEN {cond} THEN '{label}'")
    parts.append(f"ELSE {'NULL' if default is None else repr(default)} END")
    return " ".join(parts)
