"""Data-quality checks as composable operators — SURVEY §2.11, §7.1 module 9.

The reference's 8 check jobs (etl/checks/*) are its query surface:
non-empty, exact column count, PK uniqueness, per-column completeness,
schema equality, cardinality ceilings, range bounds, referential
integrity. Each assertion there is an eager count() job; here every
check returns *expressions or small DataFrames* so a whole check suite
runs as one Spark job (single scan) and yields a structured report.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class CheckResult:
    name: str
    passed: bool
    detail: str


def profile(df: DataFrame, pk: str | None = None, columns: Sequence[str] | None = None) -> DataFrame:
    """One-pass DQ profile: total rows, per-column null counts, distinct
    PK count. Single aggregate job (reference post-extract-check.py runs
    one job per assertion)."""
    cols = list(columns or df.columns)
    aggs = [F.count(F.lit(1)).alias("row_count")]
    if pk:
        aggs.append(F.countDistinct(F.col(pk)).alias(f"distinct_{pk}"))
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    return df.agg(*aggs)


def assert_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Keys appearing more than once (reference assert_unique,
    date-dimension-check.py:48-62). Empty ⇒ pass."""
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)


def referential_orphans(fact: DataFrame, fk: str, dim: DataFrame, dim_key: str) -> DataFrame:
    """Distinct fact FK values with no dimension match (reference
    ref-int-load-check.py:16-21). Empty ⇒ pass. Dimension side is
    broadcast — dims are small by construction."""
    return (
        fact.select(F.col(fk).alias(dim_key))
        .distinct()
        .join(F.broadcast(dim.select(dim_key)), on=dim_key, how="left_anti")
    )


def run_contract(
    df: DataFrame,
    expected_columns: int | None = None,
    pk: str | None = None,
    expected_schema: StructType | None = None,
    non_nullable: Sequence[str] = (),
    cardinality_max: dict[str, int] | None = None,
    value_ranges: dict[str, tuple[float, float]] | None = None,
) -> list[CheckResult]:
    """Post-extract / dimension contract (reference
    post-extract-check.py:6-40 + dimension checks) as one aggregate pass
    plus pure-metadata checks."""
    results: list[CheckResult] = []
    if expected_columns is not None:
        ok = len(df.columns) == expected_columns
        results.append(CheckResult("column_count", ok, f"{len(df.columns)}/{expected_columns}"))
    if expected_schema is not None:
        ok = df.schema == expected_schema
        results.append(CheckResult("schema_equal", ok, "" if ok else str(df.schema)))

    aggs = [F.count(F.lit(1)).alias("n")]
    if pk:
        aggs.append(F.countDistinct(pk).alias("pk_distinct"))
    for c in non_nullable:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    for c in cardinality_max or {}:
        aggs.append(F.countDistinct(c).alias(f"card_{c}"))
    for c, (lo, hi) in (value_ranges or {}).items():
        bad = (F.col(c) < lo) | (F.col(c) > hi)
        aggs.append(F.sum(bad.cast("long")).alias(f"oob_{c}"))
    row = df.agg(*aggs).collect()[0]

    results.append(CheckResult("non_empty", row["n"] > 0, f"rows={row['n']}"))
    if pk:
        ok = row["pk_distinct"] == row["n"]
        results.append(CheckResult(f"unique_{pk}", ok, f"{row['pk_distinct']}/{row['n']}"))
    for c in non_nullable:
        results.append(CheckResult(f"non_null_{c}", row[f"nulls_{c}"] == 0, f"nulls={row[f'nulls_{c}']}"))
    for c, k in (cardinality_max or {}).items():
        results.append(CheckResult(f"cardinality_{c}", row[f"card_{c}"] <= k, f"{row[f'card_{c}']}<= {k}"))
    for c in value_ranges or {}:
        results.append(CheckResult(f"range_{c}", row[f"oob_{c}"] == 0, f"out_of_bounds={row[f'oob_{c}']}"))
    return results
