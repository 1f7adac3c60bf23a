"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``lfb_data_warehouse_spark.plans.queries`` — one
registry entry per operator from SURVEY.md §2 plus the large-scale
data-pipeline operators, each paired with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lfb_data_warehouse_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-schema fact
    assembly (the reference's load_fact shape — content-hash surrogate
    keys, four broadcast dimension joins with Unknown-coalesced FKs,
    decimal-exact derived measures)."""
    return REGISTRY["flagship_star_fact"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted only for
    genuinely non-SQL-expressible operators)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
