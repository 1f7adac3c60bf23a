"""Exact (order-independent) numeric aggregation helpers.

Floating-point SUM/AVG is non-deterministic under parallel execution:
partition order changes the rounding of intermediate sums, so the same
query can hash differently run-to-run — and will differ from a
single-threaded oracle engine. Casting to DECIMAL before aggregating
makes the arithmetic exact and therefore order-independent; casting the
exact result back to DOUBLE yields a bit-identical float on any engine.

This matters at 100 TB just as much as in tests: deterministic
aggregates make incremental recomputation and cross-run diffing
possible. DECIMAL aggregation in Spark stays inside whole-stage
codegen (no UDF cost).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def sum_exact(col: Column | str, scale: str = DEC) -> Column:
    """SUM(CAST(x AS DECIMAL)) → DOUBLE — exact, order-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def avg_exact(col: Column | str, scale: str = DEC) -> Column:
    """Exact-sum / count → DOUBLE. Deterministic unlike AVG(double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double") / F.count(c)
