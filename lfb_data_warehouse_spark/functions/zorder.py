"""Morton (Z-order) keys — true multi-dimensional interleaved-bit
clustering, the real analogue of Delta's OPTIMIZE ZORDER BY (reference
etl/load/load_fact.py:403-405) on plain parquet.

`sources/io.py:write_table(cluster_by=...)` range-clusters on a column
LIST (lexicographic: great for the first column, useless for the
second). Interleaving the bits of both dimensions instead gives every
dimension equal weight: sorting by the Morton key lays rows on a
space-filling curve, so each parquet row group covers a bounded
RECTANGLE in (x, y) space and min/max row-group stats can skip files
for predicates on EITHER dimension — the property two-column range
clustering cannot provide.

Both halves (Spark Column and oracle SQL) are generated from the same
magic-number spread table, bit-identical on any engine with 64-bit
integer ops. 16 bits per dimension here (two dims → 32-bit key); widen
the table to 32 bits/dim for 64-bit keys the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# classic bit-spread: after each (shift, mask) step the 16 input bits
# occupy every second position of a 32-bit word
_SPREAD: list[tuple[int, int]] = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_col(x: Column) -> Column:
    # cast to long FIRST: with an IntegerType input, shiftleft would run
    # in 32-bit space and 0x55555555 << 1 wraps negative before any
    # outer cast — diverging from the SQL oracle's BIGINT arithmetic
    v = x.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def _spread_sql(x: str) -> str:
    v = f"({x} & 65535)"
    for shift, mask in _SPREAD:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


def morton_key(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit dimensions (x takes the even
    bits, y the odd). Inputs are masked to 16 bits — pre-scale real
    values into [0, 2^16) first (e.g. days-since-epoch, bucketed key)."""
    return _spread_col(x).bitwiseOR(F.shiftleft(_spread_col(y), 1)).cast("long")


def morton_key_sql(x: str, y: str) -> str:
    """Oracle twin of :func:`morton_key` — same spread table."""
    return f"CAST(({_spread_sql(x)} | ({_spread_sql(y)} << 1)) AS BIGINT)"
