"""Exact (order-independent) numeric aggregation helpers.

Floating-point SUM/AVG is non-deterministic under parallel execution:
partition order changes the rounding of intermediate sums, so the same
query can hash differently run-to-run — and will differ from a
single-threaded oracle engine. Quantizing to a fixed decimal grid
before aggregating makes the arithmetic exact and therefore
order-independent; casting the exact result back to DOUBLE yields a
bit-identical float on any engine.

Implementation notes (the fast path):

- A naive ``SUM(CAST(x AS DECIMAL(18,s)))`` pays a per-row
  double→BigDecimal conversion and decimal adds in the aggregate
  buffer — measured ~2.7× slower than integer arithmetic on a 600k-row
  Q1 at sf0.1. Even ``F.round`` on a double goes through BigDecimal.
  So values are scaled onto their grid with primitive math:
  ``floor(x·10^s + 0.5)`` — branch-free and sign-agnostic, identical
  to HALF_UP for on-grid inputs because an on-grid value scales to an
  integer ± fp error and can never sit at an exact .5 fraction (the
  only place this and HALF_UP differ; see _scale_to_long). Verified
  value-for-value against round() and the decimal cast on every
  lineitem/orders money column AND its negation at sf0.01/sf0.1.

- scale ≤ 2 (money-class): one LONG accumulator. Headroom ~9.2e18
  scaled units per group; Spark's ANSI mode (default-on in Spark 4,
  pinned by test) turns a pathological overflow into a loud
  ARITHMETIC_OVERFLOW instead of a silent wrap.

- scale ≥ 4 or ``wide=True``: hi/lo-split accumulation — the scaled
  long splits into ``hi = v div 1e6`` and ``lo = v mod 1e6``, each
  summed as a plain LONG (map-side combine, whole-stage codegen), then
  reassembled as ``hi·1e6 + lo`` in DECIMAL once per GROUP. For
  charge-class values (~1e12 scaled units/row) the hi sum holds
  ~9e12 rows per group — two orders past the biggest 100 TB TPC-H
  group — at plain-long speed, with zero per-row decimal ops.

- The exact integer total divides back down IN THE DECIMAL DOMAIN
  before the final double cast, so the result is rounded exactly once.
  Verified bit-identical to the decimal formulation (and the DuckDB
  oracle) at sf0.01 and sf0.1.

Precondition: the input is semantically on the 10^-s grid (money at
2dp, products of on-grid factors at 4/6dp). For off-grid values the
floor scaling and a decimal cast could disagree on ties; every call
site in this engine aggregates on-grid quantities.

This matters at 100 TB just as much as in tests: deterministic
aggregates make incremental recomputation and cross-run diffing
possible, and the scaled-long path stays inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"

_SCALE_RE = re.compile(r"decimal\s*\(\s*\d+\s*,\s*(\d+)\s*\)")

_SPLIT = 10**6  # hi/lo split for the wide accumulator


def _grid_scale(scale: str) -> int:
    m = _SCALE_RE.fullmatch(scale.strip().lower())
    if not m:
        raise ValueError(f"expected 'decimal(p,s)', got {scale!r}")
    return int(m.group(1))


def _scale_to_long(c: Column, s: int) -> Column:
    """floor(x·10^s + 0.5) — nearest integer for on-grid inputs of ANY
    sign, branch-free. The precondition (above) is that x sits on the
    10^-s grid, so the scaled value is an integer ± fp error — never
    near a .5 boundary — and one floor rounds it exactly; the sign
    branch a general HALF_UP needs (it differs from this only AT exact
    .5 fractions, which on-grid inputs cannot produce) would cost ~1.5×
    on the aggregate hot path (measured on Q1: 0.65 s vs 0.43 s).
    Verified value-for-value against round() and the decimal cast on
    every lineitem/orders column, and on negated copies, at sf0.01/0.1."""
    return F.floor(c * F.lit(float(10**s)) + F.lit(0.5)).cast("long")


def _scaled_total(c: Column, s: int, wide: bool | None) -> Column:
    """Exact integer total of the grid-scaled values, as DECIMAL."""
    if wide is None:
        wide = s >= 4
    v = _scale_to_long(c, s)
    if not wide:
        return F.sum(v).cast("decimal(38,0)")
    lo = F.pmod(v, F.lit(_SPLIT))
    # (v - lo) is an exact multiple of the split; the double division
    # below is therefore exact (quotient is an integer ≤ 2^53)
    hi = ((v - lo) / F.lit(float(_SPLIT))).cast("long")
    return F.sum(hi).cast("decimal(38,0)") * F.lit(_SPLIT) + F.sum(lo)


def _to_double(total: Column, s: int) -> Column:
    # divide in the decimal domain: one correctly-rounded double cast
    return (total.cast("decimal(38,6)") / F.lit(10**s)).cast("double")


def sum_exact(col: Column | str, scale: str = DEC, wide: bool | None = None) -> Column:
    """SUM on the decimal grid of ``scale`` → DOUBLE — exact,
    order-independent, scaled-long fast path."""
    c = F.col(col) if isinstance(col, str) else col
    s = _grid_scale(scale)
    return _to_double(_scaled_total(c, s, wide), s)


def avg_exact(col: Column | str, scale: str = DEC, wide: bool | None = None) -> Column:
    """Exact-sum / count → DOUBLE. Deterministic unlike AVG(double)."""
    c = F.col(col) if isinstance(col, str) else col
    s = _grid_scale(scale)
    return _to_double(_scaled_total(c, s, wide), s) / F.count(c)


def sum_scaled(col: Column | str, scale: str = DEC, wide: bool | None = None) -> Column:
    """The PURE-AGGREGATE half of sum_exact: the exact integer total of
    the grid-scaled values (DECIMAL). For contexts that demand a bare
    aggregate expression — pivot aggregates — pair with :func:`unscale`
    applied after the pivot."""
    c = F.col(col) if isinstance(col, str) else col
    return _scaled_total(c, _grid_scale(scale), wide)


def unscale(col: Column | str, scale: str = DEC) -> Column:
    """Divide a sum_scaled total back to a correctly-rounded DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return _to_double(c, _grid_scale(scale))


def scale_to_long(col: Column | str, scale: str = DEC) -> Column:
    """The PER-ROW half of sum_exact: grid-scale a value to a plain
    LONG (HALF_UP for on-grid inputs). For multi-phase aggregations
    that sum outside a single agg call — salted two-phase aggregation —
    sum the longs in every phase and :func:`unscale` the final total."""
    c = F.col(col) if isinstance(col, str) else col
    return _scale_to_long(c, _grid_scale(scale))
