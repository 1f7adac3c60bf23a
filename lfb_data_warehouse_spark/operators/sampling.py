"""Deterministic content-hash sampling — reproducible, oracle-checkable.

``df.sample()`` is seed-dependent and partitioning-dependent, which
makes samples irreproducible across runs/engines — useless for an
incremental 100 TB pipeline where the same row must make the same
keep/drop decision on every run (and on every engine: the DuckDB
oracle must agree bit-for-bit).

The deterministic form hashes the row's natural key with a salt and
keeps the row when the first 8 hex chars of sha256 (a uniform 32-bit
value rendered as fixed-width hex) sort below ``fraction * 16^8``.
Comparison happens on the *hex strings* — '0'-'9' < 'a'-'f' in every
collation both engines use for ASCII, so no integer conversion is
needed and the predicate is a pure map-side filter (zero shuffle,
pushable after the scan).

Changing ``salt`` draws an independent sample; the same salt always
reproduces the same sample — that also makes train/test splits stable
across pipeline re-runs (the classic ML-data requirement).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _threshold_hex(fraction: float) -> str:
    import math

    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # 'g' sorts after every hex digit, so `prefix < 'g'` keeps ALL
        # rows — a saturated hex threshold with strict '<' would drop
        # rows whose prefix is exactly 'ffffffff' (p=2^-32 per row,
        # expected hits at 100 TB scale)
        return "g"
    # floor(x + 0.5), not Python round(): for positive x this equals
    # DuckDB's round() INCLUDING exact .5 fractions (where Python
    # rounds half-to-even), so oracles that re-derive data-dependent
    # fractions in SQL (the remix queries) agree on every input
    scaled = math.floor(fraction * 16**8 + 0.5)
    if scaled >= 16**8:
        # fraction in [1 - 2^-33, 1.0) rounds up to exactly 16^8, which
        # formats as the 9-char '100000000'; the 8-char prefixes would
        # then compare lexicographically against a longer string and
        # keep only '0…' prefixes (~1/16 of rows). Saturate to keep-all.
        return "g"
    return format(scaled, "08x")


def _bucket_col(keys: Sequence[str], salt: str) -> Column:
    parts = [F.lit(salt)] + [F.col(k).cast("string") for k in keys]
    return F.substring(F.sha2(F.concat_ws("|", *parts), 256), 1, 8)


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _bucket_sql(keys: Sequence[str], salt: str) -> str:
    parts = ", ".join([_sql_str(salt)] + [f"CAST({k} AS VARCHAR)" for k in keys])
    return f"substring(sha256(concat_ws('|', {parts})), 1, 8)"


def deterministic_sample(
    df: DataFrame, keys: Sequence[str], fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a reproducible ``fraction`` of rows, decided per natural key."""
    return df.filter(_bucket_col(keys, salt) < F.lit(_threshold_hex(fraction)))


def deterministic_sample_sql(keys: Sequence[str], fraction: float, salt: str = "sample") -> str:
    """The oracle predicate for :func:`deterministic_sample` (same hash,
    same threshold — generated from the same constants)."""
    return f"{_bucket_sql(keys, salt)} < '{_threshold_hex(fraction)}'"


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    keys: Sequence[str],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample the majority class,
    keep all of the rare one). One map-side filter; the when-chain
    threshold is a Catalyst expression, not a UDF."""
    thr: Column = F.lit(_threshold_hex(default_fraction))
    for value, frac in fractions.items():
        thr = F.when(F.col(stratum_col) == value, F.lit(_threshold_hex(frac))).otherwise(thr)
    return df.filter(_bucket_col(keys, salt) < thr)


def stratified_sample_sql(
    stratum_col: str,
    fractions: dict[str, float],
    keys: Sequence[str],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> str:
    """Oracle CASE predicate for :func:`stratified_sample`."""
    whens = " ".join(
        f"WHEN {stratum_col} = {_sql_str(v)} THEN '{_threshold_hex(f)}'"
        for v, f in fractions.items()
    )
    case = f"CASE {whens} ELSE '{_threshold_hex(default_fraction)}' END"
    return f"{_bucket_sql(keys, salt)} < {case}"


def weighted_sample(
    df: DataFrame, keys: Sequence[str], fraction_col: str, salt: str = "wsample"
) -> DataFrame:
    """Keep each row with probability equal to its OWN ``fraction_col``
    value (in [0, 1]) — the continuous generalization of
    :func:`stratified_sample`, e.g. keep-probability = quality score
    so a mixing pipeline upsamples high-quality documents. Same
    deterministic machinery: content-hash prefix vs a PER-ROW hex
    threshold (a Catalyst expression, zero shuffle, reproducible on
    any engine — the oracle derives the identical threshold with
    round + printf('%08x')), with the same 16^8 saturation guard as
    :func:`_threshold_hex` (fractions within 2^-33 of 1.0 must keep
    all rows, not 1/16 of them). Out-of-range scores are clamped to
    [0, 1] — a negative score would otherwise format as a 16-char
    two's-complement hex string that sorts ABOVE every 8-char prefix
    (keeping ~all rows where the semantics demand none)."""
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(fraction_col).cast("double")))
    scaled = F.round(clamped * F.lit(float(16**8)))
    thr = F.when(scaled >= F.lit(float(16**8)), F.lit("g")).otherwise(
        F.format_string("%08x", scaled.cast("long"))
    )
    return df.filter(_bucket_col(keys, salt) < thr)


def weighted_sample_sql(keys: Sequence[str], fraction_expr: str, salt: str = "wsample") -> str:
    """Oracle predicate + threshold derivation for :func:`weighted_sample`
    (same [0, 1] clamp)."""
    clamped = f"least(1.0, greatest(0.0, CAST(({fraction_expr}) AS DOUBLE)))"
    scaled = f"round({clamped} * 4294967296.0)"
    case = (
        f"CASE WHEN {scaled} >= 4294967296.0 THEN 'g' "
        f"ELSE printf('%08x', CAST({scaled} AS BIGINT)) END"
    )
    return f"{_bucket_sql(keys, salt)} < {case}"


def group_sample(
    df: DataFrame,
    group_col: str,
    keys: Sequence[str],
    k: int,
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic fixed-size per-group sample — the reproducible
    replacement for per-group reservoir sampling: within each group
    keep the ``k`` rows whose salted content hash sorts smallest
    (ties broken by the key columns). Every run and every engine draws
    the SAME k rows per group — the property human-eval / spot-check
    samples need. One window per group; at 100 TB a pre-filter on the
    hash prefix (e.g. keep '00'-'0f' first) bounds the sort input."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _bucket_col(keys, salt).asc(), *[F.col(c).asc() for c in keys]
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def hash_split(
    df: DataFrame,
    keys: Sequence[str],
    fractions: dict[str, float],
    salt: str = "split",
    split_name: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test): EVERY row gets
    exactly one split label, decided by which hex-threshold range its
    salted content hash falls in. The ranges partition [0, 16^8), so
    the labels are mutually exclusive and exhaustive — re-runs, late
    arrivals, and other engines all assign the same row to the same
    split (the anti-leakage property ``df.randomSplit`` cannot give an
    incremental pipeline). Pure map-side when-chain, zero shuffle.

    ``fractions`` maps label → fraction, in priority order; they must
    sum to 1 (the last label absorbs rounding residue)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = _bucket_col(keys, salt)
    labels = list(fractions)
    cum = 0.0
    expr: Column | None = None
    for label, frac in list(fractions.items())[:-1]:
        cum += frac
        cond = bucket < F.lit(_threshold_hex(cum))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_name, out)


def hash_split_sql(
    keys: Sequence[str], fractions: dict[str, float], salt: str = "split"
) -> str:
    """Oracle CASE expression for :func:`hash_split` (same hash, same
    cumulative thresholds)."""
    bucket = _bucket_sql(keys, salt)
    labels = list(fractions)
    whens = []
    cum = 0.0
    for label, frac in list(fractions.items())[:-1]:
        cum += frac
        whens.append(f"WHEN {bucket} < '{_threshold_hex(cum)}' THEN {_sql_str(label)}")
    if not whens:
        return _sql_str(labels[-1])
    return f"CASE {' '.join(whens)} ELSE {_sql_str(labels[-1])} END"
