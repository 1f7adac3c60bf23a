"""Nearest-within (as-of) temporal join — SURVEY §2.3 J6/J7, §7.1 module 7.

Spark has no native as-of join. The scalable formulation (used by the
reference for incident ↔ air-quality matching, load_fact.py:225-290) is:

1. bucket both sides by ``floor(epoch / tolerance)``;
2. replicate the probe side into buckets b-1, b, b+1 (two unions);
3. equi-join on the bucket (plus any equality keys) — a plain shuffled
   hash join, NOT a range cross-join, so it scales linearly;
4. filter ``|Δt| <= tolerance``;
5. keep the nearest match per probe row via ``row_number()``.

The reference's implementation has a bucket-arithmetic bug — probe side
``floor(epoch/43200)`` (load_fact.py:243) vs build side
``floor(epoch)/43200`` (load_fact.py:259-261), a fractional bucket that
almost never matches. This operator implements the *intended*
semantics, and adds a deterministic tiebreak (reference order-by has
none, load_fact.py:281-283): smallest |Δt|, then smallest right key.

Cost model at scale: output of step 3 is |probe|·3·(avg right rows per
bucket) — bounded by data density per tolerance window, independent of
total table size. AQE handles skewed buckets (hot 12-hour windows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: Sequence[str] = (),
    granularity_sec: int = 3600,
) -> DataFrame:
    """Point-in-interval (range) join: each ``points`` row matched to
    every ``intervals`` row whose ``[start_ts, end_ts]`` contains it
    (optionally also matching equality keys ``on``).

    Spark would execute the naive ``p.ts BETWEEN i.start AND i.end``
    predicate as a broadcast-nested-loop (O(|P|·|I|)). The scalable
    form mirrors ``nearest_within``'s bucket trick: intervals are
    replicated into every ``granularity_sec`` bucket they overlap
    (``sequence`` + ``explode`` — fan-out is interval_len/granularity,
    bounded and data-independent), points carry one bucket, and the
    match becomes a plain shuffled/broadcast hash equi-join on
    (keys, bucket) plus a residual containment filter. Each
    (point, interval) pair meets in exactly one bucket (the point's),
    so no dedup pass is needed.

    Interval columns that collide with point columns are returned with
    an ``ivl_`` prefix.
    """
    g_us = int(granularity_sec) * 1_000_000
    overlap = set(points.columns) & set(intervals.columns) - set(on)
    ivl = intervals
    for c in overlap:
        ivl = ivl.withColumnRenamed(c, f"ivl_{c}")
        if start_ts == c:
            start_ts = f"ivl_{c}"
        if end_ts == c:
            end_ts = f"ivl_{c}"

    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))

    probe = points.withColumn("__bucket", F.floor(p_us / F.lit(g_us)))
    build = ivl.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(s_us / F.lit(g_us)), F.floor(e_us / F.lit(g_us)))),
    )
    join_keys = list(on) + ["__bucket"]
    return (
        probe.join(build, on=join_keys, how="inner")
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts)))
        .drop("__bucket")
    )


def nearest_within(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_sec: int,
    on: Sequence[str] = (),
    left_key: str | None = None,
    right_tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "nearest",
) -> DataFrame:
    """For each left row, attach the right row whose ``right_ts`` is
    nearest to ``left_ts`` within ``tolerance_sec`` (optionally also
    matching equality keys ``on``).

    ``direction`` selects the standard ASOF-join variants (kdb/QuestDB/
    pandas ``merge_asof`` semantics):

    - ``'nearest'``  — closest match on either side (±tolerance);
    - ``'backward'`` — latest right row at-or-before ``left_ts``
      (within tolerance) — the classic "state as of event time";
    - ``'forward'``  — earliest right row at-or-after ``left_ts``.

    Directional variants replicate probes into TWO buckets, not three
    (the match window spans at most two tolerance-sized buckets), so
    they shuffle 2/3 of the nearest variant's probe volume.

    ``left_key`` identifies left rows for the top-1 window (defaults to
    all of ``on`` + left_ts, but a unique id column is better);
    ``right_tiebreak`` breaks |Δt| ties deterministically.
    ``how='left'`` keeps unmatched left rows (right columns NULL).
    """
    if direction not in ("nearest", "backward", "forward"):
        raise ValueError(f"direction must be nearest|backward|forward, got {direction!r}")
    tol_us = int(tolerance_sec) * 1_000_000
    lcols = list(left.columns)
    rcols = list(right.columns)
    overlap = set(lcols) & set(rcols) - set(on)
    r = right
    for c in overlap:
        r = r.withColumnRenamed(c, f"right_{c}")
        rcols[rcols.index(c)] = f"right_{c}"
        if right_ts == c:
            right_ts = f"right_{c}"
        if right_tiebreak == c:
            right_tiebreak = f"right_{c}"

    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    probe = left.withColumn("__l_us", l_us)
    build = r.withColumn("__r_us", r_us).withColumn(
        "__bucket", F.floor(F.col("__r_us") / F.lit(tol_us))
    )
    base_bucket = F.floor(F.col("__l_us") / F.lit(tol_us))
    # replicate probes into neighbor buckets (reference does this with two
    # unions, load_fact.py:242-256; explode keeps it one pass); a
    # directional window spans at most two buckets
    if direction == "backward":
        neighbor = F.array(base_bucket - 1, base_bucket)
    elif direction == "forward":
        neighbor = F.array(base_bucket, base_bucket + 1)
    else:
        neighbor = F.array(base_bucket - 1, base_bucket, base_bucket + 1)
    probe = probe.withColumn("__bucket", F.explode(neighbor))

    join_keys = list(on) + ["__bucket"]
    delta = F.col("__l_us") - F.col("__r_us")  # >0 ⇒ right is earlier
    if direction == "backward":
        in_window = (delta >= 0) & (delta <= F.lit(tol_us))
    elif direction == "forward":
        in_window = (delta <= 0) & (-delta <= F.lit(tol_us))
    else:
        in_window = F.abs(delta) <= F.lit(tol_us)
    matched = (
        probe.join(build, on=join_keys, how="inner")
        .withColumn("__dt_us", F.abs(delta))
        .filter(in_window)
    )

    part_cols: list[str | Column]
    if left_key is not None:
        part_cols = [left_key]
    else:
        part_cols = list(on) + ["__l_us"]
    order = [F.col("__dt_us").asc()]
    if right_tiebreak is not None:
        order.append(F.col(right_tiebreak).asc())
    w = Window.partitionBy(*part_cols).orderBy(*order)
    best = (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__bucket", "__l_us", "__r_us")
    )
    best = best.withColumnRenamed("__dt_us", "nearest_dt_us")
    if how == "left":
        unmatched = left.join(
            best.select(*(part_cols if left_key else lcols)), on=(left_key or lcols), how="left_anti"
        )
        for c in best.columns:
            if c not in unmatched.columns:
                unmatched = unmatched.withColumn(c, F.lit(None))
        best = best.unionByName(unmatched.select(*best.columns))
    return best
