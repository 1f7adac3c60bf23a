"""Broadcast bloom-filter semi-join reduction — an explicit runtime
filter for shuffle joins whose build side is a selective subquery.

Spark's own InjectRuntimeFilter does exactly this automatically, but
only when its size thresholds line up and only for plain shuffle
equi-joins (and ``bloom_filter_agg`` is not registered as a public SQL
function, so the automatic rule is the ONLY way to reach the built-in
implementation). This operator is the explicit, always-available form,
built entirely from public JVM-side expressions — no Python touches a
single row:

build (one aggregation over the SMALL side's keys):
  k hash positions per key via ``xxhash64(key, seed_i) mod m``; each
  position becomes ``(word = pos div 64, bit = pos mod 64)``; a
  ``bit_or(shiftleft(1, bit))`` aggregate per word, then one
  ``map_from_entries`` + dense ``transform(sequence(...))`` fold packs
  the sparse words into a single ``array<bigint>`` row — the bitmap.

probe (map-only over the BIG side):
  the one-row bitmap cross-broadcast-joins onto the fact (a 1-row
  broadcast: bytes, not rows), and each row checks its k bits with
  ``element_at`` + ``shiftright`` — whole-stage-codegen bit math. Rows
  failing any bit provably have no partner; rows passing may be false
  positives, so the caller MUST still run the exact join afterwards —
  the filter only shrinks what reaches the shuffle.

Sizing at 100 TB: m = 8 bits/key and k = 3 give ~2.5% false positives
(standard bloom curve) — m is 1 MB of broadcast per million build keys,
the same budget Spark's runtime filter defaults to. The win: a fact
shuffle that moves only ~(selectivity + 2.5%) of its rows instead of
all of them. Worth it whenever the build side is selective and the
fact join must shuffle (bucketed/broadcast joins already avoid the
shuffle; use those first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


def _positions(key: Column, nbits: int, seeds: tuple[int, ...]) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(nbits)) for s in seeds]


def bloom_build(
    build: DataFrame,
    key: str | Column,
    nbits: int = 1 << 20,
    seeds: tuple[int, ...] = _SEEDS,
) -> DataFrame:
    """One-row DataFrame ``{bloom: array<bigint>}`` — the bitmap of the
    build side's keys. One partial→final ``bit_or`` aggregation over
    k·|build| positions; the dense pack is a single-row expression."""
    k = F.col(key) if isinstance(key, str) else key
    nwords = (nbits + 63) // 64
    pos = F.explode(F.array(*_positions(k, nbits, seeds))).alias("pos")
    words = (
        build.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # column-valued shift distances need the SQL form (the
            # python shiftleft() only takes literal ints)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    packed = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("sparse")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(nwords - 1).cast("long")),
            # try_element_at: absent word (or empty build side → NULL
            # map) reads as 0 under ANSI mode instead of erroring
            lambda w: F.coalesce(F.try_element_at(F.col("sparse"), w), F.lit(0).cast("long")),
        ).alias("bloom")
    )
    return packed


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key: str | Column,
    nbits: int = 1 << 20,
    seeds: tuple[int, ...] = _SEEDS,
) -> DataFrame:
    """Filter ``fact`` to rows whose ``key`` passes the bloom bitmap.

    Map-only: the one-row bitmap broadcasts, each fact row does k
    ``element_at`` lookups + bit tests. Keeps all true partners and a
    bounded false-positive tail — ALWAYS follow with the exact join.
    """
    k = F.col(key) if isinstance(key, str) else key
    probed = fact.join(F.broadcast(bloom))
    tmp_cols = []
    conds = []
    for i, pos in enumerate(_positions(k, nbits, seeds)):
        c = f"__bloom_pos{i}"
        tmp_cols.append(c)
        probed = probed.withColumn(c, pos)
        conds.append(
            f"(shiftright(element_at(bloom, CAST({c} DIV 64 AS INT) + 1),"
            f" CAST(pmod({c}, 64) AS INT)) & 1) = 1"
        )
    return probed.filter(F.expr(" AND ".join(conds))).drop("bloom", *tmp_cols)
