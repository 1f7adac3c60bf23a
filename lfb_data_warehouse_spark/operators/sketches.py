"""Mergeable frequency sketches — bounded-shuffle heavy hitters.

The exact top-k-tokens query (`text_heavy_hitters`) shuffles one row
per DISTINCT (group, token) after map-side partial aggregation — fine
until the vocabulary itself is huge (web-scale corpora: billions of
distinct tokens/URLs/hosts). The Misra-Gries path here bounds the
shuffle by ``partitions × capacity`` REGARDLESS of vocabulary size:

1. map-only per-partition MG summaries (mapInPandas, Arrow-batched,
   vectorized per-batch counting; each summary ≤ capacity items),
2. merge candidates (a shuffle of ≤ partitions × capacity tiny rows),
3. exact recount of ONLY the candidate items (broadcast semi-join +
   map-side-combined count), then the exact top-k tail.

Correctness is EXACT, not approximate, whenever the k-th heaviest
item's true count exceeds N/(capacity+1) (N = group's total item
count): the MG merge guarantee puts every such item in some summary,
and the recount pass restores exact counts — so the output is
bit-identical to the brute-force aggregation and an exact SQL oracle
can grade it. When the condition fails the gate fails loudly (oracle
mismatch) rather than silently approximating; capacity is the knob.

Misra & Gries 1982; merge property per Agarwal et al., "Mergeable
Summaries" (PODS 2012). The per-batch shrink (subtract the
(capacity+1)-th largest count, drop non-positives) is the standard
batched formulation with the same ≤ N/(capacity+1) undercount bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Column types the per-batch pandas groupby counts faithfully (floats
# are excluded on purpose: NaN keys silently drop, and float equality
# is no basis for identity counting).
_GROUPABLE = {"string", "bigint", "int", "smallint", "tinyint", "boolean", "date"}


def _col_type(df: DataFrame, col: str) -> str:
    t = df.schema[col].dataType.simpleString()
    if t not in _GROUPABLE:
        raise TypeError(
            f"mg_summaries: column {col!r} has type {t}; supported key/item "
            f"types are {sorted(_GROUPABLE)} (identity-countable in pandas)"
        )
    return t


def mg_summaries(
    df: DataFrame, key_col: str, item_col: str, capacity: int
) -> DataFrame:
    """Per-partition batched Misra-Gries summaries over an item-stream
    frame (one row per occurrence): ``(key, item, lb)`` with at most
    ``capacity`` items per (partition, key) and ``lb`` undercounting
    the partition-local truth by ≤ N_partition/(capacity+1). Map-only;
    Arrow-batched; per-batch counting is a vectorized pandas groupby,
    so Python-level work is O(distinct-per-batch), not O(rows).

    Precondition: occurrence rows must be null-free in both columns
    (pandas groupby silently drops NaN keys, which would diverge from
    a null-keeping exact twin) — the tokenize/explode producers here
    guarantee it; filter first for nullable inputs. Key/item columns
    must be identity-countable types (validated eagerly; the output
    schema mirrors the input types rather than assuming string)."""
    key_t, item_t = _col_type(df, key_col), _col_type(df, item_col)

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vc = pdf.groupby([key_col, item_col], sort=False).size()
            for (k, it), c in vc.items():
                d = counters.setdefault(k, {})
                d[it] = d.get(it, 0) + int(c)
            for k, d in counters.items():
                if len(d) > capacity:
                    vals = sorted(d.values(), reverse=True)
                    delta = vals[capacity]  # (capacity+1)-th largest
                    counters[k] = {t: c - delta for t, c in d.items() if c > delta}
        rows = [(k, t, c) for k, d in counters.items() for t, c in d.items()]
        yield pd.DataFrame(rows, columns=[key_col, item_col, "lb"])

    return df.mapInPandas(
        summarize, schema=f"{key_col} {key_t}, {item_col} {item_t}, lb long"
    )


def mg_exact_topk(
    df: DataFrame,
    key_col: str,
    item_col: str,
    k: int,
    capacity: int,
    check_exact: bool = False,
) -> DataFrame:
    """Exact per-key top-k items with MG-bounded shuffle: summaries →
    candidate union → broadcast-semi-join recount (map-side combine:
    the shuffle carries ≤ partitions × |candidates| partial rows) →
    exact top-k window with (count desc, item asc) tiebreak. Output
    ``(key, item, n, rank)`` equals the brute-force aggregation
    whenever the k-th item clears the N/(capacity+1) MG threshold.

    UNCHECKED PRECONDITION (default path): when the k-th item does NOT
    clear that threshold the result is a plausible-looking but possibly
    wrong top-k — the registry gate fails loudly only because its exact
    oracle grades it. Direct library callers should pass
    ``check_exact=True``: the threshold is then verified per key (one
    extra map-side-combined count pass over ``df`` plus a bounded
    collect of one row per key) and a ValueError names every key whose
    k-th candidate count fails to clear total/(capacity+1) — or, for
    keys with fewer than k candidates, whose candidate set fails to
    cover every distinct item (candidate coverage, not merely
    n_distinct < k, is what makes the short case exact: MG can evict
    items whenever distinct-per-partition exceeds capacity, even with
    total distinct below k). The check runs one eager job; capacity is
    the knob when it trips. The threshold is the SUFFICIENT condition,
    so the guard is conservative: a borderline capacity can produce a
    correct top-k yet still raise — that is the safe direction for a
    guard."""
    summ = mg_summaries(df, key_col, item_col, capacity)
    cands = summ.select(key_col, item_col).distinct()
    recount = (
        df.join(F.broadcast(cands), [key_col, item_col])
        .groupBy(key_col, item_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(key_col).orderBy(F.col("n").desc(), F.col(item_col).asc())
    out = (
        recount.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    if check_exact:
        kth = out.filter(F.col("rank") == k).select(key_col, F.col("n").alias("kth_n"))
        totals = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("total"))
        joined = totals.join(kth, key_col, "left")
        # kth_n present: exact iff kth_n > total/(capacity+1).
        bad = [
            (r[key_col], r["kth_n"], r["total"])
            for r in joined.filter(
                F.col("kth_n").isNotNull()
                & (F.col("kth_n") * (capacity + 1) <= F.col("total"))
            ).collect()  # bounded: one row per key
        ]
        # kth_n absent (< k candidates): the recount made every
        # candidate's count exact, so the output equals brute force iff
        # the candidate set covers ALL of the key's distinct items.
        # Fewer-than-k distinct alone is NOT sufficient — MG evicts
        # items whenever a partition's running distinct count exceeds
        # capacity, which can happen with total distinct still below k
        # (capacity < k). Checked exactly, but only for this (by
        # construction tiny) key set: flag any key whose true distinct
        # count exceeds its candidate/output row count.
        short = joined.filter(F.col("kth_n").isNull()).select(key_col)
        short_out = (
            out.join(F.broadcast(short), key_col, "left_semi")
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_out"))
        )
        short_bad = [
            (r[key_col], r["n_out"], r["n_distinct"])
            for r in df.join(F.broadcast(short), key_col, "left_semi")
            .select(key_col, item_col)
            .distinct()
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_distinct"))
            .join(short_out, key_col, "left")
            .withColumn("n_out", F.coalesce(F.col("n_out"), F.lit(0)))
            .filter(F.col("n_distinct") > F.col("n_out"))
            .collect()
        ]
        if bad or short_bad:
            raise ValueError(
                "mg_exact_topk: MG exactness not provable (k-th count must "
                "exceed total/(capacity+1), and keys with < k candidates "
                "must have every distinct item as a candidate); raise "
                "capacity. Violating (key, kth_count, total) | "
                f"(key, n_candidates, n_distinct): {(bad + short_bad)[:20]}"
            )
    return out
