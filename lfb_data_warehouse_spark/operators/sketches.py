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
    guarantee it; filter first for nullable inputs."""

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
        summarize, schema=f"{key_col} string, {item_col} string, lb long"
    )


def mg_exact_topk(
    df: DataFrame, key_col: str, item_col: str, k: int, capacity: int
) -> DataFrame:
    """Exact per-key top-k items with MG-bounded shuffle: summaries →
    candidate union → broadcast-semi-join recount (map-side combine:
    the shuffle carries ≤ partitions × |candidates| partial rows) →
    exact top-k window with (count desc, item asc) tiebreak. Output
    ``(key, item, n, rank)`` equals the brute-force aggregation
    whenever the k-th item clears the N/(capacity+1) MG threshold."""
    summ = mg_summaries(df, key_col, item_col, capacity)
    cands = summ.select(key_col, item_col).distinct()
    recount = (
        df.join(F.broadcast(cands), [key_col, item_col])
        .groupBy(key_col, item_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(key_col).orderBy(F.col("n").desc(), F.col(item_col).asc())
    return (
        recount.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
