"""Connected components — dedup-cluster assignment over near-dup pairs.

A dedup pipeline's pair finders (MinHash/SimHash/embedding LSH) emit
EDGES (doc_a, doc_b); keeping one survivor per *cluster* needs the
transitive closure — the classic union-find step, here as iterative
min-label propagation expressed in DataFrame joins:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is one join + one aggregate (both
plain shuffles on the node key); the number of rounds is bounded by the
graph diameter — for near-dup clusters that is tiny (dup clusters are
dense, diameters of 2-4), and the loop exits as soon as a round changes
nothing. The driver-side loop only inspects a scalar per round (the
changed-count), never the data.

At 100 TB scale: this is the standard "hash-to-min" formulation
(Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds") restricted to min-propagation; checkpoint labels
every few rounds to truncate lineage (``checkpoint_every``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Assign each node the minimum node id reachable from it.

    ``edges`` is an undirected edge list (each pair once is enough).
    Returns ``(node, component)`` — component = min id in the cluster;
    singleton nodes that never appear in an edge are absent (callers
    left-join and coalesce to the node's own id).
    """
    sym = edges.selectExpr(f"{src} AS a", f"{dst} AS b").union(
        edges.selectExpr(f"{dst} AS a", f"{src} AS b")
    )
    sym = sym.filter(F.col("a") != F.col("b")).distinct().persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    for i in range(max_iter):
        # candidate labels from neighbors: neighbor's current component
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            # truncate the join-loop lineage (executor-side, no driver collect)
            new_labels = new_labels.localCheckpoint(eager=True)
        new_labels = new_labels.persist()
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), on="node")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        sym.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter) — labels would be silently "
            "wrong; raise max_iter"
        )
    sym.unpersist()
    # hand back a lineage-truncated frame and release the loop's pinned
    # cache: localCheckpoint blocks are GC-managed (ContextCleaner),
    # persist() blocks would stay pinned until the caller unpersists
    out = labels.localCheckpoint(eager=True)
    labels.unpersist()
    return out
