"""Iterative graph algorithms as DataFrame message passing.

PageRank here is the join+agg idiom at K iterations: a static
edge+out-degree table (computed once, persisted, reused every round)
joined to the current rank vector, contributions summed receiver-side,
teleport mass re-added. Per-round ``localCheckpoint`` truncates the
lineage so round K's plan does not re-embed rounds 1..K-1 — the same
discipline as operators/dedup.py's connected-components loop.

Scale: each iteration is two shuffles (rank join on src, contribution
agg on dst) over the edge stream; the rank vector is node-sized. Skewed
high-in-degree nodes partial-aggregate map-side. The reference has no
graph surface (odgovlt.py is a row-at-a-time harvester); this is part
of the beyond-reference training-data/analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 5,
    damping: float = 0.85,
    undirected: bool = False,
) -> DataFrame:
    """K iterations of PageRank over ``edges``; returns (node, rank).

    Simplified (no dangling-mass redistribution): nodes without
    out-edges absorb rank. With ``undirected=True`` every edge is
    mirrored, so no node dangles and total rank mass is conserved at
    exactly N (the fixed point of T' = (1-d)·N + d·T) — the invariant
    tests/test_graph.py pins. Ranks start at 1.0 per node.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if undirected:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the loop-invariant side: edges + sender out-degree, materialized
    # once and reused by every iteration's join
    ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select("src")
        .union(e.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    try:
        for _ in range(k):
            contrib = ed.join(
                ranks, ed["src"] == ranks["node"]
            ).select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            inflow = contrib.groupBy("node").agg(
                (
                    F.lit(1.0 - damping) + F.lit(damping) * F.sum("c")
                ).alias("rank")
            )
            # nodes with no in-edges keep only teleport mass
            ranks = (
                nodes.join(inflow, "node", "left")
                .select(
                    "node",
                    F.coalesce("rank", F.lit(1.0 - damping)).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        ed.unpersist()
        nodes.unpersist()
    return ranks
