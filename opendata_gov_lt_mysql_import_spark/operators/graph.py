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


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 5,
    scale: int = 10**12,
    undirected: bool = False,
) -> DataFrame:
    """K PageRank iterations in FIXED-POINT integer arithmetic; returns
    (node, rank_fp) with ranks in units of 1/``scale``.

    Same message-passing loop as :func:`pagerank`, but every quantity is
    a BIGINT: rank0 = scale, per-edge contribution = rank DIV out-degree,
    update = (15*scale) DIV 100 + (85 * inflow) DIV 100 (damping 0.85 as
    exact integer ratios). Integral division truncates identically on
    every engine, and integer sums are summation-order-free — so K
    chained iterations are BIT-IDENTICAL across Spark and any ANSI SQL
    engine, which upgrades the K-round query from rows-only to fully
    oracle-checked (the float twin's per-round sums reorder across
    partitions and flip low decimals). Quantization: each DIV truncates
    < 1 unit (1e-12), so total mass drifts DOWN by at most
    edges+nodes units per round — deterministic, and immaterial next to
    the float twin's nondeterminism. Overflow headroom: rank <= N*scale;
    85*inflow <= 85*N*scale needs N*scale < 1.08e17, i.e. ~1e5 nodes at
    scale=1e12 — drop scale one decade per 10x nodes beyond that. The
    headroom is ASSERTED at runtime (round-6 advisory): Spark's
    non-ANSI BIGINT would silently wrap past it while a HUGEINT-
    promoting oracle would not, so the divergence must be an error, not
    a confusing hash mismatch. The node count is a one-row aggregate
    over the already-persisted node set — bounded setup, not data
    motion."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if undirected:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    # mirrored or not, receivers without out-edges still need rank rows:
    nodes = (
        e.select("src")
        .union(e.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # worst case inside one update: 85 * inflow, inflow <= N * scale
    # (total mass only shrinks under truncating DIV). Require it to fit
    # BIGINT with the same margin the docstring promises.
    n_nodes = nodes.count()
    if 85 * n_nodes * scale >= 2**63:
        raise ValueError(
            f"fixed-point overflow: {n_nodes} nodes at scale={scale} "
            f"needs 85*N*scale < 2^63; lower scale to "
            f"<= {2**63 // (85 * n_nodes)} (one decade per 10x nodes)"
        )
    teleport = 15 * scale // 100
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank_fp"))
    try:
        for _ in range(k):
            contrib = ed.join(
                ranks, ed["src"] == ranks["node"]
            ).select(
                F.col("dst").alias("node"),
                F.expr("rank_fp DIV deg").alias("c"),
            )
            inflow = contrib.groupBy("node").agg(F.sum("c").alias("infl"))
            ranks = (
                nodes.join(inflow, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(teleport)
                        + F.expr("(85 * coalesce(infl, 0)) DIV 100")
                    ).cast("long").alias("rank_fp"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        ed.unpersist()
        nodes.unpersist()
    return ranks
