"""Iterative graph algorithms as DataFrame joins.

``connected_components`` (operators/dedup.py) handles the dedup-graph
clustering; this module holds the rank-propagation family. The reference
has no graph surface at all — these are brief-mandated extensions for
corpus-quality work (domain authority for web-crawl filtering, dup-graph
diagnostics).

Scale shape: one PageRank iteration = one equi-join of the rank vector
(|V| rows) with the out-normalized edge list (|E| rows) on the source
key, then a sum-aggregate on the destination key — exactly two keyed
shuffles per round, no driver-side state. A fixed iteration count keeps
the plan bounded; callers running to convergence should checkpoint the
rank vector every few rounds (same lineage argument as
``connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (deterministic,
    oracle-checkable — a convergence loop would make the result depend
    on float tolerance).

    r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u) · w(u,v) / W(u)

    Nodes are the union of sources and destinations; rank starts
    uniform. Dangling nodes (no out-edges) keep their (1-d)/N base and
    leak the damped remainder — the plain formulation, matched exactly
    by the SQL oracle; pass a self-loop per dangling node upstream if
    mass conservation matters.

    Returns (node, rank) with rank unrounded — callers round at the
    output boundary.
    """
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        (
            F.col(weight_col).cast("double")
            if weight_col
            else F.lit(1.0)
        ).alias("_w"),
    )
    # out-strength-normalized transition probabilities; computed once,
    # reused every round (one shuffle on _src)
    out_w = Window.partitionBy("_src")
    trans = e.withColumn("_p", F.col("_w") / F.sum("_w").over(out_w)).drop("_w")

    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # scalar |V|: one tiny job, not per-iteration
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))  # empty (node, rank)
    base = (1.0 - damping) / n_nodes

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contrib = (
            trans.join(
                ranks.select(F.col("node").alias("_src"), "rank"), "_src"
            )
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .withColumn(
                "rank",
                F.lit(base) + F.lit(damping) * F.coalesce("_in", F.lit(0.0)),
            )
            .drop("_in")
        )
    return ranks
