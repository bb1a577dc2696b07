"""Iterative graph algorithms over edge DataFrames (PageRank).

Complements ``dedup.connected_components``: where components answer
"which docs are the same", PageRank answers "which docs are central"
— e.g. rank canonical documents inside a near-duplicate / citation /
link graph when choosing which copy to keep, or prioritize a crawl
frontier. Reference has no graph surface; this is part of the
large-scale training-data extension (SURVEY.md §2 scale additions).

Execution shape (the standard distributed PageRank):

- out-degrees computed once and cached;
- each round is ONE join (ranks → edges) + ONE aggregate (sum of
  contributions per destination) — both shuffle on the node id, so
  co-partitioning is stable across rounds;
- every round ``localCheckpoint``s the new rank vector, truncating
  lineage — without this the logical plan nests one level per round
  and driver-side planning OOMs after a few dozen iterations;
  convergence = L1 delta below tolerance, checked on the
  checkpointed round result (no extra pass).

Dangling nodes (no out-edges) redistribute uniformly, keeping the
rank vector a probability distribution (sums to n/n = 1·n_nodes scale
below uses the "sum to N" convention so ranks are comparable across
graph sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    check_every: int = 5,
) -> DataFrame:
    """PageRank over an undirected pair list (id_a, id_b) → (_id, rank).

    Ranks follow the sum-to-N convention (uniform start rank 1.0).
    Undirected: each pair contributes an edge in both directions, so
    there are no dangling nodes by construction.

    Convergence (L1 delta < tol·N) is tested every ``check_every``
    rounds — the delta is its own join+aggregate job over all nodes,
    so testing every round would add one full extra pass per
    iteration for a check that rarely fires early. The returned frame
    is localCheckpoint'd; callers holding many results across a long
    session should ``unpersist()`` ones they are done with.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    degrees = edges.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(
        eager=True
    )
    nodes = degrees.select(F.col("src").alias("_id"))
    n_nodes = nodes.count()
    if n_nodes == 0:
        edges.unpersist()
        degrees.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))

    ranks = nodes.withColumn("rank", F.lit(1.0)).localCheckpoint(eager=True)
    for it in range(max_iter):
        contribs = (
            edges.join(degrees, "src")
            .join(ranks, edges.src == ranks._id)
            .select("dst", (F.col("rank") / F.col("deg")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("incoming"))
        )
        new_ranks = (
            nodes.join(contribs, nodes._id == contribs.dst, "left")
            .select(
                "_id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("incoming", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        check = (it + 1) % check_every == 0 or it == max_iter - 1
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "prev"), "_id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
            .first()[0]
            if check
            else None
        )
        ranks.unpersist()
        ranks = new_ranks
        if delta is not None and delta < tol * n_nodes:
            break
    edges.unpersist()
    degrees.unpersist()
    return ranks
