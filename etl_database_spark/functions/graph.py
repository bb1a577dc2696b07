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
    max_edges_local: int | None = 1_000_000,
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

    ``max_edges_local``: graphs at or under this edge count run the
    SAME power iteration driver-locally (numpy) instead of paying
    ~20 × (join+aggregate+checkpoint) of per-job scheduling overhead
    for kilobytes of state — the exact gate
    ``dedup.connected_components`` already uses for union-find. The
    distributed loop below is the >bound path and stays the shape
    that scales (per-round cost ∝ edges, lineage truncated each
    round). ``None`` forces the distributed loop.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if max_edges_local is not None:
        # Tier gate: edges is already eagerly checkpointed, so count()
        # is one trivial action over materialized blocks. Collect the
        # edge rows ONLY when the count says the graph fits the local
        # tier (r11 advice: the previous limit(gate+1).collect() probe
        # deserialized up to 1M+1 full Rows on the driver on EVERY
        # call, even on the large-graph path where they were discarded).
        if edges.count() <= max_edges_local:
            probe = edges.collect()
            out = _pagerank_local(
                pairs.sparkSession, probe, damping, max_iter, tol, check_every
            )
            edges.unpersist()
            return out
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


def _pagerank_local(
    spark,
    rows: list,
    damping: float,
    max_iter: int,
    tol: float,
    check_every: int,
) -> DataFrame:
    """The gated small-graph path: identical update rule and
    convergence schedule to the distributed loop, run as one numpy
    power iteration on the driver over the already-collected edge
    rows. Bounded by ``max_edges_local`` rows (the
    connected_components union-find precedent)."""
    import numpy as np

    if not rows:
        return spark.createDataFrame([], "_id long, rank double")
    ids = sorted({r.src for r in rows})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    src = np.fromiter((idx[r.src] for r in rows), dtype=np.int64, count=len(rows))
    dst = np.fromiter((idx[r.dst] for r in rows), dtype=np.int64, count=len(rows))
    deg = np.bincount(src, minlength=n).astype(np.float64)
    ranks = np.ones(n, dtype=np.float64)
    for it in range(max_iter):
        contrib = ranks / deg
        incoming = np.bincount(dst, weights=contrib[src], minlength=n)
        new_ranks = (1.0 - damping) + damping * incoming
        check = (it + 1) % check_every == 0 or it == max_iter - 1
        done = check and float(np.abs(new_ranks - ranks).sum()) < tol * n
        ranks = new_ranks
        if done:
            break
    return spark.createDataFrame(
        [(int(v), float(ranks[idx[v]])) for v in ids], "_id long, rank double"
    )


def pagerank_portable(
    pairs: DataFrame, damping: float = 0.85, iters: int = 5
) -> DataFrame:
    """(_id, rank) — PageRank over an undirected pair graph with a
    FULLY cross-engine-replayable trajectory (the decimal-sum recipe
    the trained classifier uses, functions/classifier.py): per-edge
    contributions ``rank/deg`` are rounded to 12 digits and summed as
    DECIMAL(38,12) — order-independent exact sums, so every iteration
    is deterministic under any partitioning — and each new rank is
    rounded to 9 digits. There are NO transcendentals anywhere, so the
    replay is exact arithmetic end to end (no ulp guard needed).

    The pair graph is symmetric (both directions of every verified
    near-dup pair), so every node has degree >= 1 and receives
    contributions each round — no dangling-mass term. Fixed
    ``iters`` (the checkable contract; the production pagerank in
    this module iterates to convergence instead).
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n = deg.count()
    r = deg.select(
        F.col("src").alias("_id"),
        F.round(F.lit(1.0) / F.lit(float(n)), 9).alias("rank"),
    ).localCheckpoint(eager=True)
    base = F.lit(1.0 - damping) / F.lit(float(n))
    for _ in range(iters):
        contrib = (
            edges.join(r, edges.src == r._id)
            .join(deg, "src")
            .select(
                "dst",
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(38,12)")
                .alias("c"),
            )
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = sums.select(
            F.col("dst").alias("_id"),
            F.round(base + F.lit(damping) * F.col("s").cast("double"), 9).alias(
                "rank"
            ),
        ).localCheckpoint(eager=True)
    return r
