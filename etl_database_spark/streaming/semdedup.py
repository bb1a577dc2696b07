"""Streaming semantic dedup against a persisted embedding store.

The batch operator (functions/similarity.semantic_dedup, SemDeDup —
arXiv:2303.09540) prunes cosine-near-duplicates within embedding
clusters. Like text near-dups (streaming/near_dup.py), semantic
duplicates cannot be watermark-bounded — a paraphrase embedded last
month is still a semantic dup — so streaming state is a *persisted
embedding store* partitioned by micro-batch, not stream-engine state:

- centroids are FIXED, trained offline (``kmeans_fit`` over a sample)
  — the production quantizer pattern: a streaming job must not move
  cluster boundaries under previously stored vectors;
- each micro-batch argmin-assigns ONLY its new vectors (broadcast
  centroid join — cost ∝ batch, never ∝ corpus) and computes their
  norms once;
- within-batch pairs come from the same cluster-local self-join the
  batch operator uses; cross-batch pairs join the batch's clusters
  against the store's — both score with the identical rounded
  dot/(norm·norm) arithmetic, so every emitted pair matches the batch
  twin bit-for-bit;
- the batch's assignments are then stored, so state grows by one
  (vector, norm, cluster) row per new document — the minimum any
  corpus-lifetime semantic-dup detector can hold. At 100 TB the store
  is written partitioned by cluster_id so each micro-batch's
  cross-join reads only the clusters the batch actually touches.

Emitted matches are the RAW qualifying pair stream
(cluster_id, id_a < id_b, cos_sim); the keep-lowest-id prune list is
a trivial aggregation over the accumulated pairs (min id_a per id_b),
which a consumer runs whenever it snapshots the corpus — exactly the
split the reference's snapshot/report separation uses.

All writes are batch-id-keyed with overwrite semantics inside
``foreachBatch`` + AvailableNow, and the store binds to the stream
checkpoint's query id — the same exactly-once construction as
streaming/near_dup.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_database_spark.functions import similarity as S
from etl_database_spark.streaming.near_dup import (
    SignatureStore,
    _checkpoint_stream_id,
)


class EmbeddingStore(SignatureStore):
    """Per-batch-partitioned parquet store of assigned embeddings:
    (_id, _vec, cluster_id, _norm). Reuses SignatureStore's batch-id
    overwrite idempotence and checkpoint-identity binding."""

    def __init__(self, spark: SparkSession, path: str):
        super().__init__(spark, path, num_perm=0)


def process_semdedup_batch(
    batch_df: DataFrame,
    store: EmbeddingStore,
    matches_path: str,
    centroids: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int = 0,
) -> None:
    """One micro-batch: assign new vectors, store the assignments,
    pair the batch within itself and against the store, write the
    qualifying pairs. Both writes key on ``batch_id`` with overwrite
    semantics so a foreachBatch replay reproduces rather than
    duplicates its output; the store read excludes this batch's own
    partition so a replay never pairs the batch against its
    first-attempt self (which is also why appending BEFORE pairing is
    replay-safe).

    Per-batch action budget (r12, guide §5): the assignment APPEND is
    the materializing action for the broadcast-centroid assign pass —
    the pair stage serves from the batch's own just-written store
    partition (lineage-free read-back) — so a micro-batch costs two
    driver actions (assign append, match write) instead of four
    (isEmpty probe, cache+count, match write, assign append)."""
    store.append(
        S.semantic_assign(batch_df, centroids, id_col, vec_col), batch_id
    )
    assigned = store.read_batch(batch_id)
    if assigned is None:
        return
    pairs = S.semantic_pairs(assigned, assigned, threshold)
    stored = store.read(exclude_batch=batch_id)
    if stored is not None:
        cross = S.semantic_pairs(stored, assigned, threshold, self_join=False)
        pairs = pairs.unionByName(cross)
    pairs.write.mode("overwrite").parquet(
        os.path.join(matches_path, f"batch={batch_id}")
    )


def run_semdedup_once(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    matches_path: str,
    checkpoint: str,
    centroids: DataFrame,
    **kwargs,
) -> None:
    """AvailableNow driver: drain the source through the semantic-dedup
    batch handler; the checkpoint guarantees each input file is
    assigned and paired exactly once across restarts, and the store is
    bound to this checkpoint's stream identity before any batch
    writes."""
    store = EmbeddingStore(spark, store_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        store.bind(_checkpoint_stream_id(checkpoint))
        process_semdedup_batch(
            batch_df, store, matches_path, centroids, batch_id=batch_id, **kwargs
        )

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def prune_from_matches(matches: DataFrame) -> DataFrame:
    """The prune list served from the ACCUMULATED match stream →
    (cluster_id, pruned_id, kept_id, cos_sim), keep-lowest-id rule —
    identical semantics (and identical aggregate shape: a
    lexicographic struct-min, partial-combined map-side) to the batch
    operator's final stage (functions/similarity.semantic_dedup), so
    serve(stream store) == batch prune list whenever the accumulated
    pairs equal the batch pair stage (which the store construction
    guarantees and tests/test_semdedup.py asserts).

    This is the day-keyed incremental serve: each day's micro-batch
    ingest costs assign+pair for THAT day only (cross-day pairs via
    the cluster-partitioned store read), and the corpus-wide prune
    list is this counter-shaped aggregation — never a recompute over
    the corpus.
    """
    from pyspark.sql import functions as F

    return (
        matches.groupBy("cluster_id", F.col("id_b").alias("pruned_id"))
        .agg(F.min(F.struct("id_a", "cos_sim")).alias("_keep"))
        .select(
            "cluster_id",
            "pruned_id",
            F.col("_keep.id_a").alias("kept_id"),
            F.col("_keep.cos_sim").alias("cos_sim"),
        )
        .orderBy("cluster_id", "pruned_id")
    )
