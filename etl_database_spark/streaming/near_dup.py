"""Streaming near-duplicate detection against a persisted signature
store.

The exact streaming dedup (streaming/dedup.py) suppresses byte-equal
re-arrivals with watermark-bounded state. Near-dup detection cannot be
watermark-bounded — a paraphrase of a document ingested last month is
still a near-dup — so the state here is a *persisted MinHash signature
store* (Parquet), not stream-engine state:

- each micro-batch shingles + signs ONLY its new documents (cost ∝
  batch, never ∝ corpus);
- banded LSH hashes of the batch join the store's band table to find
  candidate (new, stored) pairs — the join touches only colliding
  band buckets, the standard LSH-at-scale shape;
- matches are scored with the signature-agreement estimate (σ ≈
  sqrt(J(1-J)/k)); this stage is deliberately estimate-grade — exact
  shingle verification would require storing shingle sets (state ∝
  corpus text); flagged pairs feed the batch verifier offline
  (functions/dedup.jaccard_verify) if exactness is needed;
- the batch's signatures are then appended to the store, so state
  grows by O(k longs) per unique document — the minimum any
  corpus-lifetime near-dup detector can hold.

All state transitions run inside ``foreachBatch`` with an
AvailableNow trigger: the stream checkpoint makes each file processed
exactly once, and the store append is idempotent per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_database_spark.functions.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)


def _band_table(sigs: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(_id, band_id, band_hash) — the LSH bucket keys of a sig frame."""
    rows_per_band = num_perm // bands
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            F.xxhash64(
                *[
                    F.col(f"sig_{i}")
                    for i in range(j * rows_per_band, (j + 1) * rows_per_band)
                ]
            ).alias("band_hash"),
        )
        for j in range(bands)
    ]
    return sigs.select("_id", F.explode(F.array(*band_structs)).alias("b")).select(
        "_id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_hash").alias("band_hash"),
    )


class SignatureStore:
    """Parquet-backed MinHash signature store: one row per document,
    wide sig columns. Append-only; the band table is derived on read
    (k xxhash64 calls per row — cheaper than persisting and keeps the
    store a single source of truth)."""

    def __init__(self, spark: SparkSession, path: str, num_perm: int = 32):
        self.spark = spark
        self.path = path
        self.num_perm = num_perm

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            name.endswith(".parquet") for name in os.listdir(self.path)
        )

    def read(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self.exists() else None

    def append(self, sigs: DataFrame) -> None:
        sigs.write.mode("append").parquet(self.path)


def process_batch(
    batch_df: DataFrame,
    store: SignatureStore,
    matches_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> None:
    """One micro-batch: sign new docs, LSH-join them against the
    store, append estimate-scored matches, then append the new sigs.

    Within-batch near-dups are found by the same banded self-join the
    batch operator uses (lsh_candidate_pairs), so a duplicate pair
    split across batches and one inside a single batch both surface.
    """
    if batch_df.isEmpty():
        return
    sh = shingles(batch_df, text_col, id_col, n).cache()
    new_sigs = minhash_signatures(sh, num_perm).cache()
    new_sigs.count()

    agree = sum(
        (F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}")).cast("int")
        for i in range(num_perm)
    ) / F.lit(num_perm)

    def score(pairs: DataFrame, left: DataFrame, right: DataFrame) -> DataFrame:
        return (
            pairs.join(left.alias("a"), F.col("id_a") == F.col("a._id"))
            .join(right.alias("b"), F.col("id_b") == F.col("b._id"))
            .withColumn("est_jaccard", agree)
            .where(F.col("est_jaccard") >= threshold)
            .select("id_a", "id_b", "est_jaccard")
        )

    # within-batch pairs (banded self-join, skew-capped)
    within = score(
        lsh_candidate_pairs(new_sigs, num_perm, bands), new_sigs, new_sigs
    )

    # cross-batch pairs: batch band table joins the store's band table
    stored = store.read()
    if stored is not None:
        stored_bands = _band_table(stored, store.num_perm, bands)
        new_bands = _band_table(new_sigs, num_perm, bands)
        cross_pairs = (
            stored_bands.join(new_bands.alias("n"), ["band_id", "band_hash"])
            .where(stored_bands["_id"] != F.col("n._id"))
            .select(
                stored_bands["_id"].alias("id_a"), F.col("n._id").alias("id_b")
            )
            .distinct()
        )
        cross = score(cross_pairs, stored, new_sigs)
        within = within.unionByName(cross)

    within.write.mode("append").parquet(matches_path)
    store.append(new_sigs)
    sh.unpersist()
    new_sigs.unpersist()


def run_near_dup_once(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    matches_path: str,
    checkpoint: str,
    **kwargs,
) -> None:
    """AvailableNow driver: drain the source through the near-dup
    batch handler; the checkpoint guarantees each input file is signed
    and matched exactly once across restarts."""
    store = SignatureStore(spark, store_path, kwargs.get("num_perm", 32))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(batch_df, store, matches_path, **kwargs)

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
