"""Persisted incremental similarity-edge graph.

At 100 TB the LSH-verified near-duplicate pair graph (PageRank's
input, component audits, canonical-copy selection) is a curated
artifact maintained ALONGSIDE the corpus, not recomputed per query:
candidate generation + exact verification over the full corpus was
~all of the pagerank query's cost (7.1 s at sf0.1, ~62 s p50 at sf1 —
round-8 numbers for the one-shot build) and, before round 9, any
corpus change rebuilt every edge from scratch.

``EdgeStore`` follows the engine's batch lifecycle
(:class:`~etl_database_spark.operators.batchstore.BatchStore`) with
TWO signed row kinds:

- signatures under ``_sigs`` — ``(_id, sig_0..sig_{p-1}, sign)``
  partitioned by batch: the corpus-lifetime MinHash signature table,
  appended one batch per ingest (one shingle+minhash pass over the
  NEW documents only);
- edges in the store root — ``(id_a, id_b, jaccard, sign)``
  partitioned by batch: each ingest LSH-joins the new batch's
  signatures against the full (merged) signature table
  (:func:`~etl_database_spark.functions.dedup
  .lsh_candidate_pairs_incremental` — same band construction, bucket
  cap on FULL-table bucket sizes, in-join ``min_agree`` cut), exactly
  Jaccard-verifies the candidates against the corpus text, and
  appends only the verified new edges. Old–old pairs are never
  re-verified.

Both kinds merge by sign-sum (> 0 ⇒ present), so :meth:`retract`
removes a set of documents EXACTLY — their signature rows and every
incident edge get negated rows — and a later re-ingest of the same
documents (new batch id) re-discovers their edges against the
then-current corpus.

Equivalence to the one-shot build
(:func:`~etl_database_spark.functions.dedup.minhash_near_duplicates`
with the same parameters): every served edge passes the SAME
signature-agreement cut and the SAME exact-Jaccard threshold, and the
``max_bucket`` skew cap is the only batching-sensitive step — bucket
sizes only grow, so incremental discovery yields a SUPERSET of the
one-shot pair set (pairs found while a bucket that later crossed the
cap was still small), identical whenever no bucket crosses the cap
mid-lifecycle (asserted on the fixtures in tests/test_graph.py). All
extra pairs are true positives: the exact verify is pair-intrinsic.

``corpus`` contract: :meth:`ingest` takes the document frame the
verify step reads candidate text from. It must contain every
previously ingested document plus the new batch (at scale: the data
lake's document table — the verify is a semi-joined scan of the
candidate slice, never a full-corpus explode). Ids must be integral
(the engine's ``doc_id`` convention).

No counterpart in the reference repo (training-data extension).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_database_spark.functions import dedup as D
from etl_database_spark.operators.batchstore import BatchStore


class EdgeStore(BatchStore):
    CONFIG_FILE = "_edge_config.json"
    SIGS_SUBDIR = "_sigs"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n: int = 5,
        num_perm: int = 32,
        bands: int = 32,
        threshold: float = 0.3,
        min_agree: int = 3,
        max_bucket: int = 200,
        portable: bool = False,
    ):
        """Defaults are the pagerank edge graph's parameters (r=1
        banding for low-threshold recall, ≥3/32 agreement cut — see
        queries/llmdata.py's edge-source rationale). All seven are
        store identity: edges of different shingle/banding/threshold/
        hashing schemes must never merge. ``portable=True`` swaps the
        shingle and band hashes for the md5-derived cross-engine forms
        (functions.dedup ``portable``) so a store built with the
        checkable-twin parameters serves edges a DuckDB oracle can
        replay bit-for-bit."""
        super().__init__(spark, path)
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        self.threshold = threshold
        self.min_agree = min_agree
        self.max_bucket = max_bucket
        self.portable = portable
        self._check_config()

    def _config(self) -> dict:
        return {
            "n": self.n,
            "num_perm": self.num_perm,
            "bands": self.bands,
            "threshold": self.threshold,
            "min_agree": self.min_agree,
            "max_bucket": self.max_bucket,
            "portable": self.portable,
        }

    # -- write path -------------------------------------------------------

    def ingest(
        self,
        new_docs: DataFrame,
        batch: str,
        corpus: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> bool:
        """Add one document batch: one shingle+minhash pass over the
        batch, one banded join of the batch's signatures against the
        merged signature table, one exact-Jaccard verify of the
        candidates against ``corpus`` (previously ingested docs ∪ this
        batch — see module docstring). Idempotent per batch id; a
        crash anywhere before the final commit is healed by the retry
        (both the signature and edge partitions are rewritten)."""
        if not self._begin_batch(batch):
            return False
        # A crashed previous attempt may have left partial batch
        # partitions. Dynamic-partition-overwrite replaces them only
        # when the retry produces rows for the partition — an edge
        # batch can legitimately be EMPTY, so clear stale partials
        # explicitly (local-filesystem store, same as the swap logic).
        for root in (self.path, os.path.join(self.path, self.SIGS_SUBDIR)):
            stale = os.path.join(root, f"batch={batch}")
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        sigs_new = D.minhash_signatures(
            D.shingles(new_docs, text_col, id_col, self.n, portable=self.portable),
            self.num_perm,
        ).localCheckpoint(eager=True)
        self._write_sigs(sigs_new, batch, sign=1)
        # materialize candidates once: jaccard_verify counts them and
        # joins them, which would otherwise run the banded join twice
        cands = D.lsh_candidate_pairs_incremental(
            sigs_new,
            self.signatures(),
            num_perm=self.num_perm,
            bands=self.bands,
            max_bucket=self.max_bucket,
            portable=self.portable,
            min_agree=self.min_agree,
        ).localCheckpoint(eager=True)
        verified = D.jaccard_verify(
            cands,
            D.shingles(corpus, text_col, id_col, self.n, portable=self.portable),
            threshold=self.threshold,
            release=[cands],
        )
        self._write_batch(verified.withColumn("sign", F.lit(1).cast("int")), batch)
        sigs_new.unpersist()
        return True

    def retract(self, doc_ids: DataFrame, batch: str, id_col: str = "doc_id") -> bool:
        """Remove a set of documents exactly: negate their signature
        rows (so future ingests never rediscover edges to them) and
        every stored edge incident to them, under a NEW batch id.
        ``doc_ids`` is any frame carrying ``id_col``."""
        if not self._begin_batch(batch):
            return False
        ids = doc_ids.select(F.col(id_col).alias("_id")).distinct().localCheckpoint(eager=True)
        neg_sigs = self.signatures().join(ids, "_id", "left_semi")
        self._write_sigs(neg_sigs, batch, sign=-1)
        edges = self.edges()
        cols = ["id_a", "id_b", "jaccard"]
        # select() after each semi-join: a keyed join moves its key
        # column first, and a positional union would swap a/b
        incident = (
            edges.join(ids.select(F.col("_id").alias("id_a")), "id_a", "left_semi")
            .select(*cols)
            .union(
                edges.join(ids.select(F.col("_id").alias("id_b")), "id_b", "left_semi")
                .select(*cols)
            )
            .distinct()
        )
        self._write_batch(
            incident.withColumn("sign", F.lit(-1).cast("int")), batch, commit=False
        )
        ids.unpersist()
        # record the retraction BEFORE the commit: a crash in between
        # re-runs both (the batch is not committed yet)
        self._record_retraction(batch)
        self._commit(batch)
        return True

    def _write_sigs(self, sigs: DataFrame, batch: str, sign: int) -> None:
        (
            sigs.withColumn("sign", F.lit(sign).cast("int"))
            .withColumn("batch", F.lit(batch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(os.path.join(self.path, self.SIGS_SUBDIR))
        )

    # -- read path --------------------------------------------------------

    def signatures(self) -> DataFrame:
        """Merged corpus-lifetime signature table (_id, sig_*):
        sign-sum > 0, retraction negatives folded away."""
        sig_cols = [f"sig_{i}" for i in range(self.num_perm)]
        raw = self.spark.read.parquet(os.path.join(self.path, self.SIGS_SUBDIR))
        return (
            raw.groupBy("_id", *sig_cols)
            .agg(F.sum("sign").alias("s"))
            .where(F.col("s") > 0)
            .select("_id", *sig_cols)
        )

    def edges(self) -> DataFrame:
        """Merged verified edge list (id_a, id_b, jaccard):
        sign-sum > 0. Empty (typed) before any edge exists."""
        try:
            raw = self.spark.read.parquet(self.path)
        except Exception:
            # no edge file written yet (first batch had no pairs)
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, jaccard double"
            )
        return (
            raw.groupBy("id_a", "id_b", "jaccard")
            .agg(F.sum("sign").alias("s"))
            .where(F.col("s") > 0)
            .select("id_a", "id_b", "jaccard")
        )

    # -- maintenance ------------------------------------------------------

    def _compact_fold(self, tmp: str) -> None:
        """Fold both row kinds to ``batch=base`` with sign 1 —
        retraction negatives cancel here."""
        folded_edges = self.edges().select(
            "id_a", "id_b", "jaccard", F.lit(1).cast("int").alias("sign")
        ).withColumn("batch", F.lit(self.BASE_BATCH))
        folded_edges.write.mode("overwrite").partitionBy("batch").parquet(tmp)
        folded_sigs = self.signatures().withColumn(
            "sign", F.lit(1).cast("int")
        ).withColumn("batch", F.lit(self.BASE_BATCH))
        folded_sigs.write.mode("overwrite").partitionBy("batch").parquet(
            os.path.join(tmp, self.SIGS_SUBDIR)
        )
