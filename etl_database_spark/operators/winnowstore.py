"""Persisted incremental winnowing-fingerprint state.

:mod:`etl_database_spark.functions.dedup` computes MOSS winnowing
fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003) in one
zero-shuffle pass — but the similarity report joins documents across
the WHOLE corpus, and at 100 TB the corpus cannot be re-fingerprinted
per ingestion day. This store makes the fingerprint layer incremental
with the engine's standard batch lifecycle (SpanStore / BloomStore /
RollupStore): batch-keyed idempotent ingest with a commit-after-write
manifest, merge-on-read serving, compaction recording absorbed ids.

The stored unit is a POSTING ``(_id, fp, sign)`` — one row per
document per distinct fingerprint value — and signs are ADDITIVE,
which buys the span store's two properties for the winnowing family:

- **exactness**: a posting exists iff its merged sign > 0, so served
  fingerprint stats and similarity pairs are *identical* to a
  full-corpus batch recompute under ANY batch split (the equivalence
  tests pin this; the skew cap is applied to bucket sizes at SERVE
  time — a corpus-level property — so capping commutes with batching);
- **retraction**: a bad batch's postings are removed exactly by
  ingesting negated signs — no rebuild.

Cost model at scale: ingesting a day costs one fingerprint pass over
the day's documents (zero shuffles) plus one partitioned write;
serving pairs costs the same bucket self-join the one-shot path pays,
but over stored postings — the expensive normalize+hash+window scan
of historical text never reruns. Fingerprints are md5-32 for
cross-engine verification; at 100 TB the first change is xxhash64,
which the posting algebra is agnostic to.

No counterpart in the reference repo (training-data extension).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_database_spark.functions import dedup as D


class WinnowStore:
    COMPACTED_FILE = "_compacted.json"
    COMMITTED_FILE = "_committed.json"
    RETRACTED_FILE = "_retracted.json"
    CONFIG_FILE = "_winnow_config.json"
    BASE_BATCH = "base"

    def __init__(self, spark: SparkSession, path: str, k: int = 8, w: int = 4):
        """``(k, w)`` (k-gram size, window width) are part of the
        store identity: fingerprints of different parameters must
        never merge. Persisted on first write; reopening with
        different values raises."""
        self.spark = spark
        self.path = path
        cfg = self._read_json(self.CONFIG_FILE)
        if cfg is not None and (cfg.get("k"), cfg.get("w")) != (k, w):
            raise ValueError(
                f"winnow store {path} was built with k={cfg.get('k')}, "
                f"w={cfg.get('w')}; reopening with k={k}, w={w} would merge "
                "fingerprints of different schemes — pass the original "
                "parameters or rebuild"
            )
        self.k = k
        self.w = w

    # -- write path -------------------------------------------------------

    def _batch_postings(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        sets = D.winnow_fingerprint_sets(docs, text_col, id_col, self.k, self.w)
        # Pin the fingerprint arrays BEFORE exploding: Generate over
        # the raw winnowing expression re-evaluates the whole k-gram
        # md5 chain per OUTPUT row (~n_fps× per document — measured
        # 100× on the sf0.01 fixture), exactly the blow-up
        # winnow_similarity_pairs avoids with its cache. The ingest
        # write is a single action, so an eager localCheckpoint (array
        # rows are tiny) is the materialization barrier here.
        sets = sets.localCheckpoint(eager=True)
        return sets.select("_id", F.explode("_fps").alias("fp"))

    def ingest(
        self, docs: DataFrame, batch: str, text_col: str = "text", id_col: str = "doc_id"
    ) -> bool:
        """Add one document batch's fingerprint postings. Idempotent
        per batch id (manifest commit only after the write); crash
        partials are fully replaced by the retry."""
        return self._write_signed(docs, batch, text_col, id_col, sign=1)

    def retract(
        self, docs: DataFrame, batch: str, text_col: str = "text", id_col: str = "doc_id"
    ) -> bool:
        """Remove a previously delivered batch's postings exactly, by
        ingesting negated signs under a NEW batch id — after
        retraction, served fingerprints and pairs are as if the batch
        never existed."""
        ok = self._write_signed(docs, batch, text_col, id_col, sign=-1)
        if ok:
            self._write_json(
                self.RETRACTED_FILE, sorted(set(self.retractions()) | {batch})
            )
        return ok

    def _write_signed(
        self, docs: DataFrame, batch: str, text_col: str, id_col: str, sign: int
    ) -> bool:
        if batch == self.BASE_BATCH or batch in self.batches():
            return False
        os.makedirs(self.path, exist_ok=True)
        if self._read_json(self.COMMITTED_FILE) is None:
            self._write_json(self.COMMITTED_FILE, self.batches())
        if self._read_json(self.CONFIG_FILE) is None:
            self._write_raw(self.CONFIG_FILE, {"k": self.k, "w": self.w})
        postings = self._batch_postings(docs, text_col, id_col).select(
            "_id", "fp", F.lit(sign).cast("int").alias("sign")
        ).withColumn("batch", F.lit(batch))
        (
            postings.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(self.path)
        )
        self._commit(batch)
        return True

    def retractions(self) -> list[str]:
        return self._read_json(self.RETRACTED_FILE) or []

    # -- read path --------------------------------------------------------

    def postings(self) -> DataFrame:
        """Merged corpus-lifetime postings (_id, fp): SUM of signs
        across batches, retraction negatives folded away."""
        return (
            self.spark.read.parquet(self.path)
            .groupBy("_id", "fp")
            .agg(F.sum("sign").alias("s"))
            .where(F.col("s") > 0)
            .select("_id", "fp")
        )

    def fingerprints(self) -> DataFrame:
        """(_id, n_fps, fp_sum) — exactly what
        functions.dedup.winnow_fingerprints returns on the full
        corpus, under any batch split."""
        return self.postings().groupBy("_id").agg(
            F.count("*").cast("long").alias("n_fps"),
            F.sum("fp").cast("long").alias("fp_sum"),
        )

    def similarity_pairs(
        self,
        min_shared: int = 2,
        min_containment_bp: int = 5000,
        max_bucket: int = 200,
    ) -> DataFrame:
        """MOSS similarity report from the stored postings — the same
        winnow_pairs_from_postings math as the one-shot path, with the
        skew cap evaluated against CURRENT merged bucket sizes."""
        return D.winnow_pairs_from_postings(
            self.postings(),
            min_shared=min_shared,
            min_containment_bp=min_containment_bp,
            max_bucket=max_bucket,
        )

    # -- maintenance ------------------------------------------------------

    def batches(self) -> list[str]:
        committed = self._read_json(self.COMMITTED_FILE)
        if committed is None:
            committed = [
                d.split("=", 1)[1]
                for d in (os.listdir(self.path) if os.path.isdir(self.path) else [])
                if d.startswith("batch=") and os.path.isdir(os.path.join(self.path, d))
            ]
        return sorted(set(committed) | set(self._compacted()))

    def compact(self) -> None:
        """Fold per-batch signed postings into one batch=base posting
        per (_id, fp) — retractions cancel here — and record absorbed
        ids. Write-to-sibling-and-swap."""
        absorbed = sorted(set(self.batches()) | set(self._compacted()))
        tmp = f"{self.path}__compact_{uuid.uuid4().hex[:8]}"
        folded = self.postings().select(
            "_id", "fp", F.lit(1).cast("int").alias("sign")
        ).withColumn("batch", F.lit(self.BASE_BATCH))
        folded.write.mode("overwrite").partitionBy("batch").parquet(tmp)
        with open(os.path.join(tmp, self.COMPACTED_FILE), "w") as fh:
            json.dump([b for b in absorbed if b != self.BASE_BATCH], fh)
        with open(os.path.join(tmp, self.COMMITTED_FILE), "w") as fh:
            json.dump([self.BASE_BATCH], fh)
        for name in os.listdir(self.path):
            src = os.path.join(self.path, name)
            if (
                name.startswith("_")
                and name not in (self.COMPACTED_FILE, self.COMMITTED_FILE)
                and os.path.isfile(src)
            ):
                shutil.copy2(src, os.path.join(tmp, name))
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    # -- sidecar io -------------------------------------------------------

    def _read_json(self, name: str):
        p = os.path.join(self.path, name)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _write_raw(self, name: str, value) -> None:
        tmp = os.path.join(self.path, f".{name}.tmp")
        with open(tmp, "w") as fh:
            json.dump(value, fh)
        os.replace(tmp, os.path.join(self.path, name))

    def _write_json(self, name: str, values: list[str]) -> None:
        self._write_raw(name, sorted(values))

    def _commit(self, batch: str) -> None:
        committed = self._read_json(self.COMMITTED_FILE) or []
        self._write_json(self.COMMITTED_FILE, sorted(set(committed) | {batch}))

    def _compacted(self) -> list[str]:
        return self._read_json(self.COMPACTED_FILE) or []
