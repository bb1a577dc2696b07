"""Persisted incremental substring-dedup state: corpus-lifetime
window-hash counts.

:mod:`etl_database_spark.functions.spans` detects duplicated >= W-token
runs with a corpus-wide count over rolling window hashes. At 100 TB
that count cannot be recomputed from scratch per ingestion day — this
store makes it incremental with the engine's standard batch lifecycle
(RollupStore / BloomStore / IvfIndex): batch-keyed idempotent ingest
with a commit-after-write manifest, merge-on-read serving, compaction
recording absorbed ids.

The stored measure is just ``(h, cnt)`` — and counts are ADDITIVE,
which buys the two properties the Bloom seen-set cannot offer:

- **exactness**: a window is duplicated iff its merged count > 1 — no
  false positives, so per-document span statistics from the store are
  *identical* to a full-corpus batch recompute under ANY batch split
  (the registered query proves it against the one-shot DuckDB oracle);
- **retraction**: a bad batch's contribution is removed exactly by
  ingesting negated counts (same algebra as the rollup's count
  measures) — the Bloom filter would need a rebuild.

Cost model at scale: ingesting a day costs one groupBy over the day's
windows; profiling a day costs one hash join of the day's windows
against the store. Both linear in day size (+ store size for the
join's build side, which a production deployment bounds by bucketing
the store on ``h``). The md5 window hash is kept for cross-engine
verification; at 100 TB the first change is xxhash64 (8-byte shuffle
keys), which the span algebra is agnostic to.

No counterpart in the reference repo (training-data extension).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_database_spark.functions import spans as SP


class SpanStore:
    COMPACTED_FILE = "_compacted.json"
    COMMITTED_FILE = "_committed.json"
    RETRACTED_FILE = "_retracted.json"
    CONFIG_FILE = "_span_config.json"
    BASE_BATCH = "base"

    def __init__(self, spark: SparkSession, path: str, w: int = SP.WINDOW):
        """``w`` (window size in tokens) is part of the store identity:
        counts of different window widths must never merge. Persisted
        on first write; reopening with a different value raises."""
        self.spark = spark
        self.path = path
        cfg = self._read_json(self.CONFIG_FILE)
        if cfg is not None and cfg.get("w") != w:
            raise ValueError(
                f"span store {path} was built with w={cfg.get('w')}; "
                f"reopening with w={w} would merge counts of different "
                "window widths — pass the original size or rebuild"
            )
        self.w = w

    # -- write path -------------------------------------------------------

    def _batch_counts(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        wins = SP.window_hashes(SP.tokenized(docs, text_col, id_col), self.w)
        return wins.groupBy("h").agg(F.count("*").cast("long").alias("cnt"))

    def ingest(
        self, docs: DataFrame, batch: str, text_col: str = "text", id_col: str = "doc_id"
    ) -> bool:
        """Add one document batch's window counts. Idempotent per batch
        id (manifest commit only after the write); crash partials are
        fully replaced by the retry."""
        return self._write_signed(docs, batch, text_col, id_col, sign=1)

    def retract(
        self, docs: DataFrame, batch: str, text_col: str = "text", id_col: str = "doc_id"
    ) -> bool:
        """Remove a previously delivered batch's counts exactly, by
        ingesting negated counts under a NEW batch id — after
        retraction, served counts (and therefore span profiles) are as
        if the batch never existed."""
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
            self._write_raw(self.CONFIG_FILE, {"w": self.w})
        counts = self._batch_counts(docs, text_col, id_col).select(
            "h", (F.lit(sign) * F.col("cnt")).cast("long").alias("cnt")
        ).withColumn("batch", F.lit(batch))
        (
            counts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(self.path)
        )
        self._commit(batch)
        return True

    def retractions(self) -> list[str]:
        return self._read_json(self.RETRACTED_FILE) or []

    # -- read path --------------------------------------------------------

    def counts(self) -> DataFrame:
        """Merged corpus-lifetime (h, cnt): SUM across batches,
        retraction negatives folded away."""
        return (
            self.spark.read.parquet(self.path)
            .groupBy("h")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .where(F.col("cnt") > 0)
        )

    def profile(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Per-document duplicated-span stats of ``docs`` against the
        CORPUS-SO-FAR counts (the documents are expected to be
        ingested): (doc_id, n_tokens, dup_tokens, n_spans), exactly
        what functions.spans.duplicate_span_stats returns on the full
        corpus — under any batch split, proven by test and oracle."""
        toks = SP.tokenized(docs, text_col, id_col)
        wins = SP.window_hashes(toks, self.w)
        dup_h = self.counts().where(F.col("cnt") > 1).select("h")
        dup_wins = wins.join(dup_h, "h", "left_semi").select("doc_id", "pos")
        spans = SP._merge_islands(dup_wins, self.w)
        per_doc = spans.groupBy("doc_id").agg(
            F.sum(F.col("e") - F.col("s")).cast("long").alias("dup_tokens"),
            F.count("*").cast("long").alias("n_spans"),
        )
        return (
            toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
            .join(per_doc, "doc_id", "left")
            .fillna(0, subset=["dup_tokens", "n_spans"])
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
        """Fold per-batch counts into one batch=base row per hash
        (dropping zero/negative residue — retractions cancel here) and
        record absorbed ids. Write-to-sibling-and-swap."""
        absorbed = sorted(set(self.batches()) | set(self._compacted()))
        tmp = f"{self.path}__compact_{uuid.uuid4().hex[:8]}"
        folded = self.counts().withColumn("batch", F.lit(self.BASE_BATCH))
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
