"""Persisted incremental Bloom filter — the cross-batch seen-set for
100 TB dedup pipelines.

The batch lifecycle mirrors :class:`~etl_database_spark.operators
.rollup.RollupStore` (and IvfIndex, and the minhash signature store):
batch-keyed idempotent ingest with a commit-after-write manifest,
merge-on-read serving, LSM-style compaction that records absorbed
batch ids so late replays stay no-ops. What is stored is the filter of
:mod:`etl_database_spark.functions.bloom` — rows ``(word, bits)``
packed 32 bits per word — whose merge (bitwise OR per word) is
associative, commutative, and **idempotent**, which makes this the
easiest store of the family to reason about: even a *double-committed*
batch could not corrupt it, the manifest exists purely to skip work.

Intended use: each ingestion day inserts the day's document
fingerprints as one batch; the serving filter answers "ever seen this
fingerprint?" in O(filter) per probe batch with zero false negatives,
so exact re-dedup joins only run for bloom-positive candidates —
at a 1% false-positive rate the expensive exact join shrinks by ~99%
for genuinely-new data. Insert-only by construction (like the HLL
sketch): deletion needs a counting filter, out of scope.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_database_spark.functions import bloom as B


class BloomStore:
    COMPACTED_FILE = "_compacted.json"
    COMMITTED_FILE = "_committed.json"
    CONFIG_FILE = "_bloom_config.json"
    BASE_BATCH = "base"

    def __init__(self, spark: SparkSession, path: str, m_bits: int = B.BLOOM_M_DEFAULT):
        """``m_bits`` is part of the store's identity: positions are
        taken mod m, so filters of different sizes cannot be merged.
        The configured size is persisted on first write and reopening
        with a different value raises instead of silently corrupting
        membership answers."""
        self.spark = spark
        self.path = path
        cfg = self._read_json(self.CONFIG_FILE)
        if cfg is not None and cfg.get("m_bits") != m_bits:
            raise ValueError(
                f"bloom store {path} was built with m_bits={cfg.get('m_bits')}; "
                f"reopening with m_bits={m_bits} would give wrong membership "
                "answers — pass the original size or rebuild"
            )
        self.m_bits = m_bits

    # -- write path -------------------------------------------------------

    def ingest(self, df: DataFrame, key_col: str, batch: str) -> bool:
        """Insert one batch of keys. Idempotent per batch id: replays
        (and replays of compacted batches) return False and write
        nothing. Crash-safe: the manifest entry is written only after
        the parquet write completes; a crashed partial directory is
        fully replaced by the retry's dynamic-partition-overwrite."""
        if batch == self.BASE_BATCH or batch in self.batches():
            return False
        os.makedirs(self.path, exist_ok=True)
        if self._read_json(self.COMMITTED_FILE) is None:
            self._write_json(self.COMMITTED_FILE, self.batches())
        if self._read_json(self.CONFIG_FILE) is None:
            self._write_raw(self.CONFIG_FILE, {"m_bits": self.m_bits})
        words = B.bloom_partials(df, key_col, self.m_bits).withColumn(
            "batch", F.lit(batch)
        )
        (
            words.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(self.path)
        )
        self._commit(batch)
        return True

    # -- read path --------------------------------------------------------

    def serve(self) -> DataFrame:
        """The merged filter: OR per word across all batches."""
        return B.bloom_merge(self.spark.read.parquet(self.path).select("word", "bits"))

    def might_contain(
        self, probes: DataFrame, key_col: str, id_cols: list[str], out_col: str = "bloom_hit"
    ) -> DataFrame:
        """Probe the merged filter: 1 = maybe seen, 0 = definitely new."""
        return B.bloom_might_contain(
            self.serve(), probes, key_col, id_cols, self.m_bits, out_col
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
        """Fold every batch into one ``batch=base`` filter (at most
        m_bits/32 rows total) and record the absorbed ids. Write-to-
        sibling-and-swap, never half-rewritten in place."""
        absorbed = sorted(set(self.batches()) | set(self._compacted()))
        tmp = f"{self.path}__compact_{uuid.uuid4().hex[:8]}"
        folded = self.serve().withColumn("batch", F.lit(self.BASE_BATCH))
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
