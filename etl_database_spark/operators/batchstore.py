"""Shared lifecycle for the engine's persisted incremental stores.

Five operators accrete batch-keyed parquet state with the same
contract — RollupStore, SpanStore, BloomStore, WinnowStore, DsirStore
(and IvfIndex in functions/similarity.py) — and before round 9 each
carried its own copy of the machinery. This base owns the lifecycle;
subclasses own only their algebra (what a batch's rows ARE and how
they fold).

The contract, shared verbatim by every store:

- **batch-keyed idempotent ingest**: data lands partitioned by
  ``batch=<id>`` via dynamic-partition-overwrite; the manifest entry is
  written only AFTER the parquet write completes, so a crash mid-write
  leaves a partial directory that the retry fully replaces, and a
  replay of a committed (or compacted-away) batch id is a no-op.
- **config identity**: parameters that change row meaning (window
  width, bit count, bucket count…) are persisted on first write and a
  reopen with different values raises instead of silently merging
  incompatible state.
- **merge-on-read serving**: subclasses read the whole store and fold
  by their measure's algebra (additive counts/signs, bitwise OR,
  sketch merges).
- **LSM-style compaction**: fold everything into ``batch=base``,
  record absorbed ids (late replays stay no-ops), write to a sibling
  temp dir and atomically swap. If the swap's second rename fails the
  original directory is renamed back, so the store path is only absent
  during a hard process kill between the two renames — in that case
  the data is intact in the ``<path>__old_*`` sibling: rename it back
  to recover.
- **retraction bookkeeping** (stores whose algebra supports negation):
  retracted batch ids are recorded in a sidecar for audit.

Crash-partial heal, idempotent replay, and compaction identity are
property-tested once for every registered store in
tests/test_batchstore.py.

No counterpart in the reference repo (the reference's state lives in
Postgres tables; this is the parquet-native equivalent of its
idempotent ingest-registry discipline, see reference importdatafiles'
md5-checked file registry).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BatchStore:
    COMPACTED_FILE = "_compacted.json"
    COMMITTED_FILE = "_committed.json"
    RETRACTED_FILE = "_retracted.json"
    BASE_BATCH = "base"
    #: subclasses with config identity set this (e.g. "_span_config.json")
    CONFIG_FILE: str | None = None
    #: extra partition columns AFTER "batch" in the main ingest write
    PARTITION_COLS: tuple = ()
    #: underscore-subdirs carried verbatim across a compaction swap
    COMPACT_COPY_DIRS: tuple = ()

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- config identity ----------------------------------------------------

    def _config(self) -> dict | None:
        """Subclass: the identity dict persisted on first write, or
        None if the store has no config identity."""
        return None

    def _config_mismatch(self, stored: dict, current: dict) -> str:
        return (
            f"store {self.path} was built with {stored}; reopening with "
            f"{current} would merge incompatible state — pass the original "
            "parameters or rebuild"
        )

    def _check_config(self) -> None:
        """Call at the end of subclass ``__init__`` (after the identity
        attributes are set)."""
        if self.CONFIG_FILE is None:
            return
        stored = self._read_json(self.CONFIG_FILE)
        current = self._config()
        if stored is not None:
            stored = self._upgrade_stored_config(dict(stored))
            if stored != current:
                raise ValueError(self._config_mismatch(stored, current))

    def _upgrade_stored_config(self, stored: dict) -> dict:
        """Subclass hook: default config keys that were added AFTER
        stores of this kind first persisted to disk, so pre-existing
        stores keep opening instead of failing the identity check on a
        key they could not have written."""
        return stored

    # -- write path ---------------------------------------------------------

    def _begin_batch(self, batch: str) -> bool:
        """Idempotence guard + first-write bootstrap. Returns False if
        the batch id is reserved or already ingested (live or absorbed
        by a compaction); otherwise ensures the directory, seeds the
        committed manifest (pre-manifest stores: from the directory
        listing, BEFORE writing, so compaction later absorbs legacy
        batches correctly), persists the config identity, and returns
        True."""
        if batch == self.BASE_BATCH or batch in self.batches():
            return False
        os.makedirs(self.path, exist_ok=True)
        if self._read_json(self.COMMITTED_FILE) is None:
            self._write_json(self.COMMITTED_FILE, self.batches())
        if self.CONFIG_FILE is not None and self._read_json(self.CONFIG_FILE) is None:
            self._write_raw(self.CONFIG_FILE, self._config())
        return True

    def _write_batch(self, df: DataFrame, batch: str, commit: bool = True) -> None:
        """The standard partitioned batch write: tag rows with the
        batch id, dynamic-partition-overwrite (a retried crash partial
        is fully replaced), manifest commit only after the write."""
        (
            df.withColumn("batch", F.lit(batch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", *self.PARTITION_COLS)
            .parquet(self.path)
        )
        if commit:
            self._commit(batch)

    def _record_retraction(self, batch: str) -> None:
        self._write_json(self.RETRACTED_FILE, sorted(set(self.retractions()) | {batch}))

    def retractions(self) -> list[str]:
        return self._read_json(self.RETRACTED_FILE) or []

    # -- maintenance --------------------------------------------------------

    def batches(self) -> list[str]:
        """Ingested batch ids: the committed manifest plus batches
        absorbed by a compaction. Falls back to directory listing for
        stores written before the manifest existed — for those, a
        partial directory counts as ingested (the pre-manifest
        behavior), which is why new writes always commit."""
        committed = self._read_json(self.COMMITTED_FILE)
        if committed is None:
            committed = [
                d.split("=", 1)[1]
                for d in (os.listdir(self.path) if os.path.isdir(self.path) else [])
                if d.startswith("batch=") and os.path.isdir(os.path.join(self.path, d))
            ]
        return sorted(set(committed) | set(self._compacted()))

    def _compact_fold(self, tmp: str) -> None:
        """Subclass: write the folded ``batch=base`` state into the
        sibling temp directory ``tmp`` (main data plus any sketch
        subdirs)."""
        raise NotImplementedError

    def compact(self) -> None:
        """Fold every batch into ``batch=base`` (the subclass's
        algebra — retraction negatives cancel here) and record absorbed
        ids so late replays stay no-ops. Write-to-sibling-and-swap,
        never half-rewritten in place; a failed swap restores the
        original directory."""
        absorbed = sorted(set(self.batches()) | set(self._compacted()))
        tmp = f"{self.path}__compact_{uuid.uuid4().hex[:8]}"
        self._compact_fold(tmp)
        with open(os.path.join(tmp, self.COMPACTED_FILE), "w") as fh:
            json.dump([b for b in absorbed if b != self.BASE_BATCH], fh)
        with open(os.path.join(tmp, self.COMMITTED_FILE), "w") as fh:
            json.dump([self.BASE_BATCH], fh)
        for name in self.COMPACT_COPY_DIRS:
            src = os.path.join(self.path, name)
            if os.path.isdir(src) and not os.path.isdir(os.path.join(tmp, name)):
                shutil.copytree(src, os.path.join(tmp, name))
        # carry sidecar markers (config, retraction log, streaming
        # checkpoint bindings) across the swap — a compaction must not
        # unbind the store
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
        try:
            os.rename(tmp, self.path)
        except OSError:
            os.rename(old, self.path)  # restore — the store stays serveable
            raise
        shutil.rmtree(old, ignore_errors=True)

    # -- sidecar io ---------------------------------------------------------

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
