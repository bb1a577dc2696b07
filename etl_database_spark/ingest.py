"""Config-driven generic import: the reference's core pipeline
(systemscripts/generic_import.py) re-built on Spark readers and a
schema-evolving versioned Parquet write path.

Pipeline per config (mirrors generic_import.py:492-819):

1. discover files in ``source_directory`` matching ``file_pattern``
   (regex over listdir, generic_import.py:520-545);
2. per file: extract (label, date) metadata from the filename
   (metadata.py), register a dataset snapshot (registry.py) —
   superseding any earlier snapshot of the same key;
3. validate: empty file / "Invalid Event ID" content marks the dataset
   Empty and archives without loading (generic_import.py:353-377,
   612-640);
4. read CSV all-string (the reference lands everything as VARCHAR,
   generic_import.py:183-193) — or Excel via the driver-side converter
   (sources/excel.py);
5. transform: normalize column names (lowercase, space/hyphen →
   underscore, generic_import.py:392), inject ``datasetid`` +
   metadata columns (generic_import.py:399-403), optionally truncate
   values to profiled widths (generic_import.py:446-456);
6. append to the target Parquet table partitioned by ``datasetdate``
   with schema evolution per import strategy
   (create_importconfig_table.sql:13-17):
   - strategy 1: new columns are added (union-by-name, mergeSchema);
   - strategy 2: only columns already in the target are loaded;
   - strategy 3: fail if the file is missing target columns;
7. archive the consumed file (generic_import.py:780-796).

Scale notes: the per-file loop is config-driven control flow; the data
path is pure Spark. For bulk backfills use ``load_directory`` which
reads every matching file in ONE ``spark.read`` (with
``input_file_name()``-derived metadata columns) — one job regardless
of file count. Data tables partition by ``datasetdate`` so snapshot
queries prune; truncation/profiling are single-pass JVM aggregates.
"""

from __future__ import annotations

import datetime as dt
import os
import re
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from etl_database_spark.metadata import MetadataSpec, parse_date, parse_label
from etl_database_spark.registry import STATUS_ID, DatasetRegistry

DEFAULT_WIDTH = 1000  # generic_import.py:328
WIDTH_CAP = 4000  # generic_import.py:191
WIDTH_FACTOR = 1.5  # generic_import.py:191
# Bound on distinct (label, datasetdate) snapshot keys one bulk load
# may register: config-batch cardinality by design; a malformed
# metadata pattern that extracts per-row keys must fail loudly, not
# collect a data-sized list onto the driver.
MAX_SNAPSHOT_KEYS = 100_000


@dataclass
class ImportConfig:
    """One row of the import-config surface
    (create_importconfig_table.sql:20-51)."""

    config_name: str
    source_directory: str
    archive_directory: str
    file_pattern: str
    target_table: str
    file_type: str = "CSV"  # CSV | XLS | XLSX
    datasource: str = "file"
    datasettype: str = "Generic"
    delimiter: str = ","
    import_strategy: int = 1  # 1 evolve, 2 intersect, 3 strict
    truncate_to_width: bool = False
    metadata: MetadataSpec = field(default_factory=MetadataSpec)
    is_active: bool = True
    # Post-import compaction gate: when any datasetdate partition holds
    # more than this many files after a run, the table is compacted
    # (None disables). Per-file appends write ≥1 file each — a daily
    # feed degrades scans into small-file storms without this.
    compact_max_files: int | None = None


def normalize_name(name: str) -> str:
    """lowercase; spaces/hyphens → underscores (generic_import.py:327,392)."""
    return re.sub(r"[ \-]", "_", name.strip().lower())


def normalize_columns(df: DataFrame) -> DataFrame:
    return df.toDF(*[normalize_name(c) for c in df.columns])


def profile_widths(df: DataFrame, columns: list[str] | None = None) -> dict[str, int]:
    """Per-column VARCHAR-width rule: max_len × 1.5, floor DEFAULT,
    cap 4000 (generic_import.py:183-193) — one aggregate pass over the
    scan, not per-column passes."""
    cols = columns or [c for c, t in df.dtypes if t == "string"]
    if not cols:
        return {}
    row = df.agg(
        *[F.max(F.length(F.col(c))).alias(c) for c in cols]
    ).first()
    out = {}
    for c in cols:
        max_len = row[c] or 0
        out[c] = min(int(max_len * WIDTH_FACTOR) or DEFAULT_WIDTH, WIDTH_CAP)
    return out


def truncate_to_widths(df: DataFrame, widths: dict[str, int]) -> DataFrame:
    """Explicit substring truncation stage (generic_import.py:446-456);
    the reference warns per truncated column — we return the frame and
    let the caller count truncations if it cares."""
    for c, w in widths.items():
        if c in df.columns:
            df = df.withColumn(c, F.substring(F.col(c), 1, w))
    return df


class TargetTable:
    """A Parquet data table partitioned by datasetdate, with
    union-by-name schema evolution (SURVEY.md §4.2.2).

    When an ``audit`` log is attached, every schema-changing write is
    recorded (the reference's tddllogs event-trigger analog,
    setup_dba_maintenance.sql:82-120): table creation, strategy-1
    column evolution, strategy-3 validation failure."""

    def __init__(self, spark: SparkSession, root: str, name: str, audit=None):
        self.spark = spark
        self.name = name
        self.path = os.path.join(root, name)
        self.audit = audit

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.option("mergeSchema", "true").parquet(self.path)

    def columns(self) -> list[str]:
        return self.read().columns if self.exists() else []

    def append(self, df: DataFrame, strategy: int = 1) -> list[str]:
        """Append with per-strategy schema reconciliation
        (create_importconfig_table.sql:13-17; generic_import.py:320-351,
        405-424). Returns the list of new columns added (strategy 1).

        Matching is case-insensitive on normalized names (the reference
        lowercases both sides, generic_import.py:405-414).
        """
        new_cols: list[str] = []
        created = not self.exists()
        if not created:
            existing = self.columns()
            incoming = df.columns
            missing_in_file = [c for c in existing if c not in incoming and c != "datasetdate"]
            extra_in_file = [c for c in incoming if c not in existing]
            if strategy == 3 and missing_in_file:
                if self.audit is not None:
                    from etl_database_spark.audit import VALIDATION_FAILED

                    self.audit.record(
                        VALIDATION_FAILED,
                        self.name,
                        detail=f"missing target columns: {', '.join(missing_in_file)}",
                    )
                raise ValueError(
                    f"strategy 3: source file missing target columns {missing_in_file}"
                )
            if strategy == 2 and extra_in_file:
                df = df.drop(*extra_in_file)
            elif strategy in (1, 3):
                new_cols = extra_in_file
        (
            df.write.mode("append")
            .partitionBy("datasetdate")
            .parquet(self.path)
        )
        if self.audit is not None:
            from etl_database_spark.audit import ADD_COLUMN, CREATE_TABLE

            if created:
                self.audit.record(
                    CREATE_TABLE, self.name, detail=f"columns: {', '.join(df.columns)}"
                )
            else:
                for c in new_cols:
                    self.audit.record(ADD_COLUMN, self.name, objecttype="column", detail=c)
        return new_cols

    def files_per_partition(self) -> dict[str, int]:
        """Data-file count per partition directory (non-recursive data
        layout: <path>/datasetdate=YYYY-MM-DD/part-*.parquet)."""
        out: dict[str, int] = {}
        if not self.exists():
            return out
        for entry in os.listdir(self.path):
            pdir = os.path.join(self.path, entry)
            if os.path.isdir(pdir) and "=" in entry:
                out[entry] = sum(1 for f in os.listdir(pdir) if f.endswith(".parquet"))
        return out

    def maybe_compact(self, max_files_per_partition: int, target_files: int | None = None) -> bool:
        """Compact when any partition exceeds the file-count gate —
        the small-file remedy for per-file append ingest. The rewrite
        target stays under the gate so a compacted table doesn't
        immediately re-trigger. Returns whether a compaction ran."""
        counts = self.files_per_partition()
        if not counts or max(counts.values()) <= max_files_per_partition:
            return False
        if target_files is None:
            target_files = max(1, min(8, max_files_per_partition))
        from etl_database_spark.maintenance import compact_table

        compact_table(self.spark, self.path, target_files=target_files)
        return True


@dataclass
class ImportResult:
    filename: str
    datasetid: int
    rows: int
    status: str
    new_columns: list[str] = field(default_factory=list)


class ImportJob:
    """Entry point A (SURVEY.md §3.1): run one import config."""

    def __init__(self, spark: SparkSession, config: ImportConfig, registry: DatasetRegistry,
                 data_root: str, audit=None):
        self.spark = spark
        self.config = config
        self.registry = registry
        self.table = TargetTable(spark, data_root, config.target_table, audit=audit)

    def discover(self) -> list[str]:
        """Regex file discovery (generic_import.py:520-545)."""
        pat = re.compile(self.config.file_pattern)
        src = self.config.source_directory
        if not os.path.isdir(src):
            return []
        return sorted(
            os.path.join(src, f) for f in os.listdir(src) if pat.match(f)
        )

    def _read_file(self, path: str) -> tuple[DataFrame, str | None]:
        """→ (frame, scratch_dir): ``scratch_dir`` is the Excel
        conversion tempdir to delete once the frame has been fully
        consumed (the read is lazy, so it cannot be removed here)."""
        cfg = self.config
        scratch = None
        if cfg.file_type.upper() in ("XLS", "XLSX"):
            import tempfile

            from etl_database_spark.sources.excel import excel_to_csv

            # Convert into a temp dir — the converted CSV must not land
            # in the watch dir (it is a derived artifact, not an input).
            scratch = tempfile.mkdtemp(prefix="xls2csv_")
            out = os.path.join(
                scratch, os.path.splitext(os.path.basename(path))[0] + ".csv"
            )
            path = excel_to_csv(path, out)
        df = (
            self.spark.read.option("header", "true")
            .option("sep", cfg.delimiter)
            .option("inferSchema", "false")  # all-string, reference semantics
            .csv(path)
        )
        return df, scratch

    def _archive(self, path: str) -> None:
        os.makedirs(self.config.archive_directory, exist_ok=True)
        shutil.move(path, os.path.join(self.config.archive_directory, os.path.basename(path)))

    def _widths_path(self) -> str:
        # Beside the table directory (not inside it): creating the
        # table dir early would flip table.exists() before any data
        # lands, and parquet discovery should never see this file.
        return self.table.path + "._widths.json"

    def _target_widths(self, df: DataFrame) -> dict[str, int]:
        """Profiled VARCHAR widths for truncation — the Parquet-world
        analog of the reference's DDL column lengths, persisted in a
        sidecar JSON and only ever WIDENED.

        This mirrors generic_import.py exactly: each import profiles
        its OWN incoming frame (get_column_lengths, :183-193), widens
        the established widths where required (add_columns_to_table's
        ALTER COLUMN branch, :317-347), then truncates against the
        post-widening widths (:440-456) — so, as in the reference,
        truncation fires only at the 4000 hard cap and the widths are
        the durable schema record. Re-deriving them from the target's
        DATA each run (the previous behavior) had two scale problems:
        a whole-table aggregate scan per imported file, and a
        ratchet-down — an early narrow snapshot could silently
        truncate wider later deliveries. The one legacy case — a
        pre-existing table with no sidecar — profiles the target once
        to seed it.

        Returns the merged widths; the caller persists them via
        ``_persist_widths`` only AFTER the append succeeds, so a
        failed delivery leaves no schema trace (the reference gets
        the same effect from PostgreSQL's transactional DDL: its
        ALTERs roll back with the failed INSERT)."""
        import json

        path = self._widths_path()
        if os.path.exists(path):
            with open(path) as f:
                persisted = {k: int(v) for k, v in json.load(f).items()}
        elif self.table.exists():
            persisted = profile_widths(self.table.read())  # one-time seed
        else:
            persisted = {}
        incoming = profile_widths(df)
        merged = {c: max(persisted.get(c, 0), w) for c, w in incoming.items()}
        return persisted | merged

    def _persist_widths(self, widths: dict[str, int]) -> None:
        import json

        path = self._widths_path()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(widths, f)
        os.replace(tmp, path)

    def run_file(self, path: str) -> ImportResult:
        try:
            return self._run_file(path)
        finally:
            # Excel conversion scratch dir (if any) is dead once the
            # append materialized — without the cleanup a scheduled
            # XLSX config leaks a full converted copy per run.
            scratch = getattr(self, "_scratch_dir", None)
            if scratch:
                shutil.rmtree(scratch, ignore_errors=True)
                self._scratch_dir = None

    def _run_file(self, path: str) -> ImportResult:
        self._scratch_dir = None
        cfg = self.config
        label = parse_label(path, cfg.metadata) or cfg.config_name
        snap_date = parse_date(path, cfg.metadata)
        type_id = self.registry.ensure_type(cfg.datasettype)
        source_id = self.registry.ensure_source(cfg.datasource)
        dataset_id = self.registry.register_snapshot(
            snap_date, label, type_id, source_id, STATUS_ID["New"]
        )
        # ANY exception between registration and a terminal status —
        # append failures, but also width profiling, normalization, or
        # observation retrieval — must mark the row Failed: a row left
        # in 'New' with the file un-archived would be re-registered as
        # a fresh 'New' row by every subsequent sweep (unbounded
        # registry growth). The flag keeps a post-success failure
        # (e.g. the archive move) from demoting an Active dataset
        # whose data already landed.
        terminal = False
        try:
            try:
                df, self._scratch_dir = self._read_file(path)
            except Exception:  # unreadable file → Empty, archive (generic_import.py:612-640)
                self.registry.set_status(dataset_id, "Empty")
                terminal = True
                self._archive(path)
                return ImportResult(path, dataset_id, 0, "Empty")

            empty = not df.columns or df.isEmpty()
            if not empty:
                # Content gate: first column contains 'Invalid Event ID'
                # (generic_import.py:353-362).
                first_col = df.columns[0]
                empty = (
                    df.where(
                        F.lower(F.col(first_col).cast("string")).contains("invalid event id")
                    )
                    .limit(1)
                    .count()
                    > 0
                )
            if empty:
                self.registry.set_status(dataset_id, "Empty")
                terminal = True
                self._archive(path)
                return ImportResult(path, dataset_id, 0, "Empty")

            df = normalize_columns(df)
            widths = None
            if cfg.truncate_to_width:
                widths = self._target_widths(df)
                df = truncate_to_widths(df, widths)
            df = (
                df.withColumn("datasetid", F.lit(dataset_id).cast("long"))
                .withColumn("datasetdate", F.lit(snap_date).cast("date"))
            )
            # Row count is observed DURING the append job (metric
            # piggy-backs on the write) — a post-hoc df.count() would
            # re-execute the full read (and for Excel, the driver-side
            # conversion) once more.
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            new_cols = self.table.append(df, cfg.import_strategy)
            rows = obs.get["rows"]
            if widths is not None:
                self._persist_widths(widths)  # only after the append lands
            self.registry.set_status(dataset_id, "Active")
            terminal = True
            self._archive(path)
            return ImportResult(path, dataset_id, rows, "Active", new_cols)
        except Exception:
            if not terminal:
                self.registry.set_status(dataset_id, "Failed")
            raise

    def run(self) -> list[ImportResult]:
        """Per-file error isolation: one bad file is recorded as Failed
        and the rest of the directory still loads (the reference's
        nightly sweep semantics — one malformed delivery must not
        block the feed)."""
        results = []
        for p in self.discover():
            try:
                results.append(self.run_file(p))
            except Exception:
                results.append(ImportResult(p, -1, 0, "Failed"))
        if self.config.compact_max_files is not None:
            self.table.maybe_compact(self.config.compact_max_files)
        return results


def load_directory(
    spark: SparkSession,
    config: ImportConfig,
    registry: DatasetRegistry,
    data_root: str,
    audit=None,
) -> int:
    """Bulk path: ingest every matching file in ONE spark.read — the
    100 TB shape. Metadata (label, datasetdate) is derived per-row from
    ``input_file_name()`` (distributed, no per-file driver loop); one
    dataset row is registered per distinct (label, date) after the fact.

    Returns total rows loaded.
    """
    from etl_database_spark.metadata import file_metadata_columns

    pattern = config.file_pattern
    src = config.source_directory
    # File selection MUST agree with ImportJob.discover() (re.match,
    # anchored at the start): rlike is a substring search, so anchor
    # the regex explicitly. The glob prefilter is derived from the
    # pattern's literal extension when it has one (scan-cost
    # optimization only — the regex remains the filter of record).
    m = re.search(r"\\\.(\w+)$", pattern)
    glob = f"*.{m.group(1)}" if m else "*"
    df = (
        spark.read.option("header", "true")
        .option("sep", config.delimiter)
        .option("inferSchema", "false")
        .option("pathGlobFilter", glob)
        .csv(src)
        .where(
            F.element_at(F.split(F.input_file_name(), "/"), -1).rlike(f"^(?:{pattern})")
        )
    )
    label_col, date_col = file_metadata_columns(config.metadata)
    df = normalize_columns(df).withColumn("label", label_col).withColumn(
        "datasetdate", date_col
    )
    # Audited-scalar collect: (label, datasetdate) cardinality is
    # config-batch-sized (files per run), not data-sized — but a
    # malformed date pattern could explode it into per-row keys, so
    # bound the collect explicitly (limit k+1, check, raise) instead
    # of trusting the invariant silently.
    key_rows = (
        df.select("label", "datasetdate")
        .distinct()
        .limit(MAX_SNAPSHOT_KEYS + 1)
        .collect()
    )
    if len(key_rows) > MAX_SNAPSHOT_KEYS:
        raise ValueError(
            f"load_directory derived more than {MAX_SNAPSHOT_KEYS} distinct "
            "(label, datasetdate) snapshot keys in one batch — the metadata "
            "pattern is extracting per-row values, not per-file ones; fix "
            "the ImportConfig metadata spec"
        )
    keys = [(r["label"], r["datasetdate"]) for r in key_rows]
    type_id = registry.ensure_type(config.datasettype)
    source_id = registry.ensure_source(config.datasource)
    # One registry rewrite for all k keys (k separate register_snapshot
    # calls would each rewrite the registry — O(k) jobs for 1 needed).
    id_map = registry.register_snapshots([(d, label) for label, d in keys], type_id, source_id)
    mapping = spark.createDataFrame(
        [(label, d, i) for (label, d), i in id_map.items()],
        "label string, datasetdate date, datasetid long",
    )
    out = df.join(F.broadcast(mapping), ["label", "datasetdate"]).drop("label")
    # Row count observed during the append job itself (as in the
    # single-file path above) — the previous form re-read the whole
    # target table and semi-joined it, a full-table scan per bulk
    # import at 100 TB.
    obs = Observation()
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    table = TargetTable(spark, data_root, config.target_table, audit=audit)
    table.append(out, config.import_strategy)
    return obs.get["rows"]
