"""Dataset registry: dated, versioned snapshot lineage.

Re-expresses the reference's dataset dimension and its single-active
invariant (onboarding/sql/dataset_setup.sql):

- ``dataset`` rows: datasetid, datasetdate, label, datasettypeid,
  datasourceid, datastatusid, efffromdate, effthrudate, isactive,
  createddate, createdby (dataset_setup.sql:123-139);
- lookup dimensions dataset_type / dataset_source / dataset_status
  with idempotent ensure-inserts (the reference's ON CONFLICT DO
  NOTHING lookups, generic_import.py:214-243);
- **single-active invariant**: at most one active row per (label,
  datasettypeid, datasetdate). The reference enforces it with an AFTER
  INSERT trigger (dataset_setup.sql:193-216); Spark has no triggers, so
  the write path recomputes the invariant on every registration with a
  window over the affected keys (SURVEY.md W2) and rewrites the
  registry atomically (write-new-then-swap on Parquet).

Storage is a Parquet directory; the registry is small (one row per
import), so full-rewrite semantics are fine at any realistic cardinality
— 100 TB of *data* is still only ~10⁵ snapshots. Data tables reference
``datasetid`` and are partitioned by ``datasetdate``, so active-snapshot
queries prune partitions.
"""

from __future__ import annotations

import datetime as dt
import getpass
import os
import shutil
import uuid

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAR_FUTURE = dt.datetime(9999, 1, 1)

# Seed statuses, dataset_setup.sql:368-374.
STATUSES = ["Active", "Inactive", "Deleted", "New", "Failed", "Empty"]
STATUS_ID = {name: i + 1 for i, name in enumerate(STATUSES)}

DATASET_SCHEMA = T.StructType(
    [
        T.StructField("datasetid", T.LongType(), False),
        T.StructField("datasetdate", T.DateType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("datasettypeid", T.IntegerType(), True),
        T.StructField("datasourceid", T.IntegerType(), True),
        T.StructField("datastatusid", T.IntegerType(), True),
        T.StructField("efffromdate", T.TimestampType(), True),
        T.StructField("effthrudate", T.TimestampType(), True),
        T.StructField("isactive", T.BooleanType(), True),
        T.StructField("createddate", T.TimestampType(), True),
        T.StructField("createdby", T.StringType(), True),
    ]
)


class DatasetRegistry:
    """Parquet-backed dataset registry with versioned registration."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.path = os.path.join(root, "dataset")
        self._types_path = os.path.join(root, "dataset_type")
        self._sources_path = os.path.join(root, "dataset_source")
        os.makedirs(root, exist_ok=True)

    # -- lookups ---------------------------------------------------------
    def _read_lookup(self, path: str, id_col: str, name_col: str) -> DataFrame:
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        schema = T.StructType(
            [
                T.StructField(id_col, T.IntegerType(), False),
                T.StructField(name_col, T.StringType(), False),
            ]
        )
        return self.spark.createDataFrame([], schema)

    # ensure_lookup collects the entire lookup table per call, which is
    # only sound because these tables are configuration-cardinality
    # (dataset types / data sources: one row per configured pipeline,
    # tens of rows). The cap below makes that invariant executable —
    # routing per-row or per-file data through a lookup would otherwise
    # silently become a driver-side collect of unbounded data at scale.
    MAX_LOOKUP_ROWS = 10_000

    def ensure_lookup(self, path: str, id_col: str, name_col: str, name: str) -> int:
        """Idempotent get-or-insert of a lookup row (ON CONFLICT DO
        NOTHING shape, generic_import.py:218-243). Returns the id.

        Lookup tables must stay configuration-sized (see
        MAX_LOOKUP_ROWS); this is not a general-purpose dimension
        writer."""
        # One capped collect serves both the guard and the lookup —
        # the limit keeps a mis-routed huge table from reaching the
        # driver, and the row count past the cap is the error signal.
        rows = self._read_lookup(path, id_col, name_col).limit(
            self.MAX_LOOKUP_ROWS + 1
        ).collect()
        if len(rows) > self.MAX_LOOKUP_ROWS:
            raise ValueError(
                f"lookup table {path} exceeds MAX_LOOKUP_ROWS="
                f"{self.MAX_LOOKUP_ROWS}; ensure_lookup is for "
                "configuration-cardinality tables only"
            )
        existing = {r[name_col]: r[id_col] for r in rows}
        if name not in existing and len(existing) >= self.MAX_LOOKUP_ROWS:
            raise ValueError(
                f"lookup table {path} is at MAX_LOOKUP_ROWS="
                f"{self.MAX_LOOKUP_ROWS}; refusing to grow it — "
                "ensure_lookup is for configuration-cardinality tables only"
            )
        if name in existing:
            return existing[name]
        new_id = (max(existing.values()) + 1) if existing else 1
        updated = existing | {name: new_id}
        out = self.spark.createDataFrame(
            [Row(**{id_col: v, name_col: k}) for k, v in sorted(updated.items(), key=lambda x: x[1])]
        )
        _atomic_overwrite(out.coalesce(1), path)
        return new_id

    def ensure_type(self, name: str) -> int:
        return self.ensure_lookup(self._types_path, "datasettypeid", "datasettype", name)

    def ensure_source(self, name: str) -> int:
        return self.ensure_lookup(self._sources_path, "datasourceid", "datasource", name)

    # -- dataset rows ----------------------------------------------------
    def datasets(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return self.spark.createDataFrame([], DATASET_SCHEMA)

    def register_snapshot(
        self,
        datasetdate: dt.date,
        label: str,
        datasettypeid: int,
        datasourceid: int = 1,
        datastatusid: int = STATUS_ID["Active"],
        createdby: str | None = None,
    ) -> int:
        """Insert a snapshot row; enforce the single-active invariant
        only when the new row is itself registered active.

        The reference trigger fires only WHEN NEW.isactive = TRUE
        (dataset_setup.sql:193-216) — a row inserted as New/Failed/Empty
        must NOT supersede the currently-active snapshot for its
        (label, datasettypeid, datasetdate) key; deactivation of
        siblings is tied to activation (here, or via
        ``set_status('Active')``, the f_dataset_iu shape).
        """
        now = dt.datetime.now()
        current = self.datasets()
        max_id = current.agg(F.max("datasetid")).first()[0] or 0
        is_active = datastatusid == STATUS_ID["Active"]
        new_row = self.spark.createDataFrame(
            [
                Row(
                    datasetid=max_id + 1,
                    datasetdate=datasetdate,
                    label=label,
                    datasettypeid=datasettypeid,
                    datasourceid=datasourceid,
                    datastatusid=datastatusid,
                    efffromdate=now,
                    effthrudate=FAR_FUTURE,
                    isactive=is_active,
                    createddate=now,
                    createdby=createdby or getpass.getuser(),
                )
            ],
            DATASET_SCHEMA,
        )
        merged = current.unionByName(new_row)
        if is_active:
            merged = _enforce_single_active(merged, now)
        _atomic_overwrite(merged.coalesce(1), self.path)
        return max_id + 1

    def register_snapshots(
        self,
        entries: list[tuple[dt.date, str]],
        datasettypeid: int,
        datasourceid: int = 1,
        datastatusid: int = STATUS_ID["Active"],
        createdby: str | None = None,
    ) -> dict[tuple[str, dt.date], int]:
        """Batch form of register_snapshot: k snapshots, ONE registry
        rewrite (the bulk-ingest path registers one key per distinct
        (label, date) — k separate rewrites would be k full jobs for a
        single logical transaction). Returns {(label, date): id}."""
        if not entries:
            return {}
        now = dt.datetime.now()
        current = self.datasets()
        max_id = current.agg(F.max("datasetid")).first()[0] or 0
        by = createdby or getpass.getuser()
        is_active = datastatusid == STATUS_ID["Active"]
        rows = [
            Row(
                datasetid=max_id + 1 + i,
                datasetdate=d,
                label=label,
                datasettypeid=datasettypeid,
                datasourceid=datasourceid,
                datastatusid=datastatusid,
                efffromdate=now,
                effthrudate=FAR_FUTURE,
                isactive=is_active,
                createddate=now,
                createdby=by,
            )
            for i, (d, label) in enumerate(entries)
        ]
        merged = current.unionByName(self.spark.createDataFrame(rows, DATASET_SCHEMA))
        if is_active:
            merged = _enforce_single_active(merged, now)
        _atomic_overwrite(merged.coalesce(1), self.path)
        return {(label, d): max_id + 1 + i for i, (d, label) in enumerate(entries)}

    def active(self) -> DataFrame:
        """Active datasets only (the is_active filters of
        create_f_get_event_changes.sql:34,41,59)."""
        return self.datasets().where(F.col("isactive"))

    def set_status(self, datasetid: int, status: str) -> None:
        """Status transition (Activate/Deactivate/Empty/Failed — the
        f_dataset_iu shape, dataset_setup.sql:252-348). Activating a
        row deactivates its (label, datasettypeid, datasetdate)
        siblings — the single-active invariant lives on the activation
        path, mirroring the reference's WHEN NEW.isactive trigger."""
        sid = STATUS_ID[status]
        now = dt.datetime.now()
        updated = self.datasets().withColumn(
            "datastatusid",
            F.when(F.col("datasetid") == datasetid, F.lit(sid)).otherwise(F.col("datastatusid")),
        ).withColumn(
            "isactive",
            F.when(F.col("datasetid") == datasetid, F.lit(status == "Active")).otherwise(
                F.col("isactive")
            ),
        )
        if status == "Active":
            # Re-activation re-opens the row's effective range before the
            # invariant pass closes out the displaced siblings.
            updated = updated.withColumn(
                "effthrudate",
                F.when(F.col("datasetid") == datasetid, F.lit(FAR_FUTURE)).otherwise(
                    F.col("effthrudate")
                ),
            )
            updated = _enforce_single_active(updated, now, winner_id=datasetid)
        else:
            # Deactivation closes the effective range exactly like the
            # displacement path — an isactive=false row with an open
            # effthrudate would still satisfy point-in-time range
            # predicates forever.
            updated = updated.withColumn(
                "effthrudate",
                F.when(
                    (F.col("datasetid") == datasetid) & (F.col("effthrudate") > F.lit(now)),
                    F.lit(now),
                ).otherwise(F.col("effthrudate")),
            )
        _atomic_overwrite(updated.coalesce(1), self.path)

    def status_table(self) -> DataFrame:
        return self.spark.createDataFrame(
            [Row(datastatusid=i + 1, datastatus=s) for i, s in enumerate(STATUSES)]
        )


def _enforce_single_active(df: DataFrame, now: dt.datetime, winner_id: int | None = None) -> DataFrame:
    """At most one active row per (label, datasettypeid, datasetdate):
    losers get isactive=false, effthrudate=now. The winner is the
    explicitly-activated row when ``winner_id`` is given (set_status
    path), else the most recent active row (register path)."""
    # Active rows MUST rank before inactive ones: a newer inactive
    # sibling (an Empty/Failed re-delivery) would otherwise take rank 1
    # and silently deactivate the key's active snapshot on the next
    # unrelated enforcement pass.
    if winner_id is not None:
        order = [
            F.desc(F.col("datasetid") == winner_id),
            F.desc("isactive"),
            F.desc("efffromdate"),
            F.desc("datasetid"),
        ]
    else:
        order = [F.desc("isactive"), F.desc("efffromdate"), F.desc("datasetid")]
    w = W.partitionBy("label", "datasettypeid", "datasetdate").orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_still_active", F.col("isactive") & (F.col("_rn") == 1))
        .withColumn(
            "effthrudate",
            F.when(F.col("isactive") & ~F.col("_still_active"), F.lit(now)).otherwise(
                F.col("effthrudate")
            ),
        )
        .withColumn("isactive", F.col("_still_active"))
        .drop("_rn", "_still_active")
    )


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    """Write to a temp dir then swap — readers never see a half-written
    registry (Parquet has no transactions; the registry is the one
    place we need read-modify-write)."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}.old.{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)
