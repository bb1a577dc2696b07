"""DDL/write audit log: who changed which table's shape, when.

Re-expresses the reference's DDL audit surface (dba.tddllogs + the
``logddl`` event trigger, onboarding/sql/setup_dba_maintenance.sql:82-120):
PostgreSQL fires ``flogddlchanges`` on ddl_command_end and appends one
row per DDL command. Spark has no event triggers, so the analog lives
on the write path itself — ``TargetTable`` reports every
schema-changing write (table creation, strategy-1 column evolution,
strategy-3 validation failure) to a ``DdlAuditLog``, which appends
structured rows to a Parquet audit table. The answerable question is
the reference's: "when did this column/table appear, and from what?".

Events are rare (schema changes, not data rows), so each record is a
single-file append — no buffering needed, and the table stays tiny
relative to the data it audits.
"""

from __future__ import annotations

import datetime as dt
import getpass
import os
import uuid

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("auditid", T.StringType(), False),
        T.StructField("eventtime", T.TimestampType(), False),
        T.StructField("eventtype", T.StringType(), False),
        T.StructField("schemaname", T.StringType(), True),
        T.StructField("objectname", T.StringType(), True),
        T.StructField("objecttype", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("username", T.StringType(), True),
    ]
)

# Event-type vocabulary (command_tag analog).
CREATE_TABLE = "CREATE TABLE"
ADD_COLUMN = "ALTER TABLE ADD COLUMN"
VALIDATION_FAILED = "STRATEGY VALIDATION FAILED"


class DdlAuditLog:
    """Append-only Parquet audit table (tddllogs shape)."""

    def __init__(self, spark: SparkSession, path: str, schemaname: str = "data"):
        self.spark = spark
        self.path = path
        self.schemaname = schemaname

    def record(
        self,
        eventtype: str,
        objectname: str,
        objecttype: str = "table",
        detail: str | None = None,
    ) -> None:
        row = Row(
            auditid=str(uuid.uuid4()),
            eventtime=dt.datetime.now(),
            eventtype=eventtype,
            schemaname=self.schemaname,
            objectname=objectname,
            objecttype=objecttype,
            detail=detail,
            username=getpass.getuser(),
        )
        self.spark.createDataFrame([row], AUDIT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def events(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return self.spark.createDataFrame([], AUDIT_SCHEMA)
