"""DDL/write audit log (tddllogs + logddl event-trigger analog,
setup_dba_maintenance.sql:82-120): schema-changing writes through
TargetTable/ImportJob append structured audit rows for the create /
evolve / fail paths."""

import pytest
from pyspark.sql import functions as F

from etl_database_spark.audit import (
    ADD_COLUMN,
    CREATE_TABLE,
    VALIDATION_FAILED,
    DdlAuditLog,
)
from etl_database_spark.ingest import ImportConfig, ImportJob
from etl_database_spark.metadata import MetadataSpec
from etl_database_spark.registry import DatasetRegistry


def _job(spark, tmp_path, audit, **kw):
    src = tmp_path / "watch"
    src.mkdir(exist_ok=True)
    cfg = ImportConfig(
        config_name="AuditTest",
        source_directory=str(src),
        archive_directory=str(tmp_path / "archive"),
        file_pattern=r"\d{8}T\d{6}_MeetMax_\d+\.csv",
        target_table="taudited",
        datasettype="MeetMaxEvents",
        metadata=MetadataSpec(label_location="2", date_location="0"),
        **kw,
    )
    reg = DatasetRegistry(spark, str(tmp_path / "registry"))
    return ImportJob(spark, cfg, reg, str(tmp_path / "data"), audit=audit)


def test_create_and_evolve_audited(spark, tmp_path):
    audit = DdlAuditLog(spark, str(tmp_path / "ddl_audit"))
    job = _job(spark, tmp_path, audit)
    (tmp_path / "watch" / "20250301T120000_MeetMax_1.csv").write_text(
        "Company Name,Ticker\nAcme,ACME\n"
    )
    job.run()
    ev = {r.eventtype: r for r in audit.events().collect()}
    assert CREATE_TABLE in ev
    assert ev[CREATE_TABLE].objectname == "taudited"
    assert "company_name" in ev[CREATE_TABLE].detail

    # second file brings a new column → one ADD COLUMN event for it
    (tmp_path / "watch" / "20250302T120000_MeetMax_1.csv").write_text(
        "Company Name,Ticker,Sector\nBeta,BETA,Tech\n"
    )
    job.run()
    adds = audit.events().where(F.col("eventtype") == ADD_COLUMN).collect()
    assert [r.detail for r in adds] == ["sector"]
    assert adds[0].objecttype == "column"
    # no duplicate CREATE for an existing table
    assert audit.events().where(F.col("eventtype") == CREATE_TABLE).count() == 1


def test_strategy3_failure_audited(spark, tmp_path):
    audit = DdlAuditLog(spark, str(tmp_path / "ddl_audit"))
    job = _job(spark, tmp_path, audit, import_strategy=3)
    (tmp_path / "watch" / "20250301T120000_MeetMax_1.csv").write_text("A,B\n1,2\n")
    job.run()
    (tmp_path / "watch" / "20250302T120000_MeetMax_1.csv").write_text("A\n3\n")
    # run() isolates the failure per file (Failed result, no raise);
    # the audit row is written either way.
    (res,) = job.run()
    assert res.status == "Failed"
    fails = audit.events().where(F.col("eventtype") == VALIDATION_FAILED).collect()
    assert len(fails) == 1
    assert "b" in fails[0].detail


def test_no_audit_rows_for_plain_appends(spark, tmp_path):
    """Data-only appends (same schema) are NOT DDL — the audit table
    records shape changes, not row traffic."""
    audit = DdlAuditLog(spark, str(tmp_path / "ddl_audit"))
    job = _job(spark, tmp_path, audit)
    (tmp_path / "watch" / "20250301T120000_MeetMax_1.csv").write_text("A,B\n1,2\n")
    job.run()
    n_after_create = audit.events().count()
    (tmp_path / "watch" / "20250302T120000_MeetMax_1.csv").write_text("A,B\n3,4\n")
    job.run()
    assert audit.events().count() == n_after_create
