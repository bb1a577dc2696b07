import datetime as dt

from etl_database_spark.metadata import (
    MetadataSpec,
    parse_date,
    parse_label,
    strptime_to_java,
)


def test_label_token_index():
    # {ts}_MeetMax_{eventid}.xls: eventid is token 2
    # (create_importconfig_table.sql:227-234)
    spec = MetadataSpec(label_source="filename", label_location="2")
    assert parse_label("20250301T120000_MeetMax_94583.xls", spec) == "94583"


def test_label_regex_group1_and_group0_fallback():
    spec = MetadataSpec(label_location=r"MeetMax_(\d+)")
    assert parse_label("20250301T120000_MeetMax_94583.xls", spec) == "94583"
    # no group → group(0) (generic_import.py:111-113)
    spec0 = MetadataSpec(label_location=r"\d{8}T\d{6}")
    assert parse_label("20250301T120000_MeetMax_94583.xls", spec0) == "20250301T120000"


def test_label_static():
    spec = MetadataSpec(label_source="static", label_location="fixed-label")
    assert parse_label("anything.csv", spec) == "fixed-label"


def test_date_parse_and_fallback():
    spec = MetadataSpec(date_location="0", date_format="%Y%m%dT%H%M%S")
    assert parse_date("20250301T120000_MeetMax_94583.xls", spec) == dt.date(2025, 3, 1)
    # configured format honored (documented divergence from the
    # reference's hardcoded format, generic_import.py:567)
    spec2 = MetadataSpec(date_location="1", date_format="%Y-%m-%d")
    assert parse_date("x_2025-04-05_y.csv", spec2) == dt.date(2025, 4, 5)
    # unparseable → today (generic_import.py:573-575)
    assert parse_date("nodatehere_MeetMax_1.xls", spec) == dt.date.today()


def test_strptime_to_java():
    assert strptime_to_java("%Y%m%dT%H%M%S") == "yyyyMMdd'T'HHmmss"
    assert strptime_to_java("%Y-%m-%d") == "yyyy-MM-dd"


def test_file_metadata_columns_distributed(spark, tmp_path):
    import os

    from etl_database_spark.metadata import file_metadata_columns

    p = tmp_path / "20250301T120000_MeetMax_94583.csv"
    p.write_text("a,b\n1,2\n")
    df = spark.read.option("header", "true").csv(str(tmp_path))
    label, d = file_metadata_columns(MetadataSpec(label_location="2", date_location="0"))
    row = df.select(label, d).first()
    assert row.label == "94583"
    assert row.datasetdate == dt.date(2025, 3, 1)


def test_file_metadata_columns_groupless_regex(spark, tmp_path):
    """Distributed col_for must fall back to regex group 0 when the
    pattern has no capture groups, mirroring the driver-side _extract
    (a groupless pattern with idx=1 errors in regexp_extract)."""
    from etl_database_spark.metadata import file_metadata_columns

    p = tmp_path / "MeetMax_94583.csv"
    p.write_text("a,b\n1,2\n")
    df = spark.read.option("header", "true").csv(str(tmp_path))
    # groupless pattern vs grouped pattern give the same answer
    for pattern in (r"\d{5}", r"(\d{5})"):
        label, d = file_metadata_columns(
            MetadataSpec(label_location=pattern, date_location=None)
        )
        row = df.select(label, d).first()
        assert row.label == "94583", pattern
        assert row.datasetdate == dt.date.today()
