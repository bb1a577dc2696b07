"""Runtime .xlsx ingestion via the stdlib OOXML fallback.

The container has neither openpyxl nor xlrd, so the pandas engines are
dead code here — these tests exercise the zipfile+ElementTree path on
a handcrafted (real, spec-conforming) workbook, end-to-end into the
Spark CSV reader.
"""

from __future__ import annotations

import csv
import zipfile

import pytest

from etl_database_spark.sources.excel import excel_to_csv

_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_RNS = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'


def _write_xlsx(path: str) -> None:
    """A minimal spec-conforming workbook: shared strings, inline
    strings, numbers (int/float), booleans, a skipped cell (C2 empty),
    and a non-default sheet filename resolved through the rels part."""
    shared = """<?xml version="1.0"?>
<sst {ns} count="3" uniqueCount="3">
  <si><t>name</t></si><si><t>qty</t></si><si><t>alice,smith</t></si>
</sst>""".format(ns=_NS)
    sheet = """<?xml version="1.0"?>
<worksheet {ns}><sheetData>
  <row r="1">
    <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
    <c r="C1" t="inlineStr"><is><t>price</t></is></c>
    <c r="D1" t="inlineStr"><is><t>active</t></is></c>
  </row>
  <row r="2">
    <c r="A2" t="s"><v>2</v></c><c r="B2"><v>3</v></c>
    <c r="D2" t="b"><v>1</v></c>
  </row>
  <row r="3">
    <c r="A3" t="inlineStr"><is><t>bob</t></is></c><c r="B3"><v>12</v></c>
    <c r="C3"><v>1.5</v></c><c r="D3" t="b"><v>0</v></c>
  </row>
</sheetData></worksheet>""".format(ns=_NS)
    workbook = """<?xml version="1.0"?>
<workbook {ns} {rns}><sheets>
  <sheet name="Data" sheetId="1" r:id="rId9"/>
</sheets></workbook>""".format(ns=_NS, rns=_RNS)
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId9"
   Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"
   Target="worksheets/data99.xml"/>
</Relationships>"""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/data99.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)


def test_xlsx_stdlib_conversion(tmp_path):
    xlsx = tmp_path / "snapshot.xlsx"
    _write_xlsx(str(xlsx))
    out = excel_to_csv(str(xlsx))
    with open(out, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["name", "qty", "price", "active"]
    # embedded comma survives quoting; empty C2 padded; bools rendered
    assert rows[1] == ["alice,smith", "3", "", "True"]
    assert rows[2] == ["bob", "12", "1.5", "False"]


def test_xlsx_feeds_spark_reader(spark, tmp_path):
    xlsx = tmp_path / "snapshot.xlsx"
    _write_xlsx(str(xlsx))
    out = excel_to_csv(str(xlsx))
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "false")
        .csv(out)
    )
    assert df.columns == ["name", "qty", "price", "active"]
    got = {r["name"]: (r["qty"], r["price"]) for r in df.collect()}
    assert got == {"alice,smith": ("3", None), "bob": ("12", "1.5")}


def test_invalid_workbook_still_raises_import_error(tmp_path):
    bad = tmp_path / "file.xlsx"
    bad.write_bytes(b"not a real workbook")
    with pytest.raises(ImportError, match="cannot read Excel"):
        excel_to_csv(str(bad))


def test_xlsx_import_job_end_to_end(spark, tmp_path):
    """Full ingest path on an .xlsx watch file: convert via the stdlib
    fallback, load all-string through the Spark CSV reader, register,
    archive — runtime Excel ingestion actually executed (previously
    only the ImportError gate could run in this environment)."""
    import datetime as dt
    import os

    from etl_database_spark.ingest import ImportConfig, ImportJob
    from etl_database_spark.metadata import MetadataSpec
    from etl_database_spark.registry import DatasetRegistry

    src = tmp_path / "watch"
    src.mkdir()
    _write_xlsx(str(src / "20250301T120000_MeetMax_77.xlsx"))
    cfg = ImportConfig(
        config_name="XlsxImport",
        source_directory=str(src),
        archive_directory=str(tmp_path / "archive"),
        file_pattern=r"\d{8}T\d{6}_MeetMax_\d+\.xlsx",
        target_table="txlsx",
        datasettype="MeetMaxEvents",
        file_type="XLSX",
        metadata=MetadataSpec(label_location="2", date_location="0"),
    )
    reg = DatasetRegistry(spark, str(tmp_path / "registry"))
    job = ImportJob(spark, cfg, reg, str(tmp_path / "data"))
    (res,) = job.run()
    assert res.rows == 2 and res.status == "Active"
    out = job.table.read()
    assert set(out.columns) >= {"name", "qty", "price", "active", "datasetid"}
    got = {r.name: r.qty for r in out.collect()}
    assert got == {"alice,smith": "3", "bob": "12"}
    ds = reg.datasets().first()
    assert ds.datasetdate == dt.date(2025, 3, 1) and ds.isactive
    # the source workbook was archived, not the derived CSV
    assert os.path.exists(tmp_path / "archive" / "20250301T120000_MeetMax_77.xlsx")


# ---------------------------------------------------------------------------
# Property test: random tables survive the xlsx → CSV roundtrip.

from hypothesis import given, settings
from hypothesis import strategies as st

_cell_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Zs"), max_codepoint=0x2FFF
    ),
    max_size=12,
)


def _sheet_xml(rows):
    """Inline-string worksheet for arbitrary cell values (no shared
    strings — exercises the inlineStr and numeric paths)."""
    from xml.sax.saxutils import escape

    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            col = chr(ord("A") + ci)
            if val is None:
                continue  # skipped cell
            if isinstance(val, bool):
                cells.append(f'<c r="{col}{ri}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, int):
                cells.append(f'<c r="{col}{ri}"><v>{val}</v></c>')
            elif isinstance(val, float):
                cells.append(f'<c r="{col}{ri}"><v>{val!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{col}{ri}" t="inlineStr"><is><t>{escape(val)}</t></is></c>'
                )
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    return (
        '<?xml version="1.0"?><worksheet %s><sheetData>%s</sheetData></worksheet>'
        % (_NS, "".join(body))
    )


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(_cell_text, st.integers(-10**9, 10**9),
                      st.floats(-1e6, 1e6, allow_nan=False), st.booleans(),
                      st.none()),
            min_size=1, max_size=4,
        ),
        min_size=1, max_size=6,
    )
)
def test_xlsx_roundtrip_random_tables(tmp_path_factory, rows):
    import csv as _csv
    import zipfile

    # normalize ragged rows to the first row's width (header defines it)
    width = len(rows[0])
    rows = [r[:width] + [None] * (width - len(r[:width])) for r in rows]
    # header cells must be non-empty strings
    header = [f"col{i}" for i in range(width)]
    tmp = tmp_path_factory.mktemp("xlsx_prop")
    path = str(tmp / "t.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", _sheet_xml([header] + rows))
    out = excel_to_csv(path)
    with open(out, newline="") as f:
        got = list(_csv.reader(f))
    assert got[0] == header
    assert len(got) == 1 + len(rows)
    for want_row, got_row in zip(rows, got[1:]):
        for want, got_cell in zip(want_row, got_row):
            if want is None:
                assert got_cell == ""
            elif isinstance(want, bool):
                assert got_cell == str(want)
            elif isinstance(want, int):
                assert got_cell == str(want)
            elif isinstance(want, float):
                assert float(got_cell) == want
            else:
                assert got_cell == want


def test_xlsx_sparse_rows_and_wide_data_rows(tmp_path):
    """Excel omits empty rows from the XML (sparse 'r' indices) and
    data rows may be wider than the header — both must survive like
    the pandas engines: blank row emitted, extra cells kept under
    generated Unnamed columns."""
    import zipfile

    sheet = """<?xml version="1.0"?>
<worksheet {ns}><sheetData>
  <row r="1">
    <c r="A1" t="inlineStr"><is><t>h1</t></is></c>
    <c r="B1" t="inlineStr"><is><t>h2</t></is></c>
  </row>
  <row r="3">
    <c r="A3"><v>1</v></c><c r="B3"><v>2</v></c><c r="C3"><v>3</v></c>
  </row>
</sheetData></worksheet>""".format(ns=_NS)
    path = str(tmp_path / "sparse.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    out = excel_to_csv(path)
    with open(out, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["h1", "h2", "Unnamed: 2"]
    assert rows[1] == ["", "", ""]          # omitted row 2 preserved
    assert rows[2] == ["1", "2", "3"]       # wide row kept, not truncated
