"""Excel → CSV conversion (reference systemscripts/xls_to_csv.py).

The reference converts XLS/XLSX to CSV in the driver with pandas
(openpyxl engine, xlrd fallback for legacy .xls —
xls_to_csv.py:53-78), writes with QUOTE_NONNUMERIC (xls_to_csv.py:80-88),
then imports the CSV. We keep that design: Spark core has no Excel
reader, the files are small driver-side artifacts, and the CSV output
feeds the distributed reader.

Engine ladder: pandas+openpyxl → pandas+xlrd (legacy .xls) → a
stdlib fallback dispatched on the file magic: OOXML reader for
.xlsx (zipfile + ElementTree — a zip of XML) or BIFF8 reader for
legacy binary .xls (sources/xls_biff.py — OLE2 compound document).
Workbooks of either vintage convert even in environments with
neither Excel library installed.
"""

from __future__ import annotations

import csv
import os

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELS_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC7' → 54 (0-based column from an A1-style ref)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _first_sheet_path(zf) -> str:
    """Resolve the workbook's first sheet target via the rels part,
    falling back to the conventional sheet1 path."""
    import xml.etree.ElementTree as ET

    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        first = wb.find(f"{_XLSX_NS}sheets/{_XLSX_NS}sheet")
        rid = first.get(_RID_ATTR)
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.iter(f"{_RELS_NS}Relationship"):
            if rel.get("Id") == rid:
                target = rel.get("Target").lstrip("/")
                return target if target.startswith("xl/") else f"xl/{target}"
    except Exception:
        pass
    candidates = [n for n in zf.namelist() if n.startswith("xl/worksheets/sheet")]
    if not candidates:
        raise ValueError("workbook has no worksheets")
    return sorted(candidates)[0]


def _read_xlsx_stdlib(path: str):
    """Minimal OOXML reader: first worksheet → list of rows, with
    shared/inline strings resolved, numbers as int/float, booleans as
    True/False, missing cells as ''. Enough for the tabular snapshot
    exports this pipeline ingests (no styles/dates/formula engine)."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        sheet = ET.fromstring(zf.read(_first_sheet_path(zf)))
        rows: list[list] = []
        for row in sheet.iter(f"{_XLSX_NS}row"):
            # Excel encodes sheets sparsely: entirely-empty rows are
            # omitted from the XML but carry gaps in the 'r' indices.
            # Emit blank rows for the gaps so positions match what the
            # pandas engines produce (blank row → row of empty cells).
            r_attr = row.get("r")
            if r_attr is not None:
                while len(rows) < int(r_attr) - 1:
                    rows.append([])
            out: list = []
            next_col = 0
            for c in row.iter(f"{_XLSX_NS}c"):
                col = _col_index(c.get("r")) if c.get("r") else next_col
                next_col = col + 1
                while len(out) < col:
                    out.append("")
                ctype = c.get("t", "n")
                v = c.find(f"{_XLSX_NS}v")
                if ctype == "s":
                    val = shared[int(v.text)] if v is not None else ""
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_XLSX_NS}t"))
                        if is_el is not None
                        else ""
                    )
                elif ctype == "b":
                    val = v is not None and v.text == "1"
                elif v is None or v.text is None:
                    val = ""
                elif ctype == "str":
                    val = v.text
                else:  # numeric
                    txt = v.text
                    val = (
                        float(txt)
                        if any(ch in txt for ch in ".eE")
                        else int(txt)
                    )
                out.append(val)
            rows.append(out)
    return rows


def excel_to_csv(path: str, out_path: str | None = None) -> str:
    """Convert one Excel workbook's first sheet to CSV; returns the CSV
    path. Mirrors xls_to_csv.py:18-96 (engine fallback, non-numeric
    quoting)."""
    import pandas as pd

    if out_path is None:
        out_path = os.path.splitext(path)[0] + ".csv"
    df = None
    try:
        df = pd.read_excel(path, engine="openpyxl")
    except Exception:
        try:
            df = pd.read_excel(path, engine="xlrd")  # legacy .xls fallback
        except Exception as e:
            try:
                from etl_database_spark.sources.xls_biff import is_ole2, read_xls_stdlib

                if is_ole2(path):
                    rows = read_xls_stdlib(path)
                else:
                    rows = _read_xlsx_stdlib(path)
            except Exception:
                raise ImportError(
                    f"cannot read Excel file {path}: openpyxl/xlrd unavailable "
                    "or file invalid (stdlib xls/xlsx fallback also failed)"
                ) from e
            header = [str(h) for h in rows[0]] if rows else []
            # Data rows wider than the header keep their cells under
            # generated names, mirroring pandas' unnamed-column
            # behavior — silent truncation would make the same file
            # ingest differently depending on which engine ran.
            width = max([len(header)] + [len(r) for r in rows[1:]]) if rows else 0
            header += [f"Unnamed: {i}" for i in range(len(header), width)]
            with open(out_path, "w", newline="") as f:
                w = csv.writer(f, quoting=csv.QUOTE_NONNUMERIC)
                w.writerow(header)
                for r in rows[1:]:
                    w.writerow(r + [""] * (width - len(r)))
            os.chmod(out_path, 0o660)  # xls_to_csv.py:88
            return out_path
    df.to_csv(out_path, index=False, quoting=csv.QUOTE_NONNUMERIC)
    os.chmod(out_path, 0o660)  # xls_to_csv.py:88
    return out_path
