"""Excel → CSV conversion (reference systemscripts/xls_to_csv.py).

The reference converts XLS/XLSX to CSV in the driver with pandas
(openpyxl engine, xlrd fallback for legacy .xls —
xls_to_csv.py:53-78), writes with QUOTE_NONNUMERIC (xls_to_csv.py:80-88),
then imports the CSV. We keep that design: Spark core has no Excel
reader, the files are small driver-side artifacts, and the CSV output
feeds the distributed reader.

openpyxl/xlrd may be absent in this environment — gated behind
import-try; callers get a clear ImportError only when an actual Excel
file shows up.
"""

from __future__ import annotations

import csv
import os


def excel_to_csv(path: str, out_path: str | None = None) -> str:
    """Convert one Excel workbook's first sheet to CSV; returns the CSV
    path. Mirrors xls_to_csv.py:18-96 (engine fallback, non-numeric
    quoting)."""
    import pandas as pd

    if out_path is None:
        out_path = os.path.splitext(path)[0] + ".csv"
    try:
        df = pd.read_excel(path, engine="openpyxl")
    except Exception:
        try:
            df = pd.read_excel(path, engine="xlrd")  # legacy .xls fallback
        except Exception as e:  # pragma: no cover - env dependent
            raise ImportError(
                f"cannot read Excel file {path}: openpyxl/xlrd unavailable or file invalid"
            ) from e
    df.to_csv(out_path, index=False, quoting=csv.QUOTE_NONNUMERIC)
    os.chmod(out_path, 0o660)  # xls_to_csv.py:88
    return out_path
