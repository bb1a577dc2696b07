"""Filename → metadata extraction for config-driven imports.

Re-expresses ``parse_metadata`` (reference
systemscripts/generic_import.py:86-125) and the filename-date parser
(generic_import.py:564-580):

- ``metadata_label_source`` ∈ {filename, static}: label comes from the
  file name or is a constant (create_importconfig_table.sql:29-31).
- ``metadata_label_location``: either an integer index into the
  ``_``-split filename tokens, or a regex — group 1 if the pattern has
  groups, else group 0 (the reference's fallback,
  generic_import.py:111-113).
- date extraction: token index or regex via ``dateconfig`` /
  ``datelocation``, parsed with the **configured** ``dateformat``
  (the reference hardcodes '%Y%m%dT%H%M%S' ignoring its own config,
  generic_import.py:567 — documented divergence: we honor the config);
  unparseable dates fall back to today (generic_import.py:573-575).

Both a driver-side form (plain Python, used by the import job on one
filename) and a distributed form (Column expressions over
``input_file_name()``, used when ingesting thousands of files in one
read) are provided.
"""

from __future__ import annotations

import datetime as dt
import os
import re
from dataclasses import dataclass


@dataclass
class MetadataSpec:
    label_source: str = "filename"  # filename | static
    label_location: str = "0"  # int index into _-split tokens, or regex, or static value
    date_location: str | None = "0"  # int index or regex; None → today
    date_format: str = "%Y%m%dT%H%M%S"


def _extract(filename: str, location: str) -> str | None:
    """Token-index or regex extraction (group 1 if present, else group 0)."""
    base = os.path.basename(filename)
    stem = base.rsplit(".", 1)[0]
    if re.fullmatch(r"\d+", location):
        tokens = stem.split("_")
        idx = int(location)
        return tokens[idx] if idx < len(tokens) else None
    m = re.search(location, base)
    if not m:
        return None
    return m.group(1) if m.groups() else m.group(0)


def parse_label(filename: str, spec: MetadataSpec) -> str | None:
    if spec.label_source == "static":
        return spec.label_location
    return _extract(filename, spec.label_location)


def parse_date(filename: str, spec: MetadataSpec) -> dt.date:
    """Extract and parse the snapshot date; fall back to today on any
    failure (reference behavior, generic_import.py:573-575)."""
    if spec.date_location is None:
        return dt.date.today()
    raw = _extract(filename, spec.date_location)
    if raw is None:
        return dt.date.today()
    try:
        return dt.datetime.strptime(raw, spec.date_format).date()
    except ValueError:
        return dt.date.today()


def file_metadata_columns(spec: MetadataSpec, spark_date_format: str | None = None):
    """Distributed variant: (label_col, date_col) Column expressions
    over ``input_file_name()`` for many-files-in-one-read ingestion.

    ``spark_date_format`` is the Java datetime pattern equivalent of
    ``spec.date_format`` (e.g. ``yyyyMMdd'T'HHmmss``); when None, a
    best-effort translation of the common strptime tokens is applied.
    """
    from pyspark.sql import functions as F

    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    stem = F.regexp_replace(fname, r"\.[^.]*$", "")

    def col_for(location: str):
        if re.fullmatch(r"\d+", location):
            return F.element_at(F.split(stem, "_"), int(location) + 1)
        # Group 1 when the pattern captures, group 0 otherwise —
        # mirroring the driver-side _extract fallback (a groupless
        # regex would error in regexp_extract with idx=1).
        idx = 1 if re.compile(location).groups else 0
        return F.regexp_extract(fname, location, idx)

    if spec.label_source == "static":
        label = F.lit(spec.label_location)
    else:
        label = col_for(spec.label_location)

    if spark_date_format is None:
        spark_date_format = strptime_to_java(spec.date_format)
    if spec.date_location is None:
        date = F.current_date()
    else:
        date = F.coalesce(
            F.to_date(col_for(spec.date_location), spark_date_format), F.current_date()
        )
    return label.alias("label"), date.alias("datasetdate")


_STRPTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%y": "yy",
}


def strptime_to_java(fmt: str) -> str:
    """Translate the strptime subset used by import configs to Java
    datetime patterns; literal letters are single-quoted."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out.append(_STRPTIME_TO_JAVA.get(tok, tok))
            i += 2
        else:
            ch = fmt[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)
