"""Event-time type normalization.

The synthetic ``events.parquet`` fixture has shipped with two different
physical timestamp encodings across generations: TIMESTAMP(NANOS)
(which Spark's vectorized reader only surfaces as ``bigint`` nanos
behind ``spark.sql.legacy.parquet.nanosAsLong``) and plain
``timestamp[us]`` without UTC adjustment (which Spark 4 reads as
TIMESTAMP_NTZ by default). Operators that do microsecond arithmetic
(``unix_micros``) require TIMESTAMP, so every ingest path funnels
through :func:`normalize_event_time` — the session timezone is pinned
to UTC (session.py), making the NTZ→TIMESTAMP cast value-preserving.

This is a metadata-only cast: it stays inside whole-stage codegen and
costs nothing at scan time, so it is safe to apply unconditionally on
a 100 TB read.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_event_time(df: DataFrame, cols: Iterable[str] | None = None) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (UTC session timezone).

    ``cols`` limits the normalization to specific columns; by default
    every NTZ column is cast. Non-NTZ columns are left untouched, so
    the call is idempotent and safe on already-normalized frames and
    on streaming DataFrames alike.
    """
    wanted = set(cols) if cols is not None else None
    ntz = [
        name
        for name, dtype in df.dtypes
        if dtype == "timestamp_ntz" and (wanted is None or name in wanted)
    ]
    if not ntz:
        return df
    return df.withColumns({name: F.col(name).cast("timestamp") for name in ntz})
