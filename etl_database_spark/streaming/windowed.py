"""Streaming windowed aggregation with late-data handling.

The reference has no true streaming aggregation (SURVEY.md §2.9), but
its late-arriving-snapshot absorption (date parsed from filename, old
dates arrive anytime, versioning absorbs them) maps to event-time
processing. This module provides the Structured Streaming shape a
100 TB event pipeline needs:

- ``windowed_event_counts``: tumbling event-time windows with a
  watermark — counts/sums per (window, event_type); late rows within
  the watermark update their window, later ones are dropped;
- ``run_windowed_once``: AvailableNow micro-batch driver writing
  append-mode window results to Parquet (complete windows only, i.e.
  those the watermark has closed).

The same transformation applied to a *batch* frame gives identical
results for fully-arrived data — tests exploit that equivalence
(stream vs batch over the same rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_database_spark.timeutil import normalize_event_time


def windowed_event_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window (or, with ``slide``, hopping-window) counts and
    sums per event_type. Works on both batch and streaming frames; on
    a stream the watermark bounds state. A hopping window assigns each
    event to size/slide overlapping windows (F.window emits them
    natively — no manual explode), so state and output scale by that
    same factor."""
    df = normalize_event_time(events, [ts_col])
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_size, slide)
        if slide
        else F.window(F.col(ts_col), window_size)
    )
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_windowed_once(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drive one AvailableNow pass of the windowed aggregation to a
    Parquet sink (append mode → only watermark-closed windows emit)."""
    agg = windowed_event_counts(stream, window_size, watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
