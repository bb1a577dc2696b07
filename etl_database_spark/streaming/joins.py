"""Watermarked stream-stream interval join (click→purchase attribution).

The reference's closest surface is its correlated as-of lookup
(onboarding/sql/dataset_setup.sql window queries — re-expressed in
batch as ``clicks_last_purchase_asof`` / ``click_error_range_join``).
This module provides the *streaming* counterpart a 100 TB event
pipeline needs: join two live event streams on key + time interval,
with watermarks bounding the buffered state on both sides.

Semantics: a purchase is attributed to every click by the same user in
the ``attribution_window`` preceding it. Spark buffers each side's
rows in state only until the watermark passes the join-range bound,
so state size is O(rate × window), independent of stream length —
this is the property that makes the operator viable on an unbounded
stream, and what distinguishes it from a batch range join re-run.

The transformation is batch/stream polymorphic: applied to static
frames it is a plain interval join, which the equivalence test uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_database_spark.timeutil import normalize_event_time


def attributed_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Inner interval join: purchases matched to same-user clicks with
    ``click_ts <= purchase_ts <= click_ts + attribution_window``.

    On streams both sides are watermarked; Spark derives the state
    retention for each side from the interval bound (clicks held for
    ``watermark + attribution_window``, purchases for ``watermark``).
    """
    c = normalize_event_time(clicks, [ts_col])
    p = normalize_event_time(purchases, [ts_col])
    if c.isStreaming:
        c = c.withWatermark(ts_col, watermark)
    if p.isStreaming:
        p = p.withWatermark(ts_col, watermark)
    c = c.select(
        F.col("user_id").alias("click_user"),
        F.col(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = p.select(
        F.col("user_id").alias("purchase_user"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = F.expr(
        "click_user = purchase_user "
        "AND purchase_ts >= click_ts "
        f"AND purchase_ts <= click_ts + INTERVAL {attribution_window}"
    )
    return c.join(p, cond, "inner").select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def run_attribution_once(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    attribution_window: str = "30 minutes",
    watermark: str = "2 hours",
) -> None:
    """AvailableNow micro-batch driver: append matched pairs to Parquet
    (inner stream-stream joins emit on match, not on window close)."""
    joined = attributed_purchases(
        clicks_stream, purchases_stream, attribution_window, watermark
    )
    (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
