"""Streaming exact deduplication with bounded state.

The batch dedup family (functions/dedup.py) answers "which documents
are duplicates" over a static corpus. A training-data *ingest* needs
the streaming form: drop re-arrivals of already-seen content as it
lands, without keeping every digest ever seen in memory. Structured
Streaming's ``dropDuplicatesWithinWatermark`` is exactly that shape —
the state store holds only digests younger than the watermark horizon,
so state is bounded by (arrival rate × watermark), not corpus size.
That is the 100 TB property: an unbounded ``dropDuplicates`` on a
stream would accrete state forever.

Reference parity: the closest reference behavior is the re-import
supersede path (generic_import.py registry versioning — same file
content arriving again replaces rather than duplicates); this module
is the content-addressed streaming generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_digest(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content digest as a JVM expression (no Python in the
    path). xxhash64 over the raw text — collision odds at 2^64 are
    negligible for dedup gating; exact byte equality can re-verify
    survivors offline if needed."""
    return df.withColumn("digest", F.xxhash64(F.col(text_col)))


def dedup_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen-wins exact dedup on a content digest.

    Batch frame → plain ``dropDuplicates`` on the digest (one shuffle).
    Streaming frame → watermark + ``dropDuplicatesWithinWatermark``:
    duplicates arriving within the watermark of the first sighting are
    dropped and the digest is evicted from state once the watermark
    passes it. The same call is batch/stream polymorphic so the
    equivalence is testable on identical rows.
    """
    digested = with_content_digest(df, text_col)
    if digested.isStreaming:
        return digested.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["digest"]
        )
    return digested.dropDuplicates(["digest"])


def run_dedup_once(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> None:
    """AvailableNow micro-batch driver: drain the source, append the
    surviving (first-seen) rows to Parquet, leave resumable state in
    the checkpoint so the next drain continues where this one ended."""
    deduped = dedup_stream(stream, text_col, ts_col, watermark)
    (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
