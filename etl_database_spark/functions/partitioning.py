"""Scan-parallelism guard for CPU-bound stages.

Parquet scans parallelize by file split, and a split is at minimum one
row group — so a small-but-dense input (one file, one row group) runs
every downstream projection in a single task no matter how many cores
the cluster has. For IO-bound plans that's irrelevant; for the
CPU-heavy per-row operators (tokenize+explode, stopword ladders,
per-vector distance folds) it serializes the dominant stage: the r6
sf1 fixture's documents table is ONE 5.7 MB row group, and every
per-document operator ran 10× data on one core (dsir 14.5s, semdedup
9.9s, lang-id 2.4s before this guard; 3.7s / 3.9s / 0.6s after).

:func:`spread_scan` repartitions such inputs proportionally to their
byte size (~one task per ``bytes_per_task`` of compressed scan, capped
at the session's default parallelism), so tiny fixtures don't pay
32-way task-scheduling overhead for kilobytes of work, while dense
single-file inputs fan out. It is a deliberate NO-OP whenever the scan
already carries at least as many files as cores — the normal case at
real scale (a 100 TB table has ~10⁵ splits against ~10⁴ cores), so the
extra exchange never happens on a big cluster.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# Compressed-parquet bytes of CPU-heavy input per task. Deliberately
# small next to the 128 MB IO-oriented maxPartitionBytes default:
# tokenize/explode/distance-fold work per byte is ~100× a columnar
# scan's, so partitions must be sized for CPU, not IO.
DEFAULT_BYTES_PER_TASK = 128 * 1024


def spread_scan(
    df: DataFrame,
    bytes_per_task: int = DEFAULT_BYTES_PER_TASK,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Ensure a CPU-bound stage over ``df`` gets parallelism
    proportional to its input size: repartition to
    ``min(ceil(input_bytes / bytes_per_task), default parallelism)``
    when the scan has fewer files than that; no-op when it already
    carries enough splits, when the input is too small to matter, or
    when the file listing is unavailable (e.g. streaming frames).

    Operators whose per-row work fans out (a k-way candidate expansion,
    a top-k cross score) pass a smaller ``bytes_per_task`` to reflect
    the multiplier.

    The explicit partition count keeps AQE from re-coalescing the
    exchange back down by byte size — byte-based coalescing is exactly
    the wrong heuristic for compute-bound rows.
    """
    spark = df.sparkSession
    want = min_parallelism or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= want:
        return df
    total = 0
    for f in files:
        # inputFiles() renders local paths as file:///p here, but other
        # Hadoop code paths emit file:/p or file://host/p — urlparse
        # handles all three (plain paths pass through as .path).
        path = unquote(urlparse(f).path) if ":" in f else f
        try:
            total += os.path.getsize(path)
        except OSError:
            # non-local storage: size unknown — a handful of files
            # feeding a big cluster is the case the guard exists for,
            # so assume dense and spread fully
            total = want * bytes_per_task
            break
    parts = min(want, max(1, -(-total // bytes_per_task)))
    if parts <= len(files):
        return df
    return df.repartition(parts)
