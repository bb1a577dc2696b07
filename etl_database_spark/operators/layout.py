"""Multi-dimensional data layout: Z-order (Morton) clustering.

A sorted layout prunes scans on ONE leading column: parquet min/max
stats per file/row-group are tight on the sort key and useless on
everything else. When the workload filters on several columns
(``WHERE x BETWEEN ... AND y BETWEEN ...``), interleaving the bits of
the filter columns into one Morton code and range-partitioning +
sorting on it keeps every participating column *locally clustered* in
every file — so footer min/max stats stay tight on ALL of them and the
reader (Spark's parquet filter pushdown) skips most files/row-groups
for any single- or multi-column range predicate.

This is the layout-time counterpart to the bucketed-join tables in
operators/bucketing.py: a write-once cost (one range shuffle) paid to
make every subsequent selective scan cheaper. At 100 TB, data layout
is the single biggest scan-cost lever there is — stats-based skipping
works at file granularity before a single byte of data pages is read.

Normalization: each column is min/max scaled to an unsigned
``bits``-wide integer with a 1-row bounds aggregate (broadcast — never
a driver loop). Linear scaling assumes roughly uniform value spread;
for heavily skewed columns, pre-rank with ``ntile`` and z-order the
rank (documented escape hatch, same interleave).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(scaled: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of the given non-negative
    integer columns: bit j of column i lands at position j*n + i.
    Pure JVM-side bit arithmetic (shifts + OR) — stays inside
    whole-stage codegen, no UDF."""
    n = len(scaled)
    parts = []
    for i, col in enumerate(scaled):
        for j in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(col, j).bitwiseAND(F.lit(1)), j * n + i)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 12, out_col: str = "_z"
) -> DataFrame:
    """Append a Morton code over ``cols`` (numeric), min/max scaled to
    ``bits`` bits each. Total code width n*bits must fit a long
    (n*bits <= 62). The bounds pass is one tiny aggregate joined back
    as a broadcast 1-row frame."""
    if len(cols) * bits > 62:
        raise ValueError(f"z-code width {len(cols) * bits} exceeds long range")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_max_{c}") for c in cols],
    )
    top = (1 << bits) - 1
    with_bounds = df.crossJoin(F.broadcast(bounds))
    scaled = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        # NULLs code as 0 explicitly, and the coalesce must sit INSIDE
        # the least: floor(NULL) is NULL and F.least IGNORES NULLs, so
        # least(NULL, top) returns top — a NULL row would silently take
        # the TOP bucket and cluster with max-valued rows, giving the
        # files that hold it pessimal min/max stats. Coding 0 clusters
        # NULLs with the minimum instead (one edge file's stats widen;
        # every other file stays prunable).
        scaled.append(
            F.least(
                F.coalesce(
                    F.floor(
                        (F.col(c).cast("double") - lo) / span * (top + 1)
                    ).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(top).cast("long"),
            )
        )
    return with_bounds.withColumn(out_col, morton_interleave(scaled, bits)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16, bits: int = 12
) -> None:
    """Range-partition on the Morton code (equal-population file
    splits via Spark's range-partition sampling), sort within each
    file, drop the code, write parquet. Cost: one range-exchange —
    the standard OPTIMIZE ZORDER shape."""
    z = with_zorder(df, cols, bits)
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_range_overlap(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min, max] footer stats overlap [lo, hi], total
    files) for a parquet directory — the exact skip decision a stats-
    based reader makes, measured from the footers themselves. Driver-
    side by design: it reads only footers, and it's a diagnostic."""
    import os

    import pyarrow.parquet as pq

    overlapping = total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is None or not (fmax < lo or fmin > hi):
            overlapping += 1
    return overlapping, total
