"""t-digest quantile sketches as mergeable DataFrame rows — the
unbounded-domain member of the quantile family.

Positioning inside the sketch family (all rows + algebraic merges, all
store-compatible): :mod:`.histogram` needs fixed [lo, hi) bounds;
:mod:`.ddsketch` covers an unbounded but positive domain with
*relative* error; the t-digest (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", arXiv:1902.04023) covers the
whole real line with *quantile-centric* accuracy — tight at the tails,
coarse in the middle — from a bounded set of (mean, weight) centroids.

The reference implementation clusters greedily in a sequential pass,
which on Spark would mean a Python UDAF. This module instead uses the
**scale-function band construction**, which is fully expressible in
DataFrame algebra (zero Python in the hot path):

1. rank every value within its group (one sort shuffle), giving its
   exact quantile position q = (rank - 1/2)/n;
2. assign it to integer band floor(k1(q)) of the paper's k1 scale
   k1(q) = (delta / 2*pi) * asin(2q - 1) — the band widths satisfy the
   same size bound the greedy pass enforces (k-width <= 1), so tail
   bands hold O(1) points and mid bands hold O(n/delta);
3. one groupBy (group, band) producing centroids with decimal-exact
   value sums — at most ~delta/2 + 2 rows per group.

Ties need no tie-break: equal values may swap ranks across runs, but
swapping equal values between bands leaves every centroid's (sum,
weight) unchanged. Construction is two-level (a local digest per
input partition, then a centroid-level merge per group — see
``tdigest_partials``), so for a fixed partitioning the output is
bit-deterministic (asserted by test) and no group ever pays a
single-task global sort.

Merge re-runs the same band assignment over the UNION of centroid
rows (ordered by mean, positioned by cumulative weight midpoint) —
centroid-sized work. Serving interpolates linearly between adjacent
centroid means at their cumulative midpoints, clamped at the extreme
centroids. Accuracy is property-tested (rank error) on uniform,
normal-with-negatives, and heavy-tail corpora; like the DDSketch it
registers rows-only (libm asin has no cross-engine bit contract).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

TDIGEST_DELTA = 200
_SUM_DEC = "decimal(38,6)"


def _band(q, delta: int):
    """Integer k1-scale band of quantile position column ``q``."""
    k1 = (F.lit(delta / (2.0 * math.pi))) * F.asin(F.lit(2.0) * q - F.lit(1.0))
    return F.floor(k1).cast("int")


def tdigest_partials(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    delta: int = TDIGEST_DELTA,
) -> DataFrame:
    """(group..., sum_val, weight) centroid rows, <= ~delta/2 + 2 per
    group. NULL values are skipped (SQL aggregate semantics, matching
    histogram/ddsketch partials).

    Two-level construction — the standard parallel t-digest shape: a
    local digest per (group, input partition), then one centroid-level
    merge per group. The rank window that positions each value sorts
    within (group, partition), so no group ever funnels through a
    single sort task (a per-group global rank would — the 100 TB
    failure mode of naive rank-based sketches); the cross-partition
    merge handles centroid rows only. Like any t-digest built in
    parallel, the exact centroid set depends on the input
    partitioning; for a FIXED partitioning the output is fully
    deterministic (ties between equal values cannot change any
    centroid — see module doc), and accuracy bounds hold regardless
    (property-tested)."""
    group_cols = group_cols or []
    vals = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).cast("double").alias("v"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_rank = W.partitionBy(*group_cols, "pid").orderBy("v")
    w_all = W.partitionBy(*group_cols, "pid")
    q = (F.row_number().over(w_rank) - F.lit(0.5)) / F.count("*").over(w_all)
    banded = vals.withColumn("band", _band(q, delta))
    local = banded.groupBy(*group_cols, "pid", "band").agg(
        F.sum(F.col("v").cast("decimal(18,6)")).cast(_SUM_DEC).alias("sum_val"),
        F.count("*").cast("long").alias("weight"),
    ).drop("pid", "band")
    return tdigest_merge(local, group_cols, delta)


def tdigest_merge(
    centroids: DataFrame,
    group_cols: list[str] | None = None,
    delta: int = TDIGEST_DELTA,
) -> DataFrame:
    """Merge any union of centroid-row batches by re-running the band
    assignment over centroids ordered by mean, positioned at their
    cumulative-weight midpoints. Centroid-sized work; value sums stay
    decimal-exact through any number of merges."""
    group_cols = group_cols or []
    mean = (F.col("sum_val").cast("double") / F.col("weight")).alias("mean")
    c = centroids.select(*group_cols, "sum_val", "weight", mean)
    w_cum = (
        W.partitionBy(*group_cols).orderBy("mean", "weight")
        if group_cols
        else W.orderBy("mean", "weight")
    )
    w_all = W.partitionBy(*group_cols) if group_cols else W.partitionBy()
    cum = F.sum("weight").over(w_cum)
    n = F.sum("weight").over(w_all)
    qmid = (cum.cast("double") - F.col("weight") / 2.0) / n
    banded = c.withColumn("band", _band(qmid, delta))
    return banded.groupBy(*group_cols, "band").agg(
        F.sum("sum_val").cast(_SUM_DEC).alias("sum_val"),
        F.sum("weight").cast("long").alias("weight"),
    ).drop("band")


def tdigest_quantiles(
    centroids: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., q, est): linear interpolation between adjacent
    centroid means at cumulative-weight midpoints, clamped at the
    extreme centroids. One window over centroid rows + one broadcast
    join with the literal q frame — counter-sized, never data-sized."""
    group_cols = group_cols or []
    mean = (F.col("sum_val").cast("double") / F.col("weight")).alias("m")
    c = centroids.select(*group_cols, "weight", mean)
    w_cum = (
        W.partitionBy(*group_cols).orderBy("m", "weight")
        if group_cols
        else W.orderBy("m", "weight")
    )
    w_all = W.partitionBy(*group_cols) if group_cols else W.partitionBy()
    cum = c.withColumn(
        "c_mid", F.sum("weight").over(w_cum).cast("double") - F.col("weight") / 2.0
    ).withColumn("n", F.sum("weight").over(w_all))
    qdf = centroids.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    t = F.col("n") * F.col("q")
    joined = cum.join(F.broadcast(qdf)).withColumn("t", t)
    lo = F.max(
        F.when(F.col("c_mid") <= F.col("t"), F.struct(F.col("c_mid").alias("c"), F.col("m")))
    ).alias("lo")
    hi = F.min(
        F.when(F.col("c_mid") > F.col("t"), F.struct(F.col("c_mid").alias("c"), F.col("m")))
    ).alias("hi")
    agg = joined.groupBy(*group_cols, "q").agg(lo, hi, F.first("t").alias("t"))
    est = (
        F.when(F.col("lo").isNull(), F.col("hi.m"))
        .when(F.col("hi").isNull(), F.col("lo.m"))
        .otherwise(
            F.col("lo.m")
            + (F.col("t") - F.col("lo.c"))
            / (F.col("hi.c") - F.col("lo.c"))
            * (F.col("hi.m") - F.col("lo.m"))
        )
    )
    return agg.select(
        *group_cols, "q", F.round(est, 6).cast("double").alias("est")
    ).orderBy(*group_cols, "q")
