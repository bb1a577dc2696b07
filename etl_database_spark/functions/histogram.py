"""Fixed-bound equi-width histograms as mergeable DataFrame rows —
the quantile member of the sketch family (hll.py = distinct counts,
cms.py = frequencies).

Exact percentiles are holistic: they cannot be maintained
incrementally, which is why the rollup store (operators/rollup.py)
excludes them. A fixed-bound histogram is the additive summary that
CAN: counts per (group, bucket) merge by SUM, so per-batch partials
drop into the same batch-partitioned store pattern, and any quantile
is answered from the counters with error bounded by one bucket width.
The [lo, hi) domain is fixed at sketch-creation time (store metadata
in practice) — the standard operating constraint for mergeable
histograms; values outside clamp into the edge buckets, preserving
counts at the cost of edge-quantile resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_BUCKETS = 256


def histogram_partials(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    group_cols: list[str] | None = None,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(group..., bucket, cnt) with bucket = clamp(floor((v-lo)/width)).
    One partial-aggregated shuffle into ≤ buckets groups per group."""
    group_cols = group_cols or []
    if not hi > lo:
        raise ValueError(f"histogram bounds must satisfy lo < hi, got [{lo}, {hi})")
    width = (hi - lo) / buckets
    raw = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1)).cast("int")
    # NULL values are skipped, matching ddsketch.dds_partials and SQL
    # aggregate semantics. Without this, greatest(NULL, 0)=0 clamps a
    # NULL row into bucket 0 (F.greatest ignores NULLs), silently
    # counting it and skewing every served quantile low.
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_merge(*partials: DataFrame) -> DataFrame:
    """Sum counts per (group, bucket) — the exact merge."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    partials: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    group_cols: list[str] | None = None,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(group..., q, est) per requested quantile: cumulative counts in
    bucket order, first bucket reaching q·n, linear interpolation
    inside it. Error ≤ one bucket width. The cumulative window runs
    over ≤ ``buckets`` rows per group — counter-sized, never
    data-sized."""
    group_cols = group_cols or []
    width = (hi - lo) / buckets
    w_cum = W.partitionBy(*group_cols).orderBy("bucket") if group_cols else W.orderBy(
        "bucket"
    )
    w_all = W.partitionBy(*group_cols) if group_cols else W.partitionBy()
    cum = partials.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    # ALL quantiles in one pass: join the (tiny, literal) q frame and
    # rank once per (group, q) — a per-q union would recompute the
    # cumulative window for every quantile (it audited at 12 exchanges;
    # this shape is one window + one broadcast join).
    qdf = partials.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    target = F.col("n") * F.col("q")
    hit = cum.join(F.broadcast(qdf)).where(F.col("cum") >= target)
    w_first = (
        W.partitionBy(*group_cols, "q").orderBy("bucket")
        if group_cols
        else W.partitionBy("q").orderBy("bucket")
    )
    first = hit.withColumn("rn", F.row_number().over(w_first)).where(F.col("rn") == 1)
    frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    # round to 6 decimals: the q*n product gives the two engines a
    # one-ulp liberty that %.6g formatting can split across a rounding
    # boundary (the cosine operators' round-to-4 precedent); 1e-6 is
    # far below the sketch's own bucket-width error
    est = F.round(F.lit(lo) + (F.col("bucket") + frac) * F.lit(width), 6)
    return first.select(
        *group_cols, "q", est.cast("double").alias("est")
    ).orderBy(*group_cols, "q")
