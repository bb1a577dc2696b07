"""Relative-error quantile sketch (DDSketch, Masson et al.,
VLDB 2019) as mergeable DataFrame rows.

The fixed-bound histogram (functions/histogram.py) answers quantiles
within one ABSOLUTE bucket width and needs [lo, hi) fixed up front.
Log-spaced buckets remove both constraints: bucket = ceil(log_γ(v))
with γ = (1+α)/(1-α) guarantees every estimate within RELATIVE error
α of the true quantile value, over an unbounded positive domain, with
counts that merge by plain SUM — the fourth member of the mergeable
sketch family (hll = distinct, cms = frequency, histogram =
absolute-error quantiles).

Scope: non-negative values (zero gets a dedicated counter; the
standard negative-store mirror is out of scope until a consumer needs
it). Bucket count is data-dependent but tiny: values spanning
[1e-6, 1e6] at α=1% need ~1,400 buckets.

Rows-only at the registry level: the bucket boundary is a float
``log``, whose last-ulp liberty across engines could flip a boundary
value's bucket — fine for the α-bounded estimate, not for a value
hash. Accuracy and merge-exactness are property-tested instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_ALPHA = 0.01
_ZERO_BUCKET = -(2**31)  # sorts before every real bucket


def _gamma(alpha: float) -> float:
    return (1 + alpha) / (1 - alpha)


def dds_partials(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(group..., bucket, cnt) log-bucket counters. One
    partial-aggregated shuffle; negative inputs raise at estimation
    time by never matching (they are counted into the zero bucket is
    WRONG — so they are rejected here, eagerly, via a filter-and-count
    contract documented below). Callers with negatives must split by
    sign first."""
    group_cols = group_cols or []
    ln_gamma = math.log(_gamma(alpha))
    v = F.col(value_col).cast("double")
    bucket = (
        F.when(v > 0, F.ceil(F.log(v) / F.lit(ln_gamma)).cast("int"))
        .when(v == 0, F.lit(_ZERO_BUCKET))
        .when(v.isNull(), F.lit(None).cast("int"))  # nulls skipped, like agg
        .otherwise(F.raise_error(F.lit("dds_partials: negative value")))
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dds_merge(*partials: DataFrame) -> DataFrame:
    """Sum counters per (group, bucket) — the exact merge."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def dds_quantiles(
    partials: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(group..., q, est) with |est - true| <= alpha * true: cumulative
    counts in bucket order (the zero bucket sorts first), first bucket
    reaching q*n, bucket midpoint 2*gamma^b/(gamma+1) as the estimate.
    All quantiles answered in one window pass over counter-sized data
    (same shape as histogram_quantiles)."""
    group_cols = group_cols or []
    g = _gamma(alpha)
    w_cum = W.partitionBy(*group_cols).orderBy("bucket") if group_cols else W.orderBy(
        "bucket"
    )
    w_all = W.partitionBy(*group_cols) if group_cols else W.partitionBy()
    cum = partials.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    qdf = partials.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    hit = cum.join(F.broadcast(qdf)).where(F.col("cum") >= F.col("n") * F.col("q"))
    w_first = (
        W.partitionBy(*group_cols, "q").orderBy("bucket")
        if group_cols
        else W.partitionBy("q").orderBy("bucket")
    )
    first = hit.withColumn("rn", F.row_number().over(w_first)).where(F.col("rn") == 1)
    est = F.when(F.col("bucket") == _ZERO_BUCKET, F.lit(0.0)).otherwise(
        F.lit(2.0) * F.pow(F.lit(g), F.col("bucket")) / F.lit(g + 1.0)
    )
    return first.select(
        *group_cols, "q", est.cast("double").alias("est")
    ).orderBy(*group_cols, "q")
