"""HyperLogLog distinct-count sketches as plain DataFrame algebra
(Flajolet et al. 2007; the stochastic-averaging HLL with the standard
small-range correction).

Spark's ``approx_count_distinct`` answers one query but does not
expose its sketch, so the estimate cannot be maintained incrementally
or served from a store. This module builds the sketch AS ROWS —
(group, register, max_rho) — which makes it:

- **mergeable**: registers merge by MAX, so partials from different
  batches/days/stores combine exactly (the property count-distinct
  itself lacks and the reason sketches exist at 100 TB);
- **storable**: the partial rows drop straight into the same
  batch-partitioned store pattern as the rollup partials — a
  distinct-users-per-day rollup maintained one ingest batch at a
  time;
- **engine-visible**: every step is a codegen column expression
  (xxhash64 split into register index + suffix, rho via exact integer
  bit-length — no float log on 64-bit values).

Size: 2^p register rows per group (p=12 → 4096, σ ≈ 1.04/√m ≈ 1.6%),
and usually far fewer — only hit registers materialize; the estimator
counts the missing ones as zeros.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_P = 12


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_partials(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None, p: int = DEFAULT_P
) -> DataFrame:
    """(group..., ridx, max_rho) sketch rows for the keys in ``df``.

    Register index = top ``p`` bits of xxhash64(key); rho = leading-
    zero count of the remaining 64-p bits + 1, computed as an exact
    integer bit length via base-2 ``conv`` (no float precision cliff
    at 2^53). One partial-aggregated shuffle on (group, ridx)."""
    group_cols = group_cols or []
    m_suffix_bits = 64 - p
    suffix_mask = (1 << m_suffix_bits) - 1
    h = F.xxhash64(F.col(key_col).cast("string"))
    ridx = F.shiftrightunsigned(h, m_suffix_bits).cast("int")
    w = h.bitwiseAND(F.lit(suffix_mask))
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.conv(w, 10, 2)))
    rho = (F.lit(m_suffix_bits + 1) - bitlen).cast("int")
    return (
        df.select(*group_cols, ridx.alias("ridx"), rho.alias("rho"))
        .groupBy(*group_cols, "ridx")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*partials: DataFrame) -> DataFrame:
    """Union sketch rows and re-max per register — the exact merge.
    Inputs must share (group..., ridx, max_rho) schemas."""
    out = partials[0]
    for p_ in partials[1:]:
        out = out.unionByName(p_)
    keys = [c for c in out.columns if c != "max_rho"]
    return out.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(
    partials: DataFrame, group_cols: list[str] | None = None, p: int = DEFAULT_P
) -> DataFrame:
    """(group..., approx_distinct) from sketch rows: harmonic mean of
    register values with absent registers counted as zeros, plus the
    linear-counting small-range correction. Pure aggregate — one
    shuffle on the group key over at most m rows per group."""
    group_cols = group_cols or []
    m = 1 << p
    alpha = _alpha(m)
    agg = partials.groupBy(*group_cols).agg(
        # coalesce: a global agg over an EMPTY sketch yields sum=null;
        # 0.0 makes the math fall through to linear counting → 0
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))), F.lit(0.0)).alias(
            "z_hit"
        ),
        F.count("*").alias("n_hit"),
    )
    zeros = F.lit(m) - F.col("n_hit")
    z = F.col("z_hit") + zeros.cast("double")  # absent registers: 2^0 each
    e_raw = F.lit(alpha * m * m) / z
    small = (e_raw <= F.lit(2.5 * m)) & (zeros > 0)
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when(small, lin).otherwise(e_raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("approx_distinct")
    ).orderBy(*group_cols) if group_cols else agg.select(
        F.round(est).cast("long").alias("approx_distinct")
    )


def hll_std_error(p: int = DEFAULT_P) -> float:
    """Theoretical relative standard error 1.04/sqrt(m)."""
    return 1.04 / math.sqrt(1 << p)


def hll_intersection_estimate(
    a: DataFrame, b: DataFrame, p: int = DEFAULT_P
) -> DataFrame:
    """|A ∩ B| via inclusion-exclusion over three sketch estimates
    (|A| + |B| - |A ∪ B|; the union sketch is the exact max-merge).
    Error compounds across the three estimates — for small true
    intersections of large sets, prefer an exact semi-join; this is
    the screening-grade estimator (did these two corpora overlap
    materially?) whose cost is sketch-sized, not data-sized."""
    ea = hll_estimate(a, p=p).withColumnRenamed("approx_distinct", "n_a")
    eb = hll_estimate(b, p=p).withColumnRenamed("approx_distinct", "n_b")
    eu = hll_estimate(hll_merge(a, b), p=p).withColumnRenamed(
        "approx_distinct", "n_union"
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "n_a",
            "n_b",
            "n_union",
            F.greatest(
                F.lit(0).cast("long"),
                (F.col("n_a") + F.col("n_b") - F.col("n_union")).cast("long"),
            ).alias("approx_intersection"),
        )
    )
