"""KMV (k-minimum-values) distinct-count sketch — the engine-portable
cousin of HLL (Bar-Yossef et al. 2002, "Counting distinct elements in
a data stream").

Hash every key to a uniform point in (0, 1); with n distinct keys the
k-th smallest hash u_k sits near k/n, so n̂ = (k−1)/u_k is an unbiased
NDV estimate with relative error ≈ 1/√(k−2) (~6% at k=256). Groups
with fewer than k distinct hashes report the exact distinct count
(every hash is retained — nothing to estimate).

Why this exists next to ``approx_count_distinct`` (HLL++): Spark's
HLL register layout is engine-internal, so the HLL query can only
ever be rows-only checked. KMV is nothing but DISTINCT + ROW_NUMBER +
one divide over an md5-derived hash — every step replays bit-for-bit
in any SQL engine, which makes the distinct-count *family*
oracle-verifiable (the checkable-twin move).

Scale shape: one distinct shuffle on (group, hash) — the same
exchange COUNT(DISTINCT) needs — then a per-group bottom-k. The
window carries an explicit ``_rk <= k`` rank predicate, which is
what lets Spark's WindowGroupLimit rewrite keep only k hashes of
per-group state instead of numbering every distinct hash (without
the predicate the window sorts and numbers the full distinct set,
costing at least as much as exact COUNT(DISTINCT)). Because the
filtered side's row count is exactly ``min(nd, k)``, the "exact
below k / estimate at k" split needs no second exact-count pass.
The sketch is also mergeable (union the hash sets, keep the k
smallest), which is what a per-batch incremental store would
exploit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 256

# 2^60 — the hash domain: 15 md5 hex chars fit a signed BIGINT in any
# engine (the simhash-twin precedent), and the double division below
# is exact-input IEEE (both operands integer-valued doubles < 2^62).
_KMV_DOMAIN = float(1 << 60)


def kmv_hash(col) -> F.Column:
    """60-bit portable uniform hash: first 15 md5 hex chars of the
    string form. DuckDB twin: ``('0x' || substr(md5(CAST(x AS
    VARCHAR)), 1, 15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(group..., kmv_distinct) — KMV NDV estimate per group, rounded
    to 4 digits (exact count as a double when the group has < k
    distinct hashes)."""
    from pyspark.sql import Window as W

    group_cols = group_cols or []
    dh = df.select(*group_cols, kmv_hash(key_col).alias("_h")).distinct()
    w = W.partitionBy(*group_cols).orderBy("_h") if group_cols else W.orderBy("_h")
    # The rank predicate (not just the k-th-row CASE in the agg) is
    # load-bearing: it is the pattern WindowGroupLimit matches, turning
    # full-group sort+number into a bounded top-k. count(*) of the
    # survivors is min(nd, k), so `_nd >= k` below still means "the
    # group had at least k distinct hashes".
    ranked = dh.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    stats = ranked.groupBy(*group_cols).agg(
        F.max(F.when(F.col("_rk") == k, F.col("_h"))).alias("_hk"),
        F.count("*").alias("_nd"),
    )
    est = F.when(
        F.col("_nd") >= k,
        F.round(
            F.lit(float(k - 1)) / (F.col("_hk").cast("double") / F.lit(_KMV_DOMAIN)),
            4,
        ),
    ).otherwise(F.col("_nd").cast("double"))
    return stats.select(*group_cols, est.alias("kmv_distinct"))
