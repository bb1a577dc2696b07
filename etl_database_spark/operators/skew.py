"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (enabled in session.py) handles most shuffle
skew at runtime; these operators cover the two cases AQE can't:

- **Salted two-phase aggregation**: one hot group overwhelms a single
  reducer even after AQE splits partitions, because all rows of one
  key hash to one task. Phase 1 aggregates (key, salt) with a random
  salt in [0, S); phase 2 merges the S partials. Correct for any
  algebraic aggregate (sum/count/min/max) — pass the merge expressions.
- **Replicated (salted-broadcast) join**: joining a skewed fact key
  against a small-but-not-tiny dimension: explode the dimension S ways
  and salt the fact side, so the hot key's rows spread over S tasks.

Salting uses a deterministic hash of a row-unique column when given
(reproducible runs), else ``rand`` — at 100 TB prefer the former.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(num_salts: int, unique_col: str | None) -> Column:
    if unique_col is not None:
        return F.pmod(F.xxhash64(unique_col), F.lit(num_salts)).cast("int")
    return (F.rand(seed=42) * num_salts).cast("int")


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    num_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation → (group_cols..., total, n_rows).

    total follows the engine's decimal-sum determinism rule, so the
    result is identical to the unsalted aggregate bit-for-bit.
    """
    salted = df.withColumn("_salt", _salt_col(num_salts, unique_col))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_ps"),
        F.count("*").alias("_pc"),
    )
    return (
        partial.groupBy(*group_cols)
        .agg(
            F.sum("_ps").cast("double").alias("total"),
            F.sum("_pc").alias("n_rows"),
        )
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 8,
    unique_col: str | None = None,
) -> DataFrame:
    """Inner join fact⋈dim on ``key`` with the dim replicated S ways and
    the fact salted — every hot-key row group spreads across S tasks.
    Result columns = fact columns + dim columns (minus duplicate key).
    """
    salted_fact = fact.withColumn("_salt", _salt_col(num_salts, unique_col))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted_fact.join(F.broadcast(exploded_dim), [key, "_salt"]).drop("_salt")
