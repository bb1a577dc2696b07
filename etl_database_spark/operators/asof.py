"""As-of (point-in-time) join and range (interval) join.

Two operators Spark lacks natively, built scale-first:

- **asof_join_backward(left, right, key, ts)**: for each left row, the
  most recent right row with the same key at-or-before the left
  timestamp. Implemented with the union + carry-forward-window trick:
  tag both sides, union by name, one window per key ordered by
  (ts, side) carrying the last right payload forward, keep left rows.
  ONE shuffle on the key — no range predicate in any join condition,
  no cross product, skew bounded by per-key cardinality. This is the
  standard scalable PIT-join pattern (vs the correlated-subquery form
  the reference uses for business-day lookups,
  create_f_get_event_changes.sql:17-22).
- **range_join(left, right, key, window)**: pairs (l, r) with the same
  key and ``r.ts < l.ts ≤ r.ts + window``. Implemented with banded
  bucketing: both sides bucket by floor(ts/window); each right row also
  lands in the next bucket, so every qualifying pair co-locates in ≥1
  bucket; the exact predicate filters after the equi-join. Turns an
  inequality join (cross-product per key) into an equi-join with ≤2×
  replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_database_spark.timeutil import normalize_event_time


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner as-of join: left rows paired with the latest right row at
    ``right.ts <= left.ts`` per key (ties among right rows with equal
    (key, ts): the row greatest in payload-struct order wins — a total
    order, so results are identical under any partitioning). Left rows
    with no prior right row are dropped (inner semantics —
    engine-portable output with no null timestamps).

    ``tolerance_us``: optional max staleness in microseconds.
    """
    left = normalize_event_time(left, [left_ts])
    right = normalize_event_time(right, [right_ts])
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    # The whole right payload is carried as ONE struct: carrying each
    # column independently with last(ignorenulls) would splice fields
    # from different right rows whenever a payload value is NULL —
    # composite rows that never existed. A struct is non-null as a
    # whole even when fields are null, so last(struct, ignorenulls)
    # picks the latest right ROW atomically.
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.struct(
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("_rpayload"),
    ).withColumn("_side", F.lit(0))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts → inclusive
    # <=; the struct itself is the final tie-break so equal-(key, ts)
    # right rows resolve deterministically regardless of partitioning.
    w = (
        W.partitionBy(key)
        .orderBy("_ats", "_side", "_rpayload")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    unioned = unioned.withColumn(
        "_rcarried", F.last("_rpayload", ignorenulls=True).over(w)
    )
    out = (
        unioned.where(F.col("_side") == 1)
        .where(F.col("_rcarried").isNotNull())
        .select(
            *[c for c in left.columns],
            *[F.col(f"_rcarried.{f}{suffix}").alias(f"{f}{suffix}") for f in right_cols],
            F.col(f"_rcarried.{right_ts}{suffix}").alias(f"{right_ts}{suffix}"),
        )
    )
    if tolerance_us is not None:
        out = out.where(
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"{right_ts}{suffix}"))
            <= F.lit(tolerance_us)
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Banded interval join → (key, left_id, right_id, gap_us) for pairs
    with ``0 < left.ts − right.ts ≤ window_us`` on the same key."""
    left = normalize_event_time(left, [left_ts])
    right = normalize_event_time(right, [right_ts])
    lb = left.select(
        F.col(key),
        F.col(left_id).alias("_lid"),
        F.unix_micros(F.col(left_ts)).alias("_lus"),
    ).withColumn("_bucket", F.expr(f"_lus div {window_us}"))
    rb = (
        right.select(
            F.col(key),
            F.col(right_id).alias("_rid"),
            F.unix_micros(F.col(right_ts)).alias("_rus"),
        )
        .withColumn("_b0", F.expr(f"_rus div {window_us}"))
        # a right row can match left rows in its own or the next band
        .withColumn("_bucket", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1)))
        .drop("_b0")
    )
    return (
        lb.join(rb, [key, "_bucket"])
        .where(
            (F.col("_lus") > F.col("_rus"))
            & (F.col("_lus") - F.col("_rus") <= F.lit(window_us))
        )
        .select(
            F.col(key),
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            (F.col("_lus") - F.col("_rus")).alias("gap_us"),
        )
        .distinct()
    )
