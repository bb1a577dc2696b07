"""Business-day calendar dimension.

Re-expresses the reference's calendar build (tcalendardays + tholidays,
onboarding/sql/dataset_setup.sql:430-513) as pure DataFrame ops:

- day sequence: ``sequence(start, end, interval 1 day)`` + ``explode``
  (vs PostgreSQL generate_series, dataset_setup.sql:473);
- ``downum``: 0=Sunday..6=Saturday (EXTRACT(DOW), dataset_setup.sql:470);
- ``isbusday``: weekday (dataset_setup.sql:471);
- ``isholiday``: membership in the holiday set (the reference uses an
  IN-subquery against tholidays, dataset_setup.sql:481-483 — here a
  left-semi join so the holiday table can be arbitrarily large);
- ``previous_business_date``: running MAX of workdays over a
  1-preceding window (the reference's per-row correlated MAX,
  dataset_setup.sql:486-493 — decorrelated into a single window pass).

Scale: the calendar is a bounded dimension (3.65k rows per decade), so
the single-partition ordered window is constant cost regardless of fact
volume; consumers broadcast-join it (see queries.relational).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

DOW_NAMES = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday"]


def build_calendar(
    spark: SparkSession,
    start: str,
    end: str,
    holidays: Iterable[str] | DataFrame = (),
) -> DataFrame:
    """Build the calendar dimension for [start, end] (inclusive).

    ``holidays`` is an iterable of ISO date strings or a DataFrame with
    a ``holiday_date`` column.
    """
    days = spark.sql(
        f"SELECT explode(sequence(DATE '{start}', DATE '{end}', interval 1 day)) AS fulldate"
    )
    if isinstance(holidays, DataFrame):
        hol = holidays.select(F.col("holiday_date").cast("date"))
    else:
        hol = spark.createDataFrame(
            [(h,) for h in holidays] or [("0001-01-01",)], "holiday_date string"
        ).select(F.col("holiday_date").cast("date"))
    # A holiday source may carry several rows per date (one per holiday
    # NAME); without the distinct, the left join below would duplicate
    # those calendar days and every downstream calendar join would
    # multiply matching fact rows.
    hol = hol.distinct()

    # dayofweek(): 1=Sunday..7=Saturday → reference downum 0=Sunday..6.
    cal = (
        days.withColumn("downum", (F.dayofweek("fulldate") - F.lit(1)).cast("long"))
        .withColumn("downame", F.element_at(F.lit(DOW_NAMES), F.col("downum").cast("int") + 1))
        .withColumn("isbusday", ~F.col("downum").isin(0, 6))
        .join(
            F.broadcast(hol.withColumn("_is_hol", F.lit(True))),
            F.col("fulldate") == F.col("holiday_date"),
            "left",
        )
        .withColumn("isholiday", F.coalesce("_is_hol", F.lit(False)))
        .drop("holiday_date", "_is_hol")
    )
    w = W.orderBy("fulldate").rowsBetween(W.unboundedPreceding, -1)
    return cal.withColumn(
        "previous_business_date",
        F.max(F.when(F.col("isbusday") & ~F.col("isholiday"), F.col("fulldate"))).over(w),
    )


def next_business_date(cal: DataFrame) -> DataFrame:
    """Add ``next_business_date`` (running MIN over the following window)."""
    w = W.orderBy("fulldate").rowsBetween(1, W.unboundedFollowing)
    return cal.withColumn(
        "next_business_date",
        F.min(F.when(F.col("isbusday") & ~F.col("isholiday"), F.col("fulldate"))).over(w),
    )


def asof_business_day(facts: DataFrame, cal: DataFrame, date_col: str, out_col: str) -> DataFrame:
    """Attach the previous business day for ``facts[date_col]`` via a
    broadcast equi-join — the scalable rewrite of the reference's
    correlated scalar subquery (create_f_get_event_changes.sql:17-22)."""
    lookup = cal.select(
        F.col("fulldate"), F.col("previous_business_date").alias(out_col)
    )
    return facts.join(F.broadcast(lookup), facts[date_col] == lookup.fulldate, "left").drop(
        "fulldate"
    )
