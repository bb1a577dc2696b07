"""Flagship query: snapshot change detection ("event changes").

Re-expresses the reference's flagship analytic
``dba.f_get_event_changes`` (create_f_get_event_changes.sql:3-112) —
which classifies companies as Added / Removed / Normal between two
dated snapshots — over the driver's ``events`` stream table: each
(user_id, event_type) entity is classified by its first/last appearance
inside a trailing window ending at the latest event date.

Pipeline shape (1:1 with the reference CTEs):
- DateRange: global MAX(date) + window start      (A3 scalar agg, J3 cross join)
- windowed facts: BETWEEN filter                   (P5)
- EventsData: per-entity MIN/MAX appearance dates  (A1 grouped agg)
- scenario: CASE ladder on first/last vs bounds    (J4 as when/otherwise)
- ORDER BY scenario DESC, entity                   (O1)

Scale: one shuffle (the groupBy); the 1-row bounds frame broadcasts;
the date filter prunes partitions when the fact table is date-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_database_spark.queries import register, table

WINDOW_DAYS = 7

ORACLE = f"""
WITH bounds AS (
  SELECT MAX(CAST(ts AS DATE)) AS period_end,
         MAX(CAST(ts AS DATE)) - {WINDOW_DAYS} AS period_start
  FROM events
),
windowed AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS d, value, period_start, period_end
  FROM events, bounds
  WHERE CAST(ts AS DATE) BETWEEN period_start AND period_end
),
entity AS (
  SELECT user_id, event_type, period_start, period_end,
         MIN(d) AS first_seen, MAX(d) AS last_seen,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
  FROM windowed
  GROUP BY user_id, event_type, period_start, period_end
)
SELECT user_id, event_type, first_seen, last_seen, n_events, total_value,
       CASE WHEN first_seen > period_start AND last_seen < period_end THEN 'Transient'
            WHEN first_seen > period_start THEN 'Added'
            WHEN last_seen < period_end THEN 'Removed'
            ELSE 'Normal' END AS scenario
FROM entity
ORDER BY scenario DESC, user_id, event_type
"""


@register("event_changes", oracle=ORACLE)
def event_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    bounds = ev.agg(F.max("d").alias("period_end")).withColumn(
        "period_start", F.date_sub("period_end", WINDOW_DAYS)
    )
    entity = (
        ev.crossJoin(F.broadcast(bounds))
        .where(F.col("d").between(F.col("period_start"), F.col("period_end")))
        .groupBy("user_id", "event_type", "period_start", "period_end")
        .agg(
            F.min("d").alias("first_seen"),
            F.max("d").alias("last_seen"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    scenario = (
        F.when(
            (F.col("first_seen") > F.col("period_start"))
            & (F.col("last_seen") < F.col("period_end")),
            "Transient",
        )
        .when(F.col("first_seen") > F.col("period_start"), "Added")
        .when(F.col("last_seen") < F.col("period_end"), "Removed")
        .otherwise("Normal")
    )
    return (
        entity.withColumn("scenario", scenario)
        .select(
            "user_id", "event_type", "first_seen", "last_seen", "n_events",
            "total_value", "scenario",
        )
        .orderBy(F.desc("scenario"), "user_id", "event_type")
    )
