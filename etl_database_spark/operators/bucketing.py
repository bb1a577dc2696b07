"""Bucketed tables: co-located joins without per-query shuffles.

The engine's data tables live as plain Parquet partitioned by
``datasetdate``; for *repeated* fact-fact joins (lineitem⋈orders every
report run), bucketing both tables on the join key at write time buys
back the shuffle on every subsequent join — the Spark-native analog of
co-located storage. Requires the session catalog (saveAsTable), since
bucket metadata lives in the metastore, not the files.

At 100 TB: bucket count should be sized so each bucket file lands in
the 128 MB-1 GB range per partition; both join sides must use the SAME
bucket count and key for the exchange to be elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table —
    sorted buckets let SortMergeJoin skip its sort too."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    plans with zero Exchange on the join inputs."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
