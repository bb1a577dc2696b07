"""Training-shard output layout.

A curated corpus is consumed by a data loader that wants (a) a known
shard count, (b) shards of roughly equal size, (c) a deterministic
row→shard mapping so re-runs produce identical shards, and (d) rows
within a shard laid out in a stable order. ``write_training_shards``
produces exactly that from any DataFrame:

- shard id = md5-bucket of the key (functions/sampling.py) modulo the
  shard count — deterministic and engine-portable, unlike
  ``repartition(n)``'s exchange-dependent assignment;
- one output file per shard via ``repartition(n, shard)`` (hash
  exchange on the shard id — each task writes one shard);
- ``sortWithinPartitions`` pins the intra-shard order without a global
  sort (no range exchange, no skew from a total order).

At 100 TB the shuffle is the unavoidable cost of re-bucketing; there
is exactly one, and AQE coalescing is bypassed because the partition
count IS the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_database_spark.functions.sampling import hash_bucket


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard id in [0, n_shards): md5-bucket of the key
    modulo the shard count (bucket space 1000 × n_shards keeps the
    modulo unbiased for any practical shard count)."""
    return df.withColumn(
        "shard", (hash_bucket(key_col, 1000 * n_shards) % n_shards).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    sort_col: str | None = None,
) -> None:
    """Write ``df`` as ``n_shards`` deterministic Parquet shards,
    partitioned by shard id, stable row order inside each shard."""
    sharded = with_shard(df, key_col, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(sort_col or key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
