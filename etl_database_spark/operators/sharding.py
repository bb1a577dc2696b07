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
    """Deterministic shard id in [0, n_shards): md5-bucket of the key.
    THE one shard-derivation helper (pack_documents shares it) —
    ``hash_bucket(key, n) == (hash_bucket(key, 1000n) % n)`` since
    1000n is a multiple of n, so the single modulo is equivalent to
    the former double-modulo form and values are unchanged."""
    return df.withColumn("shard", hash_bucket(key_col, n_shards).cast("int"))


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
        # Range-partition on the shard id: hash repartition would send
        # colliding shard ids to one task (murmur3(shard) % n is not
        # identity), leaving straggler tasks writing 2-3 shards while
        # others sit idle. Range boundaries over 0..n-1 give ~one
        # shard per task; the on-disk layout (one directory+file per
        # shard) is guaranteed by partitionBy regardless.
        sharded.repartitionByRange(n_shards, "shard")
        # 'shard' leads the sort: the partitionBy write requires an
        # ordering on the partition column, and without it the planner
        # inserts its own Sort ABOVE ours — under spill, merge order
        # between spill files is heap order, which would break the
        # stable intra-shard layout contract.
        .sortWithinPartitions("shard", sort_col or key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
