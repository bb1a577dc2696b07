"""Mergeable Bloom-filter membership sketch as plain DataFrame rows.

The 100 TB incremental-dedup story needs a "have we ever seen this
key" structure that (a) merges across batches with a pure aggregate,
(b) lives in the same batch-partitioned parquet store pattern as the
HLL/CMS/histogram counters (:mod:`.hll`, :mod:`.cms`), and (c) costs
O(bits) not O(keys) to serve. A Bloom filter (Bloom 1970, CACM 13(7))
is that structure:

- **representation**: rows ``(word BIGINT, bits BIGINT)`` — the filter
  bit-array packed 32 bits per word. 32, not 64: DuckDB raises on
  ``1::BIGINT << 63`` (signed overflow), and the oracle must replay
  the exact arithmetic, so the packing stays inside the portable
  range. Row count is ``m_bits/32`` — a *configuration* constant,
  never data-sized, so the filter side of every probe join is safely
  broadcast.
- **insert**: k = 4 hash positions per key from non-overlapping
  32-bit chunks of ``md5(key)`` (portable to any engine with md5 and
  integer division), ``OR``-folded per word in one ``groupBy(word)``.
- **merge**: ``groupBy(word).agg(bit_or(bits))`` — associative,
  commutative, idempotent (re-merging a batch is a no-op), which is
  exactly the property the batch-replay stores rely on.
- **query**: explode each probe key into its k (word, bit) pairs,
  one broadcast join against the words, ``min(hit)`` per key — no
  false negatives ever; false-positive rate ~ (1 - e^{-kn/m})^k.
- **delete**: unsupported, like the HLL sketch — insert-only by
  construction (a counting filter would trade 4x space; not needed
  for seen-set dedup).

Spark ships ``DataFrame.stat.bloomFilter``, but that materializes a
driver-side object — the point here is a filter that IS data (stored,
merged, and served distributively, batch by batch).

No counterpart in the reference repo (training-data extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_K = 4
BLOOM_M_DEFAULT = 1 << 20  # bits; 32 KiB of words


def _chunk_positions(key, m_bits: int) -> list:
    """k non-overlapping 32-bit chunks of md5(key), each mod m_bits."""
    h = F.md5(key)
    return [
        (F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long") % m_bits)
        for j in range(BLOOM_K)
    ]


def bloom_partials(df: DataFrame, key_col: str, m_bits: int = BLOOM_M_DEFAULT) -> DataFrame:
    """Build filter rows (word, bits) from ``df[key_col]``.

    One explode (factor k=4) and one shuffle keyed by word — output is
    at most ``m_bits/32`` rows regardless of input size."""
    pos = df.select(
        F.explode(F.array(*_chunk_positions(F.col(key_col), m_bits))).alias("p")
    )
    return (
        pos.select(
            (F.col("p") - F.pmod(F.col("p"), 32)).alias("word32"),  # p - p%32 = 32*word
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias("b"),
        )
        .select((F.col("word32") / 32).cast("long").alias("word"), "b")
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_merge(partials: DataFrame) -> DataFrame:
    """Merge any union of filter-row batches: OR per word. Idempotent —
    merging a batch twice changes nothing."""
    return partials.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    filter_df: DataFrame,
    probes: DataFrame,
    key_col: str,
    id_cols: list[str],
    m_bits: int = BLOOM_M_DEFAULT,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe membership: ``id_cols`` + an integer ``out_col`` (1 =
    maybe present, 0 = definitely absent).

    The filter side is broadcast — sound because its cardinality is
    bounded by the configured ``m_bits/32``, never by data."""
    ppos = probes.select(
        *id_cols,
        F.posexplode(F.array(*_chunk_positions(F.col(key_col), m_bits))).alias("j", "p"),
    ).select(
        *id_cols,
        "j",
        (F.col("p") - F.pmod(F.col("p"), 32)).alias("word32"),
        F.col("p").alias("p"),
    )
    joined = ppos.join(
        F.broadcast(filter_df.withColumnRenamed("word", "fword")),
        (F.col("word32") / 32).cast("long") == F.col("fword"),
        "left",
    )
    hit = F.when(
        F.col("fword").isNotNull()
        & (
            F.expr("(shiftright(bits, CAST(p % 32 AS INT)) & CAST(1 AS BIGINT))")
            == 1
        ),
        1,
    ).otherwise(0)
    return joined.withColumn("h", hit).groupBy(*id_cols).agg(
        F.min("h").cast("long").alias(out_col)
    )
