"""Document chunking and context-window packing.

Two shapes a pretraining pipeline runs constantly:

- **Chunking**: split each document into fixed-size character windows
  with overlap (sequence + explode + substring — all codegen; the
  explode multiplies rows ∝ doc length / stride, exactly like the
  shingle stage, and shuffles nothing).
- **Packing**: assign documents to fixed token-budget bins so each
  training sample is built from a known bin. A global greedy pack is
  inherently sequential, so the scalable form packs WITHIN a
  deterministic shard (md5-bucket of the id — functions/sampling.py):
  a window cumulative sum per shard, bin = (cumsum − tokens) ÷ budget.
  Each shard's window is independent → the sort is per-partition, not
  global, and shard count scales with the cluster. Documents larger
  than the budget get a bin of their own (the cumsum form does this
  naturally).

Both are pure column expressions with engine-portable arithmetic, so
both are oracle-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F



def chunk_documents(
    df: DataFrame,
    chunk_size: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, chunk_len): overlapping
    character windows, stride = chunk_size − overlap. The final chunk
    is the (possibly short) remainder; empty docs yield no chunks."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    n_chunks = F.when(F.length(text_col) <= chunk_size, F.lit(1)).otherwise(
        F.ceil((F.length(text_col) - F.lit(chunk_size)) / F.lit(stride)) + 1
    )
    return (
        df.where(F.length(text_col) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"substring(_t, chunk_idx * {stride} + 1, {chunk_size})").alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


def pack_documents(
    df: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(doc_id, shard, bin_id): sequential-fill packing per shard.

    Within a shard, documents are taken in id order; each lands in the
    bin its starting offset falls in, so a bin overflows its budget by
    at most one document (the standard sequential-fill contract).
    bin = (cumsum − tokens) ÷ budget
    over the id-ordered window is that rule as one expression —
    no loop, no state, deterministic, and the window runs per shard so
    no single task ever sees more than one shard's rows."""
    from etl_database_spark.operators.sharding import with_shard

    sharded = with_shard(df, id_col, n_shards)
    # ROWS frame, not the default RANGE: with RANGE, duplicate ids are
    # frame peers and each would see the cumsum including BOTH rows,
    # overflowing bins past the one-document contract on dirty input.
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return sharded.select(
        F.col(id_col).alias("doc_id"),
        "shard",
        F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("long").alias("bin_id"),
    )
