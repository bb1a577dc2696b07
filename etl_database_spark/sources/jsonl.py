"""JSONL document-corpus source — the de-facto interchange format for
large-scale training corpora (one JSON object per line, usually
gzipped in place).

Scale shape: the file is read as text lines (gzip decompression is
native; one .gz file = one task, so shard corpora into many files —
operators/sharding.py produces exactly that layout) and each record is
parsed with ``from_json`` against an EXPLICIT schema — schema
inference would scan the full 100 TB corpus once before the real
read. Malformed lines neither kill the job nor vanish silently:
they're counted via ``observe`` on the same pass (no second scan) and
can be quarantined raw to a side location for inspection.

Implementation note: this deliberately avoids the native
``spark.read.json`` corrupt-record column, whose plans are rejected
whenever column pruning reduces a query to the corrupt column alone
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — e.g. any
``count()`` over the quarantine branch. Parsing text lines with
``from_json`` has identical per-record semantics with no such
restriction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"

# Default corpus schema: matches the documents fixture.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    quarantine_path: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Read a JSONL (optionally .gz) corpus with an enforced schema.

    Returns (clean_df, observation): ``clean_df`` carries only rows
    that parsed as JSON objects; the observation reports
    ``rows_total`` / ``rows_corrupt`` counted during whatever action
    the caller runs — no extra scan. If ``quarantine_path`` is set,
    corrupt raw lines are written (one write job) before the clean
    frame returns, so nothing is silently lost. The write goes to a
    deterministic subdirectory keyed by the input path and is
    OVERWRITTEN, not appended: re-running the same corpus (a retry, a
    re-executed pipeline stage) reproduces the same quarantine rather
    than duplicating every corrupt line — the same idempotence the
    batch-id-keyed streaming writes use.
    """
    # Blank/whitespace-only lines are not records in JSONL (they would
    # otherwise parse to all-null rows that pass the corrupt filter) —
    # drop them before parsing; they count in neither total nor corrupt.
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    # from_json with its own corrupt-record capture: malformed lines,
    # JSON scalars, and type-mismatched fields land the raw line in
    # the _corrupt field (PERMISSIVE semantics, per record).
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    parsed = raw.select(
        F.from_json("value", full, {"columnNameOfCorruptRecord": _CORRUPT}).alias(
            "_doc"
        )
    )
    bad = F.col(f"_doc.{_CORRUPT}").isNotNull()
    if quarantine_path is not None:
        import hashlib
        import os

        key = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:16]
        parsed.where(bad).select(
            F.col(f"_doc.{_CORRUPT}").alias("raw_line")
        ).write.mode("overwrite").text(os.path.join(quarantine_path, f"source={key}"))
    obs = Observation()
    observed = parsed.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.count(F.when(bad, 1)).alias("rows_corrupt"),
    )
    clean = observed.where(~bad).select("_doc.*").drop(_CORRUPT)
    return clean, obs


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of :func:`read_jsonl_corpus`: watch a directory
    for arriving JSONL shards (readStream.text — checkpointed,
    exactly-once per file) and parse with the same per-record
    ``from_json`` semantics.

    Returns (clean_stream, corrupt_stream). Each side started as its
    own streaming query re-reads arriving shards independently (two
    file-source scans); when the double scan matters, start ONE query
    over the union of needs via ``foreachBatch`` and split inside the
    batch function. Composes with the streaming dedup/near-dup stages
    (streaming/dedup.py, streaming/near_dup.py) for incremental
    corpus curation.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    parsed = (
        spark.readStream.text(path)
        .where(F.length(F.trim("value")) > 0)
        .select(
            F.from_json("value", full, {"columnNameOfCorruptRecord": _CORRUPT}).alias(
                "_doc"
            )
        )
    )
    bad = F.col(f"_doc.{_CORRUPT}").isNotNull()
    clean = parsed.where(~bad).select("_doc.*").drop(_CORRUPT)
    corrupt = parsed.where(bad).select(F.col(f"_doc.{_CORRUPT}").alias("raw_line"))
    return clean, corrupt
