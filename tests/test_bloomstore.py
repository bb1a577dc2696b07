"""Persisted Bloom store: incremental == one-shot, replay/compaction
idempotence, crash-partial healing, and the m_bits identity guard."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import bloom as B
from etl_database_spark.operators.bloomstore import BloomStore

M = 1 << 14


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.concat(F.lit("k"), F.col("id")).alias("k"))


def _served_rows(store):
    return sorted(map(tuple, store.serve().collect()))


def test_incremental_equals_one_shot(spark, tmp_path):
    store = BloomStore(spark, str(tmp_path / "b"), m_bits=M)
    assert store.ingest(_keys(spark, 0, 300), "k", "b1") is True
    assert store.ingest(_keys(spark, 300, 600), "k", "b2") is True
    fresh = B.bloom_partials(_keys(spark, 0, 600), "k", M)
    assert _served_rows(store) == sorted(map(tuple, fresh.collect()))


def test_replay_is_noop_even_after_compaction(spark, tmp_path):
    store = BloomStore(spark, str(tmp_path / "b"), m_bits=M)
    store.ingest(_keys(spark, 0, 300), "k", "b1")
    before = _served_rows(store)
    assert store.ingest(_keys(spark, 0, 300), "k", "b1") is False
    store.compact()
    assert store.ingest(_keys(spark, 0, 300), "k", "b1") is False
    assert store.batches() == ["b1", "base"]
    assert _served_rows(store) == before


def test_compaction_bounds_rows_and_preserves_answers(spark, tmp_path):
    store = BloomStore(spark, str(tmp_path / "b"), m_bits=M)
    for i in range(4):
        store.ingest(_keys(spark, i * 100, (i + 1) * 100), "k", f"b{i}")
    before = _served_rows(store)
    store.compact()
    assert _served_rows(store) == before
    # folded layout: one physical batch, at most m/32 rows
    raw = spark.read.parquet(store.path)
    assert raw.select("batch").distinct().collect()[0][0] == "base"
    assert raw.count() <= M // 32
    # membership still exact on inserted keys
    hits = store.might_contain(_keys(spark, 0, 400), "k", ["k"])
    assert hits.where(F.col("bloom_hit") == 0).count() == 0


def test_crashed_partial_write_is_retried_not_skipped(spark, tmp_path):
    store = BloomStore(spark, str(tmp_path / "b"), m_bits=M)
    store.ingest(_keys(spark, 0, 200), "k", "b1")
    # simulate a crashed b2: batch directory exists, no manifest entry
    crashed = B.bloom_partials(_keys(spark, 200, 210), "k", M).withColumn(
        "batch", F.lit("b2")
    )
    crashed.limit(3).write.mode("overwrite").partitionBy("batch").parquet(
        str(tmp_path / "b__stage")
    )
    shutil.move(
        str(tmp_path / "b__stage" / "batch=b2"), os.path.join(store.path, "batch=b2")
    )
    assert "b2" not in store.batches()
    # retry must re-ingest and fully replace the partial
    assert store.ingest(_keys(spark, 200, 400), "k", "b2") is True
    hits = store.might_contain(_keys(spark, 200, 400), "k", ["k"])
    assert hits.where(F.col("bloom_hit") == 0).count() == 0


def test_m_bits_mismatch_raises(spark, tmp_path):
    store = BloomStore(spark, str(tmp_path / "b"), m_bits=M)
    store.ingest(_keys(spark, 0, 10), "k", "b1")
    with pytest.raises(ValueError, match="m_bits"):
        BloomStore(spark, str(tmp_path / "b"), m_bits=M * 2)
    # same size reopens fine and sees the batch
    again = BloomStore(spark, str(tmp_path / "b"), m_bits=M)
    assert again.batches() == ["b1"]


def test_probe_definitely_new_keys(spark, tmp_path):
    store = BloomStore(spark, str(tmp_path / "b"), m_bits=M)
    store.ingest(_keys(spark, 0, 200), "k", "b1")
    probes = spark.createDataFrame(
        [(f"unseen-{i}-xyz",) for i in range(500)], ["k"]
    )
    hits = store.might_contain(probes, "k", ["k"])
    fpr = hits.where(F.col("bloom_hit") == 1).count() / 500
    assert fpr < 0.05  # tiny load factor -> tiny FPR


def test_streaming_bloom_equals_batch(spark, tmp_path):
    """Draining a fingerprint stream through foreachBatch must serve
    the same filter as a one-shot batch build; re-running a drained
    checkpoint changes nothing; a fresh checkpoint is refused."""
    from etl_database_spark.streaming.bloom import run_bloom_once

    keys = _keys(spark, 0, 500)
    src = str(tmp_path / "src")
    # several files -> several micro-batches (maxFilesPerTrigger=1)
    keys.repartition(4).write.parquet(src)
    store_path = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(keys.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = run_bloom_once(spark, stream, "k", store_path, ckpt, m_bits=M)
    assert len(store.batches()) > 1  # genuinely incremental

    fresh = B.bloom_partials(keys, "k", M)
    want = sorted(map(tuple, fresh.collect()))
    assert _served_rows(store) == want

    # drained checkpoint: nothing new, serving unchanged
    stream2 = (
        spark.readStream.schema(keys.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_bloom_once(spark, stream2, "k", store_path, ckpt, m_bits=M)
    assert _served_rows(store) == want

    # compaction preserves answers and the binding
    store.compact()
    assert _served_rows(store) == want

    # fresh checkpoint (batch ids restart at 0) refused
    stream3 = (
        spark.readStream.schema(keys.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(Exception, match="bloom store"):
        run_bloom_once(spark, stream3, "k", store_path, str(tmp_path / "c2"), m_bits=M)
    assert _served_rows(store) == want
