"""SpanStore: incremental profile == one-shot batch stats under any
split, exact retraction, replay/compaction idempotence, the w identity
guard, and the streaming twin's equivalence."""

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import spans as SP
from etl_database_spark.operators.spanstore import SpanStore

W = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


CORPUS = [
    (1, "p q r s t u a1 b1"),
    (2, "x2 y2 p q r s t u"),  # shares a 6-run with 1
    (3, "c d e f g h i j"),
    (4, "c d e f zz k l m"),  # shares a 4-run with 3
    (5, "n o aa bb cc dd ee"),
    (6, "p q r s hh ii jj kk"),  # shares a 4-run with 1/2
]


def _stats_rows(df):
    return sorted(map(tuple, df.select("doc_id", "n_tokens", "dup_tokens", "n_spans").collect()))


def _one_shot(spark):
    return _stats_rows(SP.duplicate_span_stats(_docs(spark, CORPUS), "text", "doc_id", W))


def test_incremental_profile_equals_one_shot(spark, tmp_path):
    store = SpanStore(spark, str(tmp_path / "s"), w=W)
    store.ingest(_docs(spark, CORPUS[:2]), batch="b1")
    store.ingest(_docs(spark, CORPUS[2:4]), batch="b2")
    store.ingest(_docs(spark, CORPUS[4:]), batch="b3")
    got = _stats_rows(store.profile(_docs(spark, CORPUS)))
    assert got == _one_shot(spark)


def test_replay_and_compaction_preserve_profile(spark, tmp_path):
    store = SpanStore(spark, str(tmp_path / "s"), w=W)
    store.ingest(_docs(spark, CORPUS[:3]), batch="b1")
    store.compact()
    assert store.ingest(_docs(spark, CORPUS[:3]), batch="b1") is False
    store.ingest(_docs(spark, CORPUS[3:]), batch="b2")
    got = _stats_rows(store.profile(_docs(spark, CORPUS)))
    assert got == _one_shot(spark)
    store.compact()
    assert _stats_rows(store.profile(_docs(spark, CORPUS))) == _one_shot(spark)


def test_retraction_is_exact(spark, tmp_path):
    """Retracting batch 2 must leave profiles as if it never existed —
    doc 1's span with doc 2 disappears, doc 3/4 sharing survives."""
    store = SpanStore(spark, str(tmp_path / "s"), w=W)
    b1_docs = [CORPUS[0]] + CORPUS[2:]  # 1, 3, 4, 5, 6
    store.ingest(_docs(spark, b1_docs), batch="b1")
    store.ingest(_docs(spark, [CORPUS[1]]), batch="b2")
    # with doc 2 present, doc 1 has the full 6-token dup run
    with_two = {r[0]: r for r in _stats_rows(store.profile(_docs(spark, b1_docs)))}
    assert with_two[1][2] >= 6
    assert store.retract(_docs(spark, [CORPUS[1]]), batch="b2_retraction") is True
    want = _stats_rows(SP.duplicate_span_stats(_docs(spark, b1_docs), "text", "doc_id", W))
    got = _stats_rows(store.profile(_docs(spark, b1_docs)))
    assert got == want
    assert store.retractions() == ["b2_retraction"]
    # retraction survives compaction (negatives cancel in the fold)
    store.compact()
    assert _stats_rows(store.profile(_docs(spark, b1_docs))) == want


def test_w_mismatch_raises(spark, tmp_path):
    store = SpanStore(spark, str(tmp_path / "s"), w=W)
    store.ingest(_docs(spark, CORPUS[:2]), batch="b1")
    with pytest.raises(ValueError, match="w="):
        SpanStore(spark, str(tmp_path / "s"), w=W + 1)
    assert SpanStore(spark, str(tmp_path / "s"), w=W).batches() == ["b1"]


def test_streaming_equals_batch(spark, tmp_path):
    from etl_database_spark.streaming.spans import run_spans_once

    docs = _docs(spark, CORPUS)
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = run_spans_once(spark, stream, str(tmp_path / "store"), ckpt, w=W)
    assert len(store.batches()) > 1
    assert _stats_rows(store.profile(docs)) == _one_shot(spark)
    # fresh checkpoint refused
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(Exception, match="span store"):
        run_spans_once(spark, stream2, str(tmp_path / "store"), str(tmp_path / "c2"), w=W)
