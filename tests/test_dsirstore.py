"""Incremental DSIR store: batch ingest == one-shot weights, replay
idempotence, compaction, target swap, and hashing-identity guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import dsir as DS
from etl_database_spark.operators.dsirstore import DsirStore

B = 64

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate the homework"),
    (3, "stocks rallied as markets closed higher today"),
    (4, "el gato se sento en la alfombra"),
    (5, "the cat and the dog played on the mat"),
    (6, "der hund und die katze spielten"),
]
TARGET = [
    (101, "the cat sat quietly"),
    (102, "the dog and the cat are friends"),
]


def _weights_map(df):
    return {r.doc_id: (r.n_grams, r.log_weight) for r in df.collect()}


def test_incremental_equals_one_shot(spark, tmp_path):
    raw = spark.createDataFrame(CORPUS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    store = DsirStore(spark, str(tmp_path / "dsir"), n_buckets=B)
    store.set_target(tgt)
    store.ingest(raw.where(F.col("doc_id") <= 2), batch="b1")
    store.ingest(raw.where((F.col("doc_id") > 2) & (F.col("doc_id") <= 4)), batch="b2")
    store.compact()
    store.ingest(raw.where(F.col("doc_id") > 4), batch="b3")
    # replays (live and absorbed) are no-ops
    assert store.ingest(raw.limit(1), batch="b1") is False
    assert store.ingest(raw.limit(1), batch="b3") is False

    got = _weights_map(store.serve_weights())
    want = _weights_map(DS.dsir_weights(raw, tgt, n_buckets=B))
    assert got.keys() == want.keys()
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9, abs=1e-9)

    # selection ranks identically to the one-shot operator
    inc = [r.doc_id for r in store.serve_select(k=3).collect()]
    one = [r.doc_id for r in DS.dsir_select(raw, tgt, k=3, n_buckets=B).collect()]
    assert inc == one


def test_new_batch_shifts_weights_correctly(spark, tmp_path):
    """Adding a batch changes the raw LM, so weights of OLD docs must
    shift to the one-shot value over the grown pool — serving derives
    from current counts, not stale per-batch weights."""
    raw1 = spark.createDataFrame(CORPUS[:3], "doc_id long, text string")
    raw2 = spark.createDataFrame(CORPUS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    store = DsirStore(spark, str(tmp_path / "dsir"), n_buckets=B)
    store.set_target(tgt)
    store.ingest(raw1, batch="b1")
    w1 = _weights_map(store.serve_weights())
    store.ingest(
        spark.createDataFrame(CORPUS[3:], "doc_id long, text string"), batch="b2"
    )
    w2 = _weights_map(store.serve_weights())
    want2 = _weights_map(DS.dsir_weights(raw2, tgt, n_buckets=B))
    assert w2[1][1] == pytest.approx(want2[1][1], rel=1e-9)
    assert w1[1][1] != pytest.approx(w2[1][1], rel=1e-12)  # genuinely shifted


def test_target_required_and_identity_guard(spark, tmp_path):
    raw = spark.createDataFrame(CORPUS, "doc_id long, text string")
    store = DsirStore(spark, str(tmp_path / "dsir"), n_buckets=B)
    store.ingest(raw, batch="b1")
    with pytest.raises(ValueError, match="no target"):
        store.serve_weights()
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    store.set_target(tgt)
    assert store.serve_weights().count() == len(CORPUS)
    with pytest.raises(ValueError, match="hashing identity"):
        DsirStore(spark, str(tmp_path / "dsir"), n_buckets=128)
