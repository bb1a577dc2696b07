"""WinnowStore: incremental fingerprints and similarity pairs == the
one-shot batch computation under any split, exact retraction,
replay/compaction idempotence, and the (k, w) identity guard."""

import pytest

from etl_database_spark.functions import dedup as D
from etl_database_spark.operators.winnowstore import WinnowStore

K, W = 8, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


_SHARED = "the quick brown fox jumps over the lazy dog near the river bank"
CORPUS = [
    (1, _SHARED + " on a bright morning"),
    (2, _SHARED + " during a gray evening"),  # near-dup of 1
    (3, "completely different content about spark physical plans and shuffles"),
    (4, "completely different content about spark physical plans and joins"),  # near-dup of 3
    (5, "a fifth document with nothing in common with anything else here"),
    (6, "short unrelated text entirely on its own path through the corpus"),
]


def _fp_rows(df):
    return sorted(map(tuple, df.select("_id", "n_fps", "fp_sum").collect()))


def _pair_rows(df):
    return sorted(
        map(tuple, df.select("id_a", "id_b", "n_shared", "containment_bp").collect())
    )


def _one_shot_fps(spark):
    return _fp_rows(D.winnow_fingerprints(_docs(spark, CORPUS), "text", "doc_id", K, W))


def _one_shot_pairs(spark, rows=CORPUS):
    return _pair_rows(
        D.winnow_similarity_pairs(_docs(spark, rows), "text", "doc_id", K, W)
    )


def test_incremental_equals_one_shot_under_3_batch_split(spark, tmp_path):
    store = WinnowStore(spark, str(tmp_path / "s"), k=K, w=W)
    store.ingest(_docs(spark, CORPUS[:2]), batch="b1")
    store.ingest(_docs(spark, CORPUS[2:4]), batch="b2")
    store.ingest(_docs(spark, CORPUS[4:]), batch="b3")
    assert _fp_rows(store.fingerprints()) == _one_shot_fps(spark)
    assert _pair_rows(store.similarity_pairs()) == _one_shot_pairs(spark)
    # the split puts each near-dup pair in ONE batch; re-split across
    # batches must give the same pairs (cap/sizes are serve-time)
    store2 = WinnowStore(spark, str(tmp_path / "s2"), k=K, w=W)
    store2.ingest(_docs(spark, [CORPUS[0], CORPUS[2], CORPUS[4]]), batch="odd")
    store2.ingest(_docs(spark, [CORPUS[1], CORPUS[3], CORPUS[5]]), batch="even")
    assert _pair_rows(store2.similarity_pairs()) == _one_shot_pairs(spark)


def test_replay_and_compaction_preserve_serving(spark, tmp_path):
    store = WinnowStore(spark, str(tmp_path / "s"), k=K, w=W)
    store.ingest(_docs(spark, CORPUS[:3]), batch="b1")
    store.compact()
    assert store.ingest(_docs(spark, CORPUS[:3]), batch="b1") is False
    store.ingest(_docs(spark, CORPUS[3:]), batch="b2")
    assert _fp_rows(store.fingerprints()) == _one_shot_fps(spark)
    store.compact()
    assert _fp_rows(store.fingerprints()) == _one_shot_fps(spark)
    assert _pair_rows(store.similarity_pairs()) == _one_shot_pairs(spark)


def test_retraction_is_exact(spark, tmp_path):
    """Retracting doc 2's batch removes the 1-2 pair exactly; the 3-4
    pair and every fingerprint of the remaining docs are untouched."""
    rest = [CORPUS[0]] + CORPUS[2:]  # 1, 3, 4, 5, 6
    store = WinnowStore(spark, str(tmp_path / "s"), k=K, w=W)
    store.ingest(_docs(spark, rest), batch="b1")
    store.ingest(_docs(spark, [CORPUS[1]]), batch="b2")
    pairs_with = _pair_rows(store.similarity_pairs())
    assert any(p[0] == 1 and p[1] == 2 for p in pairs_with)
    assert store.retract(_docs(spark, [CORPUS[1]]), batch="b2_retraction") is True
    assert _pair_rows(store.similarity_pairs()) == _one_shot_pairs(spark, rest)
    assert _fp_rows(store.fingerprints()) == _fp_rows(
        D.winnow_fingerprints(_docs(spark, rest), "text", "doc_id", K, W)
    )
    # retraction survives compaction (signs cancel in the fold)
    store.compact()
    assert _pair_rows(store.similarity_pairs()) == _one_shot_pairs(spark, rest)


def test_streamed_store_equals_batch(spark, tmp_path):
    """Two-micro-batch streamed ingest == one-shot: pairs AND
    fingerprint stats, and a re-drain with the same checkpoint is a
    replay no-op (no double-counted postings)."""
    from etl_database_spark.streaming.winnow import run_winnow_once

    src = str(tmp_path / "src")
    store_path = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    d = _docs(spark, CORPUS)
    d.where("doc_id % 2 = 0").write.parquet(src)
    run_winnow_once(
        spark, spark.readStream.schema(d.schema).parquet(src),
        store_path, ckpt, k=K, w=W,
    )
    d.where("doc_id % 2 = 1").write.mode("append").parquet(src)
    store = run_winnow_once(
        spark, spark.readStream.schema(d.schema).parquet(src),
        store_path, ckpt, k=K, w=W,
    )
    assert _pair_rows(store.similarity_pairs()) == _one_shot_pairs(spark)
    assert _fp_rows(store.fingerprints()) == _one_shot_fps(spark)
    # replay: nothing new in the source -> no new batches, same output
    store = run_winnow_once(
        spark, spark.readStream.schema(d.schema).parquet(src),
        store_path, ckpt, k=K, w=W,
    )
    assert _pair_rows(store.similarity_pairs()) == _one_shot_pairs(spark)


def test_param_mismatch_raises(spark, tmp_path):
    store = WinnowStore(spark, str(tmp_path / "s"), k=K, w=W)
    store.ingest(_docs(spark, CORPUS[:2]), batch="b1")
    with pytest.raises(ValueError, match="k="):
        WinnowStore(spark, str(tmp_path / "s"), k=K + 1, w=W)
