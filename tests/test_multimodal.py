import hashlib

import pytest
from pyspark.sql import functions as F

from etl_database_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(20)]
    return spark.createDataFrame(rows, "id long, media binary")


def test_image_features_fake_decoder(spark, media):
    out = M.image_features(media, fake=True).orderBy("id").collect()
    assert len(out) == 20
    r = out[0]
    assert r.n_bytes == 100
    assert r.sha256 == hashlib.sha256(bytes([0]) * 100).hexdigest()
    assert 1 <= r.width <= 64 and 1 <= r.height <= 64
    assert len(r.features) == 8 and all(0.0 <= f <= 1.0 for f in r.features)
    # deterministic across runs
    again = M.image_features(media, fake=True).orderBy("id").collect()
    assert [tuple(r.features) for r in out] == [tuple(r.features) for r in again]


def test_real_decoder_is_explicit_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        M.image_features(media, fake=False).collect()


def test_media_stats(spark, media):
    r = M.media_stats(media).first()
    assert r.n_media == 20
    assert r.total_bytes == sum(100 + i for i in range(20))
    assert r.max_bytes == 119 and r.min_bytes == 100


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 25), (2, 5)], "id long, frame_count int")
    out = M.frame_sample_plan(df, every_n=10).collect()
    got = {(r.id, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}


def test_resize_images_fake_codec(spark, media):
    out = M.resize_images(media, max_side=16, fake=True).orderBy("id").collect()
    assert len(out) == 20
    # longest side capped, aspect preserved downward, payload shrinks
    assert all(max(r.width, r.height) == 16 for r in out)
    assert all(r.width >= 1 and r.height >= 1 for r in out)
    again = M.resize_images(media, max_side=16, fake=True).orderBy("id").collect()
    assert [bytes(r.media) for r in out] == [bytes(r.media) for r in again]


def test_resize_composes_with_features(spark, media):
    """resize → featurize: binary-out of one mapInPandas stage feeds
    the next; ids survive and features are recomputed on the resized
    payloads."""
    resized = M.resize_images(media, max_side=8, fake=True)
    feats = M.image_features(resized, fake=True).orderBy("id").collect()
    assert len(feats) == 20
    assert all(len(r.features) == 8 for r in feats)


def test_resize_real_codec_is_explicit_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|image resize"):
        M.resize_images(media, fake=False).collect()


def test_audio_features_fake_decoder(spark, media):
    out = M.audio_features(media, fake=True).orderBy("id").collect()
    assert len(out) == 20
    assert all(r.duration_ms >= 250 and r.sample_rate in (8000, 16000, 22000, 44000) for r in out)
    assert all(0.0 <= r.rms <= 1.0 for r in out)
    again = M.audio_features(media, fake=True).orderBy("id").collect()
    assert [r.sha256 for r in out] == [r.sha256 for r in again]


def test_audio_real_decoder_is_explicit_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|audio decode"):
        M.audio_features(media, fake=False).collect()


def test_audio_segment_plan(spark):
    rows = [(1, 25_000), (2, 10_000), (3, 9_999), (4, 1)]
    df = spark.createDataFrame(rows, "id long, duration_ms long")
    segs = M.audio_segment_plan(df, segment_ms=10_000).orderBy("id", "seg_start_ms").collect()
    by_id = {}
    for r in segs:
        by_id.setdefault(r.id, []).append((r.seg_start_ms, r.seg_end_ms))
    assert by_id[1] == [(0, 10_000), (10_000, 20_000), (20_000, 25_000)]
    assert by_id[2] == [(0, 10_000)]
    assert by_id[3] == [(0, 9_999)]
    assert by_id[4] == [(0, 1)]
