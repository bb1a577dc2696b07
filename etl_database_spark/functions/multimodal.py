"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Design (the 100 TB pattern):

- a multimodal table is (id, media BINARY, media_type STRING, meta
  MAP/STRUCT) — the binary payload is opaque to Catalyst; metadata
  columns (width, height, duration, codec, …) are first-class so
  filters/pruning never touch the payload;
- decode / resize / feature-extract run as ``mapInPandas`` stages:
  Arrow moves the binary batches to Python once per batch (not per
  row), the UDF body calls the codec library, and the result is again
  a typed column frame;
- the actual codec calls are STUBBED here (no image/audio libs in this
  environment): ``decode_image`` raises NotImplementedError unless a
  ``fake=True`` deterministic decoder is requested — the Spark-side
  plumbing (schemas, batch iteration, partitioning) is real and
  tested, and a real codec drops into the marked slot unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL-CODEC SLOT: replace with PIL/opencv decode + embedding.
    Not available in this environment."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this build; "
        "plug a real decoder into _decode_image_real"
    )


def _decode_image_fake(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder for pipeline tests: 'dimensions' and
    an 8-dim 'embedding' derived from the payload digest."""
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    features = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, features


def image_features(
    df: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    fake: bool = False,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize an image binary column via mapInPandas.

    Arrow streams batches of (id, media); Python touches each payload
    once; output is a typed feature frame. With ``fake=True`` the
    deterministic stub decoder runs (tests / environments without
    codecs); otherwise the real-codec slot must be filled.
    """
    decode = _decode_image_fake if fake else _decode_image_real

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, feats = decode(data)
                rows.append(
                    {
                        "id": int(_id),
                        "n_bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "width": w,
                        "height": h,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _resize_image_real(payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """REAL-CODEC SLOT: decode, scale longest side to ``max_side``
    preserving aspect, re-encode. Requires an imaging library."""
    raise NotImplementedError(
        "image resize requires an imaging library not present in this build; "
        "plug a real codec into _resize_image_real"
    )


def _resize_image_fake(payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Deterministic fake resize for pipeline tests: 'dimensions' come
    from the digest (as in the fake decoder), scaled so the longest
    side equals ``max_side``; the 'resized payload' is a digest-derived
    stand-in whose length shrinks with the scale factor."""
    w, h, _ = _decode_image_fake(payload)
    scale = max_side / max(w, h)
    new_w = max(1, int(w * scale))
    new_h = max(1, int(h * scale))
    digest = hashlib.sha256(payload + max_side.to_bytes(4, "big")).digest()
    n_out = max(1, int(len(payload) * min(1.0, scale * scale)))
    body = (digest * (n_out // len(digest) + 1))[:n_out]
    return body, new_w, new_h


def resize_images(
    df: DataFrame,
    max_side: int = 32,
    id_col: str = "id",
    media_col: str = "media",
    fake: bool = False,
) -> DataFrame:
    """Resize an image binary column via mapInPandas → (id, media,
    width, height) with the longest side capped at ``max_side``.

    Binary-in/binary-out: the stage composes with ``image_features``
    (resize → featurize) without the payload ever leaving Arrow
    batches. Same real/fake codec gating as ``image_features``.
    """
    resize = _resize_image_fake if fake else _resize_image_real

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                body, w, h = resize(data, max_side)
                rows.append({"id": int(_id), "media": body, "width": w, "height": h})
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "id") -> DataFrame:
    """Video frame-sampling *plan*: explode per-media frame indices
    (metadata-driven — requires a frame_count column) without touching
    payloads; the decode of selected frames is a second mapInPandas
    stage. Demonstrates the metadata-first pattern: the expensive
    binary stage only sees rows that survived frame selection."""
    return (
        df.select(id_col, "frame_count")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("frame_count") - 1, F.lit(every_n))),
        )
    )


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Payload-size stats without decoding: pure JVM expressions over
    the binary column (length works on binary)."""
    return df.agg(
        F.count("*").alias("n_media"),
        F.sum(F.length(media_col)).cast("long").alias("total_bytes"),
        F.max(F.length(media_col)).cast("long").alias("max_bytes"),
        F.min(F.length(media_col)).cast("long").alias("min_bytes"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.FloatType(), True),
    ]
)


def _decode_audio_real(payload: bytes) -> tuple[int, int, float]:
    """REAL-CODEC SLOT: replace with soundfile/librosa decode →
    (duration_ms, sample_rate, rms). Not available in this build."""
    raise NotImplementedError(
        "audio decode requires an audio library not present in this build; "
        "plug a real decoder into _decode_audio_real"
    )


def _decode_audio_fake(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake audio decoder: duration/rate/level derived
    from the payload digest (pipeline tests, codec-less builds)."""
    digest = hashlib.sha256(payload).digest()
    duration_ms = 250 + int.from_bytes(digest[0:2], "big") % 30_000
    sample_rate = (8, 16, 22, 44)[digest[2] % 4] * 1000
    rms = round(digest[3] / 255.0, 6)
    return duration_ms, sample_rate, rms


def audio_features(
    df: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    fake: bool = False,
) -> DataFrame:
    """Decode + featurize an audio binary column via mapInPandas —
    same Arrow-batched shape as ``image_features``: payloads cross to
    Python once per batch, output is a typed metadata frame."""
    decode = _decode_audio_fake if fake else _decode_audio_real

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                dur, rate, rms = decode(data)
                rows.append(
                    {
                        "id": int(_id),
                        "n_bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "duration_ms": dur,
                        "sample_rate": rate,
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, AUDIO_FEATURES_SCHEMA)


def audio_segment_plan(
    df: DataFrame,
    segment_ms: int = 10_000,
    id_col: str = "id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Audio segmentation *plan*: explode fixed-length segment bounds
    from the duration metadata column — pure JVM sequence/explode, no
    payload access. The decode of selected segments is a second
    mapInPandas stage over only the rows that survive selection
    (the metadata-first pattern, as ``frame_sample_plan``)."""
    start = F.explode(
        F.sequence(F.lit(0), F.col(duration_col) - 1, F.lit(segment_ms))
    ).alias("seg_start_ms")
    return (
        df.select(id_col, duration_col)
        .select(id_col, duration_col, start)
        .select(
            id_col,
            "seg_start_ms",
            F.least(F.col("seg_start_ms") + segment_ms, F.col(duration_col)).alias(
                "seg_end_ms"
            ),
        )
    )
