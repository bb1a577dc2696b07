"""Metadata-only MP4/MP3 probing: handcrafted ISO-BMFF / MPEG-audio
fixtures, sniffing, the mapInPandas probe stage, and loud failure on
truncation."""

from __future__ import annotations

import pytest

from etl_database_spark.functions.mediameta import (
    media_probe_stats,
    probe_media,
    probe_mp3,
    probe_mp4,
    sniff_kind,
)

# ---------------------------------------------------------------------------
# fixture builders (public ISO/IEC 14496-12 box layout)


def _box(btype: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def _fullbox_body(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def _mvhd(timescale: int, duration: int) -> bytes:
    body = _fullbox_body(
        0,
        (0).to_bytes(4, "big") * 2  # ctime, mtime
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")  # rate 1.0
        + (0x0100).to_bytes(2, "big")  # volume
        + b"\x00" * 10
        + b"\x00" * 36  # matrix
        + b"\x00" * 24  # predefined
        + (2).to_bytes(4, "big"),  # next track id
    )
    return _box(b"mvhd", body)


def _tkhd(width: int, height: int) -> bytes:
    body = _fullbox_body(
        0,
        (0).to_bytes(4, "big") * 2  # ctime, mtime
        + (1).to_bytes(4, "big")  # track id
        + (0).to_bytes(4, "big")  # reserved
        + (0).to_bytes(4, "big")  # duration
        + b"\x00" * 8  # reserved
        + b"\x00" * 8  # layer/alt/volume/reserved
        + b"\x00" * 36  # matrix
        + (width << 16).to_bytes(4, "big")
        + (height << 16).to_bytes(4, "big"),
    )
    return _box(b"tkhd", body)


def _hdlr(handler: bytes) -> bytes:
    return _box(
        b"hdlr", _fullbox_body(0, (0).to_bytes(4, "big") + handler + b"\x00" * 12)
    )


def _mdhd(timescale: int) -> bytes:
    body = _fullbox_body(
        0,
        (0).to_bytes(4, "big") * 2
        + timescale.to_bytes(4, "big")
        + (0).to_bytes(4, "big")
        + b"\x55\xc4\x00\x00",  # language 'und' + predefined
    )
    return _box(b"mdhd", body)


def _stsd(fourcc: bytes) -> bytes:
    entry = (16).to_bytes(4, "big") + fourcc + b"\x00" * 8
    return _box(b"stsd", _fullbox_body(0, (1).to_bytes(4, "big") + entry))


def _trak(handler: bytes, *, dims=None, mdhd_ts=0, fourcc=b"xxxx") -> bytes:
    stbl = _box(b"stbl", _stsd(fourcc))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _mdhd(mdhd_ts) + _hdlr(handler) + minf)
    tkhd = _tkhd(*(dims or (0, 0)))
    return _box(b"trak", tkhd + mdia)


def _mp4_fixture() -> bytes:
    ftyp = _box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomavc1")
    moov = _box(
        b"moov",
        _mvhd(timescale=1000, duration=12_345)
        + _trak(b"vide", dims=(640, 360), mdhd_ts=30_000, fourcc=b"avc1")
        + _trak(b"soun", mdhd_ts=48_000, fourcc=b"mp4a"),
    )
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


def _mp3_frame(header2: int = 0x90, pad: int = 413) -> bytes:
    """One MPEG-1 Layer III frame: 0xFFFB header, bitrate index in the
    caller's header2 high nibble (0x9 = 128 kbps), 44.1 kHz, stereo.
    417 bytes total at 128 kbps."""
    return bytes([0xFF, 0xFB, header2, 0x00]) + b"\x00" * pad


def _mp3_cbr_fixture(n_frames: int = 10) -> bytes:
    tag_body_size = 100
    id3 = (
        b"ID3\x04\x00\x00"
        + bytes(
            [
                (tag_body_size >> 21) & 0x7F,
                (tag_body_size >> 14) & 0x7F,
                (tag_body_size >> 7) & 0x7F,
                tag_body_size & 0x7F,
            ]
        )
        + b"\x00" * tag_body_size
    )
    return id3 + _mp3_frame() * n_frames


def _mp3_xing_fixture(n_frames: int = 38) -> bytes:
    # Xing tag sits after the 32-byte MPEG-1-stereo side info
    xing = b"Xing" + (1).to_bytes(4, "big") + n_frames.to_bytes(4, "big")
    first = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 32 + xing
    first += b"\x00" * (417 - len(first))
    return first + _mp3_frame() * 3


# ---------------------------------------------------------------------------


def test_probe_mp4_duration_dims_codec_rate():
    meta = probe_mp4(_mp4_fixture())
    assert meta["duration_ms"] == 12_345  # mvhd duration/timescale
    assert (meta["width"], meta["height"]) == (640, 360)  # tkhd 16.16
    assert meta["sample_rate"] == 48_000  # audio track mdhd timescale
    assert meta["codec"] == "avc1"  # video stsd wins over mp4a


def test_probe_mp4_audio_only():
    ftyp = _box(b"ftyp", b"M4A " + (0).to_bytes(4, "big") + b"M4A ")
    moov = _box(
        b"moov",
        _mvhd(timescale=600, duration=1200)
        + _trak(b"soun", mdhd_ts=44_100, fourcc=b"mp4a"),
    )
    meta = probe_mp4(ftyp + moov)
    assert meta["duration_ms"] == 2000
    assert meta["width"] is None and meta["height"] is None
    assert meta["sample_rate"] == 44_100
    assert meta["codec"] == "mp4a"


def test_probe_mp4_truncated_fails_loudly():
    # cut into the moov box (the trailing mdat is 40 bytes)
    payload = _mp4_fixture()[:-45]
    with pytest.raises(ValueError, match="truncated MP4 box"):
        probe_mp4(payload)


def test_probe_mp3_cbr_estimate():
    payload = _mp3_cbr_fixture(n_frames=10)
    meta = probe_mp3(payload)
    assert meta["sample_rate"] == 44_100
    assert meta["codec"] == "mp3-layer3"
    # 10 frames * 417 bytes at 128 kbps → ~261 ms
    assert meta["duration_ms"] == pytest.approx(10 * 417 * 8000 / 128_000, abs=2)


def test_probe_mp3_xing_frame_count_wins():
    meta = probe_mp3(_mp3_xing_fixture(n_frames=38))
    # 38 frames * 1152 samples at 44.1 kHz ≈ 993 ms — NOT the CBR
    # estimate over the (much shorter) payload
    assert meta["duration_ms"] == int(round(38 * 1152 * 1000 / 44_100))


def test_probe_mp3_no_sync_fails_loudly():
    with pytest.raises(ValueError, match="no MPEG audio frame sync"):
        probe_mp3(b"\x00" * 64)


def test_sniff_kinds():
    assert sniff_kind(_mp4_fixture()) == "mp4"
    assert sniff_kind(_mp3_cbr_fixture()) == "mp3"
    assert sniff_kind(_mp3_frame()) == "mp3"  # bare frame, no ID3
    assert sniff_kind(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert sniff_kind(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_kind(b"RIFF\x00\x00\x00\x00AVI LIST") == "avi"
    assert sniff_kind(b"garbage") == "unknown"


def test_probe_media_mixed_batch(spark):
    rows = [
        (1, bytearray(_mp4_fixture())),
        (2, bytearray(_mp3_cbr_fixture())),
        (3, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    got = {r.id: r for r in probe_media(df).collect()}
    assert got[1].kind == "mp4" and got[1].width == 640 and got[1].codec == "avc1"
    assert got[1].duration_ms == 12_345
    assert got[2].kind == "mp3" and got[2].sample_rate == 44_100
    assert got[3].kind == "unknown" and got[3].duration_ms is None
    assert got[3].n_bytes == len(b"not media at all")


def _fullbox(btype: bytes, version: int, payload: bytes, flags: int = 0) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


def _fmp4_fixture(with_mehd: bool, n_frags: int = 3) -> bytes:
    """Fragmented MP4: mvhd duration 0, mvex (trex [+ mehd]), then
    moof fragments whose trun boxes carry the samples. One video
    track (id=1, media timescale 30000, 1001/sample)."""
    ftyp = _box(b"ftyp", b"iso5" + (512).to_bytes(4, "big") + b"iso5dash")
    mvhd = _fullbox(
        b"mvhd",
        0,
        (0).to_bytes(4, "big") * 2  # ctime, mtime
        + (1000).to_bytes(4, "big")  # movie timescale
        + (0).to_bytes(4, "big")  # duration 0: the fMP4 signature
        + (0x00010000).to_bytes(4, "big")
        + (0x0100).to_bytes(2, "big")
        + b"\x00" * 10
        + b"\x00" * 36
        + b"\x00" * 24
        + (2).to_bytes(4, "big"),
    )
    trex = _fullbox(
        b"trex",
        0,
        (1).to_bytes(4, "big")  # track id
        + (1).to_bytes(4, "big")  # default sample description idx
        + (1001).to_bytes(4, "big")  # default sample duration
        + (0).to_bytes(4, "big") * 2,
    )
    mvex_children = trex
    if with_mehd:
        # total fragment duration in MOVIE timescale: 2.5 s
        mvex_children = _fullbox(b"mehd", 0, (2500).to_bytes(4, "big")) + trex
    mvex = _box(b"mvex", mvex_children)
    moov = _box(
        b"moov",
        mvhd
        + mvex
        + _trak(b"vide", dims=(1280, 720), mdhd_ts=30_000, fourcc=b"avc1"),
    )
    frags = b""
    for i in range(n_frags):
        mfhd = _fullbox(b"mfhd", 0, (i + 1).to_bytes(4, "big"))
        # tfhd: default-sample-duration present (flag 0x08)
        tfhd = _fullbox(
            b"tfhd", 0, (1).to_bytes(4, "big") + (1001).to_bytes(4, "big"), flags=0x08
        )
        if i == 0:
            # per-sample durations present (flag 0x100): 10 samples
            trun = _fullbox(
                b"trun",
                0,
                (10).to_bytes(4, "big") + (1001).to_bytes(4, "big") * 10,
                flags=0x100,
            )
        else:
            # count-only trun: duration = tfhd default x count
            trun = _fullbox(b"trun", 0, (10).to_bytes(4, "big"), flags=0)
        traf = _box(b"traf", tfhd + trun)
        frags += _box(b"moof", mfhd + traf) + _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + frags


def test_probe_fmp4_mehd_duration():
    meta = probe_mp4(_fmp4_fixture(with_mehd=True))
    # mehd 2500 / movie timescale 1000 -> 2500 ms, NOT the zero mvhd
    assert meta["duration_ms"] == 2500
    assert (meta["width"], meta["height"]) == (1280, 720)
    assert meta["codec"] == "avc1"


def test_probe_fmp4_summed_fragments():
    meta = probe_mp4(_fmp4_fixture(with_mehd=False, n_frags=3))
    # 3 fragments x 10 samples x 1001 ticks at media timescale 30000
    want = int(round(3 * 10 * 1001 * 1000 / 30_000))
    assert meta["duration_ms"] == want


def test_probe_mp3_vbri_and_id3v1():
    # VBRI header: fixed 32 bytes after the frame header
    vbri = b"VBRI" + (1).to_bytes(2, "big") + (0).to_bytes(2, "big") + (
        0
    ).to_bytes(2, "big") + (4000).to_bytes(4, "big") + (77).to_bytes(4, "big")
    first = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 32 + vbri
    first += b"\x00" * (417 - len(first))
    meta = probe_mp3(first + _mp3_frame() * 3)
    assert meta["duration_ms"] == int(round(77 * 1152 * 1000 / 44_100))

    # ID3v1 trailer excluded from the CBR byte count
    bare = _mp3_frame() * 10
    id3v1 = b"TAG" + b"\x00" * 125
    with_tag = probe_mp3(bare + id3v1)
    without = probe_mp3(bare)
    assert with_tag["duration_ms"] == without["duration_ms"]


def test_probe_media_isolates_corrupt_payloads(spark):
    """A truncated MP4 (or junk that sniffs as mp3) must not abort the
    whole-lake scan: the row lands with its sniffed kind, null
    metadata, and the parse error recorded."""
    rows = [
        (1, bytearray(_mp4_fixture())),
        (2, bytearray(_mp4_fixture()[:-45])),  # truncated mid-moov
        (3, bytearray(b"\xff\xe0junk that sniffs as mp3 but has no sync")),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    got = {r.id: r for r in probe_media(df).collect()}
    assert got[1].duration_ms == 12_345 and got[1].error is None
    assert got[2].kind == "mp4" and got[2].duration_ms is None
    assert "truncated MP4 box" in got[2].error
    assert got[3].kind == "mp3" and got[3].error is not None


def test_probe_mp4_short_box_body_fails_loudly():
    """A box whose declared size is valid but shorter than its
    version-dependent field extent must raise, not read bytes of the
    following box as field values."""
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big"))
    # mvhd with only version byte + 8 body bytes: v0 needs 20
    short_mvhd = _box(b"mvhd", _fullbox_body(0, b"\x00" * 5))
    moov = _box(b"moov", short_mvhd)
    with pytest.raises(ValueError, match="body too short"):
        probe_mp4(ftyp + moov)


def test_probe_media_long_duration_survives_arrow():
    """A bogus tiny timescale yields a >2^31 ms duration — the long
    column must carry it instead of failing Arrow conversion."""
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    moov = _box(b"moov", _mvhd(timescale=1, duration=2**32 - 1))
    payload = ftyp + moov
    meta = probe_mp4(payload)
    assert meta["duration_ms"] == (2**32 - 1) * 1000
    spark_df_rows = [(1, bytearray(payload))]
    import pyspark.sql.functions as F  # noqa: F401

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    df = spark.createDataFrame(spark_df_rows, "id long, media binary")
    row = probe_media(df).collect()[0]
    assert row.duration_ms == (2**32 - 1) * 1000 and row.error is None


def test_media_probe_stats_per_kind(spark):
    rows = [
        (1, bytearray(_mp4_fixture())),
        (2, bytearray(_mp4_fixture())),
        (3, bytearray(_mp3_cbr_fixture())),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    stats = {r.kind: r for r in media_probe_stats(df).collect()}
    assert stats["mp4"].n_media == 2
    assert stats["mp4"].total_bytes == 2 * len(_mp4_fixture())
    assert stats["mp4"].avg_duration_ms == pytest.approx(12_345)
    assert stats["mp3"].n_media == 1
