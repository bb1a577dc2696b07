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


# ---------------------------------------------------------------------------
# Real stdlib codecs: uncompressed BMP / P6 PPM images, PCM WAV audio.


def _bmp_bytes(pixels):
    """Encode rows of RGB tuples as a bottom-up 24-bit BI_RGB BMP."""
    h = len(pixels)
    w = len(pixels[0])
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        body += line + b"\x00" * (row_bytes - len(line))
    header = (
        b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def _ppm_bytes(pixels):
    h, w = len(pixels), len(pixels[0])
    body = b"".join(bytes(px) for row in pixels for px in row)
    return b"P6\n%d %d\n255\n" % (w, h) + body


def _wav_bytes(samples, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_real_bmp_and_ppm_decode(spark):
    # 2x2: red, green / blue, white
    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    rows = [(1, _bmp_bytes(px)), (2, _ppm_bytes(px))]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r.id: r for r in M.image_features(df, fake=False).collect()}
    for r in out.values():
        assert (r.width, r.height) == (2, 2)
        # mean of each channel: red present in 2 of 4 pixels etc.
        assert r.features[0] == 0.5 and r.features[1] == 0.5 and r.features[2] == 0.5
    # identical pixels → identical features across containers
    assert out[1].features == out[2].features


def _png_bytes(pixels, rgba=False, filters=None):
    """Encode rows of RGB tuples as an 8-bit truecolor PNG; per-row
    filter types selectable to exercise every unfilter branch."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    ch = 4 if rgba else 3
    filters = filters or [0] * h

    def px_bytes(p):
        return bytes(p) + (b"\xff" if rgba else b"")

    def apply_filter(ftype, row, prev):
        out = bytearray()
        for i, b in enumerate(row):
            a = row[i - ch] if i >= ch else 0
            up = prev[i] if prev else 0
            c = prev[i - ch] if (prev and i >= ch) else 0
            if ftype == 0:
                out.append(b)
            elif ftype == 1:
                out.append((b - a) & 0xFF)
            elif ftype == 2:
                out.append((b - up) & 0xFF)
            elif ftype == 3:
                out.append((b - ((a + up) >> 1)) & 0xFF)
            else:  # Paeth
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                out.append((b - pred) & 0xFF)
        return bytes(out)

    raw = b""
    prev = None
    for ftype, row in zip(filters, pixels):
        flat = b"".join(px_bytes(p) for p in row)
        raw += bytes([ftype]) + apply_filter(ftype, flat, prev)
        prev = flat
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6 if rgba else 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_matches_bmp(spark):
    """The same image stored as BMP and PNG (every filter type, and
    RGBA with opaque alpha) must yield identical features — the PNG
    path is a real zlib-inflate + unfilter decode, not a stub."""
    px = [
        [(255, 0, 0), (0, 255, 0), (17, 34, 51)],
        [(0, 0, 255), (255, 255, 255), (200, 100, 50)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
        [(90, 80, 70), (60, 50, 40), (30, 20, 10)],
        [(0, 0, 0), (128, 128, 128), (255, 255, 255)],
    ]
    rows = [
        (1, _bmp_bytes(px)),
        (2, _png_bytes(px, filters=[0, 1, 2, 3, 4])),  # every filter branch
        (3, _png_bytes(px, rgba=True, filters=[4, 3, 2, 1, 0])),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r.id: r for r in M.image_features(df, fake=False).collect()}
    assert (out[1].width, out[1].height) == (3, 5)
    assert out[1].features == out[2].features == out[3].features


def test_png_invalid_combo_routes_to_explicit_slot(spark):
    """Spec-invalid depth/color combinations (16-bit paletted) return
    None from the PNG decoder and land at the explicit slot instead of
    guessing."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", b"\x00\x00\x00")
        + chunk(b"IDAT", zlib.compress(b"\x00" * 3)) + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, payload)], "id long, media binary")
    with pytest.raises(Exception, match="NotImplementedError|imaging library"):
        M.image_features(df, fake=False).collect()


def test_real_resize_preserves_aspect_and_pixels(spark):
    # 4x2 gradient; resize longest side to 2 → 2x1
    px = [[(i * 20, 0, 0) for i in range(4)] for _ in range(2)]
    df = spark.createDataFrame([(1, _ppm_bytes(px))], "id long, media binary")
    (r,) = M.resize_images(df, max_side=2, fake=False).collect()
    assert (r.width, r.height) == (2, 1)
    assert bytes(r.media).startswith(b"P6\n2 1\n255\n")
    # nearest-neighbor keeps exact source pixels (columns 0 and 2)
    assert bytes(r.media)[-6:] == bytes((0, 0, 0)) + bytes((40, 0, 0))
    # resized output feeds the real feature stage (binary-in/binary-out)
    (f,) = M.image_features(M.resize_images(df, max_side=2, fake=False), fake=False).collect()
    assert (f.width, f.height) == (2, 1)


def test_real_wav_decode(spark):
    # 8000 samples at 8 kHz = 1000 ms of a +/- 16384 square wave:
    # rms = 16384/32768 = 0.5
    samples = [16384 if i % 2 == 0 else -16384 for i in range(8000)]
    df = spark.createDataFrame([(1, _wav_bytes(samples))], "id long, media binary")
    (r,) = M.audio_features(df, fake=False).collect()
    assert r.duration_ms == 1000 and r.sample_rate == 8000
    assert r.rms == 0.5


def _y4m_bytes(frames, w=4, h=2):
    """Encode constant-luma frames as YUV4MPEG2 4:2:0."""
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h)
    for luma in frames:
        out += b"FRAME\n"
        out += bytes([luma]) * (w * h)              # Y plane
        out += bytes([128]) * (w * h // 2)          # U+V planes (4:2:0)
    return out


def test_real_y4m_frame_sampling(spark):
    # 5 frames, luma 0,50,100,150,200; sample every 2nd → frames 0,2,4
    payload = _y4m_bytes([0, 50, 100, 150, 200])
    df = spark.createDataFrame([(7, payload)], "id long, media binary")
    rows = M.video_frame_features(df, every_n=2).orderBy("frame_idx").collect()
    assert [(r.frame_idx, r.width, r.height) for r in rows] == [(0, 4, 2), (2, 4, 2), (4, 4, 2)]
    assert [r.luma_mean for r in rows] == pytest.approx(
        [0.0, 100 / 255, 200 / 255], abs=1e-5
    )
    assert all(r.luma_std == 0.0 for r in rows)  # constant frames


def test_compressed_video_is_explicit_slot(spark):
    df = spark.createDataFrame([(1, b"\x00\x00\x00\x18ftypmp42")], "id long, media binary")
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|video decode|YUV4MPEG2"):
        M.video_frame_features(df).collect()


def test_truncated_y4m_fails_loudly(spark):
    payload = _y4m_bytes([10, 20])[:-3]  # cut mid-frame
    df = spark.createDataFrame([(1, payload)], "id long, media binary")
    import pytest as _pytest

    with _pytest.raises(Exception, match="truncated y4m frame"):
        M.video_frame_features(df, every_n=1).collect()


def _gif_lzw_encode(indices, m):
    """Standard GIF LZW compress with the non-early-change width rule
    (grow when next_code == (1<<width)+1) — the inverse of the
    decoder's grow-at-table-size==1<<width rule. Implements deferred
    clear: at 4096 entries the table freezes and codes keep flowing
    at 12 bits (the spec-legal path some encoders take instead of
    emitting CLEAR)."""
    clear, eoi = 1 << m, (1 << m) + 1
    width = m + 1
    next_code = eoi + 1
    table = {(i,): i for i in range(1 << m)}
    out = []

    def emit(code):
        out.append((code, width))

    emit(clear)
    cur = (indices[0],)
    for k in indices[1:]:
        if cur + (k,) in table:
            cur = cur + (k,)
        else:
            emit(table[cur])
            if next_code < 4096:  # deferred clear: freeze when full
                table[cur + (k,)] = next_code
                next_code += 1
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
            cur = (k,)
    emit(table[cur])
    emit(eoi)
    _gif_lzw_encode.last_table_size = next_code
    acc = bits = 0
    data = bytearray()
    for code, wd in out:
        acc |= code << bits
        bits += wd
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        data.append(acc & 0xFF)
    return bytes(data)


def _gif_bytes(pixels, interlaced=False, local_palette=False, with_gce=False):
    """Encode rows of RGB tuples as a single-frame GIF89a."""
    h, w = len(pixels), len(pixels[0])
    colors = []
    for row in pixels:
        for p in row:
            if tuple(p) not in colors:
                colors.append(tuple(p))
    m = max(2, (len(colors) - 1).bit_length())
    n = 1 << m
    pal = b"".join(bytes(c) for c in colors) + b"\x00" * (3 * (n - len(colors)))
    idx = {c: i for i, c in enumerate(colors)}
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = [pixels[r] for r in order]
    else:
        rows = pixels
    indices = [idx[tuple(p)] for row in rows for p in row]

    buf = bytearray(b"GIF89a")
    buf += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_palette:
        buf += bytes([0x00, 0, 0])  # no global palette
    else:
        buf += bytes([0x80 | (m - 1), 0, 0]) + pal
    if with_gce:
        buf += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
        buf += b"\x21\xfe\x05hello\x00"  # comment ext, 1 sub-block
    buf += b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    ipacked = (0x80 | (m - 1)) if local_palette else 0
    if interlaced:
        ipacked |= 0x40
    buf += bytes([ipacked])
    if local_palette:
        buf += pal
    buf += bytes([m])
    lzw = _gif_lzw_encode(indices, m)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        buf += bytes([len(block)]) + block
    buf += b"\x00\x3b"
    return bytes(buf)


def _gif_test_pixels():
    """9x6 image with a long same-color run (exercises the LZW KwK
    case), enough distinct colors for a 3-bit palette, and enough
    entries to force code-width growth."""
    palette = [
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
        (255, 0, 255), (0, 255, 255), (10, 20, 30),
    ]
    px = []
    for r in range(9):
        row = []
        for c in range(6):
            if r < 2:
                row.append(palette[0])  # solid run → KwK codes
            else:
                row.append(palette[(r * 6 + c) % len(palette)])
        px.append(row)
    return px


def test_real_gif_decode_matches_bmp(spark):
    """The same image stored as BMP and GIF (plain, interlaced+local
    palette, and with extension blocks) must yield identical features —
    the GIF path is a real LZW decode, not a stub."""
    px = _gif_test_pixels()
    rows = [
        (1, _bmp_bytes(px)),
        (2, _gif_bytes(px)),
        (3, _gif_bytes(px, interlaced=True, local_palette=True)),
        (4, _gif_bytes(px, with_gce=True)),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r.id: r for r in M.image_features(df, fake=False).collect()}
    assert (out[2].width, out[2].height) == (6, 9)
    assert out[1].features == out[2].features == out[3].features == out[4].features


def test_gif_lzw_roundtrip_exact_pixels():
    """Direct pixel-level roundtrip through encode→decode, including
    a width-growth-heavy random image."""
    import random

    import numpy as np

    from etl_database_spark.functions.multimodal import _decode_gif

    rng = random.Random(3)
    palette = [(i * 16 % 256, (i * 7 + 3) % 256, (i * 29 + 11) % 256) for i in range(16)]
    px = [[palette[rng.randrange(16)] for _ in range(17)] for _ in range(13)]
    decoded = _decode_gif(_gif_bytes(px))
    assert decoded.shape == (13, 17, 3)
    assert np.array_equal(decoded, np.array(px, dtype=np.uint8))
    inter = _decode_gif(_gif_bytes(px, interlaced=True))
    assert np.array_equal(inter, np.array(px, dtype=np.uint8))


def test_truncated_gif_fails_loudly(spark):
    px = _gif_test_pixels()
    payload = _gif_bytes(px)
    # Cut inside the LZW data: decode must raise, not return wrong stats
    truncated = payload[: len(payload) // 2]
    df = spark.createDataFrame([(1, truncated)], "id long, media binary")
    with pytest.raises(Exception):
        M.image_features(df, fake=False).collect()


def _avi_bytes(jpeg_frames, handler=b"MJPG"):
    """Minimal RIFF/AVI wrapper around per-frame JPEG payloads."""
    def chunk(cid, data):
        pad = b"\x00" if len(data) & 1 else b""
        return cid + len(data).to_bytes(4, "little") + data + pad

    def list_chunk(subtype, data):
        return chunk(b"LIST", subtype + data)

    avih = chunk(b"avih", bytes(56))
    strh = chunk(b"strh", b"vids" + handler + bytes(48))
    strf = chunk(b"strf", bytes(40))
    hdrl = list_chunk(b"hdrl", avih + list_chunk(b"strl", strh + strf))
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_mjpeg_avi_frame_sampling(spark):
    """MJPEG AVI decodes for real through the JPEG decoder: sampled
    frames report their true luma statistics."""
    import numpy as np

    from tests.test_jpeg import _encode_jpeg

    levels = [30, 80, 130, 180, 230]
    frames = [
        _encode_jpeg(np.full((16, 24, 3), lv, dtype=np.uint8), quality=95)
        for lv in levels
    ]
    df = spark.createDataFrame([(7, _avi_bytes(frames))], "id long, media binary")
    out = sorted(
        M.video_frame_features(df, every_n=2).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in out] == [0, 2, 4]
    for r, lv in zip(out, levels[::2]):
        assert (r.width, r.height) == (24, 16)
        assert abs(r.luma_mean - lv / 255.0) < 0.02
        assert r.luma_std < 0.02


def test_non_mjpeg_avi_is_explicit_slot(spark):
    import numpy as np

    from tests.test_jpeg import _encode_jpeg

    frame = _encode_jpeg(np.full((8, 8, 3), 100, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, _avi_bytes([frame], handler=b"H264"))], "id long, media binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|video library"):
        M.video_frame_features(df, every_n=1).collect()


def test_truncated_avi_fails_loudly(spark):
    import numpy as np

    from tests.test_jpeg import _encode_jpeg

    frame = _encode_jpeg(np.full((8, 8, 3), 100, dtype=np.uint8))
    payload = _avi_bytes([frame, frame])
    df = spark.createDataFrame(
        [(1, payload[: len(payload) - 40])], "id long, media binary"
    )
    with pytest.raises(Exception, match="truncated AVI|ValueError"):
        M.video_frame_features(df, every_n=1).collect()


def _g711_wav_bytes(samples_u8, fmt_code, rate=8000, channels=1):
    """Handcraft a G.711 WAV (format 6=A-law, 7=mu-law): stdlib wave
    cannot write these, which is the point."""
    import struct

    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, rate, rate * channels, channels, 8
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(samples_u8).to_bytes(4, "little") + bytes(samples_u8)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_g711_tables_match_audioop():
    """The μ-law/A-law expansion formulas must agree byte-for-byte
    with the stdlib's C implementation (independent reference)."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    from etl_database_spark.functions.multimodal import _g711_table

    raw = bytes(range(256))
    ulaw_ref = np.frombuffer(audioop.ulaw2lin(raw, 2), dtype=np.int16)
    alaw_ref = np.frombuffer(audioop.alaw2lin(raw, 2), dtype=np.int16)
    assert np.array_equal(_g711_table(7), ulaw_ref)
    assert np.array_equal(_g711_table(6), alaw_ref)


def test_g711_wav_features(spark):
    """A μ-law/A-law sine must report true duration/rate and an rms
    close to the PCM original's."""
    audioop = pytest.importorskip("audioop")
    import math
    import struct

    n, rate = 8000, 8000
    pcm = [int(12000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)]
    raw = b"".join(struct.pack("<h", s) for s in pcm)
    rows = [
        (1, _wav_bytes(pcm, rate=rate)),
        (2, _g711_wav_bytes(audioop.lin2ulaw(raw, 2), 7, rate=rate)),
        (3, _g711_wav_bytes(audioop.lin2alaw(raw, 2), 6, rate=rate)),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r.id: r for r in M.audio_features(df, fake=False).collect()}
    for r in out.values():
        assert r.duration_ms == 1000
        assert r.sample_rate == rate
    ref = out[1].rms
    assert abs(out[2].rms - ref) < 0.005  # mu-law quantization noise
    assert abs(out[3].rms - ref) < 0.005


def _png_bytes_v2(pixels, color_type, interlace=False, palette=None):
    """PNG encoder for the widened envelope: grayscale (0), RGB (2),
    palette (3), gray+alpha (4), optionally Adam7-interlaced; all
    scanlines use filter type 0 (filters are exercised elsewhere)."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])

    def sample(p):
        if color_type == 0:
            return bytes([p])
        if color_type == 3:
            return bytes([p])
        if color_type == 4:
            return bytes([p, 0xFF])
        return bytes(p)

    passes = (
        [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        if interlace
        else [(0, 0, 1, 1)]
    )
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        for r in range(y0, h, dy):
            row = [pixels[r][c] for c in range(x0, w, dx)]
            if not row:
                continue
            raw += b"\x00" + b"".join(sample(p) for p in row)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", b"".join(bytes(c) for c in palette))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _bmp8_bytes(index_rows, palette):
    """8-bit paletted bottom-up BMP."""
    h, w = len(index_rows), len(index_rows[0])
    row_bytes = (w + 3) & ~3
    body = b""
    for row in reversed(index_rows):
        body += bytes(row) + b"\x00" * (row_bytes - w)
    pal = b"".join(bytes((b, g, r, 0)) for (r, g, b) in palette)
    data_off = 54 + len(pal)
    header = (
        b"BM" + (data_off + len(body)).to_bytes(4, "little") + b"\x00" * 4
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + b"\x00" * 8 + len(palette).to_bytes(4, "little") + b"\x00" * 4
    )
    return header + pal + body


def test_png_palette_gray_and_interlace_variants(spark):
    """Paletted, grayscale, gray+alpha, and Adam7-interlaced PNGs all
    decode to the same pixels as their BMP twins."""
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    idx = [[(r * 7 + c) % 4 for c in range(9)] for r in range(11)]
    rgb = [[palette[i] for i in row] for row in idx]
    gray = [[(r * 11 + c * 5) % 256 for c in range(9)] for r in range(11)]
    gray_rgb = [[(g, g, g) for g in row] for row in gray]

    rows = [
        (1, _bmp_bytes(rgb)),
        (2, _png_bytes_v2(idx, 3, palette=palette)),
        (3, _png_bytes_v2(idx, 3, palette=palette, interlace=True)),
        (4, _png_bytes_v2(rgb, 2, interlace=True)),
        (5, _bmp_bytes(gray_rgb)),
        (6, _png_bytes_v2(gray, 0)),
        (7, _png_bytes_v2(gray, 4)),
        (8, _png_bytes_v2(gray, 0, interlace=True)),
        (9, _bmp8_bytes(idx, palette)),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r.id: r for r in M.image_features(df, fake=False).collect()}
    for r in out.values():
        assert (r.width, r.height) == (9, 11)
    assert out[1].features == out[2].features == out[3].features == out[4].features
    assert out[1].features == out[9].features
    assert out[5].features == out[6].features == out[7].features == out[8].features


def test_gif_deferred_clear_roundtrip():
    """A stream long enough to fill the 4096-entry LZW table without a
    CLEAR must still decode exactly: the table freezes on both sides
    (deferred clear), it must not desync."""
    import random

    import numpy as np

    from etl_database_spark.functions.multimodal import _decode_gif

    rng = random.Random(41)
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    px = [[palette[rng.randrange(4)] for _ in range(256)] for _ in range(128)]
    payload = _gif_bytes(px)
    assert _gif_lzw_encode.last_table_size >= 4096, "fixture must fill the table"
    decoded = _decode_gif(payload)
    assert np.array_equal(decoded, np.array(px, dtype=np.uint8))


def test_mjpeg_avi_rec_grouped_frames(spark):
    """Frames wrapped in 'rec ' grouping LISTs inside movi must still
    be found by the chunk walker."""
    import numpy as np

    from etl_database_spark.functions.multimodal import _iter_avi_mjpeg_frames
    from tests.test_jpeg import _encode_jpeg

    frames = [
        _encode_jpeg(np.full((8, 8, 3), lv, dtype=np.uint8), quality=95)
        for lv in (40, 90, 140)
    ]

    def chunk(cid, data):
        pad = b"\x00" if len(data) & 1 else b""
        return cid + len(data).to_bytes(4, "little") + data + pad

    def list_chunk(subtype, data):
        return chunk(b"LIST", subtype + data)

    avih = chunk(b"avih", bytes(56))
    strh = chunk(b"strh", b"vids" + b"MJPG" + bytes(48))
    strf = chunk(b"strf", bytes(40))
    hdrl = list_chunk(b"hdrl", avih + list_chunk(b"strl", strh + strf))
    movi = list_chunk(
        b"movi",
        b"".join(list_chunk(b"rec ", chunk(b"00dc", f)) for f in frames),
    )
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    got = list(_iter_avi_mjpeg_frames(payload))
    assert [idx for idx, _ in got] == [0, 1, 2]
    assert [f for _, f in got] == frames


def _png_bytes_depth(pixels, color_type, depth, palette=None, interlace=False):
    """PNG encoder for non-8-bit depths: 16-bit writes v*257 (so the
    decoder's high byte returns v exactly); 1/2/4-bit packs MSB-first.
    Filter 0 everywhere."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    passes = (
        [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        if interlace
        else [(0, 0, 1, 1)]
    )
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        for r in range(y0, h, dy):
            row = [pixels[r][c] for c in range(x0, w, dx)]
            if not row:
                continue
            raw.append(0)  # filter type None
            if depth == 16:
                for p in row:
                    samples = tuple(p) if isinstance(p, (tuple, list)) else (p,)
                    if color_type == 4:
                        samples = (samples[0], 255)  # opaque alpha
                    elif color_type == 6:
                        samples = samples + (255,)  # opaque alpha
                    for v in samples:
                        raw += struct.pack(">H", v * 257)
            else:  # 1/2/4-bit single channel
                acc = nbits = 0
                for p in row:
                    acc = (acc << depth) | (p & ((1 << depth) - 1))
                    nbits += depth
                    if nbits == 8:
                        raw.append(acc)
                        acc = nbits = 0
                if nbits:
                    raw.append(acc << (8 - nbits))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", b"".join(bytes(c) for c in palette))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_16bit_and_subbyte_depths(spark):
    """16-bit (gray/RGB/RGBA/gray+alpha) and 1/2/4-bit (gray,
    palette) PNGs decode to the same pixels as their 8-bit twins."""
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    idx = [[(r * 3 + c) % 4 for c in range(7)] for r in range(5)]
    rgb = [[palette[i] for i in row] for row in idx]
    g1 = [[(r + c) % 2 for c in range(7)] for r in range(5)]
    g1_rgb = [[(v * 255, v * 255, v * 255) for v in row] for row in g1]
    g2 = [[(r + c) % 4 for c in range(7)] for r in range(5)]
    g2_rgb = [[(v * 255 // 3,) * 3 for v in row] for row in g2]
    gray = [[(r * 31 + c * 17) % 256 for c in range(7)] for r in range(5)]
    gray_rgb = [[(v, v, v) for v in row] for row in gray]

    rows = [
        (1, _bmp_bytes(rgb)),
        (2, _png_bytes_depth(rgb, 2, 16)),
        (3, _png_bytes_depth(idx, 3, 4, palette=palette)),
        (4, _png_bytes_depth(idx, 3, 2, palette=palette)),
        (5, _png_bytes_depth(rgb, 6, 16, interlace=True)),
        (6, _bmp_bytes(g1_rgb)),
        (7, _png_bytes_depth(g1, 0, 1)),
        (8, _bmp_bytes(g2_rgb)),
        (9, _png_bytes_depth(g2, 0, 2, interlace=True)),
        (10, _bmp_bytes(gray_rgb)),
        (11, _png_bytes_depth(gray, 0, 16)),
        (12, _png_bytes_depth(gray, 4, 16)),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r.id: r for r in M.image_features(df, fake=False).collect()}
    for r in out.values():
        assert (r.width, r.height) == (7, 5)
    assert out[1].features == out[2].features == out[3].features
    assert out[1].features == out[4].features == out[5].features
    assert out[6].features == out[7].features
    assert out[8].features == out[9].features
    assert out[10].features == out[11].features == out[12].features


def test_gif_random_roundtrip_property():
    """Fuzz the GIF LZW path: random palette sizes, dimensions, and
    pixel data must roundtrip exactly (hypothesis-style loop kept
    dependency-free)."""
    import random

    import numpy as np

    from etl_database_spark.functions.multimodal import _decode_gif

    rng = random.Random(97)
    for trial in range(8):
        ncolors = rng.choice([2, 3, 4, 7, 13, 16, 64, 200])
        w = rng.randint(1, 40)
        h = rng.randint(1, 30)
        palette = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(ncolors)
        ]
        # dedupe palette entries (encoder maps by color value)
        palette = list(dict.fromkeys(palette))
        px = [[palette[rng.randrange(len(palette))] for _ in range(w)] for _ in range(h)]
        for interlaced in (False, True):
            decoded = _decode_gif(_gif_bytes(px, interlaced=interlaced))
            assert decoded.shape == (h, w, 3), f"trial {trial} {w}x{h}"
            assert np.array_equal(decoded, np.array(px, dtype=np.uint8)), (
                f"trial {trial} {w}x{h} interlaced={interlaced}"
            )


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + near-dup blocking


def _grad_pixels(w=32, h=24, seed=3):
    """Structured test image: smooth gradient + a few features, so the
    dhash carries signal (a flat image hashes to 0 everywhere)."""
    import random

    rng = random.Random(seed)
    px = [
        [
            (
                (x * 255) // w,
                (y * 255) // h,
                ((x + y) * 255) // (w + h),
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    # sprinkle deterministic features
    for _ in range(30):
        x, y = rng.randrange(w), rng.randrange(h)
        px[y][x] = (rng.randrange(256), rng.randrange(256), rng.randrange(256))
    return px


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_is_format_invariant(spark):
    from etl_database_spark.functions.multimodal import image_dhash

    px = _grad_pixels()
    df = spark.createDataFrame(
        [(1, bytearray(_bmp_bytes(px))), (2, bytearray(_ppm_bytes(px)))],
        "id long, media binary",
    )
    rows = {r["id"]: r for r in image_dhash(df).collect()}
    assert rows[1]["sha256"] != rows[2]["sha256"]  # bytes differ...
    assert rows[1]["dhash"] == rows[2]["dhash"]  # ...perception doesn't


def test_dhash_survives_brightness_shift(spark):
    from etl_database_spark.functions.multimodal import image_dhash

    px = _grad_pixels()
    brighter = [[(min(r + 20, 255), min(g + 20, 255), min(b + 20, 255)) for r, g, b in row] for row in px]
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(px))), (2, bytearray(_ppm_bytes(brighter)))],
        "id long, media binary",
    )
    rows = {r["id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert _hamming(rows[1], rows[2]) <= 2  # gradient signs nearly all survive


def test_near_duplicates_found_and_verified(spark):
    from etl_database_spark.functions.multimodal import image_dhash, image_near_duplicates

    base = _grad_pixels()
    # small local edit: a 3x3 patch
    edited = [row[:] for row in base]
    for y in range(3):
        for x in range(3):
            edited[y + 5][x + 5] = (255, 255, 255)
    other = _grad_pixels(seed=99)
    different = [[c[::-1] for c in row[::-1]] for row in other]  # mirrored, channel-swapped
    df = spark.createDataFrame(
        [
            (1, bytearray(_ppm_bytes(base))),
            (2, bytearray(_ppm_bytes(edited))),
            (3, bytearray(_ppm_bytes(different))),
        ],
        "id long, media binary",
    )
    hashes = image_dhash(df)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in image_near_duplicates(hashes, 3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert not any(3 in p for p in pairs)


def test_dhash_fake_path_is_deterministic(spark):
    from etl_database_spark.functions.multimodal import image_dhash

    df = spark.createDataFrame(
        [(1, bytearray(b"not-an-image")), (2, bytearray(b"not-an-image"))],
        "id long, media binary",
    )
    rows = [r["dhash"] for r in image_dhash(df, fake=True).collect()]
    assert rows[0] == rows[1]


# ---------------------------------------------------------------------------
# Perceptual audio fingerprinting


def _tone_samples(freqs, n=4000, rate=8000, amp=8000, seed=None):
    import math
    import random

    rng = random.Random(seed)
    out = []
    for i in range(n):
        v = sum(math.sin(2 * math.pi * f * i / rate) for f in freqs) * amp / len(freqs)
        if seed is not None:
            v += rng.gauss(0, 80)
        out.append(max(-32768, min(32767, int(v))))
    return out


def test_audio_fp_gain_invariant(spark):
    from etl_database_spark.functions.multimodal import audio_fingerprint

    s = _tone_samples([440, 1200], seed=1)
    half = [v // 2 for v in s]
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(s))), (2, bytearray(_wav_bytes(half)))],
        "id long, media binary",
    )
    rows = {r["id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert bin((rows[1] ^ rows[2]) & ((1 << 64) - 1)).count("1") <= 2


def test_audio_fp_survives_g711_requantization(spark):
    import audioop
    import struct

    from etl_database_spark.functions.multimodal import audio_fingerprint

    s = _tone_samples([300, 900, 2100], seed=2)
    raw = b"".join(struct.pack("<h", v) for v in s)
    ulaw = audioop.lin2ulaw(raw, 2)
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(s))),
            (2, bytearray(_g711_wav_bytes(ulaw, 7))),
        ],
        "id long, media binary",
    )
    rows = {r["id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert bin((rows[1] ^ rows[2]) & ((1 << 64) - 1)).count("1") <= 3


def test_audio_near_duplicates_blocking(spark):
    from etl_database_spark.functions.multimodal import (
        audio_fingerprint,
        audio_near_duplicates,
    )

    base = _tone_samples([440, 1200], seed=3)
    noised = [max(-32768, min(32767, v + ((i * 2654435761) % 97) - 48)) for i, v in enumerate(base)]
    other = _tone_samples([3500], seed=4)
    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(base))),
            (2, bytearray(_wav_bytes(noised))),
            (3, bytearray(_wav_bytes(other))),
        ],
        "id long, media binary",
    )
    fps = audio_fingerprint(df)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in audio_near_duplicates(fps, 3).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


# ---------------------------------------------------------------------------
# Video near-dup via per-frame dHash


def _y4m_plane_bytes(planes, w, h):
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h)
    for plane in planes:
        assert len(plane) == w * h
        out += b"FRAME\n" + bytes(plane) + bytes([128]) * (w * h // 2)
    return out


def _pattern_plane(w, h, phase):
    return [((x * 7 + y * 13 + phase * 29) % 197 + (x > w // 2) * 40) % 256 for y in range(h) for x in range(w)]


def test_video_near_duplicates(spark):
    from etl_database_spark.functions.multimodal import (
        video_frame_hashes,
        video_near_duplicates,
    )

    w, h = 32, 16
    base = [_pattern_plane(w, h, k) for k in range(6)]
    noised = [[min(255, v + (i % 3)) for i, v in enumerate(p)] for p in base]
    other = [_pattern_plane(w, h, k + 50)[::-1] for k in range(6)]
    df = spark.createDataFrame(
        [
            (1, bytearray(_y4m_plane_bytes(base, w, h))),
            (2, bytearray(_y4m_plane_bytes(noised, w, h))),
            (3, bytearray(_y4m_plane_bytes(other, w, h))),
        ],
        "id long, media binary",
    )
    fh = video_frame_hashes(df, every_n=2)
    assert fh.where(F.col("id") == 1).count() == 3  # frames 0,2,4 sampled
    pairs = {
        (r["id_a"], r["id_b"]): r["matched_frames"]
        for r in video_near_duplicates(fh, max_hamming=3, min_matched_frames=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_video_frame_hash_deterministic(spark):
    from etl_database_spark.functions.multimodal import video_frame_hashes

    w, h = 32, 16
    frames = [_pattern_plane(w, h, k) for k in range(4)]
    df = spark.createDataFrame(
        [(1, bytearray(_y4m_plane_bytes(frames, w, h)))], "id long, media binary"
    )
    a = sorted(map(tuple, video_frame_hashes(df, every_n=1).collect()))
    b = sorted(map(tuple, video_frame_hashes(df, every_n=1).collect()))
    assert a == b and len(a) == 4
