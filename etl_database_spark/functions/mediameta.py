"""Metadata-only probing for compressed media containers (MP4, MP3).

The multimodal codec policy (functions/multimodal.py) decodes
pixels/samples only for formats the standard library + numpy can
handle; MP4/AAC and MP3 payload decode stays an explicit library
swap-point. But the *metadata-first* layout — filters and pruning
never touch payloads — does not need a decoder for the two most
common real-world containers: duration, dimensions, codec and sample
rate all live in structured headers that a pure-stdlib walk can read.

- MP4 / ISO BMFF (public spec ISO/IEC 14496-12): a box walk — `moov >
  mvhd` for duration/timescale, `trak > tkhd` for presentation
  width/height (16.16 fixed point), `trak > mdia > hdlr` to tell
  video from audio tracks, `mdhd` for the audio media timescale
  (the sample rate), `stbl > stsd` for the codec fourcc.
- MP3 (public MPEG-1/2/2.5 audio frame header layout): skip an ID3v2
  tag (synchsafe size), find the first frame sync, decode
  version/layer/bitrate/sample-rate from the header tables; duration
  from the Xing/Info frame count when present (VBR), else the CBR
  estimate audio-bytes * 8 / bitrate.

`probe_media` runs the sniff+parse as an Arrow-batched mapInPandas
stage producing typed metadata columns — the step that turns a binary
lake into a filterable multimodal table without ever decoding. Parity
note: the reference engine has no multimodal surface; this extends the
LLM-data layer (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# MP4 / ISO BMFF


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each box in [start, end).
    Handles 64-bit largesize and size-0 (to-end) boxes; truncation
    fails loudly — a silently short walk would report wrong metadata."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated MP4 largesize box at byte {pos}")
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"truncated MP4 box {btype!r} at byte {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"mvex", b"moof"}


def _need(btype: bytes, body: int, bend: int, extent: int) -> None:
    """Require `extent` bytes of box body before a fixed-offset field
    read. A box whose declared size passes _iter_boxes but is shorter
    than its version-dependent header must fail loudly here, not
    silently read bytes belonging to the next box."""
    if bend - body < extent:
        raise ValueError(
            f"MP4 box {btype!r} body too short: {bend - body} < {extent}"
        )


def probe_mp4(payload: bytes) -> dict:
    """Metadata from an ISO BMFF file without touching sample data:
    {duration_ms, width, height, sample_rate, codec}. Codec is the
    video track's first stsd sample-entry fourcc when a video track
    exists, else the audio track's.

    Fragmented MP4 (fMP4 / DASH / CMAF segments) is handled: those
    files carry ``mvhd`` duration 0 and spread the samples across
    ``moof`` fragments. Duration then comes from ``mvex > mehd``
    (declared fragment duration) when present, else by summing each
    fragment's ``trun`` sample durations (falling back to the
    ``tfhd``/``trex`` default sample duration × sample count) — still
    a pure header walk, sample payloads (``mdat``) untouched."""
    out = {
        "duration_ms": None,
        "width": None,
        "height": None,
        "sample_rate": None,
        "codec": None,
    }
    video_codec = audio_codec = None
    # per-trak state, keyed off the hdlr handler type seen in that trak
    stack = [(b"", 0, len(payload))]
    trak_handler = None
    trak_mdhd_timescale = None
    trak_stsd_codec = None
    trak_dims = None
    # fMP4 state: movie timescale, declared/summed fragment durations
    mvhd_timescale = None
    mehd_duration = None
    frag_duration = 0  # movie-timescale units summed over moof boxes
    trex_default_dur = {}  # track_id -> trex default sample duration
    traf_default_dur = None  # current traf's tfhd default (or trex fallback)
    moof_track_dur = {}  # track_id -> summed duration within one moof

    trak_id = None
    media_timescale = {}  # track_id -> mdhd timescale (fMP4 duration units)

    def flush_trak():
        nonlocal video_codec, audio_codec
        if trak_id is not None and trak_mdhd_timescale:
            media_timescale[trak_id] = trak_mdhd_timescale
        if trak_handler == b"vide":
            if trak_dims and out["width"] is None:
                out["width"], out["height"] = trak_dims
            if video_codec is None:
                video_codec = trak_stsd_codec
        elif trak_handler == b"soun":
            if trak_mdhd_timescale and out["sample_rate"] is None:
                out["sample_rate"] = trak_mdhd_timescale
            if audio_codec is None:
                audio_codec = trak_stsd_codec

    def walk(start: int, end: int) -> None:
        nonlocal trak_handler, trak_mdhd_timescale, trak_stsd_codec, trak_dims
        nonlocal trak_id, mvhd_timescale, mehd_duration, traf_default_dur
        for btype, body, bend in _iter_boxes(payload, start, end):
            if btype == b"trak":
                trak_handler = trak_mdhd_timescale = trak_stsd_codec = None
                trak_dims = trak_id = None
                walk(body, bend)
                flush_trak()
            elif btype == b"traf":
                traf_default_dur = None
                walk(body, bend)
            elif btype in _MP4_CONTAINERS:
                walk(body, bend)
            elif btype == b"mvhd":
                _need(btype, body, bend, 1)
                version = payload[body]
                if version == 1:
                    _need(btype, body, bend, 32)
                    timescale = int.from_bytes(payload[body + 20 : body + 24], "big")
                    duration = int.from_bytes(payload[body + 24 : body + 32], "big")
                else:
                    _need(btype, body, bend, 20)
                    timescale = int.from_bytes(payload[body + 12 : body + 16], "big")
                    duration = int.from_bytes(payload[body + 16 : body + 20], "big")
                mvhd_timescale = timescale or None
                if timescale and duration:
                    out["duration_ms"] = int(round(duration * 1000 / timescale))
            elif btype == b"mehd":
                _need(btype, body, bend, 1)
                version = payload[body]
                if version == 1:
                    _need(btype, body, bend, 12)
                    mehd_duration = int.from_bytes(payload[body + 4 : body + 12], "big")
                else:
                    _need(btype, body, bend, 8)
                    mehd_duration = int.from_bytes(payload[body + 4 : body + 8], "big")
            elif btype == b"trex":
                _need(btype, body, bend, 20)
                tid = int.from_bytes(payload[body + 4 : body + 8], "big")
                trex_default_dur[tid] = int.from_bytes(
                    payload[body + 12 : body + 16], "big"
                )
            elif btype == b"tfhd":
                _need(btype, body, bend, 8)
                flags = int.from_bytes(payload[body + 1 : body + 4], "big")
                tid = int.from_bytes(payload[body + 4 : body + 8], "big")
                off = body + 8
                if flags & 0x01:  # base-data-offset
                    off += 8
                if flags & 0x02:  # sample-description-index
                    off += 4
                default = None
                if flags & 0x08:  # default-sample-duration present
                    _need(btype, body, bend, off + 4 - body)
                    default = int.from_bytes(payload[off : off + 4], "big")
                traf_default_dur = (tid, default if default is not None
                                    else trex_default_dur.get(tid))
            elif btype == b"trun":
                _need(btype, body, bend, 8)
                flags = int.from_bytes(payload[body + 1 : body + 4], "big")
                n_samples = int.from_bytes(payload[body + 4 : body + 8], "big")
                pos = body + 8
                if flags & 0x01:  # data-offset
                    pos += 4
                if flags & 0x04:  # first-sample-flags
                    pos += 4
                tid, default = traf_default_dur or (None, None)
                stride = sum(
                    4 for bit in (0x100, 0x200, 0x400, 0x800) if flags & bit
                )
                if flags & 0x100:  # per-sample durations
                    _need(btype, body, bend, pos + n_samples * stride - body)
                    dur = sum(
                        int.from_bytes(payload[p : p + 4], "big")
                        for p in range(pos, pos + n_samples * stride, stride)
                    )
                elif default is not None:
                    dur = default * n_samples
                else:
                    dur = 0
                if tid is not None and dur:
                    moof_track_dur[tid] = moof_track_dur.get(tid, 0) + dur
            elif btype == b"tkhd":
                _need(btype, body, bend, 1)
                version = payload[body]
                # 4 (version/flags) + times/ids: 32 for v1, 20 for v0
                id_off = body + 4 + (16 if version == 1 else 8)
                _need(btype, body, bend, id_off + 4 - body)
                trak_id = int.from_bytes(payload[id_off : id_off + 4], "big")
                off = body + 4 + (32 if version == 1 else 20)
                # reserved (8) + layer/alt-group/volume/reserved (8)
                # + matrix (36)
                dims = off + 8 + 8 + 36
                _need(btype, body, bend, dims + 8 - body)
                w = int.from_bytes(payload[dims : dims + 4], "big") >> 16
                h = int.from_bytes(payload[dims + 4 : dims + 8], "big") >> 16
                if w and h:
                    trak_dims = (w, h)
            elif btype == b"hdlr":
                _need(btype, body, bend, 12)
                trak_handler = payload[body + 8 : body + 12]
            elif btype == b"mdhd":
                _need(btype, body, bend, 1)
                version = payload[body]
                if version == 1:
                    _need(btype, body, bend, 24)
                    trak_mdhd_timescale = int.from_bytes(
                        payload[body + 20 : body + 24], "big"
                    )
                else:
                    _need(btype, body, bend, 16)
                    trak_mdhd_timescale = int.from_bytes(
                        payload[body + 12 : body + 16], "big"
                    )
            elif btype == b"stsd":
                _need(btype, body, bend, 8)
                n = int.from_bytes(payload[body + 4 : body + 8], "big")
                if n >= 1 and body + 16 <= bend:
                    trak_stsd_codec = (
                        payload[body + 12 : body + 16].decode("ascii", "replace")
                    )

    walk(0, len(payload))
    out["codec"] = video_codec or audio_codec
    if not out["duration_ms"]:
        # fMP4: mvhd carries 0 — prefer the declared mvex>mehd total
        # (movie timescale), else sum the fragments' sample durations
        # (media timescale per track, take the longest track)
        if mehd_duration and mvhd_timescale:
            out["duration_ms"] = int(round(mehd_duration * 1000 / mvhd_timescale))
        elif moof_track_dur:
            secs = [
                d / media_timescale[tid]
                for tid, d in moof_track_dur.items()
                if media_timescale.get(tid)
            ]
            if secs:
                out["duration_ms"] = int(round(max(secs) * 1000))
    return out


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio)

# bitrate (kbps) tables indexed [version_key][layer][idx]; version_key
# 1 = MPEG-1, 2 = MPEG-2/2.5 (which share a table)
_MP3_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],  # MPEG-2.5
}
# samples per frame [version_key][layer]
_MP3_SPF = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152, (2, 1): 384, (2, 2): 1152, (2, 3): 576}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). Size field is
    4 synchsafe (7-bit) bytes, excluding the 10-byte header."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):
        raise ValueError("corrupt ID3v2 synchsafe size")
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def probe_mp3(payload: bytes) -> dict:
    """Metadata from an MPEG audio stream without decoding samples:
    {duration_ms, sample_rate, codec}. Duration from the Xing/Info
    frame count when present (the VBR convention), else the CBR
    estimate from the first frame's bitrate."""
    pos = _id3v2_size(payload)
    # scan to the first frame sync (11 set bits), tolerating junk
    while pos + 4 <= len(payload):
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            b1, b2 = payload[pos + 1], payload[pos + 2]
            version_bits = (b1 >> 3) & 0x3
            layer_bits = (b1 >> 1) & 0x3
            rate_idx = (b2 >> 2) & 0x3
            br_idx = (b2 >> 4) & 0xF
            if version_bits != 1 and layer_bits != 0 and rate_idx != 3 and 0 < br_idx < 15:
                break
        pos += 1
    else:
        raise ValueError("no MPEG audio frame sync found")
    b1, b2, b3 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
    version_bits = (b1 >> 3) & 0x3
    layer = 4 - ((b1 >> 1) & 0x3)  # bits 3/2/1 → layer I/II/III
    vkey = 1 if version_bits == 3 else 2
    sample_rate = _MP3_RATES[version_bits][(b2 >> 2) & 0x3]
    bitrate = _MP3_BITRATES[(vkey, layer)][(b2 >> 4) & 0xF] * 1000
    spf = _MP3_SPF[(vkey, layer)]
    mono = ((b3 >> 6) & 0x3) == 3
    codec = {1: "mp3-layer1", 2: "mp3-layer2", 3: "mp3-layer3"}[layer]

    # Xing/Info header (VBR frame count) sits after the side info
    side = (17 if mono else 32) if vkey == 1 else (9 if mono else 17)
    tag_off = pos + 4 + side
    duration_ms = None
    if payload[tag_off : tag_off + 4] in (b"Xing", b"Info"):
        flags = int.from_bytes(payload[tag_off + 4 : tag_off + 8], "big")
        if flags & 0x1:  # frames field present
            n_frames = int.from_bytes(payload[tag_off + 8 : tag_off + 12], "big")
            duration_ms = int(round(n_frames * spf * 1000 / sample_rate))
    # VBRI (Fraunhofer VBR) sits at a FIXED 32 bytes after the frame
    # header regardless of side-info size; frame count at offset +14
    # (version 2 + delay 2 + quality 2 + bytes 4 precede it)
    vbri_off = pos + 4 + 32
    if duration_ms is None and payload[vbri_off : vbri_off + 4] == b"VBRI":
        n_frames = int.from_bytes(payload[vbri_off + 14 : vbri_off + 18], "big")
        if n_frames:
            duration_ms = int(round(n_frames * spf * 1000 / sample_rate))
    if duration_ms is None and bitrate:
        # CBR estimate over the audio bytes only: a trailing 128-byte
        # ID3v1 "TAG" block is metadata, not frames
        audio_end = len(payload)
        if len(payload) >= pos + 128 and payload[-128:-125] == b"TAG":
            audio_end -= 128
        duration_ms = int(round((audio_end - pos) * 8000 / bitrate))
    return {
        "duration_ms": duration_ms,
        "width": None,
        "height": None,
        "sample_rate": sample_rate,
        "codec": codec,
    }


# ---------------------------------------------------------------------------
# Sniff + probe over a DataFrame


def sniff_kind(payload: bytes) -> str:
    """Magic-byte container classification for every format the
    multimodal layer handles (decoded or metadata-only)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    return "unknown"


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# width/height/sample_rate stay 32-bit columns; clamp so a corrupt
# header produces a null, not an Arrow conversion failure mid-job
_INT32_MAX = 2**31 - 1


def _probe_one(payload: bytes) -> dict:
    """Probe one payload, isolating failures: a corrupt/truncated file
    yields its sniffed kind + an `error` message with null metadata,
    so one bad file cannot abort a whole-lake probe scan."""
    kind = sniff_kind(payload)
    meta = {
        "kind": kind,
        "n_bytes": len(payload),
        "duration_ms": None,
        "width": None,
        "height": None,
        "sample_rate": None,
        "codec": None,
        "error": None,
    }
    try:
        if kind == "mp4":
            meta.update(probe_mp4(payload))
        elif kind == "mp3":
            meta.update(probe_mp3(payload))
        elif kind == "wav":
            from etl_database_spark.functions.multimodal import _wav_fmt_and_data

            fmt, data = _wav_fmt_and_data(payload)
            if fmt is not None and len(fmt) >= 16:
                channels = int.from_bytes(fmt[2:4], "little") or 1
                rate = int.from_bytes(fmt[4:8], "little")
                bits = int.from_bytes(fmt[14:16], "little") or 8
                meta["sample_rate"] = rate
                meta["codec"] = {1: "pcm", 6: "g711-alaw", 7: "g711-ulaw"}.get(
                    int.from_bytes(fmt[0:2], "little"), "wav-other"
                )
                if data is not None and rate:
                    n = len(data) // max(channels * max(bits // 8, 1), 1)
                    meta["duration_ms"] = int(round(n * 1000 / rate))
    except (ValueError, IndexError) as exc:
        meta.update(
            {
                "duration_ms": None,
                "width": None,
                "height": None,
                "sample_rate": None,
                "codec": None,
                "error": str(exc)[:200],
            }
        )
    for col in ("width", "height", "sample_rate"):
        if meta[col] is not None and not (0 <= meta[col] <= _INT32_MAX):
            meta[col] = None
    return meta


def probe_media(
    df: DataFrame, media_col: str = "media", id_col: str = "id"
) -> DataFrame:
    """Typed per-media metadata via one Arrow-batched mapInPandas pass:
    (id, kind, n_bytes, duration_ms, width, height, sample_rate,
    codec). This is the ingest step of the metadata-first layout —
    every later filter runs on these columns, never the payload."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                meta = _probe_one(bytes(payload))
                meta["id"] = int(_id)
                rows.append(meta)
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, PROBE_SCHEMA)


def media_probe_stats(df: DataFrame, media_col: str = "media", id_col: str = "id") -> DataFrame:
    """Per-kind corpus stats from probed metadata — count, bytes and
    mean duration per container kind, one shuffle over counter-sized
    rows (the probe output, never payloads)."""
    from pyspark.sql import functions as F

    return (
        probe_media(df, media_col, id_col)
        .groupBy("kind")
        .agg(
            F.count("*").cast("long").alias("n_media"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
