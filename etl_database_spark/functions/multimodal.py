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
- codec policy: formats the Python standard library + numpy can
  decode are decoded FOR REAL — BMP (BI_RGB 24-bit + 8-bit paletted),
  binary PPM (P6), PNG at every spec-valid depth/color combination
  (1/2/4/8/16-bit gray+palette, 8/16-bit RGB/alpha, sequential or
  Adam7, zlib inflate + per-row unfiltering), GIF87a/89a (LZW, first
  frame), baseline + progressive JPEG (functions/jpeg.py: Huffman +
  IDCT + chroma upsampling, spectral selection and successive
  approximation) images, MJPEG AVI video (RIFF walk + per-frame
  JPEG), and PCM / G.711 μ-law / A-law WAV audio — with real
  pixel/sample math for features and resizing; the remaining
  compressed formats (arithmetic-coded JPEG, MP3/AAC, non-MJPEG
  video) raise NotImplementedError at the marked slot until an
  imaging/audio library is present. ``fake=True``
  selects the deterministic digest-based decoder for pipeline tests
  that don't care about payload contents;
- METADATA for MP4 and MP3 needs no codec at all:
  functions/mediameta.py walks ISO-BMFF boxes / MPEG audio frame
  headers with the stdlib, so duration/dimensions/codec/sample-rate
  land as typed columns (``probe_media``) even for containers whose
  sample decode stays a library slot.
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _unfilter_png_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> bytearray:
    """Reverse one scanline's PNG filter (spec §9: None/Sub/Up/
    Average/Paeth, all arithmetic mod 256). Sequential by definition —
    Sub/Average/Paeth reference the just-reconstructed left neighbor."""
    n = len(row)
    recon = bytearray(row)
    if ftype == 0:
        return recon
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            recon[i] = (recon[i] + recon[i - bpp]) & 0xFF
        return recon
    if ftype == 2:  # Up
        for i in range(n):
            recon[i] = (recon[i] + prev[i]) & 0xFF
        return recon
    if ftype == 3:  # Average
        for i in range(n):
            left = recon[i - bpp] if i >= bpp else 0
            recon[i] = (recon[i] + ((left + prev[i]) >> 1)) & 0xFF
        return recon
    if ftype == 4:  # Paeth
        for i in range(n):
            a = recon[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            recon[i] = (recon[i] + pred) & 0xFF
        return recon
    raise ValueError(f"bad PNG filter type {ftype}")


def _unfilter_png_image(raw, offset, width, height, ch, depth):
    """Unfilter one (sub-)image of ``height`` scanlines starting at
    ``offset`` in the inflated stream → (HxWxch uint8 sample array,
    bytes consumed). Shared by the sequential and Adam7 paths.
    Filters operate on bytes with bpp = ceil(bits-per-pixel / 8)
    (PNG spec §9); sample extraction then depends on the depth:
    16-bit keeps the high byte, sub-byte depths unpack MSB-first."""
    import numpy as np

    bits_px = ch * depth
    stride = (width * bits_px + 7) // 8
    bpp = max(1, bits_px // 8)
    if len(raw) - offset < (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytes(stride)
    for r in range(height):
        off = offset + r * (stride + 1)
        recon = _unfilter_png_row(
            raw[off], bytearray(raw[off + 1 : off + 1 + stride]), prev, bpp
        )
        out[r] = np.frombuffer(bytes(recon), dtype=np.uint8)
        prev = bytes(recon)
    consumed = (stride + 1) * height
    if depth == 8:
        return out[:, : width * ch].reshape(height, width, ch), consumed
    if depth == 16:
        pairs = out[:, : width * ch * 2].reshape(height, width, ch, 2)
        return pairs[..., 0].copy(), consumed  # high byte == value >> 8
    # 1/2/4-bit: single-channel only (gray or palette indices)
    bits = np.unpackbits(out, axis=1)[:, : width * depth]
    grouped = bits.reshape(height, width, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (grouped * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :, None], consumed


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _decode_png(payload: bytes):
    """PNG → HxWx3 uint8 array via stdlib zlib: chunk walk, IDAT
    inflate, per-row unfilter. Supported: every spec-valid
    depth/color combination — color types 0 (grayscale), 2 (RGB), 3
    (palette), 4 (gray+alpha), 6 (RGBA); depths 8/16 everywhere plus
    1/2/4 for gray and palette — sequential or Adam7-interlaced.
    16-bit keeps the high byte, sub-byte gray scales to 8-bit, alpha
    is dropped. Returns None only for spec-invalid combinations.
    Per-byte unfiltering is Python-speed — fine for the
    metadata-first pipeline shape where only selected rows are
    decoded; swap in an imaging library for bulk pixel work."""
    import zlib

    import numpy as np

    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type = data[8], data[9]
            interlace = data[12]
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + payload-less CRC skip
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    depth_ok = bit_depth in (8, 16) or (
        bit_depth in (1, 2, 4) and color_type in (0, 3)
    )
    if (
        width is None
        or channels is None
        or not depth_ok
        or (color_type == 3 and bit_depth == 16)  # invalid per spec
        or interlace not in (0, 1)
    ):
        return None
    if color_type == 3 and palette is None:
        raise ValueError("paletted PNG without PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        px, _ = _unfilter_png_image(raw, 0, width, height, channels, bit_depth)
    else:
        px = np.empty((height, width, channels), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            sub, used = _unfilter_png_image(raw, offset, pw, ph, channels, bit_depth)
            px[y0::dy, x0::dx] = sub
            offset += used
    if color_type == 3:
        if int(px.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[px[:, :, 0]].copy()
    if bit_depth in (1, 2, 4):  # sub-byte grayscale → scale to 8-bit
        px = (px.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)).astype(np.uint8)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy() if channels == 4 else px.copy()


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW → pixel index list. LSB-first bit packing,
    CLEAR/EOI codes, dictionary grows to 12-bit width (GIF89a spec
    appendix F). Pure stdlib — the dictionary holds index tuples."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset_table():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]  # CLEAR/EOI slots
        width = min_code_size + 1
        prev = None

    reset_table()
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset_table()
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                # Deferred clear (spec-legal): once the table is full the
                # encoder stops adding entries, so the decoder must too —
                # growing past 4096 would desync every later code.
                if len(table) < 4096:
                    table.append(prev + (entry[0],))
            elif code == len(table) and len(table) < 4096:  # the KwK case
                entry = prev + (prev[0],)
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            # Width grows when the NEXT code would not fit; 12-bit cap.
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _decode_gif(payload: bytes):
    """GIF87a/89a → HxWx3 uint8 array via stdlib LZW: logical-screen
    palette, first image frame only (animation = frame 1), local
    palette and interlacing honored, transparency ignored (the
    transparent index renders as its palette color). Returns None only
    for payloads without a decodable first frame."""
    import numpy as np

    if len(payload) < 13:
        return None
    gw = int.from_bytes(payload[6:8], "little")
    gh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + len-prefixed sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
            h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
            ipacked = payload[pos + 8]
            pos += 9
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                return None
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _gif_lzw_decode(bytes(lzw), min_code)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            grid = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
            if ipacked & 0x40:  # interlaced: 4-pass row order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                deinter = np.empty_like(grid)
                deinter[order] = grid
                grid = deinter
            if int(grid.max(initial=0)) >= len(pal):
                raise ValueError("GIF index outside palette")
            px = pal[grid]
            # Frames smaller than the logical screen are composited
            # onto it only for animations; a single-frame decode is the
            # frame itself — matches what feature math should see.
            del gw, gh
            return px.astype(np.uint8)
        elif block == 0x3B:  # trailer
            break
        else:
            return None
    return None


def _decode_pixels(payload: bytes):
    """Decode an image payload to an HxWx3 uint8 numpy array.
    Supports BMP (BI_RGB 24-bit), binary PPM (P6), 8-bit truecolor
    PNG, and GIF87a/89a (first frame) — the formats a stdlib-only
    build can read. Returns None for other (compressed) formats."""
    import numpy as np

    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from etl_database_spark.functions.jpeg import decode_jpeg

        # None for out-of-envelope variants (arithmetic/12-bit) →
        # stays at the real-codec slot below.
        return decode_jpeg(payload)

    if payload[:2] == b"BM" and len(payload) >= 54:
        data_off = int.from_bytes(payload[10:14], "little")
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if compression != 0 or bpp not in (8, 24):
            return None  # compressed / other depths → real-codec slot
        top_down = height < 0
        height = abs(height)
        if bpp == 8:  # paletted: BGRA entries follow the info header
            hdr_size = int.from_bytes(payload[14:18], "little")
            clr_used = int.from_bytes(payload[46:50], "little") or 256
            pal = (
                np.frombuffer(payload, np.uint8, clr_used * 4, 14 + hdr_size)
                .reshape(-1, 4)[:, 2::-1]  # BGRA → RGB
            )
            row_bytes = (width + 3) & ~3
            idx = np.frombuffer(
                payload, np.uint8, row_bytes * height, data_off
            ).reshape(height, row_bytes)[:, :width]
            if not top_down:
                idx = idx[::-1]
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("BMP palette index out of range")
            return pal[idx].copy()
        row_bytes = (width * 3 + 3) & ~3  # rows padded to 4 bytes
        px = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
        ).reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
        if not top_down:
            px = px[::-1]  # BMP stores bottom-up
        return px[:, :, ::-1].copy()  # BGR → RGB
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws>
        parts, i = [], 2
        while len(parts) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment line
                i = payload.index(b"\n", i) + 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            parts.append(int(payload[i:j]))
            i = j
        i += 1  # the single whitespace after maxval
        width, height, _maxval = parts
        return (
            np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=i)
            .reshape(height, width, 3)
            .copy()
        )
    return None


def _pixel_features(px) -> list[float]:
    """8-dim real feature vector from decoded pixels: per-channel
    mean/std plus luminance mean/std, all normalized to [0,1]."""
    import numpy as np

    f = px.astype(np.float64) / 255.0
    luma = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    feats = [
        f[:, :, 0].mean(), f[:, :, 1].mean(), f[:, :, 2].mean(),
        f[:, :, 0].std(), f[:, :, 1].std(), f[:, :, 2].std(),
        luma.mean(), luma.std(),
    ]
    return [round(float(x), 6) for x in feats]


def _decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode for stdlib-readable formats (uncompressed BMP / P6
    PPM): true dimensions + pixel-statistics features.

    REAL-CODEC SLOT for everything else (JPEG/PNG/...): requires an
    imaging library not present in this build."""
    px = _decode_pixels(payload)
    if px is None:
        raise NotImplementedError(
            "compressed-image decode requires an imaging library not present "
            "in this build; plug a real decoder into _decode_image_real"
        )
    h, w = px.shape[:2]
    return w, h, _pixel_features(px)


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


IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def _dhash64(px) -> int:
    """64-bit difference hash (dHash): block-mean the luma plane to an
    8x9 grid, emit one bit per horizontal gradient sign. Perceptual:
    invariant to container format, re-encoding, and global brightness
    shifts (gradient signs survive +c); small edits flip few bits, so
    near-duplicate images sit at small Hamming distance — the image
    analog of SimHash, and it reuses SimHash's banded blocking."""
    import numpy as np

    f = px.astype(np.float64)
    luma = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    h, w = luma.shape
    redges = np.linspace(0, h, 9).astype(int)
    cedges = np.linspace(0, w, 10).astype(int)
    cells = np.empty((8, 9))
    for i in range(8):
        r0, r1 = redges[i], max(redges[i + 1], redges[i] + 1)
        for j in range(9):
            c0, c1 = cedges[j], max(cedges[j + 1], cedges[j] + 1)
            cells[i, j] = luma[min(r0, h - 1) : min(r1, h), min(c0, w - 1) : min(c1, w)].mean()
    bits = cells[:, 1:] > cells[:, :-1]
    val = 0
    for k, b in enumerate(bits.flatten()):
        if b:
            val |= 1 << k
    if val >= 1 << 63:  # store as signed LongType
        val -= 1 << 64
    return val


def _dhash_fake(payload: bytes) -> int:
    digest = hashlib.sha256(payload).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def image_dhash(
    df: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    fake: bool = False,
) -> DataFrame:
    """Perceptual 64-bit dHash per image via mapInPandas →
    (id, n_bytes, sha256, dhash). Real path decodes the stdlib
    formats (BMP/PPM/PNG/GIF/baseline+progressive JPEG); other
    formats raise at the documented real-codec slot."""

    def one(payload: bytes) -> int:
        if fake:
            return _dhash_fake(payload)
        px = _decode_pixels(payload)
        if px is None:
            raise NotImplementedError(
                "image hash for compressed formats beyond the stdlib "
                "envelope requires an imaging library; plug a decoder "
                "into _decode_pixels"
            )
        return _dhash64(px)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                rows.append(
                    {
                        "id": int(_id),
                        "n_bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "dhash": one(data),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_HASH_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, IMAGE_HASH_SCHEMA)


def image_near_duplicates(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs from dhash rows: SimHash's 4x16-bit
    pigeonhole blocking + popcount verify (sound for Hamming <= 3) —
    one banded equi-join, never all-pairs. → (id_a, id_b, hamming)."""
    from etl_database_spark.functions.dedup import simhash_near_duplicates

    fps = hashes.select(F.col("id").alias("_id"), F.col("dhash").alias("simhash"))
    return simhash_near_duplicates(fps, max_hamming)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _encode_ppm(px) -> bytes:
    """Re-encode pixels as binary PPM (the simplest lossless container
    — output format for all stdlib-path resizes)."""
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _resize_image_real(payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Real nearest-neighbor resize for stdlib-readable formats
    (uncompressed BMP / P6 PPM), re-encoded as PPM.

    REAL-CODEC SLOT for compressed formats: requires an imaging
    library not present in this build."""
    import numpy as np

    px = _decode_pixels(payload)
    if px is None:
        raise NotImplementedError(
            "compressed-image resize requires an imaging library not present "
            "in this build; plug a real codec into _resize_image_real"
        )
    h, w = px.shape[:2]
    scale = min(1.0, max_side / max(w, h))
    new_w, new_h = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(new_h) * (h / new_h)).astype(int)
    xs = (np.arange(new_w) * (w / new_w)).astype(int)
    resized = px[ys][:, xs]
    return _encode_ppm(resized), new_w, new_h


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


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("luma_mean", T.FloatType(), True),
        T.StructField("luma_std", T.FloatType(), True),
    ]
)


def _iter_avi_mjpeg_frames(payload: bytes):
    """Walk a RIFF/AVI container and yield (frame_idx, jpeg_bytes) for
    an MJPEG video stream — each '##dc' movi chunk of a Motion-JPEG
    AVI is a standalone baseline JPEG, which functions/jpeg.py decodes
    with no external library. Non-MJPEG AVIs raise at the real-codec
    slot; structurally broken containers raise ValueError.

    The chunk walk is offset arithmetic only — a skipped frame is
    never decoded, so every_n sampling touches just the sampled
    frames' bytes (same metadata-first shape as the y4m path)."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    vids_handler = None
    vids_stream: int | None = None
    frames: list[tuple[int, int]] = []  # (offset, size) of stream chunks

    def walk(start: int, end: int, depth: int) -> None:
        nonlocal vids_handler, vids_stream
        pos = start
        stream_counter = 0
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = pos + 8
            if body + size > end:
                raise ValueError(f"truncated AVI chunk {cid!r} at byte {pos}")
            if cid == b"LIST":
                subtype = payload[body : body + 4]
                # 'rec ' groups interleave chunks inside movi — walk
                # through them or their frames are silently dropped.
                if subtype in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk(body + 4, body + size, depth + 1)
            elif cid == b"strh":
                fcc_type = payload[body : body + 4]
                handler = payload[body + 4 : body + 8]
                if fcc_type == b"vids" and vids_stream is None:
                    vids_handler = handler
                    vids_stream = stream_counter
                stream_counter += 1
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                try:
                    stream_no = int(cid[:2])
                except ValueError:
                    stream_no = -1
                if vids_stream is not None and stream_no == vids_stream:
                    frames.append((body, size))
            pos = body + size + (size & 1)  # chunks pad to even

    walk(12, len(payload), 0)
    if vids_stream is None:
        raise ValueError("AVI has no video stream header")
    if vids_handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            "compressed-video decode beyond MJPEG requires a video library "
            f"not present in this build (AVI handler {vids_handler!r})"
        )
    for idx, (off, size) in enumerate(frames):
        yield idx, payload[off : off + size]


def _iter_y4m_frames(payload: bytes):
    """Parse a YUV4MPEG2 (.y4m) stream — a stdlib-decodable raw video
    container: text header, then 'FRAME\\n' + planar YUV420 data.
    Yields (frame_idx, width, height, luma_plane bytes)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "compressed-video decode requires a video library not present "
            "in this build; YUV4MPEG2 (.y4m) and MJPEG AVI parse natively"
        )
    hdr_end = payload.index(b"\n")
    width = height = None
    colorspace = b"420"
    for tok in payload[:hdr_end].split(b" ")[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:]
    if width is None or height is None:
        raise ValueError("y4m header missing W/H")
    if not colorspace.startswith(b"420"):
        raise NotImplementedError(f"unsupported y4m colorspace {colorspace!r}")
    luma_len = width * height
    frame_len = luma_len + luma_len // 2  # 4:2:0 chroma
    pos, idx = hdr_end + 1, 0
    while pos < len(payload):
        line_end = payload.find(b"\n", pos)
        if line_end < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad or truncated FRAME marker at byte {pos}")
        pos = line_end + 1
        luma = payload[pos : pos + luma_len]
        if len(luma) < luma_len or len(payload) - pos < frame_len:
            # A partial plane would yield silently wrong statistics —
            # malformed input must fail loudly like every other path.
            raise ValueError(f"truncated y4m frame {idx} at byte {pos}")
        yield idx, width, height, luma
        pos += frame_len
        idx += 1


def video_frame_features(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "id",
    media_col: str = "media",
) -> DataFrame:
    """REAL frame sampling + per-frame luma statistics for raw
    YUV4MPEG2 and MJPEG-AVI video payloads via mapInPandas (every
    ``every_n``-th frame; other compressed containers raise at the
    documented slot). Same Arrow-batch shape as the image/audio
    stages — at 100 TB the payloads stream through Python once per
    batch and only the sampled frames are decoded (both container
    layouts allow direct frame seeks)."""
    import numpy as np

    def frame_row(_id, idx, w, h, y):
        return {
            "id": int(_id),
            "frame_idx": idx,
            "width": w,
            "height": h,
            "luma_mean": round(float(y.mean()), 6),
            "luma_std": round(float(y.std()), 6),
        }

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_database_spark.functions.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    for idx, jpeg in _iter_avi_mjpeg_frames(data):
                        if idx % every_n:
                            continue
                        rgb = decode_jpeg(jpeg)
                        if rgb is None:
                            raise NotImplementedError(
                                "non-baseline JPEG inside MJPEG AVI requires an "
                                "imaging library not present in this build"
                            )
                        f = rgb.astype(np.float64) / 255.0
                        # BT.601 luma — same weights the MJPEG encoder used,
                        # so stats line up with the y4m path's Y' plane
                        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
                        rows.append(
                            frame_row(_id, idx, rgb.shape[1], rgb.shape[0], y)
                        )
                    continue
                for idx, w, h, luma in _iter_y4m_frames(data):
                    if idx % every_n:
                        continue
                    y = np.frombuffer(luma, dtype=np.uint8).astype(np.float64) / 255.0
                    rows.append(frame_row(_id, idx, w, h, y))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, FRAME_FEATURES_SCHEMA)


FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def video_frame_hashes(
    df: DataFrame,
    every_n: int = 5,
    id_col: str = "id",
    media_col: str = "media",
) -> DataFrame:
    """Perceptual dHash of every ``every_n``-th frame of raw
    YUV4MPEG2 / MJPEG-AVI payloads → (id, frame_idx, dhash). The luma
    plane is hashed directly (the image dHash is luma-based anyway),
    so y4m and MJPEG encodings of the same footage produce comparable
    hashes."""
    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_database_spark.functions.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    frames = (
                        (idx, decode_jpeg(jpeg))
                        for idx, jpeg in _iter_avi_mjpeg_frames(data)
                    )
                    for idx, rgb in frames:
                        if idx % every_n:
                            continue
                        if rgb is None:
                            raise NotImplementedError(
                                "non-baseline JPEG inside MJPEG AVI requires an "
                                "imaging library not present in this build"
                            )
                        rows.append(
                            {"id": int(_id), "frame_idx": idx, "dhash": _dhash64(rgb)}
                        )
                    continue
                for idx, w, h, luma in _iter_y4m_frames(data):
                    if idx % every_n:
                        continue
                    y = np.frombuffer(luma, dtype=np.uint8).reshape(h, w)
                    gray = np.repeat(y[:, :, None], 3, axis=2)
                    rows.append(
                        {"id": int(_id), "frame_idx": idx, "dhash": _dhash64(gray)}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_HASH_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, FRAME_HASH_SCHEMA)


def video_near_duplicates(
    frame_hashes: DataFrame, max_hamming: int = 3, min_matched_frames: int = 2
) -> DataFrame:
    """Near-duplicate video pairs: per-frame banded blocking (the
    SimHash 4x16-bit pigeonhole) + popcount verify, then a per-pair
    count of matched sampled frames. One banded equi-join over frame
    rows — never all-pairs over videos or frames.
    → (id_a, id_b, matched_frames)."""
    bands = frame_hashes.select(
        F.col("id").alias("vid"),
        F.col("frame_idx").alias("fidx"),
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright("dhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("vid", "fidx", "dhash", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.fidx").alias("fidx_a"),
            F.col("b.fidx").alias("fidx_b"),
            F.col("a.dhash").alias("h_a"),
            F.col("b.dhash").alias("h_b"),
        )
        .distinct()
    )
    verified = cands.where(
        F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= max_hamming
    )
    return (
        verified.groupBy("id_a", "id_b")
        .agg(F.countDistinct("fidx_a").cast("long").alias("matched_frames"))
        .where(F.col("matched_frames") >= min_matched_frames)
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "id") -> DataFrame:
    """Video frame-sampling *plan*: explode per-media frame indices
    (metadata-driven — requires a frame_count column) without touching
    payloads; the decode of selected frames is a second mapInPandas
    stage. Demonstrates the metadata-first pattern: the expensive
    binary stage only sees rows that survived frame selection."""
    return (
        df.select(id_col, "frame_count")
        # zero-frame rows yield zero samples; without the guard the
        # sequence(0, -1, n) bound is illegal and fails the whole job
        .where(F.col("frame_count") > 0)
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


_G711_TABLES: dict[int, "object"] = {}


def _g711_table(law: int):
    """256-entry decode table for G.711 companded bytes → 16-bit
    linear PCM (law 7 = μ-law, 6 = A-law; the WAVE format codes)."""
    import numpy as np

    tbl = _G711_TABLES.get(law)
    if tbl is not None:
        return tbl
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        if law == 7:  # μ-law: stored complemented
            u = ~b & 0xFF
            seg = (u >> 4) & 0x07
            quant = u & 0x0F
            mag = (((quant << 3) + 0x84) << seg) - 0x84
            out[b] = -mag if u & 0x80 else mag
        else:  # A-law: even bits inverted
            a = b ^ 0x55
            seg = (a & 0x70) >> 4
            quant = a & 0x0F
            if seg == 0:
                mag = (quant << 4) + 8
            else:
                mag = ((quant << 4) + 0x108) << (seg - 1)
            out[b] = mag if a & 0x80 else -mag
    _G711_TABLES[law] = out
    return out


def _wav_fmt_and_data(payload: bytes):
    """RIFF/WAVE chunk walk → (fmt chunk bytes, data chunk bytes)."""
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(payload):
            raise ValueError(f"truncated WAV chunk {cid!r} at byte {pos}")
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return fmt, data


def _decode_audio_real(payload: bytes) -> tuple[int, int, float]:
    """Real decode for PCM WAV (stdlib ``wave``) and G.711 μ-law /
    A-law WAV (format codes 7/6, expanded via the standard segment
    formulas) → (duration_ms, sample_rate, rms in [0,1], averaged
    across channels).

    REAL-CODEC SLOT for compressed audio (MP3/AAC/...): requires an
    audio library not present in this build."""
    import io
    import wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed-audio decode requires an audio library not present "
            "in this build; plug a real decoder into _decode_audio_real"
        )
    fmt, data = _wav_fmt_and_data(payload)
    if fmt is not None and len(fmt) >= 8:
        audio_format = int.from_bytes(fmt[0:2], "little")
        if audio_format in (6, 7):
            if data is None:
                raise ValueError("G.711 WAV without a data chunk")
            channels = int.from_bytes(fmt[2:4], "little") or 1
            rate = int.from_bytes(fmt[4:8], "little")
            x = _g711_table(audio_format)[np.frombuffer(data, np.uint8)].astype(
                np.float64
            )
            n = len(x) // channels
            rms = float(np.sqrt(np.mean(np.square(x / 32768.0)))) if len(x) else 0.0
            duration_ms = int(round(n * 1000 / rate)) if rate else 0
            return duration_ms, rate, round(rms, 6)
    with wave.open(io.BytesIO(payload)) as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        x = x - 128.0  # 8-bit WAV is unsigned
    full_scale = float(2 ** (8 * width - 1))
    rms = float(np.sqrt(np.mean(np.square(x / full_scale)))) if len(x) else 0.0
    duration_ms = int(round(n * 1000 / rate)) if rate else 0
    return duration_ms, rate, round(rms, 6)


def _decode_audio_fake(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake audio decoder: duration/rate/level derived
    from the payload digest (pipeline tests, codec-less builds)."""
    digest = hashlib.sha256(payload).digest()
    duration_ms = 250 + int.from_bytes(digest[0:2], "big") % 30_000
    sample_rate = (8, 16, 22, 44)[digest[2] % 4] * 1000
    rms = round(digest[3] / 255.0, 6)
    return duration_ms, sample_rate, rms


AUDIO_HASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("afp", T.LongType(), True),
    ]
)


def _decode_audio_samples(payload: bytes):
    """→ (mono float64 in [-1, 1], rate). Same stdlib WAV envelope as
    :func:`_decode_audio_real` (PCM via ``wave``, G.711 via the
    tables); multi-channel audio is averaged to mono per frame."""
    import io
    import wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed-audio decode requires an audio library not present "
            "in this build; plug a real decoder into _decode_audio_samples"
        )
    fmt, data = _wav_fmt_and_data(payload)
    if fmt is not None and len(fmt) >= 8:
        audio_format = int.from_bytes(fmt[0:2], "little")
        if audio_format in (6, 7):
            channels = int.from_bytes(fmt[2:4], "little") or 1
            rate = int.from_bytes(fmt[4:8], "little")
            x = _g711_table(audio_format)[np.frombuffer(data or b"", np.uint8)]
            x = x.astype(np.float64) / 32768.0
            n = len(x) // channels
            return x[: n * channels].reshape(n, channels).mean(axis=1), rate
    with wave.open(io.BytesIO(payload)) as wf:
        rate = wf.getframerate()
        channels = wf.getnchannels() or 1
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        x = x - 128.0
    x = x / float(2 ** (8 * width - 1))
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels).mean(axis=1), rate


def _audio_fingerprint64(mono, rate) -> int:
    """64-bit spectrogram-gradient fingerprint: 9 equal time slices,
    8 log-spaced rFFT band energies each, one bit per band's energy
    gradient along time — the audio analog of the image dHash.
    Gain-invariant (scaling every energy preserves gradient signs);
    re-quantization (e.g. G.711) flips few bits; different spectral
    content lands far away in Hamming space."""
    import numpy as np

    if len(mono) < 18:
        return 0
    edges = np.linspace(0, len(mono), 10).astype(int)
    bands = np.empty((9, 8))
    for t in range(9):
        seg = mono[edges[t] : max(edges[t + 1], edges[t] + 1)]
        spec = np.abs(np.fft.rfft(seg))
        if len(spec) < 2:
            bands[t] = 0.0
            continue
        bedges = np.geomspace(1, len(spec), 9)
        for b in range(8):
            lo = int(bedges[b])
            hi = max(int(bedges[b + 1]), lo + 1)
            bands[t, b] = spec[lo : min(hi, len(spec))].mean() if lo < len(spec) else 0.0
    bits = bands[1:, :] > bands[:-1, :]
    val = 0
    for k, b in enumerate(bits.flatten()):
        if b:
            val |= 1 << k
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    fake: bool = False,
) -> DataFrame:
    """Perceptual 64-bit audio fingerprint per clip via mapInPandas →
    (id, n_bytes, sha256, afp)."""

    def one(payload: bytes) -> int:
        if fake:
            return _dhash_fake(payload)
        mono, rate = _decode_audio_samples(payload)
        return _audio_fingerprint64(mono, rate)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                rows.append(
                    {
                        "id": int(_id),
                        "n_bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "afp": one(data),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_HASH_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(process, AUDIO_HASH_SCHEMA)


def audio_near_duplicates(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate clip pairs from fingerprint rows — same banded
    blocking as the image/text SimHash family."""
    from etl_database_spark.functions.dedup import simhash_near_duplicates

    fps = hashes.select(F.col("id").alias("_id"), F.col("afp").alias("simhash"))
    return simhash_near_duplicates(fps, max_hamming)


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
        # zero-duration rows yield zero segments (sequence(0,-1) guard)
        .where(F.col(duration_col) > 0)
        .select(id_col, duration_col, start)
        .select(
            id_col,
            "seg_start_ms",
            F.least(F.col("seg_start_ms") + segment_ms, F.col(duration_col)).alias(
                "seg_end_ms"
            ),
        )
    )
