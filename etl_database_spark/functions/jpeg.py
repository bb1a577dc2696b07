"""Baseline JPEG (ITU-T T.81) decoder in pure numpy + stdlib.

Scope: sequential DCT, Huffman-coded (SOF0) — the overwhelmingly
common variant — with 8-bit samples, grayscale or YCbCr (JFIF), one
interleaved scan, arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0),
and restart markers. Progressive (SOF2), arithmetic coding, and
12-bit precision return ``None`` so the caller's real-codec slot
stays explicit; corrupt streams raise rather than yield wrong pixels.

Used by the multimodal layer's metadata-first pipeline
(functions/multimodal.py): only rows selected for decoding reach this
code, Arrow-batched through mapInPandas, so Python-speed Huffman
walking is acceptable; swap in an imaging library for bulk pixel work.
Extension scope — the reference repo has no image path at all.
"""

from __future__ import annotations

import math

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_IDCT_A = None  # lazy 8x8 orthonormal DCT matrix


def _dct_matrix():
    global _IDCT_A
    if _IDCT_A is None:
        import numpy as np

        a = np.empty((8, 8))
        for u in range(8):
            c = math.sqrt(0.5) if u == 0 else 1.0
            for x in range(8):
                a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
        _IDCT_A = a
    return _IDCT_A


def _build_huffman(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C → {(bitlen, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first entropy-coded-segment reader with 0xFF00 unstuffing.
    Restart markers are consumed only via ``restart()``; hitting any
    other marker mid-stream raises."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
        # Mask consumed high bits before shifting: without this the
        # accumulator grows by ~7 bits per byte for the whole scan and
        # every bit extraction turns O(image size).
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Byte-align and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + expected:
            raise ValueError("missing restart marker")
        self.pos += 2

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(r: _BitReader, dc_tbl, ac_tbl, qt, pred: int):
    """One 8x8 block → (natural-order dequantized coefficient matrix,
    new DC predictor)."""
    import numpy as np

    coef = np.zeros(64)
    t = r.decode_symbol(dc_tbl)
    pred += _extend(r.read_bits(t), t) if t else 0
    coef[0] = pred * qt[0]
    k = 1
    while k < 64:
        rs = r.decode_symbol(ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        coef[k] = _extend(r.read_bits(size), size) * qt[k]
        k += 1
    block = np.zeros(64)
    block[_ZIGZAG] = coef
    return block.reshape(8, 8), pred


def decode_jpeg(payload: bytes):
    """Baseline JPEG → HxWx3 uint8 RGB array (grayscale replicated),
    or None if the payload is outside the baseline envelope."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    qtables[tid] = list(seg[i : i + 64])
                    i += 64
                else:
                    qtables[tid] = [
                        int.from_bytes(seg[i + 2 * j : i + 2 * j + 2], "big")
                        for j in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                counts = seg[i + 1 : i + 17]
                n = sum(counts)
                symbols = seg[i + 17 : i + 17 + n]
                huff[(cls, tid)] = _build_huffman(counts, symbols)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame type → real-codec slot
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tbl = {}
            for c in range(ns):
                cid, tids = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tbl[cid] = (tids >> 4, tids & 0x0F)
            return _decode_scan(
                payload, pos + ln, frame, scan_tbl, qtables, huff, restart_interval
            )
        pos += ln
    raise ValueError("no scan data in JPEG")


def _decode_scan(payload, pos, frame, scan_tbl, qtables, huff, restart_interval):
    import numpy as np

    a = _dct_matrix()
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    preds = [0] * len(comps)
    r = _BitReader(payload, pos)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            r.restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            dc_id, ac_id = scan_tbl[c["id"]]
            qt = qtables[c["q"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    block, preds[ci] = _decode_block(
                        r, huff[(0, dc_id)], huff[(1, ac_id)], qt, preds[ci]
                    )
                    px = a.T @ block @ a + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(out[0], 0, 255)
        return np.dstack([g, g, g]).round().astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.dstack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb]
    )
    return np.clip(rgb, 0, 255).round().astype(np.uint8)
