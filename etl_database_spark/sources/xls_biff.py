"""Stdlib reader for legacy binary ``.xls`` workbooks (BIFF8 in an
OLE2 compound document).

The reference converts legacy ``.xls`` with the xlrd engine
(systemscripts/xls_to_csv.py:64-78), and its primary upstream data
files ARE ``.xls`` (jobscripts/meetmax_url_download.py:113-157). This
module gives that path a zero-dependency implementation — the same
treatment the ``.xlsx`` branch got with the zipfile+ElementTree
reader — covering the record types tabular snapshot exports actually
contain: LABELSST/SST shared strings (with CONTINUE splits), LABEL
inline strings, NUMBER/RK/MULRK numerics, BOOLERR booleans, cached
FORMULA results, and BLANK/MULBLANK gaps.

Scope notes (documented simplifications, mirroring the .xlsx reader):
only the first worksheet is read; cell formats are ignored, so
date-formatted cells surface as Excel serial numbers (the pandas
engines, when installed, take precedence in the engine ladder and
keep their richer behavior); BIFF5/7 (pre-Excel-97) files raise.

File format references are public: [MS-CFB] for the compound
document, [MS-XLS] for BIFF8.
"""

from __future__ import annotations

import struct

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# CFB sector-chain sentinels (signed 32-bit views of FFFFFFFE etc.)
_ENDOFCHAIN = -2
_FREESECT = -1

# BIFF8 record opcodes
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207


def is_ole2(path: str) -> bool:
    """True when the file carries the OLE2 compound-document magic
    (every legacy .xls does; .xlsx is a zip and does not)."""
    with open(path, "rb") as f:
        return f.read(8) == _OLE_MAGIC


# ---------------------------------------------------------------------------
# [MS-CFB] compound document: locate and extract the Workbook stream.


def _chain(start: int, table: list[int], what: str) -> list[int]:
    out, s, seen = [], start, set()
    while s >= 0:
        if s in seen or s >= len(table):
            raise ValueError(f"corrupt {what} chain in compound document")
        seen.add(s)
        out.append(s)
        s = table[s]
    return out


def _cfb_workbook_stream(data: bytes) -> bytes:
    """Extract the 'Workbook' (or BIFF5-era 'Book') stream, following
    the FAT for large streams and the miniFAT for streams under the
    mini-stream cutoff, per [MS-CFB] 2.3-2.6."""
    if data[:8] != _OLE_MAGIC:
        raise ValueError("not an OLE2 compound document")
    sect_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    ssz, mssz = 1 << sect_shift, 1 << mini_shift
    num_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<i", data, 60)[0]
    difat_start = struct.unpack_from("<i", data, 68)[0]
    num_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = (i + 1) * ssz
        if off + ssz > len(data):
            # Writers may truncate the trailing sector; pad with zeros.
            return data[off:].ljust(ssz, b"\x00")
        return data[off : off + ssz]

    per_sector = ssz // 4
    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    for _ in range(num_difat):
        entries = struct.unpack(f"<{per_sector}i", sector(s))
        difat.extend(entries[:-1])
        s = entries[-1]
        if s < 0:
            break
    fat: list[int] = []
    fat_sectors = [x for x in difat if x >= 0][:num_fat]
    for fs in fat_sectors:
        fat.extend(struct.unpack(f"<{per_sector}i", sector(fs)))

    directory = b"".join(sector(s) for s in _chain(dir_start, fat, "directory"))
    root_start = root_size = None
    wb_start = wb_size = None
    for off in range(0, len(directory) - 127, 128):
        entry = directory[off : off + 128]
        name_len = struct.unpack_from("<H", entry, 64)[0]
        if name_len < 2:
            continue
        name = entry[: name_len - 2].decode("utf-16-le", errors="replace")
        etype = entry[66]
        start = struct.unpack_from("<i", entry, 116)[0]
        size = struct.unpack_from("<Q", entry, 120)[0]
        if ssz == 512:
            size &= 0xFFFFFFFF  # v3 files: only the low 4 bytes are valid
        if etype == 5:  # root storage: holds the mini stream
            root_start, root_size = start, size
        elif etype == 2 and name in ("Workbook", "Book"):
            wb_start, wb_size = start, size
    if wb_start is None:
        raise ValueError("no Workbook/Book stream in compound document")

    if wb_size < mini_cutoff:
        if root_start is None or minifat_start < 0:
            raise ValueError("mini stream missing for small Workbook stream")
        ministream = b"".join(sector(s) for s in _chain(root_start, fat, "mini stream"))
        ministream = ministream[:root_size]
        minifat: list[int] = []
        for s in _chain(minifat_start, fat, "miniFAT"):
            minifat.extend(struct.unpack(f"<{per_sector}i", sector(s)))
        raw = b"".join(
            ministream[s * mssz : (s + 1) * mssz]
            for s in _chain(wb_start, minifat, "Workbook miniFAT")
        )
    else:
        raw = b"".join(sector(s) for s in _chain(wb_start, fat, "Workbook"))
    return raw[:wb_size]


# ---------------------------------------------------------------------------
# BIFF8 record stream.


def _records(stream: bytes, pos: int = 0):
    """Yield (opcode, payload, next_pos) until the stream ends."""
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos + 4 + ln
        pos += 4 + ln


class _Chunks:
    """Byte reader over an SST payload plus its CONTINUE payloads.

    BIFF8 strings may split across CONTINUE records; at each split the
    continuation begins with a fresh option byte that can switch a
    string between compressed (8-bit) and UTF-16 encoding mid-string
    ([MS-XLS] 2.5.293). read_chars handles that re-spec; read_raw is a
    plain boundary-crossing read used for lengths, runs, and skips.
    """

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _advance(self) -> None:
        while self.ci < len(self.chunks) and self.pos >= len(self.chunks[self.ci]):
            self.ci += 1
            self.pos = 0

    def exhausted(self) -> bool:
        self._advance()
        return self.ci >= len(self.chunks)

    def read_raw(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.ci >= len(self.chunks):
                raise ValueError("truncated SST record")
            chunk = self.chunks[self.ci]
            take = min(n, len(chunk) - self.pos)
            out += chunk[self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_u8(self) -> int:
        return self.read_raw(1)[0]

    def read_u16(self) -> int:
        return struct.unpack("<H", self.read_raw(2))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self.read_raw(4))[0]

    def read_chars(self, cch: int, high: bool) -> str:
        out: list[str] = []
        while cch > 0:
            self._advance()
            if self.ci >= len(self.chunks):
                raise ValueError("truncated string in SST")
            chunk = self.chunks[self.ci]
            if self.pos == 0:
                # Character data beginning at a continuation boundary
                # carries a fresh option byte — including when the
                # split falls exactly between a string's header and
                # its first character (pos can only be 0 here after a
                # boundary crossing: the 3-byte header always precedes
                # the characters within its own chunk).
                high = bool(chunk[0] & 1)
                self.pos = 1
            width = 2 if high else 1
            avail = (len(chunk) - self.pos) // width
            take = min(cch, avail)
            if take == 0:
                # Lone odd byte at a chunk end can't happen for
                # spec-conforming writers; guard against loops anyway.
                raise ValueError("malformed string split in SST")
            raw = chunk[self.pos : self.pos + take * width]
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            self.pos += take * width
            cch -= take
        return "".join(out)

    def read_xl_string(self) -> str:
        """XLUnicodeRichExtendedString ([MS-XLS] 2.5.293)."""
        cch = self.read_u16()
        flags = self.read_u8()
        high = bool(flags & 0x01)
        rich = bool(flags & 0x08)
        ext = bool(flags & 0x04)
        c_run = self.read_u16() if rich else 0
        cb_ext = self.read_u32() if ext else 0
        s = self.read_chars(cch, high)
        if c_run:
            self.read_raw(4 * c_run)
        if cb_ext:
            self.read_raw(cb_ext)
        return s


def _parse_sst(chunks: list[bytes]) -> list[str]:
    rdr = _Chunks(chunks)
    rdr.read_u32()  # cstTotal
    unique = rdr.read_u32()
    return [rdr.read_xl_string() for _ in range(unique)]


def _inline_string(payload: bytes, off: int) -> str:
    """XLUnicodeRichExtendedString inline in a record (LABEL / STRING,
    [MS-XLS] 2.4.148): the rich (0x08) and ext (0x04) flags shift the
    character array past the cRun / cbExtRst fields."""
    cch = struct.unpack_from("<H", payload, off)[0]
    flags = payload[off + 2]
    high = bool(flags & 0x01)
    pos = off + 3
    if flags & 0x08:  # fRichSt: u16 cRun precedes the characters
        pos += 2
    if flags & 0x04:  # fExtSt: u32 cbExtRst precedes the characters
        pos += 4
    raw = payload[pos : pos + cch * (2 if high else 1)]
    return raw.decode("utf-16-le" if high else "latin-1")


def _decode_rk(v: int):
    """RK-compressed number ([MS-XLS] 2.5.217): bit0 = ÷100, bit1 =
    30-bit signed int vs. truncated IEEE double."""
    div100 = v & 1
    if v & 2:
        x = v >> 2
        if x >= 1 << 29:
            x -= 1 << 30
        num = x
    else:
        num = struct.unpack("<d", struct.pack("<Q", (v & 0xFFFFFFFC) << 32))[0]
    return num / 100 if div100 else num


def read_xls_stdlib(path: str) -> list[list]:
    """First worksheet of a BIFF8 .xls → list of ragged rows, shaped
    like the .xlsx stdlib reader's output (strings, int/float numbers,
    booleans, '' for blanks). Raises ValueError for pre-BIFF8 files."""
    with open(path, "rb") as f:
        data = f.read()
    stream = _cfb_workbook_stream(data)

    # --- workbook globals: BOF version check, SST, first sheet offset.
    sst: list[str] = []
    first_sheet_pos: int | None = None
    pending_sst: list[bytes] | None = None
    for op, payload, nxt in _records(stream):
        if op == _BOF:
            version = struct.unpack_from("<H", payload, 0)[0]
            if version < 0x0600:
                raise ValueError(f"unsupported pre-BIFF8 .xls (BOF version 0x{version:04x})")
        elif op == _SST:
            pending_sst = [payload]
        elif op == _CONTINUE and pending_sst is not None:
            pending_sst.append(payload)
        elif op == _BOUNDSHEET:
            pos = struct.unpack_from("<I", payload, 0)[0]
            sheet_type = payload[5]
            if sheet_type == 0 and first_sheet_pos is None:  # worksheet
                first_sheet_pos = pos
        elif op == _EOF:
            break
        if op not in (_SST, _CONTINUE) and pending_sst is not None:
            sst = _parse_sst(pending_sst)
            pending_sst = None
    if pending_sst is not None:
        sst = _parse_sst(pending_sst)
    if first_sheet_pos is None:
        raise ValueError("workbook has no worksheets")

    # --- worksheet substream: collect cell values.
    cells: dict[tuple[int, int], object] = {}
    pending_formula: tuple[int, int] | None = None
    for op, payload, nxt in _records(stream, first_sheet_pos):
        if op == _EOF:
            break
        if op == _LABELSST:
            r, c = struct.unpack_from("<HH", payload, 0)
            isst = struct.unpack_from("<I", payload, 6)[0]
            cells[(r, c)] = sst[isst] if isst < len(sst) else ""
        elif op == _LABEL:
            r, c = struct.unpack_from("<HH", payload, 0)
            cells[(r, c)] = _inline_string(payload, 6)
        elif op == _NUMBER:
            r, c = struct.unpack_from("<HH", payload, 0)
            d = struct.unpack_from("<d", payload, 6)[0]
            cells[(r, c)] = int(d) if d.is_integer() and abs(d) < 2**53 else d
        elif op == _RK:
            r, c = struct.unpack_from("<HH", payload, 0)
            cells[(r, c)] = _decode_rk(struct.unpack_from("<I", payload, 6)[0])
        elif op == _MULRK:
            r, c0 = struct.unpack_from("<HH", payload, 0)
            n_cells = (len(payload) - 6) // 6
            for i in range(n_cells):
                rk = struct.unpack_from("<I", payload, 4 + 6 * i + 2)[0]
                cells[(r, c0 + i)] = _decode_rk(rk)
        elif op == _BOOLERR:
            r, c = struct.unpack_from("<HH", payload, 0)
            val, is_err = payload[6], payload[7]
            cells[(r, c)] = "" if is_err else bool(val)
        elif op == _FORMULA:
            r, c = struct.unpack_from("<HH", payload, 0)
            result = payload[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # string result follows in a STRING record
                    pending_formula = (r, c)
                elif kind == 1:
                    cells[(r, c)] = bool(result[2])
                else:  # error / empty cached result
                    cells[(r, c)] = ""
            else:
                d = struct.unpack("<d", result)[0]
                cells[(r, c)] = int(d) if d.is_integer() and abs(d) < 2**53 else d
        elif op == _STRING and pending_formula is not None:
            cells[pending_formula] = _inline_string(payload, 0)
            pending_formula = None

    if not cells:
        return []
    by_row: dict[int, dict[int, object]] = {}
    for (r, c), v in cells.items():
        by_row.setdefault(r, {})[c] = v
    n_rows = max(by_row) + 1
    rows: list[list] = []
    for r in range(n_rows):
        row = by_row.get(r)
        width = max(row) + 1 if row else 0
        rows.append([row.get(c, "") for c in range(width)] if row else [])
    return rows
