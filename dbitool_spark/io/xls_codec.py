"""Minimal legacy .xls (BIFF8) codec — stdlib struct only, no Excel
engine required.

Closes the last spreadsheetread gap (reference handles .xls via
Spreadsheet::Read, scripts/dbitool.pl:2696-2784): same approach as
io/xlsx_codec.py and io/bson_io.py — when the environment lacks a
library for a niche bounded format, implement the PUBLIC spec subset
directly rather than stub. Both layers of .xls are published:

- the container is CFB (Compound File Binary, [MS-CFB]): 512-byte
  header, FAT of 512-byte sectors, a directory of 128-byte entries,
  and a mini-FAT of 64-byte minisectors inside the root entry's
  ministream for streams under 4096 bytes;
- the workbook stream is BIFF8 ([MS-XLS]): length-prefixed records —
  BOF/BOUNDSHEET/SST in the workbook globals, then one substream per
  sheet with DIMENSIONS and cell records.

Subset: the records that carry DATA. Writer emits BOF, CODEPAGE, SST,
BOUNDSHEET, EOF + per sheet BOF, DIMENSIONS, NUMBER (IEEE double
cells), LABELSST (shared-string cells), EOF — no fonts/XF/styling
(our reader and every data-level consumer ignore them). Reader walks
records and understands NUMBER, RK (both integer and x100 forms),
LABELSST, LABEL, MULRK and SST with CONTINUE continuation (including
the per-boundary grbit re-statement and richtext/phonetic tails), so
it reads real-world data sheets, not just its own output.

Everything is bounded/driver-side by design, exactly like the xlsx
codec — whole-sheet formats are in-memory by nature (the reference
buffers them too; --memorylimit is the guard at the caller).

Values surface as strings (the reference's stringly-typed model,
SURVEY §1.3); numeric cells format Excel-"General"-style: integral
doubles drop the trailing .0, so a round-trip through typed columns
re-casts cleanly.
"""

from __future__ import annotations

import math
import struct

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_SECT = 512
_MINI_SECT = 64
_MINI_CUTOFF = 4096
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF

_MAX_RECORD = 8224  # BIFF8 record-body ceiling ([MS-XLS] 2.1.4)


# ======================================================================
# CFB container
# ======================================================================


def _cfb_write(stream_name: str, payload: bytes) -> bytes:
    """Build a minimal single-stream CFB file. Streams under the 4096
    cutoff live in the ministream (per spec — real readers follow the
    rule strictly); larger ones chain regular sectors."""

    def pad(b: bytes, size: int) -> bytes:
        return b + b"\x00" * (-len(b) % size)

    use_mini = len(payload) < _MINI_CUTOFF
    sectors: list[bytes] = []  # regular sectors, in order after the FAT

    if use_mini:
        mini = pad(payload, _MINI_SECT)
        n_mini = len(mini) // _MINI_SECT
        # mini-FAT: one chain 0..n_mini-1
        minifat = b"".join(
            struct.pack("<I", i + 1 if i + 1 < n_mini else _ENDOFCHAIN)
            for i in range(n_mini)
        )
        # unused mini-FAT slots are FREESECT (0xFFFFFFFF) per spec —
        # pad with 0xff BEFORE slicing so the fill actually lands
        minifat = minifat + b"\xff" * (-len(minifat) % _SECT or _SECT * (not minifat))
        minifat_sectors = [
            minifat[i : i + _SECT] for i in range(0, len(minifat), _SECT)
        ]
        ministream_sectors = [mini[i : i + _SECT] for i in range(0, len(mini), _SECT)]
    else:
        data = pad(payload, _SECT)
        stream_sectors = [data[i : i + _SECT] for i in range(0, len(data), _SECT)]

    # directory: Root Entry + the stream + 2 free = 1 sector
    def dirent(
        name: str, etype: int, start: int, size: int, child: int = _NOSTREAM
    ) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        ent = raw.ljust(64, b"\x00")
        ent += struct.pack("<HBB", len(raw), etype, 1)  # name len, type, black
        ent += struct.pack(
            "<III", _NOSTREAM, _NOSTREAM, child & 0xFFFFFFFF
        )  # left, right, child
        ent += b"\x00" * 16  # clsid
        ent += struct.pack("<I", 0)  # state bits
        ent += b"\x00" * 16  # timestamps
        ent += struct.pack("<Iq", start & 0xFFFFFFFF, size)
        return ent

    # sector layout (after however many FAT sectors we need):
    #   [directory] [minifat...] [ministream... | stream...]
    # compute with a fixed-point loop since FAT count depends on total
    n_fat = 1
    while True:
        dir_sector = 0  # relative to post-FAT region; absolute = n_fat + idx
        if use_mini:
            body = [None] + minifat_sectors + ministream_sectors  # dir placeholder
        else:
            body = [None] + stream_sectors
        total_sectors = n_fat + len(body)
        fat_capacity = n_fat * (_SECT // 4)
        if fat_capacity >= total_sectors:
            break
        n_fat += 1

    if n_fat > 109:
        # header DIFAT holds 109 FAT-sector pointers (109*128 sectors
        # ≈ 7 MB); extended-DIFAT emission is not implemented, and
        # writing past it would produce a silently corrupt container
        raise MemoryError(
            f"CFB payload needs {n_fat} FAT sectors (>109 header DIFAT "
            "slots, ≈7 MB) — a bounded whole-sheet edge; use csv/"
            "parquet for big tables"
        )
    dir_abs = n_fat
    if use_mini:
        minifat_abs = dir_abs + 1
        ministream_abs = minifat_abs + len(minifat_sectors)
        stream_start = 0  # minisector 0
        root_start = ministream_abs
        root_size = len(ministream_sectors) * _SECT if ministream_sectors else 0
        # the ministream's real byte size is rounded to minisectors
        root_size = n_mini * _MINI_SECT
    else:
        stream_abs = dir_abs + 1
        stream_start = stream_abs
        root_start = _ENDOFCHAIN
        root_size = 0

    # FAT
    total = n_fat + len(body)
    fat = [_FREESECT] * (n_fat * (_SECT // 4))
    for i in range(n_fat):
        fat[i] = _FATSECT
    fat[dir_abs] = _ENDOFCHAIN
    if use_mini:
        for i in range(len(minifat_sectors)):
            s = minifat_abs + i
            fat[s] = s + 1 if i + 1 < len(minifat_sectors) else _ENDOFCHAIN
        for i in range(len(ministream_sectors)):
            s = ministream_abs + i
            fat[s] = s + 1 if i + 1 < len(ministream_sectors) else _ENDOFCHAIN
    else:
        for i in range(len(stream_sectors)):
            s = stream_abs + i
            fat[s] = s + 1 if i + 1 < len(stream_sectors) else _ENDOFCHAIN

    directory = (
        dirent("Root Entry", 5, root_start, root_size, child=1)
        + dirent(stream_name, 2, stream_start, len(payload))
        + b"\x00" * 128 * 2
    )

    header = _CFB_SIG
    header += b"\x00" * 16  # clsid
    header += struct.pack("<HH", 0x003E, 0x0003)  # minor, major (v3)
    header += struct.pack("<H", 0xFFFE)  # byte order
    header += struct.pack("<HH", 9, 6)  # sector shift 512, mini shift 64
    header += b"\x00" * 6
    header += struct.pack("<I", 0)  # num dir sectors (0 for v3)
    header += struct.pack("<I", n_fat)
    header += struct.pack("<I", dir_abs)
    header += struct.pack("<I", 0)  # transaction
    header += struct.pack("<I", _MINI_CUTOFF)
    if use_mini and minifat_sectors:
        header += struct.pack("<II", minifat_abs, len(minifat_sectors))
    else:
        header += struct.pack("<II", _ENDOFCHAIN, 0)
    header += struct.pack("<II", _ENDOFCHAIN, 0)  # DIFAT chain (none)
    difat = [i if i < n_fat else _FREESECT for i in range(109)]
    header += struct.pack("<109I", *difat)
    assert len(header) == _SECT

    fat_bytes = struct.pack(f"<{len(fat)}I", *fat)
    out = header + fat_bytes
    for i, sec in enumerate(body):
        out += directory.ljust(_SECT, b"\x00") if sec is None else sec
    return out


def _cfb_read(blob: bytes, stream_names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream matching one of
    `stream_names` from a CFB file."""
    if blob[:8] != _CFB_SIG:
        raise ValueError("not a CFB (.xls) file: bad signature")
    (sect_shift,) = struct.unpack_from("<H", blob, 30)
    sect = 1 << sect_shift
    (n_fat,) = struct.unpack_from("<I", blob, 44)
    (dir_start,) = struct.unpack_from("<I", blob, 48)
    (mini_cutoff,) = struct.unpack_from("<I", blob, 56)
    (minifat_start,) = struct.unpack_from("<I", blob, 60)
    (difat_start,) = struct.unpack_from("<I", blob, 68)
    (n_difat,) = struct.unpack_from("<I", blob, 72)
    difat = list(struct.unpack_from("<109I", blob, 76))
    # extended DIFAT sectors (huge files)
    s = difat_start
    for _ in range(n_difat):
        base = sect + s * sect
        ext = struct.unpack_from(f"<{sect // 4}I", blob, base)
        difat += list(ext[:-1])
        s = ext[-1]
        if s in (_ENDOFCHAIN, _FREESECT):
            break

    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs == _FREESECT:
            continue
        fat += list(struct.unpack_from(f"<{sect // 4}I", blob, sect + fs * sect))

    def chain(start: int) -> bytes:
        out, s, seen = b"", start, set()
        while s not in (_ENDOFCHAIN, _FREESECT) and s not in seen:
            seen.add(s)
            out += blob[sect + s * sect : sect + (s + 1) * sect]
            if s >= len(fat):
                break
            s = fat[s]
        return out

    directory = chain(dir_start)
    root_start = root_size = None
    target = None
    for off in range(0, len(directory), 128):
        ent = directory[off : off + 128]
        if len(ent) < 128:
            break
        (name_len,) = struct.unpack_from("<H", ent, 64)
        etype = ent[66]
        if etype == 0 or name_len < 2:
            continue
        name = ent[: name_len - 2].decode("utf-16-le", errors="replace")
        start, size = struct.unpack_from("<Iq", ent, 116)
        if etype == 5:
            root_start, root_size = start, size
        elif etype == 2 and name in stream_names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"CFB file has no stream named any of {stream_names}")
    start, size = target
    if size >= mini_cutoff:
        return chain(start)[:size]
    # ministream path
    if root_start is None:
        raise ValueError("CFB mini-stream without a root entry")
    ministream = chain(root_start)[:root_size]
    minifat: list[int] = []
    s = minifat_start
    seen: set[int] = set()
    while s not in (_ENDOFCHAIN, _FREESECT) and s not in seen:
        seen.add(s)
        minifat += list(
            struct.unpack_from(f"<{sect // 4}I", blob, sect + s * sect)
        )
        s = fat[s] if s < len(fat) else _ENDOFCHAIN
    out, m, mseen = b"", start, set()
    while m not in (_ENDOFCHAIN, _FREESECT) and m not in mseen:
        mseen.add(m)
        out += ministream[m * _MINI_SECT : (m + 1) * _MINI_SECT]
        if m >= len(minifat):
            break
        m = minifat[m]
    return out[:size]


# ======================================================================
# BIFF8 records
# ======================================================================


def _rec(rid: int, body: bytes) -> bytes:
    if len(body) > _MAX_RECORD:
        raise MemoryError(
            f"BIFF record 0x{rid:04X} body {len(body)}B exceeds the 8224B "
            "record ceiling (CONTINUE emission not implemented — this is a "
            "bounded edge; use csv/parquet for big tables)"
        )
    return struct.pack("<HH", rid, len(body)) + body


def _biff_string(s: str) -> bytes:
    """XLUnicodeString: cch(2) grbit(1) chars (compressed when every
    code point fits a byte, else UTF-16LE). cch counts UTF-16 CODE
    UNITS, not code points — astral-plane chars are surrogate pairs
    and count as 2 ([MS-XLS] 2.5.294)."""
    if all(ord(c) < 256 for c in s):
        if len(s) > 32767:
            raise MemoryError("BIFF string exceeds 32767 chars")
        return struct.pack("<HB", len(s), 0x00) + s.encode("latin-1")
    enc = s.encode("utf-16-le")
    cch = len(enc) // 2
    if cch > 32767:
        raise MemoryError("BIFF string exceeds 32767 UTF-16 code units")
    return struct.pack("<HB", cch, 0x01) + enc


def _fmt_number(v: float) -> str:
    """Excel-'General'-style numeric text: integral doubles drop .0.
    NUMBER records can legally carry inf/nan doubles — surface their
    repr instead of crashing on int(inf)."""
    if math.isfinite(v) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def write_xls(
    path: str,
    rows: list[tuple],
    *,
    sheet: str = "Sheet1",
    x: int = 0,
    y: int = 0,
) -> None:
    """Write rows (scalars; None -> blank cell) as one BIFF8 sheet in a
    CFB container, top-left cell at 0-based (x, y) like the
    reference's x=/y= offsets (scripts/dbitool.pl:2825-2832). int/
    float cells become NUMBER records; everything else goes through
    the SST + LABELSST pair."""
    if len(rows) > 65536 - y:
        raise MemoryError("BIFF8 sheets cap at 65536 rows")
    n_cols = max((len(r) for r in rows), default=0)
    if n_cols > 256 - x:
        # checked over EVERY row — ragged rows longer than the first
        # would otherwise emit out-of-spec columns silently
        raise MemoryError("BIFF8 sheets cap at 256 columns")

    # shared string table: unique strings in first-seen order
    sst_index: dict[str, int] = {}
    total_refs = 0
    cells: list[tuple[int, int, object]] = []  # (row, col, float | sst-idx-as-str)
    for ri, row in enumerate(rows):
        for ci, v in enumerate(row):
            if v is None:
                continue
            r, c = y + ri, x + ci
            if isinstance(v, bool):
                v = str(v)
            if isinstance(v, (int, float)):
                cells.append((r, c, float(v)))
            else:
                s = str(v)
                if s not in sst_index:
                    sst_index[s] = len(sst_index)
                total_refs += 1
                cells.append((r, c, ("sst", sst_index[s])))

    # SST splits into CONTINUE records at string boundaries when the
    # 8224B record ceiling would overflow ([MS-XLS] 2.5.293 allows a
    # continuation to begin at a fresh string, where no grbit byte is
    # re-stated — the reader tracks mid-string state). A single string
    # longer than one record still raises in _rec (bounded edge).
    sst_chunks: list[bytes] = [struct.pack("<ii", total_refs, len(sst_index))]
    for s in sst_index:
        enc = _biff_string(s)
        if len(sst_chunks[-1]) + len(enc) > _MAX_RECORD:
            sst_chunks.append(b"")
        sst_chunks[-1] += enc

    # sheet substream
    n_rows = len(rows)
    sheet_parts = [
        _rec(0x0809, struct.pack("<HHHHIHH", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0, 0)),
        _rec(
            0x0200,
            struct.pack("<IIHHH", y, y + n_rows, x, x + n_cols, 0),
        ),
    ]
    for r, c, v in cells:
        if isinstance(v, tuple):
            sheet_parts.append(_rec(0x00FD, struct.pack("<HHHI", r, c, 0, v[1])))
        else:
            sheet_parts.append(_rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v)))
    sheet_parts.append(_rec(0x000A, b""))
    sheet_bytes = b"".join(sheet_parts)

    # workbook globals; BOUNDSHEET needs the sheet BOF offset — assemble
    # with a placeholder, then patch (the offset is the globals' length)
    # BOUNDSHEET name is a ShortXLUnicodeString: wide encoding when any
    # char exceeds latin-1 so non-ASCII sheet names round-trip (the
    # reader keys sheet selection on the exact name)
    name = sheet[:31]
    if all(ord(c) < 256 for c in name):
        name_bytes = struct.pack("<BB", len(name), 0) + name.encode("latin-1")
    else:
        enc = name.encode("utf-16-le")
        name_bytes = struct.pack("<BB", len(enc) // 2, 1) + enc
    bsheet_body = struct.pack("<IH", 0, 0) + name_bytes
    globals_parts = [
        _rec(0x0809, struct.pack("<HHHHIHH", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0, 0)),
        _rec(0x0042, struct.pack("<H", 0x04B0)),  # CODEPAGE: UTF-16
        _rec(0x0085, bsheet_body),
        _rec(0x00FC, sst_chunks[0]),
        *[_rec(0x003C, chunk) for chunk in sst_chunks[1:]],
        _rec(0x000A, b""),
    ]
    globals_bytes = b"".join(globals_parts)
    # patch lbPlyPos inside BOUNDSHEET (first record after BOF+CODEPAGE)
    bs_off = len(globals_parts[0]) + len(globals_parts[1]) + 4
    globals_bytes = (
        globals_bytes[:bs_off]
        + struct.pack("<I", len(globals_bytes))
        + globals_bytes[bs_off + 4 :]
    )

    with open(path, "wb") as fh:
        fh.write(_cfb_write("Workbook", globals_bytes + sheet_bytes))


# --- reader -----------------------------------------------------------


def _records(stream: bytes, start: int = 0):
    off = start
    while off + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, off)
        yield rid, stream[off + 4 : off + 4 + ln], off
        off += 4 + ln


def _parse_sst(body: bytes, continues: list[bytes]) -> list[str]:
    """SST with CONTINUE handling: strings may split at record
    boundaries, where the continuation re-states a fresh grbit byte
    ([MS-XLS] 2.5.293)."""
    (n_unique,) = struct.unpack_from("<i", body, 4)
    chunks = [body[8:]] + continues
    out: list[str] = []
    ci, off = 0, 0

    def remaining() -> int:
        return len(chunks[ci]) - off

    def advance() -> None:
        nonlocal ci, off
        while ci < len(chunks) and off >= len(chunks[ci]):
            ci += 1
            off = 0

    def take(n: int) -> bytes:
        nonlocal off
        b = chunks[ci][off : off + n]
        off += len(b)
        return b

    while len(out) < n_unique:
        advance()
        if ci >= len(chunks):
            break
        cch = struct.unpack("<H", take(2))[0]
        advance()
        grbit = take(1)[0]
        rich = bool(grbit & 0x08)
        ext = bool(grbit & 0x04)
        c_run = struct.unpack("<H", take(2))[0] if rich else 0
        cb_ext = struct.unpack("<i", take(4))[0] if ext else 0
        # segments are (wide, raw) — decode AFTER merging adjacent
        # same-width runs: cch counts UTF-16 code units, so a record
        # boundary may fall between the two halves of a surrogate
        # pair, and decoding per-segment would explode on the lone
        # high surrogate
        segs: list[tuple[bool, bytes]] = []
        wide = bool(grbit & 0x01)
        need = cch
        # chunk the header ended in: character data continuing into a
        # LATER chunk re-states the grbit byte at the boundary — even
        # when zero characters were read before it (header flush
        # against the record end, spec-legal)
        cur_chunk = ci
        while need:
            advance()
            if ci >= len(chunks):
                break
            if ci != cur_chunk:
                wide = bool(take(1)[0] & 0x01)
                cur_chunk = ci
                advance()
                if ci >= len(chunks):
                    break
                cur_chunk = ci
            avail = remaining() // (2 if wide else 1)
            if avail == 0:
                # odd trailing byte of a wide run (truncated/corrupt
                # record): consuming 0 would spin forever
                raise ValueError(
                    "corrupt SST: record ends mid-character in a "
                    "UTF-16 string"
                )
            n = min(need, avail)
            raw = take(n * (2 if wide else 1))
            if segs and segs[-1][0] == wide:
                segs[-1] = (wide, segs[-1][1] + raw)
            else:
                segs.append((wide, raw))
            need -= n
        chars = [
            raw.decode("utf-16-le" if w else "latin-1") for w, raw in segs
        ]
        # skip rich-text runs and extended data (may also span records)
        skip = c_run * 4 + cb_ext
        while skip:
            advance()
            if ci >= len(chunks):
                break
            n = min(skip, remaining())
            take(n)
            skip -= n
        out.append("".join(chars))
    return out


def _rk_value(rk: int) -> float:
    x100 = rk & 0x01
    is_int = rk & 0x02
    if is_int:
        v = float(rk >> 2 if rk >> 2 < (1 << 29) else (rk >> 2) - (1 << 30))
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if x100 else v


def read_xls(
    path: str, *, sheet: str | int = 0, max_rows: int | None = None
) -> list[list[str]]:
    """Read one sheet into a dense list of string rows (same interface
    as xlsx_codec.read_xlsx: ragged rows right-padded with "", blank/
    absent cells as "")."""
    with open(path, "rb") as fh:
        blob = fh.read()
    stream = _cfb_read(blob, ("Workbook", "Book"))

    # pass 1: globals — SST (+ its CONTINUEs) and BOUNDSHEETs
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []
    pending_sst: bytes | None = None
    pending_cont: list[bytes] = []
    for rid, body, _off in _records(stream):
        if rid == 0x00FC:
            pending_sst, pending_cont = body, []
        elif rid == 0x003C and pending_sst is not None:
            pending_cont.append(body)
        elif pending_sst is not None:
            sst = _parse_sst(pending_sst, pending_cont)
            pending_sst = None
        if rid == 0x0085:
            (pos,) = struct.unpack_from("<I", body, 0)
            cch = body[6]
            grbit = body[7]
            raw = body[8 : 8 + cch * (2 if grbit & 0x01 else 1)]
            name = raw.decode("utf-16-le" if grbit & 0x01 else "latin-1")
            sheets.append((name, pos))
        if rid == 0x000A:
            break
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, pending_cont)
    if not sheets:
        raise ValueError("xls workbook has no BOUNDSHEET records")
    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        _name, pos = sheets[sheet]
    else:
        by_name = dict(sheets)
        if sheet not in by_name:
            raise ValueError(f"sheet {sheet!r} not found; have {sorted(by_name)}")
        pos = by_name[sheet]

    # pass 2: the chosen sheet substream
    grid: dict[tuple[int, int], str] = {}
    max_r = max_c = -1

    def put(r: int, c: int, text: str) -> None:
        nonlocal max_r, max_c
        if max_rows is not None and r >= max_rows:
            return
        grid[(r, c)] = text
        max_r = max(max_r, r)
        max_c = max(max_c, c)

    started = False
    for rid, body, _off in _records(stream, pos):
        if rid == 0x0809:
            if started:
                break
            started = True
        elif rid == 0x000A:
            break
        elif rid == 0x0203:  # NUMBER
            r, c, _xf = struct.unpack_from("<HHH", body, 0)
            (v,) = struct.unpack_from("<d", body, 6)
            put(r, c, _fmt_number(v))
        elif rid == 0x027E:  # RK
            r, c, _xf, rk = struct.unpack_from("<HHHI", body, 0)
            put(r, c, _fmt_number(_rk_value(rk)))
        elif rid == 0x00BD:  # MULRK
            r, c_first = struct.unpack_from("<HH", body, 0)
            n = (len(body) - 6) // 6
            for i in range(n):
                _xf, rk = struct.unpack_from("<HI", body, 4 + i * 6)
                put(r, c_first + i, _fmt_number(_rk_value(rk)))
        elif rid == 0x00FD:  # LABELSST
            r, c, _xf, isst = struct.unpack_from("<HHHI", body, 0)
            put(r, c, sst[isst] if isst < len(sst) else "")
        elif rid == 0x0204:  # LABEL (inline BIFF8 string)
            r, c, _xf = struct.unpack_from("<HHH", body, 0)
            cch, grbit = struct.unpack_from("<HB", body, 6)
            # rich-text run count / extended size sit BETWEEN grbit
            # and the character data when flagged ([MS-XLS] 2.5.294)
            pos = 9
            if grbit & 0x08:
                pos += 2
            if grbit & 0x04:
                pos += 4
            raw = body[pos : pos + cch * (2 if grbit & 0x01 else 1)]
            put(r, c, raw.decode("utf-16-le" if grbit & 0x01 else "latin-1"))

    out: list[list[str]] = []
    for r in range(max_r + 1):
        out.append([grid.get((r, c), "") for c in range(max_c + 1)])
    return out
