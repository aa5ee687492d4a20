"""Baseline JPEG codec — stdlib struct + numpy, no image library.

Closes the last pixel-decode gap in the multimodal family (WAV, BMP,
PNG, GIF already decode fully; JPEG was dimensions-only). Same
approach as io/xlsx_codec.py / io/xls_codec.py / the PNG and GIF
decoders: the format is PUBLIC (ITU-T T.81 / ISO 10918-1, with the
standard quantization and Huffman tables of Annex K), so implement
the spec subset directly rather than stub.

Subset: baseline sequential DCT (SOF0; SOF1 extended-sequential
parses identically for 8-bit), any sampling factors up to 2x2
(4:4:4, 4:2:2, 4:2:0), restart markers, multi-table DQT/DHT
segments. Progressive (SOF2), arithmetic coding, 12-bit precision,
and hierarchical modes are NOT decoded — callers fall back to the
dimension-only SOF scan for those (the honest-split contract in
ops/multimodal.py).

Shape notes for the mapInPandas path that calls this:
- the entropy decode is a sequential bit stream per image (that is
  inherent to Huffman JPEG, not an implementation choice), so the
  per-image cost is bounded by the caller's pixel-area cap the same
  way the GIF LZW loop is;
- everything after entropy decode (dequantize, IDCT, upsample, color
  convert) is vectorized numpy over all blocks at once.

The encoder exists so the decoder is testable against closed-form
content with zero external fixtures: encode -> decode -> compare
against the quantization-error bound. It emits 4:4:4 baseline with
the Annex K tables at a chosen quality scale.
"""

from __future__ import annotations

import struct

import numpy as np

# --- spec constants (ITU-T T.81 Annex K) -------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# standard Huffman tables: (BITS counts per code length 1..16, HUFFVAL)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(length, code) canonical Huffman assignment per T.81 C.2."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """T.81 F.2.2.3 mincode/maxcode tables: two int compares per code
    length in the hot loop instead of a tuple-keyed dict lookup (the
    entropy decode is the decoder's dominant cost)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def read(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 byte
    stuffing; restart markers are handled by the caller (reset())."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    raise ValueError("marker in entropy stream")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for restart intervals); returns
        the marker's second byte."""
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(content: bytes, *, max_pixels: int = 1 << 22) -> tuple:
    """Decode a baseline JPEG to (width, height, planes) where planes
    is a list of full-resolution float64 arrays (Y or Y,Cb,Cr).
    Raises ValueError on non-baseline streams (caller falls back to
    the dims-only scan) and on frames over max_pixels (bounds the
    sequential entropy loop per executor task)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    try:
        return _decode_jpeg_inner(content, max_pixels)
    except (IndexError, struct.error, KeyError, ZeroDivisionError) as exc:
        # truncated/corrupt streams surface as the one exception type
        # the caller's fallback contract handles (KeyError: SOS with no
        # DHT / unknown table ids; ZeroDivisionError: degenerate fields)
        raise ValueError(f"corrupt JPEG stream: {type(exc).__name__}") from exc


def _decode_jpeg_inner(content: bytes, max_pixels: int) -> tuple:
    qt: dict[int, np.ndarray] = {}
    hd: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart = 0
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # 0xFF fill bytes may pad between segments (T.81 B.1.1.2)
        while pos + 4 <= len(content) and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no length
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", content, pos + 2)[0]
        body = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                hd[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: Huffman sequential
            prec = body[0]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            h, w = struct.unpack_from(">HH", body, 1)
            if w == 0 or h == 0:
                raise ValueError("zero-dimension frame")
            ncomp = body[5]
            if not 1 <= ncomp <= 4:  # Y / YCbCr / YCCK are the real layouts
                raise ValueError(f"implausible component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if any(hmax % c[1] or vmax % c[2] for c in comps):
                raise ValueError("non-integral sampling ratio")
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            w, h, comps = frame
            # the cap bounds the per-task working set: coefficient
            # grids are ~8 bytes per pixel PER COMPONENT, so the
            # component count multiplies into the bound
            if w * h * len(comps) > 3 * max_pixels:
                raise ValueError(
                    f"frame {w}x{h}x{len(comps)} over max_pixels={max_pixels}"
                )
            ns = body[0]
            if ns < len(comps):
                # spec-legal non-interleaved layout (one scan per
                # component); this decoder handles the single
                # interleaved scan that every camera/JFIF file uses
                raise ValueError("non-interleaved multi-scan JPEG")
            tables = {}
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                tables[cs] = (tdta >> 4, tdta & 0x0F)
            data_pos = pos + 2 + seg_len
            return _decode_scan(
                content, data_pos, w, h, comps, tables, qt, hd, restart
            )
        pos += 2 + seg_len
    raise ValueError("no scan found")


def _decode_scan(data, pos, w, h, comps, tables, qt, hd, restart):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(data, pos)
    # per-component coefficient block grids
    grids = []
    for cid, hs, vs, tq in comps:
        grids.append(np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.float64))
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RSTn, got {m:02x}")
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dc_t, ac_t = tables[cid]
                dec_dc, dec_ac = hd[(0, dc_t)], hd[(1, ac_t)]
                for by in range(vs):
                    for bx in range(hs):
                        blk = grids[ci][my * vs + by, mx * hs + bx]
                        t = dec_dc.read(br)
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = dec_ac.read(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
            n_mcu += 1
    # vectorized: dequantize + inverse zigzag + IDCT per component
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        g = grids[ci]  # (BY, BX, 64) zigzag-order quantized coeffs
        by, bx = g.shape[0], g.shape[1]
        deq = g * qt[tq][None, None, :]
        blocks = np.zeros((by, bx, 64))
        blocks[:, :, ZIGZAG] = deq  # undo zigzag
        blocks = blocks.reshape(by, bx, 8, 8)
        spatial = np.einsum("ux,ybuv,vz->ybxz", _A, blocks, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full MCU-aligned resolution, then crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(np.clip(plane[:h, :w], 0, 255))
    return w, h, planes


def ycbcr_to_rgb(planes: list[np.ndarray]) -> np.ndarray:
    """JFIF YCbCr -> RGB, stacked (h, w, 3)."""
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


# --- encoder (test harness: closed-form content, no fixtures) ----------


class _HuffEncoder:
    def __init__(self, bits, vals):
        self.lut = {}
        for length, code, val in _canonical_codes(bits, vals):
            self.lut[val] = (length, code)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _encode_block(bw, blk, qtbl_zz, dc_enc, ac_enc, pred):
    """qtbl_zz is the quantization table in ZIGZAG order (the same
    order the DQT segment carries and the zigzag-ordered coefficient
    vector is divided in — T.81 B.2.4.1)."""
    coef = _A @ blk @ _A.T  # forward DCT of the level-shifted block
    q = np.round(coef.reshape(64)[_INV_ZIGZAG_ORDER] / qtbl_zz).astype(np.int64)
    diff = int(q[0]) - pred
    t = int(diff).bit_length() if diff else 0
    length, code = dc_enc.lut[t]
    bw.put(code, length)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.put(v & ((1 << t) - 1), t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if q[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        if q[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_enc.lut[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        s = int(abs(q[k])).bit_length()
        length, code = ac_enc.lut[(run << 4) | s]
        bw.put(code, length)
        v = int(q[k]) if q[k] > 0 else int(q[k]) + (1 << s) - 1
        bw.put(v & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        length, code = ac_enc.lut[0x00]  # EOB
        bw.put(code, length)
    return int(q[0])


# zigzag index k -> natural index ZIGZAG[k]; the encoder needs
# natural -> zigzag, i.e. for output position k take natural ZIGZAG[k]
_INV_ZIGZAG_ORDER = ZIGZAG  # q[k] = coef_natural[ZIGZAG[k]]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(
    rgb: np.ndarray,
    *,
    quality_scale: float = 0.25,
    subsample: bool = False,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 array as baseline JPEG with the
    Annex K tables scaled by quality_scale (smaller = higher quality;
    0.25 keeps per-pixel error within a few levels for smooth
    content). subsample=True emits 4:2:0 (2x2 luma sampling, chroma
    box-averaged) — the common camera layout, which exercises the
    decoder's multi-block MCU + upsample path; grayscale=True emits a
    single-component stream. Test harness — correctness over speed."""
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    qlum = np.maximum(1, np.round(QUANT_LUM * quality_scale))
    qchrom = np.maximum(1, np.round(QUANT_CHROM * quality_scale))

    ysamp = (2, 2) if subsample else (1, 1)
    if grayscale:
        comps = [(1, (1, 1), 0, 0)]  # (cid, (hs, vs), tq, huff-th)
    else:
        comps = [(1, ysamp, 0, 0), (2, (1, 1), 1, 1), (3, (1, 1), 1, 1)]

    # DQT carries the table in zigzag order (T.81 B.2.4.1); quantize
    # with the same zigzag-ordered view so index k always means the
    # k-th zigzag coefficient on both sides
    qlum_zz = qlum[ZIGZAG]
    qchrom_zz = qchrom[ZIGZAG]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qlum_zz.astype(np.uint8)))
    if not grayscale:
        out += _seg(0xDB, bytes([1]) + bytes(qchrom_zz.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, (hs, vs), tq, _th in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(0xC0, sof)
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not grayscale:
        tables += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tc_th, (bits, vals) in tables:
        out += _seg(0xC4, bytes([tc_th] + bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _hv, _tq, th in comps:
        sos += bytes([cid, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    encs = {
        (0, 0): _HuffEncoder(*DC_LUM), (1, 0): _HuffEncoder(*AC_LUM),
        (0, 1): _HuffEncoder(*DC_CHROM), (1, 1): _HuffEncoder(*AC_CHROM),
    }
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def _prep(plane: np.ndarray, hs: int, vs: int) -> np.ndarray:
        if (hs, vs) != (hmax, vmax):
            # box-average downsample by the sampling ratio
            fy, fx = vmax // vs, hmax // hs
            ph = (plane.shape[0] + fy - 1) // fy * fy
            pw = (plane.shape[1] + fx - 1) // fx * fx
            p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                       mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th_, tw = mcuy * 8 * vs, mcux * 8 * hs
        return np.pad(
            plane,
            ((0, th_ - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        ) - 128.0

    srcs = {1: y, 2: cb, 3: cr}
    qts = {0: qlum_zz, 1: qchrom_zz}
    padded = [
        (_prep(srcs[cid], hs, vs), qts[tq], th, hs, vs)
        for cid, (hs, vs), tq, th in comps
    ]
    pred = [0] * len(comps)
    bw = _BitWriter()
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, (pp, qtbl, th, hs, vs) in enumerate(padded):
                for by in range(vs):
                    for bx in range(hs):
                        ry = (my * vs + by) * 8
                        rx = (mx * hs + bx) * 8
                        blk = pp[ry : ry + 8, rx : rx + 8]
                        pred[ci] = _encode_block(
                            bw, blk, qtbl, encs[(0, th)], encs[(1, th)], pred[ci]
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
