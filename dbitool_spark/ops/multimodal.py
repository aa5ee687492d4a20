"""Multimodal (binary) column support: typed opaque media columns with
Arrow-batched decode/feature plumbing.

Design (north-star scope): media rides as an opaque `binary` column
plus a typed metadata struct — the layout `spark.read.format(
"binaryFile")` produces and every lakehouse media pipeline uses. The
decode / feature-extraction step is a Pandas-batch `mapInPandas`
transform: Arrow moves whole record batches into Python once per
partition (never row-at-a-time), and partition sizing — not driver
memory — bounds the working set.

Codec status (honest tiers):
- REAL, stdlib-only: FULL WAV decode (container fields + 16-bit PCM
  sample stats: mean-abs and RMS via numpy), FULL BMP 24-bit BI_RGB
  pixel decode (per-channel means; CORE/INFO header variants), FULL
  PNG pixel decode for 8-bit non-interlaced images (chunk CRC walk,
  zlib inflate, all five scanline filters, per-channel means —
  _decode_png), FULL GIF pixel decode (own LZW decompressor + palette
  mapping — _decode_gif), FULL baseline-JPEG pixel decode (own T.81
  Huffman-sequential codec, ops/jpeg_codec.py — any 1x1..2x2
  sampling, restart markers; _decode_jpeg_full), and MP4/ISO-BMFF
  container metadata (box walk: mvhd duration, tkhd track dims —
  _decode_mp4), AVI container metadata + FULL MJPEG-AVI frame decode
  (RIFF walk + per-frame JPEG decode — _avi_mjpeg_frames,
  extract_video_frames) — the published formats, no external library
  needed. `_try_real_decode` routes these by magic bytes.
- STUBBED: inter-frame-predicted video codecs (H.26x, VP9, AV1...)
  require libraries this container does not ship; those fall through
  to the deterministic fake keyed on the content digest.
  Progressive/arithmetic JPEG degrades to the dims-only SOF scan;
  palette/interlaced/16-bit PNGs and interlaced GIFs degrade to
  header-only decode (dims still real).
  Everything Spark-side — schema, batch iteration, UDF signature,
  partition behavior — is identical in both tiers; swapping the fake
  for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<source:string, declared_mime:string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, content_sha string, "
    "width int, height int, duration_ms int, feature array<float>"
)

def _fake_decode(kind: str, content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for the codec: derives fake
    width/height/duration and an 8-dim feature vector from the
    content digest. Same bytes -> same features, so tests are exact."""
    digest = hashlib.sha256(content).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    duration = int.from_bytes(digest[2:4], "big") if kind in ("audio", "video") else 0
    feature = [round(b / 255.0, 6) for b in digest[4:12]]
    return width, height, duration, feature


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA rows.

    Batches arrive as pandas DataFrames (Arrow transfer); the loop is
    per-batch, not per-row-network-call. At 100 TB the input should be
    repartitioned so each task holds O(100 MB) of media bytes — set
    spark.sql.files.maxPartitionBytes accordingly when reading
    binaryFile sources."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
                "content_sha": pdf["content"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
            decoded = [
                _decode_one(kind, content)
                for kind, content in zip(pdf["kind"], pdf["content"])
            ]
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["duration_ms"] = pd.Series([d[2] for d in decoded], dtype="int32")
            out["feature"] = pd.Series([d[3] for d in decoded])
            yield pd.DataFrame(out)

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def _decode_wav(content: bytes) -> tuple[int, int, int, list[float]]:
    """REAL WAV decode via the stdlib wave module: duration from the
    container's frame count / sample rate (exact integer ms for the
    rates used in tests), feature = [channels, sampwidth, framerate/
    1e5, nframes/1e6, mean_abs/32768, rms/32768] — the last two are
    FULL sample decode (16-bit PCM via numpy int16 view; other sample
    widths keep the header-only 4-field feature). Mean-abs and RMS are
    the standard loudness descriptors an audio curation filter keys
    on (silence / clipping detection)."""
    with wave.open(io.BytesIO(content), "rb") as w:
        channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        nframes = w.getnframes()
        frames = w.readframes(nframes) if sampwidth == 2 else b""
    duration_ms = nframes * 1000 // rate if rate else 0
    feature = [
        float(channels),
        float(sampwidth),
        round(rate / 1e5, 6),
        round(nframes / 1e6, 6),
    ]
    if sampwidth == 2 and frames:
        import numpy as np

        samples = np.frombuffer(frames, dtype="<i2").astype("float64")
        feature.append(round(float(np.abs(samples).mean()) / 32768.0, 6))
        feature.append(round(float(np.sqrt((samples**2).mean())) / 32768.0, 6))
    return 0, 0, duration_ms, feature


def _decode_bmp(content: bytes) -> tuple[int, int, int, list[float]] | None:
    """REAL BMP header decode (the public Windows DIB layouts). The DIB
    header size at offset 14 selects the variant: 12 = BITMAPCOREHEADER
    (16-bit dims), >= 40 = BITMAPINFOHEADER family (32-bit signed dims;
    negative height means top-down rows). Unknown sizes fall through to
    the deterministic fake rather than mis-parsing."""
    dib_size = struct.unpack_from("<I", content, 14)[0]
    if dib_size == 12:
        width, height = struct.unpack_from("<HH", content, 18)
        bpp = struct.unpack_from("<H", content, 24)[0]
        return width, height, 0, [float(bpp)]
    if dib_size >= 40:
        width, height = struct.unpack_from("<ii", content, 18)
        bpp = struct.unpack_from("<H", content, 28)[0]
        compression = struct.unpack_from("<I", content, 30)[0]
        feature = [float(bpp)]
        # FULL pixel decode for the uncompressed 24-bit BI_RGB layout:
        # bottom-up (or top-down if height < 0) rows, 4-byte padded,
        # BGR order; per-channel means appended as [bpp, mean_b,
        # mean_g, mean_r]. Other bit depths / compressions keep the
        # header-only feature.
        if bpp == 24 and compression == 0 and width > 0 and height != 0:
            offset = struct.unpack_from("<I", content, 10)[0]
            h = abs(height)
            stride = (width * 3 + 3) & ~3
            if offset + stride * h <= len(content):
                import numpy as np

                # vectorized: strided view drops the row padding, then
                # one C-level mean per channel (the per-row Python loop
                # was O(3*W*H) interpreted work in the mapInPandas path)
                px = (
                    np.frombuffer(content, dtype=np.uint8,
                                  count=stride * h, offset=offset)
                    .reshape(h, stride)[:, : width * 3]
                    .reshape(-1, 3)
                )
                feature += [round(float(m), 6) for m in px.mean(axis=0, dtype="float64")]
        return width, abs(height), 0, feature
    return None


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (spec §9, filter types 0-4:
    None/Sub/Up/Average/Paeth). `raw` is the inflated IDAT stream —
    each scanline is one filter byte + width*bpp sample bytes; output
    is the defiltered pixel bytes.

    Vectorized per scanline (this runs inside the mapInPandas decode
    path, where an interpreted per-byte loop would dominate executor
    CPU on large images): None copies, Up is one whole-row add, Sub is
    an exact per-channel cumsum mod 256, and Average/Paeth — whose
    carry is inherently sequential along x — step x-position-at-a-time
    operating on bpp-wide numpy slices (a bpp× reduction over per-byte
    work). Rows themselves stay sequential: every filter may reference
    the previous *decoded* row."""
    import numpy as np

    stride = width * bpp
    rows = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = None  # previous decoded row (np.uint8[stride]) or None
    for y in range(height):
        f = int(rows[y, 0])
        line = rows[y, 1:]
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            out[y] = (
                np.cumsum(line.reshape(width, bpp), axis=0, dtype=np.uint64) & 0xFF
            ).reshape(stride)
        elif f == 2:  # Up
            out[y] = line + prev if prev is not None else line  # uint8 wraps
        elif f == 3:  # Average
            cur = out[y]
            up = prev if prev is not None else np.zeros(stride, dtype=np.uint8)
            cur[:bpp] = line[:bpp] + (up[:bpp] >> 1)
            for x in range(bpp, stride, bpp):
                s = slice(x, x + bpp)
                left = cur[x - bpp : x].astype(np.int32)
                cur[s] = line[s] + ((left + up[s]) >> 1).astype(np.uint8)
        elif f == 4:  # Paeth
            cur = out[y]
            up = (prev if prev is not None else np.zeros(stride, dtype=np.uint8)).astype(
                np.int32
            )
            cur[:bpp] = line[:bpp] + up[:bpp].astype(np.uint8)  # a=c=0 → pred=b
            for x in range(bpp, stride, bpp):
                s = slice(x, x + bpp)
                a = cur[x - bpp : x].astype(np.int32)
                b = up[s]
                c = up[x - bpp : x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                cur[s] = line[s] + pred.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        prev = out[y]
    return bytearray(out.tobytes())


# channels per PNG color type (8-bit, non-interlaced path)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png(content: bytes) -> tuple[int, int, int, list[float]]:
    """FULL PNG decode for 8-bit non-interlaced images, pure stdlib
    (public PNG spec): chunk walk with CRC-32 verification, zlib
    inflate of the IDAT stream, scanline unfiltering (all five filter
    types), then per-channel pixel means as the feature —
    [bit_depth, color_type, mean_ch0, mean_ch1, ...]. Palette,
    interlaced, and 16-bit images fall back to the IHDR dimensions
    with the header-only feature (still real parsing, just not pixel
    decode)."""
    import zlib

    width, height = struct.unpack_from(">II", content, 16)
    bit_depth, color_type, _comp, _filt, interlace = content[24:29]
    header_feature = [float(bit_depth), float(color_type)]
    channels = _PNG_CHANNELS.get(color_type)
    if bit_depth != 8 or channels is None or interlace != 0:
        return width, height, 0, header_feature
    i, idat = 8, bytearray()
    try:
        while i + 8 <= len(content):
            (ln,) = struct.unpack_from(">I", content, i)
            tag = content[i + 4 : i + 8]
            body = content[i + 8 : i + 8 + ln]
            (crc,) = struct.unpack_from(">I", content, i + 8 + ln)
            if crc != zlib.crc32(tag + body):
                return width, height, 0, header_feature
            if tag == b"IDAT":
                idat += body
            if tag == b"IEND":
                break
            i += 12 + ln
        raw = zlib.decompress(bytes(idat))
        if len(raw) != height * (1 + width * channels):
            return width, height, 0, header_feature
        pixels = _png_unfilter(raw, width, height, channels)
    except (zlib.error, ValueError, IndexError, struct.error):
        # incl. a chunk truncated mid-walk: keep the already-parsed
        # IHDR dims (header-only degrade), never the digest fake
        return width, height, 0, header_feature
    n = width * height
    means = [
        round(sum(pixels[c::channels]) / n, 6) if n else 0.0
        for c in range(channels)
    ]
    return width, height, 0, header_feature + means


def _gif_lzw(data: bytes, min_code_size: int, n_pixels: int) -> bytearray | None:
    """GIF LZW decompression (public GIF89a spec, appendix F): variable
    -width codes LSB-first, CLEAR resets the dictionary, width grows
    when the next code would not fit, capped at 12 bits. Sequential by
    nature (each code depends on the dictionary built so far), but the
    stream is bounded by the n_pixels cap upstream."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated stream: return what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = dictionary[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(dictionary):
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None  # corrupt stream
        out += entry
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + entry[:1])
        prev = entry
        if len(dictionary) >= (1 << width) and width < 12:
            width += 1
    return out


def _decode_gif(content: bytes) -> tuple[int, int, int, list[float]]:
    """REAL GIF decode, pure stdlib (public GIF87a/89a spec): logical
    screen descriptor, global/local color table, block walk, and FULL
    LZW decompression of the first image's pixel indices mapped
    through the palette — features [palette_bits, mean_r, mean_g,
    mean_b], the same channel-mean convention as the BMP/PNG decoders.
    Interlaced images and frames over the 4M-pixel cap keep the
    dims-only feature (the cap bounds the sequential LZW loop per
    executor task, same rationale as the PNG area guard)."""
    width, height = struct.unpack_from("<HH", content, 6)
    packed = content[10]
    bits = (packed & 0x07) + 1
    feature = [float(bits)]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (1 << bits)
        gct = content[pos : pos + n]
        pos += n
    while pos < len(content):
        block = content[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            iw, ih = struct.unpack_from("<HH", content, pos + 5)
            ipacked = content[pos + 9]
            pos += 10
            palette = gct
            if ipacked & 0x80:  # local color table wins
                n = 3 * (1 << ((ipacked & 0x07) + 1))
                palette = content[pos : pos + n]
                pos += n
            interlaced = bool(ipacked & 0x40)
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while pos < len(content) and content[pos] != 0:
                ln = content[pos]
                data += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if interlaced or palette is None or iw * ih > (1 << 22):
                return width, height, 0, feature
            idx = _gif_lzw(bytes(data), min_code, iw * ih)
            if idx is None or not idx:
                return width, height, 0, feature
            import numpy as np

            pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
            px = pal[np.frombuffer(bytes(idx), dtype=np.uint8) % len(pal)]
            feature += [round(float(m), 6) for m in px.mean(axis=0, dtype="float64")]
            return width, height, 0, feature
        else:  # 0x3B trailer or unknown
            break
    return width, height, 0, feature


def _decode_jpeg_full(content: bytes) -> tuple[int, int, int, list[float]] | None:
    """FULL baseline-JPEG pixel decode via the engine's own codec
    (ops/jpeg_codec.py: T.81 Huffman sequential — entropy decode,
    dequantize, vectorized IDCT, chroma upsample, YCbCr->RGB),
    feature [n_components, mean_r, mean_g, mean_b] in the BMP/PNG/GIF
    channel-mean convention. Progressive/arithmetic/12-bit streams
    and frames over the area cap fall back to the dimension-only SOF
    scan (the honest-split contract)."""
    try:
        from dbitool_spark.ops import jpeg_codec

        w, h, planes = jpeg_codec.decode_jpeg(content)
        if len(planes) == 3:
            rgb = jpeg_codec.ycbcr_to_rgb(planes)
            means = [round(float(rgb[..., c].mean()), 6) for c in range(3)]
        else:
            m = round(float(planes[0].mean()), 6)
            means = [m, m, m]
        return w, h, 0, [float(len(planes))] + means
    except ValueError:
        return _decode_jpeg_dims(content)


def _decode_jpeg_dims(content: bytes) -> tuple[int, int, int, list[float]] | None:
    """JPEG dimension scan: walk the marker stream to the first SOFn
    frame header (public JFIF layout); no entropy decode."""
    i = 2
    while i + 9 < len(content):
        if content[i] != 0xFF:
            return None
        # 0xFF fill bytes may pad between segments (ITU T.81 B.1.1.2)
        while i + 9 < len(content) and content[i + 1] == 0xFF:
            i += 1
        marker = content[i + 1]
        # standalone markers carry no length field: TEM (0x01), RSTn
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height, width = struct.unpack_from(">HH", content, i + 5)
            return width, height, 0, [float(content[i + 4])]
        seg_len = struct.unpack_from(">H", content, i + 2)[0]
        i += 2 + seg_len
    return None


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Iterate (type, body_start, body_end) over ISO-BMFF boxes in
    buf[start:end]; handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        min_size = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
            min_size = 16  # a largesize < 16 would invert the body range
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < min_size or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _decode_mp4(content: bytes) -> tuple[int, int, int, list[float]]:
    """REAL MP4/ISO-BMFF container metadata decode, pure stdlib
    (public ISO 14496-12 box structure): walks ftyp/moov, reads mvhd
    (v0 and v1) for timescale+duration -> duration_ms, and each
    trak/tkhd for the 16.16 fixed-point presentation width/height
    (first visual track wins). Feature = [n_tracks]. Frame PIXEL
    decode stays env-gated (entropy-coded video codecs need external
    libraries); this is the container tier — the same honest split as
    JPEG's dimension-only SOF scan."""
    width = height = duration_ms = 0
    n_tracks = 0
    for btype, body, bend in _mp4_boxes(content, 0, len(content)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in _mp4_boxes(content, body, bend):
            if ctype == b"mvhd":
                version = content[cbody]
                if version == 1:
                    timescale = struct.unpack_from(">I", content, cbody + 20)[0]
                    duration = struct.unpack_from(">Q", content, cbody + 24)[0]
                else:
                    timescale = struct.unpack_from(">I", content, cbody + 12)[0]
                    duration = struct.unpack_from(">I", content, cbody + 16)[0]
                if timescale:
                    duration_ms = duration * 1000 // timescale
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, tbody, tend in _mp4_boxes(content, cbody, cend):
                    if ttype != b"tkhd":
                        continue
                    off = 88 if content[tbody] == 1 else 76
                    w = struct.unpack_from(">I", content, tbody + off)[0] >> 16
                    h = struct.unpack_from(">I", content, tbody + off + 4)[0] >> 16
                    if w and h and not width:
                        width, height = w, h
    return width, height, duration_ms, [float(n_tracks)]


def _avi_mjpeg_frames(content: bytes) -> tuple[int, list[bytes]]:
    """Walk a RIFF AVI container (public MS AVI/RIFF layout): read
    dwMicroSecPerFrame from the avih header and collect the '00dc'/
    '00db' video chunks of the movi LIST — for MJPEG streams each
    chunk IS a JPEG image. Returns (frame_interval_ms, [jpeg_bytes]).
    Raises ValueError on a malformed container."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    interval_ms = 0
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal interval_ms
        pos = start
        while pos + 8 <= end:
            cid = content[pos : pos + 4]
            size = struct.unpack_from("<I", content, pos + 4)[0]
            body, bend = pos + 8, pos + 8 + size
            if bend > end:
                raise ValueError("AVI chunk overruns container")
            if cid == b"LIST":
                walk(body + 4, bend)  # skip the list-type fourcc
            elif cid == b"avih" and size >= 4:
                us = struct.unpack_from("<I", content, body)[0]
                interval_ms = us // 1000
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(content[body:bend])
            pos = bend + (size & 1)  # RIFF chunks are word-aligned

    walk(12, len(content))
    return interval_ms, frames


def extract_video_frames(df: DataFrame, *, max_frames: int = 64) -> DataFrame:
    """REAL video frame extraction for MJPEG-in-AVI — the one video
    layout that is fully decodable with the engine's own codecs (RIFF
    walk + per-frame baseline-JPEG decode via ops/jpeg_codec.py; no
    external library). Each MEDIA_SCHEMA row fans out to one row per
    decoded frame with dimensions and channel means — the same 1->N
    mapInPandas shape as sample_frames, but with actual pixels.

    Inter-frame-predicted codecs (H.26x, VP9, AV1...) remain
    env-gated: rows whose container or frames do not decode are
    SKIPPED (a curation pipeline drops undecodable media; the
    sample_frames fake-codec path remains the oracle-mirrorable
    fan-out for those). max_frames bounds the per-row fan-out."""
    from dbitool_spark.ops import jpeg_codec

    schema = (
        "media_id bigint, frame_idx int, frame_ts_ms int, "
        "width int, height int, mean_r double, mean_g double, mean_b double"
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "frame_idx", "frame_ts_ms", "width", "height",
                "mean_r", "mean_g", "mean_b",
            )}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    interval_ms, frames = _avi_mjpeg_frames(bytes(content))
                except ValueError:
                    continue
                for i, frame in enumerate(frames[:max_frames]):
                    try:
                        w, h, planes = jpeg_codec.decode_jpeg(frame)
                    except ValueError:
                        continue
                    if len(planes) == 3:
                        rgb = jpeg_codec.ycbcr_to_rgb(planes)
                        means = [float(rgb[..., c].mean()) for c in range(3)]
                    else:
                        m = float(planes[0].mean())
                        means = [m, m, m]
                    rows["media_id"].append(media_id)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * interval_ms)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_r"].append(round(means[0], 6))
                    rows["mean_g"].append(round(means[1], 6))
                    rows["mean_b"].append(round(means[2], 6))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "frame_ts_ms": pd.Series(rows["frame_ts_ms"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "mean_r": pd.Series(rows["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(rows["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(rows["mean_b"], dtype="float64"),
                }
            )

    return df.mapInPandas(process, schema=schema)


def _try_real_decode(content: bytes) -> tuple[int, int, int, list[float]] | None:
    """Route by magic bytes to the stdlib container decoders; None
    falls through to the deterministic fake (unknown/compressed
    formats whose full decode needs external codecs)."""
    try:
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            return _decode_wav(content)
        if content[:2] == b"BM":
            return _decode_bmp(content)
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(content)
        if content[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif(content)
        if content[:2] == b"\xff\xd8":
            return _decode_jpeg_full(content)
        if len(content) >= 12 and content[4:8] == b"ftyp":
            return _decode_mp4(content)
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            interval_ms, frames = _avi_mjpeg_frames(content)
            w = h = 0
            if frames:  # dims from the first decodable MJPEG frame
                try:
                    from dbitool_spark.ops import jpeg_codec

                    w, h, _planes = jpeg_codec.decode_jpeg(frames[0])
                except ValueError:
                    dims = _decode_jpeg_dims(frames[0])
                    if dims:
                        w, h = dims[0], dims[1]
            return w, h, interval_ms * len(frames), [float(len(frames))]
    except (wave.Error, struct.error, EOFError, IndexError, ValueError):
        return None
    return None


def _decode_one(kind: str, content: bytes) -> tuple[int, int, int, list[float]]:
    content = bytes(content)
    real = _try_real_decode(content)
    if real is not None:
        return real
    return _fake_decode(kind, content)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for tests: wraps the documents table as MEDIA_SCHEMA
    rows (text bytes as the opaque content) so the multimodal plumbing
    has a deterministic corpus in this environment."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit("text/plain").alias("declared_mime"),
        ).alias("meta"),
    )


FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_ts_ms int, frame_sha string"
)

FRAME_INTERVAL_MS = 1000


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling over MEDIA_SCHEMA rows: each media row fans out
    to one row per sampled frame — the 1->N mapInPandas shape a video
    pipeline needs (the output batch is built per input batch, so
    Arrow still moves whole record batches and a 10-minute video
    never materializes as Python rows one call at a time).

    The codec is stubbed like extract_media_features: the fake
    "decoder" derives the frame count from the content size
    (1 + n_bytes % 7) and each frame's identity hash from
    sha256(content || '#' || frame_idx), so same bytes -> same frames
    and the whole operator is exactly SQL-mirrorable for the oracle.
    With real codecs, frame count = duration // FRAME_INTERVAL_MS and
    frame_sha becomes the decoded frame's digest — same schema, same
    fan-out shape."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, shas = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                n_frames = 1 + len(content) % 7
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    tss.append(i * FRAME_INTERVAL_MS)
                    shas.append(
                        hashlib.sha256(
                            content + b"#" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.mapInPandas(process, schema=FRAME_SCHEMA)


# --- deterministic media synthesis (for decode verification) ----------

SYNTH_RATE = 16_000  # WAV sample rate; divides 1000*frames exactly below


def _synth_wav(media_id: int) -> bytes:
    """Mono 16-bit WAV whose frame count is a closed-form function of
    the id: nframes = 8000 + (id % 5) * 1600, so the REAL wave-module
    decode must report duration_ms = 500 + (id % 5) * 100 exactly."""
    import numpy as np

    nframes = 8000 + (media_id % 5) * 1600
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SYNTH_RATE)
        # deterministic square-ish wave; content is irrelevant to the
        # container fields the decoder reports, but keep it id-keyed.
        # Vectorized: a per-frame struct.pack loop measured ~6s of the
        # sf0.1 bench entry by itself (~50M calls).
        amp = 1000 + (media_id % 7) * 100
        i = np.arange(nframes)
        v = np.where((i // 50) % 2 == 0, amp, -amp).astype("<i2")
        w.writeframes(v.tobytes())
    return buf.getvalue()


def _synth_bmp(media_id: int) -> bytes:
    """24-bit BMP with closed-form dimensions: width = 8 + id % 16,
    height = 8 + id % 9 — the REAL header decode must recover both."""
    width = 8 + media_id % 16
    height = 8 + media_id % 9
    row = bytearray()
    for x in range(width):
        px = (media_id + x) % 256
        row += bytes((px, 255 - px, (px * 7) % 256))
    row += b"\x00" * ((4 - (len(row) % 4)) % 4)  # 4-byte row padding
    pixels = bytes(row) * height
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + dib + pixels


def _synth_png(media_id: int) -> bytes:
    """Valid RGB8 PNG (public PNG spec: signature + IHDR + IDAT +
    IEND, CRC-32 per chunk, zlib-deflated filter-0 scanlines) with
    closed-form dimensions: width = 4 + id % 13, height = 4 + id % 11
    — the REAL IHDR decode must recover both."""
    import zlib

    width = 4 + media_id % 13
    height = 4 + media_id % 11

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    scanline = b"\x00" + bytes(
        ((media_id + x) % 256) for x in range(width * 3)
    )
    idat = zlib.compress(scanline * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _synth_gif(media_id: int) -> bytes:
    """Valid GIF89a (public spec) with closed-form dimensions:
    width = 6 + id % 10, height = 6 + id % 7, a 4-color global palette
    keyed by the id, and pixels LZW-coded with the classic
    "uncompressed GIF" technique — a CLEAR code before every literal
    keeps the code width fixed at min_code_size+1, so the encoder
    needs no dictionary while remaining fully spec-conformant for any
    decoder. Pixel (x, y) has palette index (x + y + id) % 4, so the
    REAL LZW decode's channel means are closed-form checkable."""
    width = 6 + media_id % 10
    height = 6 + media_id % 7
    palette = b""
    for c in range(4):
        palette += bytes((
            (media_id * 31 + c * 67) % 256,
            (media_id * 53 + c * 29) % 256,
            (media_id * 17 + c * 101) % 256,
        ))
    # LSD: GCT flag set, 4-entry table -> size field 1 (2^(1+1) = 4)
    lsd = struct.pack("<HHBBB", width, height, 0x80 | 0x01, 0, 0)
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    min_code = 2  # 4 literals; CLEAR=4, END=5, 3-bit codes
    codes = []
    for y in range(height):
        for x in range(width):
            codes.append(4)  # CLEAR: dictionary never grows past 3 bits
            codes.append((x + y + media_id) % 4)
    codes.append(5)  # END
    acc = nbits = 0
    packed = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += 3
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    blocks = bytearray((min_code,))
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        blocks += bytes((len(chunk),)) + chunk
    blocks += b"\x00"
    return b"GIF89a" + lsd + palette + img_desc + bytes(blocks) + b"\x3b"


def _synth_mp4(media_id: int) -> bytes:
    """Minimal valid ISO-BMFF container (ftyp + moov[mvhd + trak[tkhd]])
    with closed-form metadata: duration_ms = 1000 + (id % 20) * 250
    (timescale 1000), width = 160 + (id % 8) * 16,
    height = 96 + (id % 5) * 24 — the REAL box-walk decode must
    recover all three. No media data: this is the container tier."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    duration = 1000 + (media_id % 20) * 250  # ms at timescale 1000
    width = 160 + (media_id % 8) * 16
    height = 96 + (media_id % 5) * 24
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, 1000, duration)  # v0, times, scale, dur
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x03"  # version 0, flags: enabled | in_movie
        + struct.pack(">III", 0, 0, 1)  # ctime, mtime, track_id
        + b"\x00" * 4  # reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt_group, volume, reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def _synth_avi(media_id: int) -> bytes:
    """Minimal valid MJPEG AVI with closed-form metadata: n_frames =
    2 + id % 4 at 40 ms/frame (25 fps); frame i is the engine's own
    baseline JPEG of a deterministic (id, i)-keyed gradient, 16x8 —
    so REAL container walk + REAL per-frame JPEG decode recover
    frame count, timestamps and dimensions exactly."""
    import numpy as np

    from dbitool_spark.ops import jpeg_codec

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n_frames = 2 + media_id % 4
    avih = struct.pack("<IIIIIIIIII", 40_000, 0, 0, 0, n_frames, 0, 1, 0, 16, 8)
    avih += b"\x00" * 16  # reserved
    frames = b""
    for i in range(n_frames):
        xx, yy = np.meshgrid(np.arange(16), np.arange(8))
        rgb = np.stack(
            [
                (xx * 7 + media_id + i * 11) % 200,
                (yy * 9 + 2 * media_id) % 200,
                ((xx + yy) * 3 + i) % 200,
            ],
            axis=-1,
        ).astype(np.uint8)
        frames += chunk(b"00dc", jpeg_codec.encode_jpeg(rgb))
    body = b"AVI " + lst(b"hdrl", chunk(b"avih", avih)) + lst(b"movi", frames)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_media(df: DataFrame, id_col: str, *, families: int = 3) -> DataFrame:
    """mapInPandas media synthesizer: each input id becomes one
    MEDIA_SCHEMA row with REAL container bytes — WAV for id % 3 == 0,
    BMP for == 1, PNG for == 2 — whose decoded fields are closed-form
    functions of the id. This is the verification harness for the
    real decoders: a SQL oracle can state the expected width/height/
    duration purely arithmetically, so a driver hash match proves the
    wave/struct/IHDR parsing end to end (same pattern as testrow's
    exact-value fixture). families=4 adds GIF at id % 4 == 3 (full
    LZW decode) — the registered media_decode_roundtrip entry runs at
    4 since r9; families=3 remains for the pre-GIF arithmetic."""
    ids_df = df.select(F.col(id_col).cast("bigint").alias("media_id"))
    synths = {
        0: ("audio", "audio/wav", _synth_wav),
        1: ("image", "image/bmp", _synth_bmp),
        2: ("image", "image/png", _synth_png),
        3: ("image", "image/gif", _synth_gif),
    }
    if families not in (3, 4):
        raise ValueError(f"families must be 3 or 4, got {families}")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "content": [], "meta": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                kind, mime, fn = synths[mid % families]
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["content"].append(fn(mid))
                rows["meta"].append({"source": "synth", "declared_mime": mime})
            yield pd.DataFrame(rows)

    return ids_df.mapInPandas(synth, schema=MEDIA_SCHEMA)


# --- image RESIZE (the pre-processing step between decode and
# --- feature extraction / model input) ---------------------------------

RESIZE_SCHEMA = (
    "media_id long, kind string, src_w int, src_h int, out_w int, "
    "out_h int, decoded boolean, mean_r double, mean_g double, mean_b double"
)


def _pixels_bmp(content: bytes):
    """Full-pixel BMP decode to an RGB uint8 (h, w, 3) array — the
    uncompressed 24-bit BI_RGB layout only (the family the synth
    fixture and the feature decoder's pixel path cover); bottom-up
    rows flipped to top-down. None on any other variant."""
    import numpy as np

    if content[:2] != b"BM":
        return None
    try:
        dib_size = struct.unpack_from("<I", content, 14)[0]
        if dib_size < 40:
            return None
        width, height = struct.unpack_from("<ii", content, 18)
        bpp = struct.unpack_from("<H", content, 28)[0]
        compression = struct.unpack_from("<I", content, 30)[0]
        if bpp != 24 or compression != 0 or width <= 0 or height == 0:
            return None
        offset = struct.unpack_from("<I", content, 10)[0]
        h = abs(height)
        stride = (width * 3 + 3) & ~3
        if offset + stride * h > len(content):
            return None
        rows = (
            np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=offset)
            .reshape(h, stride)[:, : width * 3]
            .reshape(h, width, 3)
        )
        if height > 0:  # bottom-up storage
            rows = rows[::-1]
        return rows[:, :, ::-1]  # BGR -> RGB
    except (struct.error, ValueError):
        return None


def _pixels_png(content: bytes):
    """Full-pixel PNG decode to an RGB uint8 (h, w, 3) array — 8-bit
    non-interlaced gray/RGB/gray+alpha/RGBA (gray replicates to three
    channels, alpha drops). None on palette/16-bit/interlaced or any
    parse failure."""
    import zlib

    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        width, height = struct.unpack_from(">II", content, 16)
        bit_depth, color_type, _comp, _filt, interlace = content[24:29]
        channels = _PNG_CHANNELS.get(color_type)
        if bit_depth != 8 or channels is None or interlace != 0:
            return None
        i, idat = 8, bytearray()
        while i + 8 <= len(content):
            (ln,) = struct.unpack_from(">I", content, i)
            tag = content[i + 4 : i + 8]
            body = content[i + 8 : i + 8 + ln]
            (crc,) = struct.unpack_from(">I", content, i + 8 + ln)
            if crc != zlib.crc32(tag + body):
                return None
            if tag == b"IDAT":
                idat += body
            if tag == b"IEND":
                break
            i += 12 + ln
        raw = zlib.decompress(bytes(idat))
        if len(raw) != height * (1 + width * channels):
            return None
        flat = _png_unfilter(raw, width, height, channels)
        px = np.frombuffer(bytes(flat), dtype=np.uint8).reshape(height, width, channels)
        if channels == 1:
            return np.repeat(px, 3, axis=2)
        if channels == 2:  # gray + alpha
            return np.repeat(px[:, :, :1], 3, axis=2)
        return px[:, :, :3]  # RGB / RGBA minus alpha
    except (zlib.error, ValueError, IndexError, struct.error):
        return None


def _pixels_gif(content: bytes):
    """Full-pixel GIF decode to an RGB uint8 (h, w, 3) array — first
    non-interlaced frame through the LZW decoder + palette. None on
    interlace, oversize frames, or any parse failure. (Standalone
    walk, deliberately not threaded through _decode_gif: that
    function's fallback ladder backs a recorded driver hash.)"""
    import numpy as np

    if content[:4] != b"GIF8":
        return None
    try:
        packed = content[10]
        bits = (packed & 0x07) + 1
        pos = 13
        gct = None
        if packed & 0x80:
            n = 3 * (1 << bits)
            gct = content[pos : pos + n]
            pos += n
        while pos < len(content):
            block = content[pos]
            if block == 0x21:
                pos += 2
                while pos < len(content) and content[pos] != 0:
                    pos += 1 + content[pos]
                pos += 1
            elif block == 0x2C:
                iw, ih = struct.unpack_from("<HH", content, pos + 5)
                ipacked = content[pos + 9]
                pos += 10
                palette = gct
                if ipacked & 0x80:
                    n = 3 * (1 << ((ipacked & 0x07) + 1))
                    palette = content[pos : pos + n]
                    pos += n
                if bool(ipacked & 0x40) or palette is None or iw * ih > (1 << 22):
                    return None
                min_code = content[pos]
                pos += 1
                data = bytearray()
                while pos < len(content) and content[pos] != 0:
                    ln = content[pos]
                    data += content[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                idx = _gif_lzw(bytes(data), min_code, iw * ih)
                if idx is None or len(idx) < iw * ih:
                    return None
                pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
                flat = np.frombuffer(bytes(idx[: iw * ih]), dtype=np.uint8) % len(pal)
                return pal[flat].reshape(ih, iw, 3)
            else:
                break
        return None
    except (struct.error, ValueError, IndexError):
        return None


def _fake_pixels(content: bytes):
    """Deterministic digest-keyed 16x16 RGB stand-in for kinds without
    a pixel decoder (same honesty contract as _fake_decode): resize
    plumbing stays testable, the `decoded` flag stays False."""
    import numpy as np

    digest = hashlib.sha256(content).digest()
    y, x, c = np.ogrid[0:16, 0:16, 0:3]
    d = np.frombuffer(digest, dtype=np.uint8)
    return d[(x + y + c) % 32].astype(np.uint8)


_PIXEL_DECODERS = (_pixels_bmp, _pixels_png, _pixels_gif)


def resize_nearest(px, out_w: int, out_h: int):
    """Nearest-neighbor resize by integer index mapping: source index
    = (dst_index * src_dim) // dst_dim — pure integer arithmetic, so
    the resized array (and anything derived from it) is exactly
    reproducible on any engine or platform."""
    import numpy as np

    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[np.ix_(ys, xs)]


def resize_media(df: DataFrame, *, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """mapInPandas image resize over MEDIA_SCHEMA rows: real pixel
    decode (BMP/PNG/GIF) -> nearest-neighbor resize -> per-channel
    means of the RESIZED image, rounded to 1e-6. Kinds without a
    pixel decoder resize the digest-keyed fake grid with
    decoded=False — the plumbing (schema, batching, arithmetic) is
    identical either way. Means are exact: integer pixel sums divided
    by out_w*out_h (a power of two in the default), so cross-engine
    oracles can state them arithmetically. Same partitioning guidance
    as extract_media_features: media bytes never leave the executors."""
    import numpy as np

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "src_w": [], "src_h": [],
                "out_w": [], "out_h": [], "decoded": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                px = None
                for dec in _PIXEL_DECODERS:
                    px = dec(content)
                    if px is not None:
                        break
                decoded = px is not None
                if px is None:
                    px = _fake_pixels(content)
                rs = resize_nearest(px, out_w, out_h)
                sums = rs.reshape(-1, 3).sum(axis=0, dtype="int64")
                n = out_w * out_h
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["src_h"].append(int(px.shape[0]))
                out["src_w"].append(int(px.shape[1]))
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["decoded"].append(decoded)
                out["mean_r"].append(round(float(sums[0]) / n, 6))
                out["mean_g"].append(round(float(sums[1]) / n, 6))
                out["mean_b"].append(round(float(sums[2]) / n, 6))
            yield pd.DataFrame(out)

    return df.mapInPandas(process, schema=RESIZE_SCHEMA)
