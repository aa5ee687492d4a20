"""Baseline JPEG codec (ops/jpeg_codec.py): own-encoder round-trips
with quantization-error bounds across sampling modes, the multimodal
router's full-decode feature contract, and the honest-split fallbacks
(progressive, oversized frames)."""

from __future__ import annotations

import numpy as np
import pytest

from dbitool_spark.ops import jpeg_codec as J
from dbitool_spark.ops.multimodal import _decode_one


def _gradient(h, w, seed=0):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [
            (xx * 3 + seed) % 220,
            (yy * 5 + 2 * seed) % 220,
            ((xx + yy) * 2 + seed) % 220,
        ],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "mode,kwargs,bound",
    [
        ("444", {}, 8.0),
        ("420", {"subsample": True}, 12.0),
        ("gray", {"grayscale": True}, 6.0),
        ("rst1", {"restart_interval": 1}, 8.0),
        ("rst3_420", {"restart_interval": 3, "subsample": True}, 12.0),
    ],
)
def test_jpeg_roundtrip_modes(mode, kwargs, bound):
    """Every sampling/restart layout decodes to pixels within the
    quantization-error bound, with exact dimensions — including
    non-multiple-of-8 (and of-16, for 4:2:0) frames."""
    rgb = _gradient(21, 35, seed=3)
    w, h, planes = J.decode_jpeg(J.encode_jpeg(rgb, **kwargs))
    assert (w, h) == (35, 21)
    if len(planes) == 3:
        err = np.abs(J.ycbcr_to_rgb(planes) - rgb.astype(np.float64))
    else:
        ytrue = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        err = np.abs(planes[0] - ytrue)
    assert float(err.max()) < bound, mode


def test_jpeg_router_full_decode_feature():
    """_decode_one routes JPEG through the full pixel decode:
    feature = [n_components, mean_r, mean_g, mean_b] with means within
    ~2 levels of the source (channel means average out the per-pixel
    quantization error)."""
    rgb = _gradient(24, 40)
    w, h, dur, feat = _decode_one("image", J.encode_jpeg(rgb))
    assert (w, h, dur) == (40, 24, 0)
    assert feat[0] == 3.0 and len(feat) == 4
    for c in range(3):
        assert abs(feat[1 + c] - float(rgb[..., c].mean())) < 2.0


def test_jpeg_progressive_falls_back_to_dims():
    """SOF2 (progressive) is not decoded: decode_jpeg raises, and the
    router degrades to the dimension-only SOF scan."""
    enc = bytearray(J.encode_jpeg(_gradient(16, 16)))
    i = enc.find(b"\xff\xc0")
    assert i > 0
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(bytes(enc))
    w, h, dur, feat = _decode_one("image", bytes(enc))
    assert (w, h) == (16, 16) and len(feat) == 1  # dims-only feature


def test_jpeg_area_cap():
    """Frames over max_pixels raise (the bound on the sequential
    entropy loop); the router falls back to dims."""
    enc = J.encode_jpeg(_gradient(32, 32))
    with pytest.raises(ValueError, match="max_pixels"):
        J.decode_jpeg(enc, max_pixels=100)


def test_jpeg_truncated_stream_raises():
    enc = J.encode_jpeg(_gradient(16, 16))
    with pytest.raises(ValueError):
        J.decode_jpeg(enc[: len(enc) // 2])


def test_jpeg_noise_bounded():
    """Random noise is JPEG's worst case: error is large but bounded
    (no crash, exact dims) — decodability, not fidelity."""
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    w, h, planes = J.decode_jpeg(J.encode_jpeg(noise))
    assert (w, h) == (24, 16)
    assert float(np.abs(J.ycbcr_to_rgb(planes) - noise).max()) < 128


def _patch_seg(enc: bytes, marker: bytes) -> int:
    i = enc.find(marker)
    assert i > 0
    return i


def test_jpeg_corrupt_streams_raise_valueerror_only():
    """Every corrupt-stream failure mode must surface as ValueError
    (the one type the router's dims fallback catches) — not KeyError/
    ZeroDivisionError crashing the mapInPandas batch."""
    base = bytearray(J.encode_jpeg(_gradient(16, 16)))

    # strip all DHT segments -> entropy decode finds no tables
    no_dht = bytearray()
    i = 0
    enc = bytes(base)
    no_dht += enc[:2]
    i = 2
    import struct as _s

    while i + 4 <= len(enc):
        marker = enc[i + 1]
        if marker == 0xDA:
            no_dht += enc[i:]
            break
        seg_len = _s.unpack_from(">H", enc, i + 2)[0]
        if marker != 0xC4:
            no_dht += enc[i : i + 2 + seg_len]
        i += 2 + seg_len
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(no_dht))

    # zero sampling factors -> previously ZeroDivisionError
    sof = _patch_seg(bytes(base), b"\xff\xc0")
    zero_samp = bytearray(base)
    zero_samp[sof + 11] = 0x00  # first component h/v byte
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(zero_samp))

    # zero-dimension frame -> ValueError, and the router must NOT
    # emit NaN means
    zdim = bytearray(base)
    zdim[sof + 5 : sof + 9] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(zdim))
    feat = _decode_one("image", bytes(zdim))[3]
    assert all(f == f for f in feat)  # no NaN


def test_jpeg_non_interleaved_falls_back():
    """A first SOS covering fewer components than the frame (legal
    non-interleaved baseline) raises explicitly and the router
    degrades to dims."""
    enc = bytearray(J.encode_jpeg(_gradient(16, 16)))
    sos = _patch_seg(bytes(enc), b"\xff\xda")
    enc[sos + 4] = 1  # ns: 3 -> 1 (length field left as-is: parse only)
    with pytest.raises(ValueError, match="non-interleaved"):
        J.decode_jpeg(bytes(enc))
    w, h, _, feat = _decode_one("image", bytes(enc))
    assert (w, h) == (16, 16) and len(feat) == 1


def test_jpeg_fill_bytes_between_segments():
    """0xFF fill bytes before a marker (T.81 B.1.1.2) must not break
    the full pixel decode (the dims scan already tolerated them)."""
    enc = J.encode_jpeg(_gradient(16, 16))
    sof = enc.find(b"\xff\xc0")
    padded = enc[:sof] + b"\xff\xff\xff" + enc[sof:]
    w, h, planes = J.decode_jpeg(padded)
    assert (w, h) == (16, 16) and len(planes) == 3


def test_jpeg_component_bomb_header_rejected():
    """A crafted header with a huge component count must be rejected
    before grid allocation (the area cap covers w*h*ncomp)."""
    import struct as _s

    def seg(marker, body):
        return _s.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # SOF claiming 255 components on a 2048x2048 frame
    sof = _s.pack(">BHHB", 8, 2048, 2048, 255)
    for c in range(255):
        sof += bytes([c + 1, 0x11, 0])
    bomb = b"\xff\xd8" + seg(0xC0, sof) + seg(0xDA, bytes([1, 1, 0, 0, 63, 0]))
    with pytest.raises(ValueError):
        J.decode_jpeg(bomb)


def test_jpeg_dqt_is_zigzag_ordered():
    """The DQT segment must carry the table in zigzag order (T.81
    B.2.4.1): a third-party decoder reading it positionally must see
    QUANT_LUM's DC value first and its zigzag neighbours in zigzag
    sequence."""
    enc = J.encode_jpeg(_gradient(16, 16), quality_scale=1.0)
    i = enc.find(b"\xff\xdb")
    body = enc[i + 5 : i + 5 + 64]  # skip marker, length, pq/tq byte
    expect = J.QUANT_LUM[J.ZIGZAG].astype(int)
    assert list(body) == list(expect)
