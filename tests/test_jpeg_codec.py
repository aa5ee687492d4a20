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
