"""Baseline JPEG codec (riot_spark.jpeg, round-5 #5): the
exact-roundtrip fixture subspace, general lossy roundtrip error
bounds, color, odd sizes, and the decode_image sniffing path."""

from __future__ import annotations

import numpy as np
import pytest

from riot_spark.jpeg import jpeg_decode, jpeg_encode
from riot_spark.multimodal import decode_image


def _flat_block_gray(m: int, w: int = 16, h: int = 16) -> np.ndarray:
    g = np.zeros((h, w), np.uint8)
    nbx = w // 8
    for by in range(h // 8):
        for bx in range(nbx):
            j = by * nbx + bx
            g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (m * 7 + j * 13) % 256
    return g


@pytest.mark.parametrize("m", [0, 3, 77, 255, 123456])
def test_flat_block_quality100_is_bit_exact(m):
    """The oracle fixture subspace: constant 8x8 blocks + all-ones
    quantization roundtrip BIT-EXACTLY through the lossy codec (DC-only
    coefficients quantize without loss, IDCT of a constant is exact)."""
    g = _flat_block_gray(m)
    out = jpeg_decode(jpeg_encode(g, quality=100))
    assert out.shape == (16, 16, 3)
    for c in range(3):
        assert (out[:, :, c] == g).all()


def test_gray_lossy_roundtrip_error_bounded():
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    smooth = ((xx * 3 + yy * 5) % 200 + 20).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(smooth, quality=90))[:, :, 0]
    err = np.abs(out.astype(int) - smooth.astype(int))
    assert err.mean() < 2.0 and err.max() <= 20

    rng = np.random.default_rng(42)
    noise = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(noise, quality=90))[:, :, 0]
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 8.0


def test_rgb_444_roundtrip():
    xx, yy = np.meshgrid(np.arange(24), np.arange(16))
    px = np.stack(
        [(xx * 7) % 256, np.full_like(xx, 100), (yy * 11) % 256], axis=2
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(px, quality=95))
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 8, err.max()


def test_odd_dimensions_padded_and_cropped():
    xx, yy = np.meshgrid(np.arange(21), np.arange(13))
    g = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(g, quality=100))
    assert out.shape == (13, 21, 3)
    # q=100 on a pattern whose AC energy survives all-ones quant:
    # near-exact (round-trip rounding only)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 1


def test_decode_image_sniffs_jpeg():
    g = _flat_block_gray(9)
    data = jpeg_encode(g, quality=100)
    px = decode_image(data, {}, fake=False)
    assert (px[:, :, 0] == g).all()


def test_decoder_rejects_progressive_and_truncated():
    g = _flat_block_gray(1)
    data = bytearray(jpeg_encode(g, quality=100))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(data))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x11not a jpeg")
