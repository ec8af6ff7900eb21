"""PNG/PPM codec + PSNR unit tests (stdlib-only, no Spark)."""

from __future__ import annotations

import numpy as np
import pytest

from mechaml_spark import imaging


def _px(seed=7, h=9, w=13):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_bit_exact():
    px = _px()
    data = imaging.png_encode(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = imaging.png_decode(data)
    assert np.array_equal(back, px)


def test_ppm_roundtrip():
    px = _px(11)
    assert np.array_equal(imaging.ppm_decode(imaging.ppm_encode(px)), px)


def test_png_filtered_rows_decode():
    """Decoder handles filter types 1/2/3/4 even though we emit 0."""
    import struct
    import zlib

    px = _px(3, 4, 5)
    h, w = px.shape[:2]
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    # encode with Up filter (type 2) by hand
    raw[:, 0] = 2
    flat = px.reshape(h, w * 3).astype(np.int32)
    prev = np.zeros(w * 3, np.int32)
    for y in range(h):
        raw[y, 1:] = ((flat[y] - prev) & 0xFF).astype(np.uint8)
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + imaging._chunk(b"IHDR", ihdr)
        + imaging._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + imaging._chunk(b"IEND", b"")
    )
    assert np.array_equal(imaging.png_decode(data), px)


def test_psnr():
    px = _px()
    assert imaging.psnr(px, px) == float("inf")
    noisy = px.astype(np.int32).copy()
    noisy[0, 0, 0] = (noisy[0, 0, 0] + 4) % 256
    val = imaging.psnr(px, noisy.astype(np.uint8))
    assert val > 40.0
    garbage = np.zeros_like(px)
    assert imaging.psnr(px, garbage) < 40.0


def test_payload_ok():
    px = _px()
    assert imaging.payload_ok(imaging.png_encode(px), "png", px)
    other = _px(99)
    assert not imaging.payload_ok(imaging.png_encode(other), "png", px)
    assert not imaging.payload_ok(b"junk", "png", px)
    with pytest.raises(NotImplementedError):
        imaging.decode(b"x", "jpeg")  # stubbed: no lossy codec in-sandbox
