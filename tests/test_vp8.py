"""VP8 (lossy WebP) decoder conformance tests.

Three independent pins:

1. pure unit tests of the fixed-point transforms and the boolean
   coder (encoder<->decoder round trip over random bit/prob streams);
2. the flat-color fixture writer round-trips through OUR decoder to
   the documented closed forms (no external library involved);
3. differential fuzz vs the SYSTEM libwebp via ctypes (gated on the
   library loading): our YUV planes must equal WebPDecodeYUV
   BIT-EXACTLY over randomized content, sizes, and quality levels —
   one wrong table value or filter tap desyncs the arithmetic
   decoder, so bit-equality over the corpus is a strong conformance
   proof — and libwebp must decode OUR writer's streams to the same
   closed forms (writer conformance).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mechaml_spark import vp8
from mechaml_spark.webp import webp_decode, webp_encode_lossy_flat


def _libwebp():
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    return lib


def _lib_encode(lib, px, q):
    import ctypes

    h, w, _ = px.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(px).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        w, h, w * 3, ctypes.c_float(q), ctypes.byref(out),
    )
    data = bytes(
        bytearray(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    )
    lib.WebPFree(out)
    return data


def _lib_yuv(lib, data):
    import ctypes

    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert yp, "libwebp refused the stream"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    y = np.ctypeslib.as_array(yp, shape=(H * S,)).reshape(H, S)[:, :W].copy()
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = np.ctypeslib.as_array(up, shape=(ch * US,)).reshape(ch, US)[
        :, :cw
    ].copy()
    v = np.ctypeslib.as_array(vp, shape=(ch * US,)).reshape(ch, US)[
        :, :cw
    ].copy()
    lib.WebPFree(yp)
    return y, u, v


def _vp8_payload(data):
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if fourcc == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ------------------------------------------------------------- units


def test_idct_dc_only_is_flat():
    co = np.zeros(16, np.int32)
    co[0] = 100
    out = vp8._idct4x4(co)
    assert (out == (100 + 4) >> 3).all()
    co[0] = -100
    assert (vp8._idct4x4(co) == ((-100 + 4) >> 3)).all()  # floor shift


def test_iwht_dc_only_distributes():
    co = np.zeros(16, np.int32)
    co[0] = 80
    assert vp8._iwht4x4(co) == [(80 + 3) >> 3] * 16


def test_bool_coder_round_trip():
    rng = np.random.default_rng(3)
    probs = rng.integers(1, 255, 500).tolist()
    bits = rng.integers(0, 2, 500).tolist()
    be = vp8.BoolEncoder()
    for p, b in zip(probs, bits):
        be.write(p, b)
    data = be.flush()
    bd = vp8.BoolDecoder(data)
    got = [bd.read(p) for p in probs]
    assert got == bits


def test_tree_paths_cover_all_tokens():
    for tok in range(12):
        path = vp8._tree_path(vp8.COEFF_TREE, tok)
        # replay the path through a decoder-style walk
        i = 0
        for node, bit in path:
            assert node == i
            i = vp8.COEFF_TREE[i + bit]
        assert i == -tok


# ------------------------------------------- writer <-> own decoder


@pytest.mark.parametrize(
    "w,h,vy,vu,vv,qi",
    [
        (16, 16, 10, -5, 7, 0),
        (16, 16, 0, 0, 0, 0),
        (16, 16, 0, 16, 128, 0),
        (16, 16, 0, 0, 7, 127),
        (48, 32, 100, 60, -60, 10),
        (17, 23, -30, 2, 1, 4),
        (64, 64, 500, 120, -120, 0),
        (100, 60, 67, 35, 19, 127),
        (1, 1, 3, 1, -1, 0),
    ],
)
def test_flat_writer_closed_form(w, h, vy, vu, vv, qi):
    data = vp8.vp8_encode_flat(w, h, vy, vu, vv, qi)
    y, u, v = vp8.decode_yuv(data)
    ey, eu, ev = vp8.webp_lossy_flat_value(vy, vu, vv, qi)
    assert y.shape == (h, w)
    assert (y == ey).all() and (u == eu).all() and (v == ev).all()


def test_webp_container_lossy_decode():
    data = webp_encode_lossy_flat(32, 16, 40, -20, 20, 8)
    rgb = webp_decode(data)
    assert rgb.shape == (16, 32, 3)
    ey, eu, ev = vp8.webp_lossy_flat_value(40, -20, 20, 8)
    exp = vp8.yuv_to_rgb(
        np.full((16, 32), ey, np.uint8),
        np.full((8, 16), eu, np.uint8),
        np.full((8, 16), ev, np.uint8),
    )
    assert np.array_equal(rgb, exp)
    # flat image -> one distinct color
    assert len(np.unique(rgb.reshape(-1, 3), axis=0)) == 1


# ------------------------------------------------ libwebp differential


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_differential_bit_exact_vs_libwebp():
    lib = _libwebp()
    rng = np.random.default_rng(42)
    for (w, h) in [(16, 16), (48, 32), (17, 23), (64, 64), (33, 33),
                   (160, 120), (7, 5), (1, 1)]:
        for q in (10, 50, 75, 95):
            x = np.linspace(0, 255, w)
            yy = np.linspace(0, 255, h)
            gr = (yy[:, None] + x[None, :]) / 2
            px = np.stack([gr, 255 - gr, gr * 0.5 + 64], -1)
            px += rng.normal(0, 30, px.shape)
            if h >= 3:
                px[h // 3:h // 2, :] = rng.integers(0, 255, 3)
            px = np.clip(px, 0, 255).astype(np.uint8)
            data = _lib_encode(lib, px, q)
            y, u, v = vp8.decode_yuv(_vp8_payload(data))
            ly, lu, lv = _lib_yuv(lib, data)
            assert np.array_equal(y, ly), f"{w}x{h} q{q}: Y differs"
            assert np.array_equal(u, lu), f"{w}x{h} q{q}: U differs"
            assert np.array_equal(v, lv), f"{w}x{h} q{q}: V differs"


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_writer_conformance_libwebp_decodes_closed_form():
    lib = _libwebp()
    for (w, h, vy, vu, vv, qi) in [
        (16, 16, 10, -5, 7, 0),
        (48, 32, 100, 60, -60, 10),
        (17, 23, -30, 2, 1, 4),
        (33, 17, 67, 35, 19, 60),
    ]:
        data = webp_encode_lossy_flat(w, h, vy, vu, vv, qi)
        ly, lu, lv = _lib_yuv(lib, data)
        ey, eu, ev = vp8.webp_lossy_flat_value(vy, vu, vv, qi)
        assert (ly == ey).all() and (lu == eu).all() and (lv == ev).all()


@pytest.mark.skipif(_libwebp() is None, reason="system libwebp absent")
def test_rgb_psnr_vs_libwebp_rgb():
    """Our BT.601 RGB path vs libwebp's fancy-upsampler RGB: not
    bit-comparable by design, but must clear the engine's PSNR>=40dB
    lossy-payload bar on smooth content."""
    import ctypes

    lib = _libwebp()
    lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    rng = np.random.default_rng(5)
    x = np.linspace(0, 255, 64)
    gr = (x[None, :] + x[:, None]) / 2
    px = np.clip(
        np.stack([gr, 255 - gr, gr], -1) + rng.normal(0, 6, (64, 64, 3)),
        0, 255,
    ).astype(np.uint8)
    data = _lib_encode(lib, px, 90)
    ours = webp_decode(data).astype(np.float64)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    theirs = (
        np.ctypeslib.as_array(ptr, shape=(h.value * w.value * 3,))
        .reshape(h.value, w.value, 3)
        .astype(np.float64)
    )
    mse = np.mean((ours - theirs) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse) if mse else np.inf
    assert psnr >= 40.0, f"RGB PSNR {psnr:.1f} dB vs libwebp"


def test_animated_webp_with_lossy_vp8_frames():
    """ANMF frames carrying ``VP8 `` (lossy) payloads decode through
    vp8.py inside the shared animation compositor — hand-assembled
    container, flat frames, closed-form colors."""
    import struct as _struct

    from mechaml_spark.webp import _chunk, _u24, webp_decode_frames

    def anmf(x, y, w, h, dur, payload):
        hdr = (_u24(x // 2) + _u24(y // 2) + _u24(w - 1) + _u24(h - 1)
               + _u24(dur) + bytes([0x02]))  # no blend, no dispose
        return _chunk(b"ANMF", hdr + _chunk(b"VP8 ", payload))

    f0 = vp8.vp8_encode_flat(16, 16, 40, 0, 0, 0)
    f1 = vp8.vp8_encode_flat(16, 16, 0, 0, 120, 0)
    body = _chunk(
        b"VP8X", bytes([0x02]) + b"\x00\x00\x00" + _u24(15) + _u24(15)
    )
    body += _chunk(b"ANIM", bytes([0, 0, 0, 255]) + _struct.pack("<H", 0))
    body += anmf(0, 0, 16, 16, 100, f0) + anmf(0, 0, 16, 16, 200, f1)
    data = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    frames = webp_decode_frames(data)
    assert [d for d, _ in frames] == [100, 200]
    ey0, eu0, ev0 = vp8.webp_lossy_flat_value(40, 0, 0, 0)
    exp0 = vp8.yuv_to_rgb(
        np.full((16, 16), ey0, np.uint8),
        np.full((8, 8), eu0, np.uint8),
        np.full((8, 8), ev0, np.uint8),
    )
    assert np.array_equal(frames[0][1], exp0)
    ey1, eu1, ev1 = vp8.webp_lossy_flat_value(0, 0, 120, 0)
    exp1 = vp8.yuv_to_rgb(
        np.full((16, 16), ey1, np.uint8),
        np.full((8, 8), eu1, np.uint8),
        np.full((8, 8), ev1, np.uint8),
    )
    assert np.array_equal(frames[1][1], exp1)


def test_corrupt_streams_fail_cleanly():
    """Crawl reality: truncated/garbage payloads must raise (ValueError
    family) promptly — never hang, never return garbage silently."""
    rng = np.random.default_rng(9)
    good = vp8.vp8_encode_flat(32, 32, 50, 20, -20, 10)
    for blob in [
        b"", b"\x00", b"\xff" * 10,
        good[:9],                       # header truncation
        good[:len(good) // 2],          # mid-stream truncation
        b"\x00" * 3 + good[3:],         # broken frame tag
        bytes(rng.integers(0, 256, 200, dtype=np.uint8)),
    ]:
        try:
            vp8.decode_yuv(blob)
        except ValueError:
            pass  # VP8Error is a ValueError
    # bit flips in the token partition: decode returns SOMETHING or
    # raises, but always terminates (bounded loops by construction)
    for pos in range(20, min(len(good), 60), 7):
        b = bytearray(good)
        b[pos] ^= 0xFF
        try:
            vp8.decode_yuv(bytes(b))
        except ValueError:
            pass


@pytest.mark.parametrize("nparts", [2, 4, 8])
def test_multi_token_partitions(nparts):
    """§9.5 multi-partition token layout (MB row r reads partition
    r % n; 3-byte little-endian sizes): libwebp's simple encoder
    never emits this, so the writer is the only in-sandbox source —
    both our decoder and libwebp (when present) must land on the
    closed forms."""
    vy, vu, vv, qi = 37, 21, -14, 6
    p = vp8.vp8_encode_flat(48, 80, vy, vu, vv, qi,
                            n_token_partitions=nparts)
    y, u, v = vp8.decode_yuv(p)
    ey, eu, ev = vp8.webp_lossy_flat_value(vy, vu, vv, qi)
    assert (y == ey).all() and (u == eu).all() and (v == ev).all()
    lib = _libwebp()
    if lib is not None:
        chunk = b"VP8 " + struct.pack("<I", len(p)) + p
        if len(p) & 1:
            chunk += b"\x00"
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        ly, lu, lv = _lib_yuv(lib, data)
        assert (ly == ey).all() and (lu == eu).all() and (lv == ev).all()
