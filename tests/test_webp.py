"""WebP lossless (VP8L) codec tests.

Encoder round trips cover literals + subtract-green + palette
(incl. sub-byte bundling); the decode-only surfaces (LZ77 backward
references, 2-D distance plane codes, color cache, meta-Huffman,
predictor and cross-color transforms) are exercised by hand-built
spec-conformant streams assembled from the module's bit-writer and
Huffman-writer internals.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mechaml_spark import imaging
from mechaml_spark import webp
from mechaml_spark.webp import (
    _CODE_TO_OFFSET,
    _BitWriter,
    _pred_pixel,
    _write_huffman_code,
    _write_pixels,
    vp8l_decode,
    vp8l_encode,
    webp_decode,
    webp_encode,
)


def _riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


# ------------------------------------------------------- round trips


def test_round_trip_all_modes():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 5), (12, 16), (9, 13), (16, 1)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for mode in ("none", "subtract-green"):
            assert (webp_decode(webp_encode(px, mode=mode)) == px).all()
        few = (px // 64) * 64  # <= 64 distinct colors
        assert (webp_decode(webp_encode(few, mode="palette")) == few).all()
        auto = webp_decode(webp_encode(px, mode="auto"))
        assert (auto == px).all()


def test_palette_bundling_widths():
    """1/2/4-bit packed palette indices, odd widths (partial bundle)."""
    rng = np.random.default_rng(3)
    for n_colors, w in [(2, 13), (2, 8), (4, 7), (16, 9), (3, 1), (5, 2)]:
        vals = np.linspace(0, 255, n_colors).astype(np.uint8)
        idx = rng.integers(0, n_colors, (5, w))
        px = np.stack([vals[idx]] * 3, axis=-1)
        assert (webp_decode(webp_encode(px, mode="palette")) == px).all()


def test_imaging_dispatch_and_sniff():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    data = imaging.encode(px, "webp")
    assert (imaging.decode(data, "webp") == px).all()
    from mechaml_spark.sniff import sniff_mime  # noqa: F401 - import ok


# -------------------------------------------- hand-built stream: LZ77


def _literal_tables(bw, pixels, extra_green=(), dist_syms=(0,),
                    green_alpha=256 + 24):
    """Write the five Huffman codes for a literal set + LZ77 symbols;
    return the code tables (green, red, blue, alpha, dist)."""
    freqs = [dict() for _ in range(4)]  # G R B A stream order
    for a, r, g, b in pixels:
        for d, v in zip(freqs, (g, r, b, a)):
            d[v] = d.get(v, 0) + 1
    for s in extra_green:
        freqs[0][s] = freqs[0].get(s, 0) + 1
    tables = []
    for fr, n in zip(freqs, (green_alpha, 256, 256, 256)):
        tables.append(_write_huffman_code(bw, fr, n))
    tables.append(
        _write_huffman_code(bw, {s: 1 for s in dist_syms}, 40)
    )
    return tables


def _emit_literal(bw, tables, pix):
    a, r, g, b = pix
    for t, v in zip(tables, (g, r, b, a)):
        bw.code(*t[v])


def test_lz77_dist1_run():
    """Literal then a length-7 distance-1 copy fills the image."""
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    p0 = (255, 10, 20, 30)
    # length 7 -> prefix code 5 with 1 extra bit 0 (offset 7); keep it
    # simpler: length codes 0-3 are literal lengths 1-4 -> use two
    # refs of length 4 and 3 (codes 3 and 2).
    tables = _literal_tables(bw, [p0], extra_green=(256 + 3, 256 + 2),
                             dist_syms=(1,))
    _emit_literal(bw, tables, p0)
    for green_sym in (256 + 3, 256 + 2):  # lengths 4, 3
        bw.code(*tables[0][green_sym])
        bw.code(*tables[4][1])  # dist code 1 -> value 2 -> (1,0) -> 1
    out = vp8l_decode(bw.done())
    assert out.shape == (2, 4, 4)
    assert (out.reshape(-1, 4) == np.array(p0, np.uint8)).all()


def test_lz77_plane_code_row_copy():
    """Distance value 1 = plane code (0,1): copies the row above."""
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    row = [(255, i * 3, i * 5, i * 7) for i in range(1, 5)]
    tables = _literal_tables(bw, row, extra_green=(256 + 3,),
                             dist_syms=(0,))
    for p in row:
        _emit_literal(bw, tables, p)
    bw.code(*tables[0][256 + 3])  # length 4
    bw.code(*tables[4][0])  # dist code 0 -> value 1 -> (0,1) -> w
    out = vp8l_decode(bw.done())
    assert (out[1] == out[0]).all()
    assert [tuple(px) for px in out[0]] == row


def test_lz77_long_distance():
    """Distance values > 120 are literal distances minus 120."""
    bw = _BitWriter()
    _header(bw, 6, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    pix = [(255, 9, 8, 7), (255, 1, 2, 3)]
    tables = _literal_tables(bw, pix, extra_green=(256 + 2,),
                             dist_syms=(13,))
    for p in pix + pix[:1]:
        _emit_literal(bw, tables, p)
    bw.code(*tables[0][256 + 2])  # length 3
    bw.code(*tables[4][13])  # prefix code 13
    # code 13: extra=(13-2)>>1=5, offset=(2+(13&1))<<5=96;
    # value = 96 + bits + 1; want value 122 (distance 2) -> bits 25
    bw.write(25, 5)
    out = vp8l_decode(bw.done())
    row = [tuple(p) for p in out[0]]
    # buffer [p0, p1, p0] + dist-2 copies of pos 1,2,3 -> alternation
    assert row == [tuple(p) for p in pix * 3]


def test_plane_code_table_head():
    assert _CODE_TO_OFFSET[:8] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    ]


# ------------------------------------------------ color cache stream


def test_color_cache():
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    cache_bits = 4
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    p0, p1 = (255, 10, 20, 30), (255, 40, 50, 60)

    def cidx(p):
        argb = p[0] << 24 | p[1] << 16 | p[2] << 8 | p[3]
        return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)

    assert cidx(p0) != cidx(p1)
    tables = _literal_tables(
        bw, [p0, p1], extra_green=(280 + cidx(p0), 280 + cidx(p1)),
        green_alpha=256 + 24 + (1 << cache_bits),
    )
    _emit_literal(bw, tables, p0)
    _emit_literal(bw, tables, p1)
    bw.code(*tables[0][280 + cidx(p0)])
    bw.code(*tables[0][280 + cidx(p1)])
    out = vp8l_decode(bw.done())
    assert [tuple(p) for p in out[0]] == [p0, p1, p0, p1]


# ------------------------------------------------ meta-Huffman stream


def test_meta_huffman_two_groups():
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-Huffman image present
    bw.write(0, 3)  # meta_bits = 2 -> 4-pixel tiles -> 2 tiles
    meta = np.array([(0, 0, 0, 0), (0, 0, 1, 0)], np.uint8)  # groups 0,1
    _write_pixels(bw, meta)
    c0, c1 = (255, 11, 22, 33), (255, 99, 88, 77)
    for c in (c0, c1):  # one single-symbol code set per group
        for v, n in zip((c[2], c[1], c[3], c[0]), (280, 256, 256, 256)):
            _write_huffman_code(bw, {v: 1}, n)
        _write_huffman_code(bw, {0: 1}, 40)
    out = vp8l_decode(bw.done())  # zero body bits: all 0-bit codes
    assert [tuple(p) for p in out[0]] == [c0] * 4 + [c1] * 4


# --------------------------------------------- predictor + cross-color


def _forward_predict(px_argb: np.ndarray, mode: int) -> np.ndarray:
    """Encoder-side residuals for a single predictor tile covering
    the image; mirrors the spec's edge rules."""
    h, w, _ = px_argb.shape
    res = np.zeros_like(px_argb)
    for y in range(h):
        for x in range(w):
            if y == 0:
                pred = (
                    (255, 0, 0, 0)
                    if x == 0
                    else tuple(int(v) for v in px_argb[0, x - 1])
                )
            elif x == 0:
                pred = tuple(int(v) for v in px_argb[y - 1, 0])
            else:
                L = tuple(int(v) for v in px_argb[y, x - 1])
                T = tuple(int(v) for v in px_argb[y - 1, x])
                TL = tuple(int(v) for v in px_argb[y - 1, x - 1])
                TR = (
                    tuple(int(v) for v in px_argb[y - 1, x + 1])
                    if x + 1 < w
                    else tuple(int(v) for v in px_argb[y, 0])
                )
                pred = _pred_pixel(mode, L, T, TL, TR)
            res[y, x] = [
                (int(px_argb[y, x, i]) - pred[i]) & 0xFF for i in range(4)
            ]
    return res


@pytest.mark.parametrize("mode", range(14))
def test_predictor_transform_inverse(mode):
    rng = np.random.default_rng(100 + mode)
    h, w = 6, 5
    px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    px[..., 0] = 255
    res = _forward_predict(px, mode)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(1, 3)  # size_bits = 3 -> 8x8 tiles -> single tile
    _write_pixels(bw, np.array([(0, 0, mode, 0)], np.uint8))
    bw.write(0, 1)  # end transforms
    _write_pixels(bw, res.reshape(-1, 4), level0=True)
    out = vp8l_decode(bw.done())
    assert (out == px).all(), mode


def test_clamp_add_subtract_half_truncates_toward_zero():
    # ave=10, TL=13 -> d=-3 -> C-style half = -1 (not -2): pred 9
    assert _pred_pixel(13, (10, 10, 10, 10), (10, 10, 10, 10),
                       (13, 13, 13, 13), (0, 0, 0, 0)) == (9, 9, 9, 9)


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def test_cross_color_transform_inverse():
    rng = np.random.default_rng(42)
    h, w, bits = 4, 8, 2  # 4x4 tiles -> 2x1 tile grid
    px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    px[..., 0] = 255
    tiles = [(0, 17, 245, 5), (0, 250, 33, 199)]  # (a, r2b, g2b, g2r)
    res = px.copy()
    for y in range(h):
        for x in range(w):
            _, r2b, g2b, g2r = tiles[x >> bits]
            a, r, g, b = (int(v) for v in px[y, x])
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            res[y, x] = (a, nr, g, nb)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # cross-color
    bw.write(bits - 2, 3)
    _write_pixels(bw, np.array(tiles, np.uint8))
    bw.write(0, 1)
    _write_pixels(bw, res.reshape(-1, 4), level0=True)
    out = vp8l_decode(bw.done())
    assert (out == px).all()


# --------------------------------------------------- container errors


def test_lossy_decodes_and_garbage_raises():
    # lossy VP8 now decodes through vp8.py (round 4); garbage VP8
    # payloads raise VP8Error (a ValueError), not NotImplementedError
    from mechaml_spark.vp8 import VP8Error
    from mechaml_spark.webp import webp_encode_lossy_flat

    rgb = webp_decode(webp_encode_lossy_flat(16, 16, 8, 4, -4, 0))
    assert rgb.shape == (16, 16, 3)
    bad = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + \
        struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(VP8Error):
        webp_decode(bad)
    vp8x = b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X" + \
        struct.pack("<I", 10) + bytes([0x02]) + b"\x00" * 9
    with pytest.raises(NotImplementedError, match="animated"):
        webp_decode(vp8x)


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        webp_decode(b"nope")
    with pytest.raises(ValueError):
        vp8l_decode(b"\x00\x01\x02")
    px = np.zeros((2, 2, 3), np.uint8)
    good = webp_encode(px)
    with pytest.raises(ValueError):
        webp_decode(good[:-6] + b"")  # truncated payload
    with pytest.raises(ValueError):
        vp8l_encode(np.zeros((0, 2, 3), np.uint8))


def test_vp8x_wrapped_lossless_decodes():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = vp8l_encode(px)
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert (webp_decode(data) == px).all()


def test_against_real_libwebp():
    """Ground truth when the reference C libwebp is present: real
    libwebp lossless streams (which use predictor/cross-color
    transforms, color cache, meta-Huffman and LZ77 as the reference
    encoder chooses) must decode bit-exact, and libwebp must decode
    every one of our encoder modes bit-exact."""
    import ctypes

    try:
        lw = ctypes.CDLL("libwebp.so.7")
    except OSError:
        pytest.skip("libwebp not present")
    lw.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lw.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lw.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
    lw.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    rng = np.random.default_rng(17)
    cases = []
    for (h, w) in [(16, 16), (37, 53), (64, 64)]:
        cases.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        yy, xx = np.mgrid[0:h, 0:w]
        cases.append(np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], -1
        ).astype(np.uint8))
        cases.append((rng.integers(0, 4, (h, w, 3)) * 80).astype(np.uint8))
        cases.append(np.clip(
            128 + 40 * np.sin(xx / 7.0) + 40 * np.cos(yy / 5.0), 0, 255
        ).astype(np.uint8)[..., None].repeat(3, 2))
    for i, px in enumerate(cases):
        h, w = px.shape[:2]
        out = ctypes.c_void_p()
        n = lw.WebPEncodeLosslessRGB(
            px.tobytes(), w, h, w * 3, ctypes.byref(out)
        )
        assert n > 0
        assert (webp_decode(ctypes.string_at(out, n)) == px).all(), i
    for i, px in enumerate(cases[:6]):
        for mode in ("none", "subtract-green", "auto"):
            data = webp_encode(px, mode=mode)
            wid, hei = ctypes.c_int(), ctypes.c_int()
            p = lw.WebPDecodeRGB(
                data, len(data), ctypes.byref(wid), ctypes.byref(hei)
            )
            assert p, (i, mode)
            arr = np.ctypeslib.as_array(
                p, shape=(hei.value, wid.value, 3)
            ).copy()
            assert (arr == px).all(), (i, mode)


# ------------------------------------------------- animated (ANMF)


def test_anim_roundtrip_compositing():
    f0 = np.full((8, 8, 3), 50, np.uint8)
    f1 = np.full((4, 4, 3), 200, np.uint8)
    f2 = np.full((2, 2, 3), 10, np.uint8)
    data = webp.webp_encode_anim(
        [
            (120, 0, 0, f0, False, False),
            (80, 2, 2, f1, True, False),  # dispose rect to bg after
            (60, 0, 0, f2, False, False),
        ],
        bg=(1, 2, 3, 255),
    )
    frames = webp.webp_decode_frames(data)
    assert [d for d, _ in frames] == [120, 80, 60]
    c0, c1, c2 = (c for _, c in frames)
    assert (c0 == 50).all()
    assert (c1[2:6, 2:6] == 200).all() and (c1[0, 0] == 50).all()
    assert tuple(c2[3, 3]) == (1, 2, 3)     # disposed to bg
    assert (c2[0:2, 0:2] == 10).all()       # overwrite
    assert (c2[6:, 6:] == 50).all()         # untouched


def test_anim_alpha_blend_integer():
    f0 = np.full((4, 4, 3), 100, np.uint8)
    patch = np.empty((2, 2, 4), np.uint8)
    patch[..., :3] = 20
    patch[..., 3] = 128
    data = webp.webp_encode_anim(
        [(100, 0, 0, f0, False, False), (100, 2, 2, patch, False, True)],
        canvas_wh=(4, 4),
    )
    frames = webp.webp_decode_frames(data)
    want = (128 * 20 + 127 * 100 + 127) // 255
    assert (frames[1][1][2:4, 2:4] == want).all()
    assert (frames[1][1][0:2, 0:2] == 100).all()


def test_anim_no_blend_overwrites_even_with_alpha():
    f0 = np.full((4, 4, 3), 100, np.uint8)
    patch = np.empty((2, 2, 4), np.uint8)
    patch[..., :3] = 20
    patch[..., 3] = 128
    data = webp.webp_encode_anim(
        [(100, 0, 0, f0, False, False), (100, 0, 0, patch, False, False)],
        canvas_wh=(4, 4),
    )
    frames = webp.webp_decode_frames(data)
    assert (frames[1][1][0:2, 0:2] == 20).all()


def test_anim_still_webp_single_frame():
    still = webp.webp_encode(np.full((5, 3, 3), 7, np.uint8))
    frames = webp.webp_decode_frames(still)
    assert len(frames) == 1 and frames[0][0] == 0
    assert (frames[0][1] == 7).all()


def test_anim_odd_offset_rejected():
    f = np.full((2, 2, 3), 1, np.uint8)
    with pytest.raises(ValueError):
        webp.webp_encode_anim([(10, 1, 0, f, False, False)])


def test_still_decode_still_refuses_animation():
    f = np.full((2, 2, 3), 1, np.uint8)
    data = webp.webp_encode_anim([(10, 0, 0, f, False, False)])
    with pytest.raises(NotImplementedError):
        webp.webp_decode(data)
