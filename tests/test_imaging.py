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


def test_png_palette_variants():
    """Palette (color type 3) at 8-bit and packed 4-bit depths."""
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    idx = ((yy + xx) % 8).astype(np.uint8)
    for depth in (4, 8):
        data = imaging.png_encode_ext(idx, 3, bit_depth=depth, palette=pal)
        assert np.array_equal(imaging.png_decode(data), pal[idx])
    # 1-bit palette, odd width (packing padding per scanline)
    pal2 = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx2 = ((yy[:5, :13] + xx[:5, :13]) % 2).astype(np.uint8)
    data = imaging.png_encode_ext(idx2, 3, bit_depth=1, palette=pal2)
    assert np.array_equal(imaging.png_decode(data), pal2[idx2])
    # out-of-range index refuses
    bad = imaging.png_encode_ext(
        np.full((2, 2), 5, np.uint8), 3, bit_depth=8, palette=pal2
    )
    with pytest.raises(ValueError, match="palette index"):
        imaging.png_decode(bad)


def test_png_gray_and_alpha_variants():
    """Gray (0), gray+alpha (4), RGBA (6): gray replicates to RGB
    with sub-byte depths scaled to full range; alpha is dropped."""
    yy, xx = np.mgrid[0:7, 0:11]
    g8 = ((yy * 31 + xx * 17) % 256).astype(np.uint8)
    assert np.array_equal(
        imaging.png_decode(imaging.png_encode_ext(g8, 0)),
        np.repeat(g8[..., None], 3, axis=2),
    )
    g1 = ((yy + xx) % 2).astype(np.uint8)  # 1-bit: 0 / 255
    assert np.array_equal(
        imaging.png_decode(imaging.png_encode_ext(g1, 0, bit_depth=1)),
        np.repeat((g1 * 255)[..., None], 3, axis=2),
    )
    g4 = ((yy + xx) % 16).astype(np.uint8)  # 4-bit: v * 255 // 15
    assert np.array_equal(
        imaging.png_decode(imaging.png_encode_ext(g4, 0, bit_depth=4)),
        np.repeat((g4.astype(np.uint16) * 255 // 15).astype(np.uint8)[..., None], 3, axis=2),
    )
    ga = np.stack([g8, (g8[::-1] // 2)], axis=-1)  # gray+alpha
    assert np.array_equal(
        imaging.png_decode(imaging.png_encode_ext(ga, 4)),
        np.repeat(g8[..., None], 3, axis=2),
    )
    rgb = _px(19, 7, 11)
    rgba = np.concatenate([rgb, (g8 ^ 255)[..., None]], axis=-1)
    assert np.array_equal(
        imaging.png_decode(imaging.png_encode_ext(rgba, 6)), rgb
    )


def test_png_adam7_interlace():
    """Adam7 streams decode identically to their sequential twins,
    including non-multiple-of-8 dims and packed palette depths."""
    px = _px(23, 13, 9)  # odd dims: several passes partially empty
    data = imaging.png_decode(imaging.png_encode_ext(px, 2, interlace=1))
    assert np.array_equal(data, px)
    pal = np.random.default_rng(2).integers(0, 256, (16, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:10, 0:17]
    idx = ((yy * 3 + xx) % 16).astype(np.uint8)
    data = imaging.png_decode(
        imaging.png_encode_ext(idx, 3, bit_depth=4, palette=pal, interlace=1)
    )
    assert np.array_equal(data, pal[idx])
    # tiny image (single pixel: only pass 1 non-empty)
    one = np.array([[[9, 8, 7]]], np.uint8)
    assert np.array_equal(
        imaging.png_decode(imaging.png_encode_ext(one, 2, interlace=1)), one
    )


def test_png_16bit_decode_truncates_high_byte():
    import struct
    import zlib

    yy, xx = np.mgrid[0:4, 0:6]
    hi = ((yy * 40 + xx * 9) % 256).astype(np.uint8)
    raw = np.zeros((4, 6 * 2 + 1), np.uint8)
    raw[:, 1::2] = hi  # big-endian high byte
    raw[:, 2::2] = 0xAB  # low byte must be ignored
    ihdr = struct.pack(">IIBBBBB", 6, 4, 16, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + imaging._chunk(b"IHDR", ihdr)
        + imaging._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + imaging._chunk(b"IEND", b"")
    )
    assert np.array_equal(
        imaging.png_decode(data), np.repeat(hi[..., None], 3, axis=2)
    )


def test_png_illegal_variants_refuse():
    import struct
    import zlib

    for depth, ct in ((16, 3), (2, 2), (4, 6), (3, 0)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ct, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + imaging._chunk(b"IHDR", ihdr)
            + imaging._chunk(b"IDAT", zlib.compress(b"\x00" * 9))
            + imaging._chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            imaging.png_decode(data)


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
    with pytest.raises(ValueError):
        imaging.decode(b"x", "webp")  # now a real codec: bad bytes raise
    with pytest.raises(NotImplementedError):
        imaging.decode(b"x", "heic")  # genuinely absent codec stays a stub


def test_dhash64_perceptual_not_content():
    """The phash column must catch re-encodes: identical pixels in
    different lossless encodings share the dHash while their encoded
    bytes (and any content hash over them) differ."""
    px = _px(7)
    png, ppm = imaging.png_encode(px), imaging.ppm_encode(px)
    assert png != ppm  # a content hash over bytes would split these
    h_png = imaging.dhash64(imaging.png_decode(png))
    h_ppm = imaging.dhash64(imaging.ppm_decode(ppm))
    assert h_png == h_ppm == imaging.dhash64(px)


def test_dhash64_stable_under_small_noise_mostly():
    """Light edits flip only bits whose local gradient they cross —
    Hamming distance stays far below the ~32 expected for unrelated
    images (what makes banded bucketing find near-dups)."""
    px = _px(3).astype(np.int32)
    noisy = np.clip(px + 1, 0, 255).astype(np.uint8)
    a = imaging.dhash64(px.astype(np.uint8))
    b = imaging.dhash64(noisy)
    assert bin(a ^ b).count("1") <= 8
    unrelated = imaging.dhash64(_px(1234))
    assert bin(a ^ unrelated).count("1") > 10


def test_dhash64_geometry_identity():
    """At the native 9x8 geometry the downscale is the identity, so
    the hash is the raw comparison bits (the closed form the driver
    oracle uses in queries.q_image_phash)."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    g = (
        299 * px[..., 0].astype(int)
        + 587 * px[..., 1].astype(int)
        + 114 * px[..., 2].astype(int)
    ) // 1000
    expect = 0
    for y in range(8):
        for x in range(8):
            if g[y, x] < g[y, x + 1]:
                expect |= 1 << (y * 8 + x)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert imaging.dhash64(px) == expect


def test_bmp_roundtrip_and_variants():
    """BMP: bit-exact round-trip through encode/decode (incl. widths
    that need 4-byte row padding), top-down negative-height decode,
    and a hypothesis sweep over shapes."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 5, 16):  # w=1..3 exercise row padding
        px = rng.integers(0, 256, (5, w, 3), dtype=np.uint8)
        assert np.array_equal(imaging.bmp_decode(imaging.bmp_encode(px)), px)
        # through the generic dispatch too
        assert np.array_equal(
            imaging.decode(imaging.encode(px, "bmp"), "bmp"), px
        )

    # top-down BMP (negative height): same pixels, no vertical flip
    px = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    data = bytearray(imaging.bmp_encode(px))
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    # rows in the file are bottom-up; reinterpreting as top-down must
    # yield the vertically flipped image
    assert np.array_equal(imaging.bmp_decode(bytes(data)), px[::-1])

    with pytest.raises(ValueError):
        imaging.bmp_decode(b"not a bmp")

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9), st.integers(0, 2**32 - 1))
    def rt(h, w, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        assert np.array_equal(imaging.bmp_decode(imaging.bmp_encode(px)), px)

    rt()


def test_gif_roundtrip_and_lzw():
    """GIF: bit-exact round-trip through the literal-LZW encoder and
    the real LZW decoder, across palette sizes that exercise every
    code width (2..8 bit) and the periodic-CLEAR path."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = np.random.default_rng(11)
    for n_colors in (1, 2, 3, 4, 17, 250):
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, (13, 9))
        px = pal[idx]
        data = imaging.gif_encode(px)
        assert data[:6] == b"GIF89a"
        assert np.array_equal(imaging.gif_decode(data), px)
        assert np.array_equal(imaging.decode(imaging.encode(px, "gif"), "gif"), px)

    # a big image forces many CLEAR resets at the smallest code width
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    px = pal[rng.integers(0, 2, (64, 64))]
    assert np.array_equal(imaging.gif_decode(imaging.gif_encode(px)), px)

    with pytest.raises(ValueError):
        k = np.arange(17 * 16)  # 272 genuinely distinct colors
        many = np.stack([k // 256, k % 256, k % 256], axis=1)
        imaging.gif_encode(many.astype(np.uint8).reshape(17, 16, 3))
    with pytest.raises(ValueError):
        imaging.gif_decode(b"not a gif")

    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9), st.integers(1, 6),
           st.integers(0, 2**32 - 1))
    def rt(h, w, ncol, seed):
        r = np.random.default_rng(seed)
        pal = r.integers(0, 256, (ncol, 3), dtype=np.uint8)
        px = pal[r.integers(0, ncol, (h, w))]
        assert np.array_equal(imaging.gif_decode(imaging.gif_encode(px)), px)

    rt()


def test_gif_interlaced_and_real_lzw_decode():
    """Decode a hand-built INTERLACED GIF whose pixel stream uses real
    dictionary LZW codes (not just literals), proving the decoder's
    table growth and interlace reorder are correct."""
    import struct

    # 4x4, 2-bit palette {0:black, 1:white}, rows 0..3 = 0,1,2,3-ish
    pal = np.array(
        [[0, 0, 0], [255, 255, 255], [17, 34, 51], [68, 85, 102]],
        dtype=np.uint8,
    )
    rows = np.array(
        [[0, 1, 2, 3], [1, 1, 1, 1], [2, 2, 2, 2], [3, 2, 1, 0]]
    )
    # interlace order for h=4: pass1 row0, pass3 row2, pass4 rows 1,3
    stream_rows = [rows[0], rows[2], rows[1], rows[3]]
    indices = [int(v) for r in stream_rows for v in r]

    # real LZW compressor (dictionary-building) for the test input
    def lzw(min_code, seq):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        table = {bytes([i]): i for i in range(clear)}
        nxt = eoi + 1
        out, acc, nacc = bytearray(), 0, 0

        def emit(code, w):
            nonlocal acc, nacc
            acc |= code << nacc
            nacc += w
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8

        emit(clear, width)
        cur = b""
        for s in seq:
            nxt_str = cur + bytes([s])
            if nxt_str in table:
                cur = nxt_str
                continue
            emit(table[cur], width)
            table[nxt_str] = nxt
            if nxt == (1 << width):
                width += 1
            nxt += 1
            cur = bytes([s])
        if cur:
            emit(table[cur], width)
        emit(eoi, width)
        if nacc:
            out.append(acc & 0xFF)
        return bytes(out)

    payload = lzw(2, indices)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)  # GCT, 4 entries
    gif += pal.tobytes()
    gif += struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0x40)  # interlaced
    gif.append(2)  # min code size
    gif.append(len(payload))
    gif += payload
    gif += b"\x00\x3b"

    out = imaging.gif_decode(bytes(gif))
    assert np.array_equal(out, pal[rows])


def test_gif_animated_roundtrip():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 6, (7, 5))] for _ in range(3)]
    delays = [100, 50, 120]
    data = imaging.gif_encode_animated(frames, delays)
    out = imaging.gif_decode_frames(data)
    assert [d for d, _ in out] == delays
    for (_, got), want in zip(out, frames):
        assert np.array_equal(got, want)
    # gif_decode = first frame
    assert np.array_equal(imaging.gif_decode(data), frames[0])


def test_gif_transparency_compositing():
    """A second frame with a transparent index must leave the prior
    canvas visible through the transparent pixels."""
    import struct

    pal = np.array([[10, 20, 30], [200, 0, 0], [0, 200, 0], [9, 9, 9]],
                   dtype=np.uint8)
    data = bytearray(b"GIF89a")
    data += struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)  # 4-entry GCT
    data += pal.tobytes()
    # frame 0: all color 0, no transparency
    data += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, 5, 0, 0)
    data += imaging._gif_image_block(np.zeros(4, dtype=int), 2, 2, 2)
    # frame 1: indices [[1, 3], [3, 2]] with 3 = transparent
    data += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 1, 5, 3, 0)
    data += imaging._gif_image_block(np.array([1, 3, 3, 2]), 2, 2, 2)
    data += b"\x3b"
    out = imaging.gif_decode_frames(bytes(data))
    assert len(out) == 2
    want = np.array(
        [[[200, 0, 0], [10, 20, 30]], [[10, 20, 30], [0, 200, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(out[1][1], want)


def test_gif_disposal_and_malformed():
    import struct

    # disposal=2: frame 1's rect restores to background (index 0)
    # before frame 2 draws a transparent-holed frame
    pal = np.array([[1, 2, 3], [200, 0, 0], [0, 200, 0], [7, 7, 7]],
                   dtype=np.uint8)
    data = bytearray(b"GIF89a")
    data += struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)  # bg index 0
    data += pal.tobytes()
    # frame 0: all color 1, disposal=2 ((2<<2) in packed)
    data += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 2 << 2, 5, 0, 0)
    data += imaging._gif_image_block(np.full(4, 1), 2, 2, 2)
    # frame 1: all transparent (index 3) -> must show BACKGROUND, not
    # frame 0's pixels
    data += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 1, 5, 3, 0)
    data += imaging._gif_image_block(np.full(4, 3), 2, 2, 2)
    data += b"\x3b"
    out = imaging.gif_decode_frames(bytes(data))
    assert np.array_equal(out[0][1], np.tile(pal[1], (2, 2, 1)))
    assert np.array_equal(out[1][1], np.tile(pal[0], (2, 2, 1)))

    # disposal=3: restore-to-previous — frame 2 sees frame 0's canvas
    data3 = bytearray(b"GIF89a")
    data3 += struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)
    data3 += pal.tobytes()
    data3 += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, 5, 0, 0)
    data3 += imaging._gif_image_block(np.full(4, 1), 2, 2, 2)  # all red
    data3 += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 3 << 2, 5, 0, 0)
    data3 += imaging._gif_image_block(np.full(4, 2), 2, 2, 2)  # all green
    data3 += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 1, 5, 3, 0)
    data3 += imaging._gif_image_block(np.full(4, 3), 2, 2, 2)  # transparent
    data3 += b"\x3b"
    out3 = imaging.gif_decode_frames(bytes(data3))
    assert np.array_equal(out3[2][1], np.tile(pal[1], (2, 2, 1)))  # red again

    # malformed: frame rect exceeding the screen -> typed ValueError
    bad = bytearray(b"GIF89a")
    bad += struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)
    bad += pal.tobytes()
    bad += imaging._gif_image_block(np.full(9, 1), 3, 3, 2)  # 3x3 on 2x2
    bad += b"\x3b"
    with pytest.raises(ValueError):
        imaging.gif_decode_frames(bytes(bad))
    # truncated stream -> typed ValueError, not IndexError
    good = imaging.gif_encode(pal[np.zeros((3, 3), dtype=int)])
    with pytest.raises(ValueError):
        imaging.gif_decode_frames(good[: len(good) - 6])

    # animated-encoder delay validation
    f = pal[np.zeros((2, 2), dtype=int)]
    with pytest.raises(ValueError):
        imaging.gif_encode_animated([f], [700_000])
    with pytest.raises(ValueError):
        imaging.gif_encode_animated([f], [-10])


def test_jpeg_baseline_codec():
    """Baseline JPEG (SOF0, 4:4:4): real DCT + quantization + Huffman.
    Smooth content clears the payload rule's PSNR >= 40 dB lossy bar
    at quality 90; structure (markers, stuffing, padding) round-trips
    at any size; malformed input raises ValueError."""
    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack(
        [yy * 255 // 40, xx * 255 // 56, (yy + xx) * 255 // 96], axis=-1
    ).astype(np.uint8)
    data = imaging.encode(px, "jpg")
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = imaging.decode(data, "jpg")
    assert out.shape == px.shape
    assert imaging.psnr(px, out) >= 40.0
    # the payload invariant's lossy branch takes exactly this path
    assert imaging.payload_ok(data, "jpg", px)
    assert not imaging.payload_ok(data, "jpg", px[::-1].copy())

    # solid color is numerically exact after clipping
    solid = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
    assert imaging.psnr(
        solid, imaging.decode(imaging.encode(solid, "jpeg"), "jpeg")
    ) == float("inf")

    # odd (non-multiple-of-8) sizes pad and crop correctly
    odd = imaging.decode(imaging.encode(px[:37, :49], "jpg"), "jpg")
    assert odd.shape == (37, 49, 3)

    # quality knob: lower quality -> smaller stream
    from mechaml_spark.jpeg import jpeg_encode

    assert len(jpeg_encode(px, 30)) < len(jpeg_encode(px, 95))

    with pytest.raises(ValueError):
        imaging.decode(b"\xff\xd8not a jpeg", "jpg")
    with pytest.raises(ValueError):
        imaging.decode(data[: len(data) // 2], "jpg")  # truncated scan


def test_jpeg_malformed_inputs_raise_valueerror():
    """Every malformed-input class raises ValueError, never an
    untyped struct/Index/Key error (the documented decode contract)."""
    import struct

    from mechaml_spark import jpeg

    yy, xx = np.mgrid[0:16, 0:16]
    px = np.stack([yy * 15, xx * 15, yy + xx], axis=-1).astype(np.uint8)
    good = jpeg.jpeg_encode(px)

    # truncated SOF body
    sof = good.find(b"\xff\xc0")
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(good[: sof + 6])
    # DHT declaring more values than present
    dht = good.find(b"\xff\xc4")
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(good[: dht + 10])
    # non-interleaved scan (Ns=1) is refused, not silently mis-decoded
    sos = good.find(b"\xff\xda")
    bad = bytearray(good)
    bad[sos + 4] = 1  # Ns
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(bytes(bad))
    # fill bytes before markers are legal and skipped
    filled = good[:2] + b"\xff" + good[2:]
    assert np.array_equal(jpeg.jpeg_decode(filled), jpeg.jpeg_decode(good))
    # sanity: the struct module path (garbage length field)
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(b"\xff\xd8\xff\xdb\xff\xff")


def _encode_subsampled_jpeg(planes, samps, h, w, quality=95):
    """Test-side subsampled JPEG writer (the repo's public encoder
    stays 4:4:4): YCbCr planes at COMPONENT resolution (MCU-padded),
    per-component (hi, vi) sampling factors, one interleaved scan
    using the module's canonical tables."""
    import struct

    from mechaml_spark import jpeg as J

    qy = J._quality_scale(J._QY, quality)
    qc = J._quality_scale(J._QC, quality)
    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qy), (1, qc)):
        zz = qt.ravel()[J._ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in zz)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for (cid, tq), (hi, vi) in zip(((1, 0), (2, 1), (3, 1)), samps):
        out += bytes([cid, (hi << 4) | vi, tq])
    out += J._dht(0, 0, J._DC_BITS, J._DC_VALS)
    out += J._dht(1, 0, J._AC_BITS, J._AC_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00])
    out += b"\x00\x3f\x00"
    hmax = max(hi for hi, _ in samps)
    vmax = max(vi for _, vi in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    wtr = J._BitWriter()
    preds = [0, 0, 0]
    qts = [qy, qc, qc]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(samps):
                for bv in range(vi):
                    for bh in range(hi):
                        by, bx = (my * vi + bv) * 8, (mx * hi + bh) * 8
                        block = planes[ci][by:by + 8, bx:bx + 8]
                        preds[ci] = J._encode_block(
                            wtr, block, qts[ci], preds[ci]
                        )
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def test_jpeg_420_decode_exact_blocks():
    """4:2:0 decode: per-block constant Y values land in the right
    MCU quadrants (DC prediction across the 4 luma blocks of one MCU),
    neutral chroma -> exact grayscale at q95 (DC step 2)."""
    from mechaml_spark import jpeg

    ypl = np.zeros((16, 16))
    vals = [90, 110, 130, 150]
    for i, v in enumerate(vals):
        ypl[(i // 2) * 8:(i // 2) * 8 + 8, (i % 2) * 8:(i % 2) * 8 + 8] = v
    cpl = np.full((8, 8), 128.0)
    data = _encode_subsampled_jpeg(
        [ypl, cpl, cpl], [(2, 2), (1, 1), (1, 1)], 16, 16
    )
    out = jpeg.jpeg_decode(data)
    assert out.shape == (16, 16, 3)
    for i, v in enumerate(vals):
        quad = out[(i // 2) * 8:(i // 2) * 8 + 8, (i % 2) * 8:(i % 2) * 8 + 8]
        assert np.array_equal(quad, np.full((8, 8, 3), v, np.uint8)), i


def test_jpeg_420_odd_dims_and_chroma():
    """4:2:0 with non-MCU-aligned dims (20x12): crop is exact; a
    non-neutral constant chroma survives replication exactly."""
    from mechaml_spark import jpeg

    ypl = np.full((32, 16), 100.0)
    cb = np.full((16, 8), 136.0)   # +8 chroma, exactly representable
    cr = np.full((16, 8), 120.0)   # -8
    data = _encode_subsampled_jpeg(
        [ypl, cb, cr], [(2, 2), (1, 1), (1, 1)], 20, 12
    )
    out = jpeg.jpeg_decode(data)
    assert out.shape == (20, 12, 3)
    want = np.clip(np.round(np.array([
        100 + 1.402 * -8,
        100 - 0.344136 * 8 - 0.714136 * -8,
        100 + 1.772 * 8,
    ])), 0, 255).astype(np.uint8)
    assert np.array_equal(out, np.broadcast_to(want, (20, 12, 3)))


def test_jpeg_422_decode_exact():
    from mechaml_spark import jpeg

    ypl = np.zeros((8, 16))
    ypl[:, :8], ypl[:, 8:] = 60, 200
    cpl = np.full((8, 8), 128.0)
    data = _encode_subsampled_jpeg(
        [ypl, cpl, cpl], [(2, 1), (1, 1), (1, 1)], 8, 16
    )
    out = jpeg.jpeg_decode(data)
    assert out.shape == (8, 16, 3)
    assert np.array_equal(out[:, :8], np.full((8, 8, 3), 60, np.uint8))
    assert np.array_equal(out[:, 8:], np.full((8, 8, 3), 200, np.uint8))


def test_jpeg_own_encoder_roundtrip_unchanged_and_sof1_refused():
    """Generalizing the sampling geometry must not change the 4:4:4
    path (own-encoder round trip stays bit-identical to a fresh
    decode); extended-sequential (SOF1) still refuses."""
    from mechaml_spark import jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    px = np.stack(
        [yy * 255 // 24, xx * 255 // 40, (yy + xx) * 255 // 64], axis=-1
    ).astype(np.uint8)
    data = jpeg.jpeg_encode(px, quality=90)
    out1 = jpeg.jpeg_decode(data)
    out2 = jpeg.jpeg_decode(data)
    assert np.array_equal(out1, out2)
    assert imaging.psnr(px, out1) >= 40.0
    ext = bytearray(data)
    sof = data.find(b"\xff\xc0")
    ext[sof + 1] = 0xC1
    with pytest.raises(ValueError, match="baseline"):
        jpeg.jpeg_decode(bytes(ext))


def test_jpeg_progressive_equals_baseline_444():
    """Progressive (SOF2) decode: the own progressive encoder carries
    bitwise-identical quantized coefficients to the baseline stream,
    so the two decodes must be exactly equal — exercising DC/AC
    first + refinement scans and spectral-selection reassembly."""
    from mechaml_spark import jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    px = np.stack(
        [yy * 255 // 24, xx * 255 // 40, (yy * 7 + xx * 13) % 256],
        axis=-1,
    ).astype(np.uint8)
    base = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=90))
    prog_bytes = jpeg.jpeg_encode_progressive(px, quality=90)
    assert b"\xff\xc2" in prog_bytes and b"\xff\xc0" not in prog_bytes
    prog = jpeg.jpeg_decode(prog_bytes)
    assert np.array_equal(prog, base)


def test_jpeg_progressive_subsampled_odd_dims():
    """Progressive + 4:2:0 + non-MCU-aligned dims (20x12): the
    non-interleaved AC scans must walk the component's ACTUAL block
    raster (not the MCU-padded array) — decode equals the baseline
    subsampled stream of the same planes.  Constant chroma makes
    every chroma AC block an end-of-band block, exercising EOBn
    run-length accumulation (run > 0)."""
    from mechaml_spark import jpeg

    yy, xx = np.mgrid[0:32, 0:16]
    ypl = ((yy * 11 + xx * 23) % 200 + 28).astype(np.float64)
    cb = np.full((16, 8), 136.0)
    cr = np.full((16, 8), 120.0)
    planes = [ypl, cb, cr]
    samps = [(2, 2), (1, 1), (1, 1)]
    base = jpeg.jpeg_decode(
        _encode_subsampled_jpeg(planes, samps, 20, 12, quality=95)
    )
    prog = jpeg.jpeg_decode(
        jpeg._encode_progressive(planes, samps, 12, 20, quality=95)
    )
    assert base.shape == prog.shape == (20, 12, 3)
    assert np.array_equal(prog, base)


def test_jpeg_restart_markers_decode():
    """DRI/RSTn streams decode: a 4:4:4 stream re-emitted with a
    restart interval of 1 MCU (byte-aligned RSTm every MCU, DC
    predictors reset) must decode identically to the marker-free
    stream from the public encoder."""
    import struct

    from mechaml_spark import jpeg as J

    yy, xx = np.mgrid[0:24, 0:24]
    px = np.stack(
        [yy * 255 // 24, xx * 255 // 24, (yy + xx) * 255 // 48], axis=-1
    ).astype(np.uint8)
    plain = J.jpeg_encode(px, quality=90)
    want = J.jpeg_decode(plain)

    # rebuild the same image as a restart-interval stream: headers as
    # in jpeg_encode plus DRI, entropy data flushed + RSTm per MCU
    q = 90
    qy, qc = J._quality_scale(J._QY, q), J._quality_scale(J._QC, q)
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qy), (1, qc)):
        zz = qt.ravel()[J._ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in zz)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 24, 24, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    out += J._dht(0, 0, J._DC_BITS, J._DC_VALS)
    out += J._dht(1, 0, J._AC_BITS, J._AC_VALS)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI: every MCU
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00])
    out += b"\x00\x3f\x00"
    qts = [qy, qc, qc]
    mcu = 0
    chunks = []
    for by in range(0, 24, 8):
        for bx in range(0, 24, 8):
            w = J._BitWriter()
            preds = [0, 0, 0]  # DC reset per interval
            for ci in range(3):
                block = planes[ci][by:by + 8, bx:bx + 8]
                preds[ci] = J._encode_block(w, block, qts[ci], preds[ci])
            w.flush()
            chunks.append(bytes(w.out))
            mcu += 1
    for i, c in enumerate(chunks):
        out += c
        if i < len(chunks) - 1:
            out += bytes((0xFF, 0xD0 + (i & 7)))
    out += b"\xff\xd9"
    got = J.jpeg_decode(bytes(out))
    assert np.array_equal(got, want)
    # wrong marker ordinal is refused
    bad = bytes(out).replace(b"\xff\xd0", b"\xff\xd3", 1)
    with pytest.raises(ValueError, match="restart"):
        J.jpeg_decode(bad)


def test_ico_roundtrip_both_inner_forms():
    """ICO (favicon): classic doubled-height DIB entries and PNG
    entries both round-trip bit-exact; truncated/foreign bytes raise."""
    import numpy as np
    import pytest

    from mechaml_spark import imaging

    rng = np.random.default_rng(11)
    for shape in [(8, 8, 3), (5, 7, 3), (1, 1, 3), (256, 33, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for inner in ("bmp", "png"):
            data = imaging.ico_encode(px, inner=inner)
            assert data[:4] == b"\x00\x00\x01\x00"
            assert (imaging.ico_decode(data) == px).all()
    # dispatcher path
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert (imaging.decode(imaging.encode(px, "ico"), "ico") == px).all()
    with pytest.raises(ValueError):
        imaging.ico_decode(b"BM not an ico")
    with pytest.raises(ValueError):
        imaging.ico_encode(np.zeros((300, 8, 3), np.uint8))


def test_qoi_roundtrip_all_ops():
    """QOI (qoiformat.org): every op family round-trips bit-exact —
    RUN (constant regions), INDEX (palette repeats), DIFF/LUMA (small
    gradients), RGB (big jumps), RGBA (alpha changes); RGB + RGBA +
    grayscale inputs; truncated/foreign bytes raise."""
    import numpy as np
    import pytest

    from mechaml_spark import imaging

    rng = np.random.default_rng(23)
    # constant -> long runs incl. the 62-run split
    px = np.full((40, 40, 3), 129, np.uint8)
    assert (imaging.qoi_decode(imaging.qoi_encode(px)) == px).all()
    # small palette -> INDEX hits
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 4, (16, 16))]
    assert (imaging.qoi_decode(imaging.qoi_encode(px)) == px).all()
    # +-1 jitter -> DIFF; +-10 jitter -> LUMA; random -> RGB
    for spread in (2, 10, 256):
        base = rng.integers(60, 190, 3)
        px = ((base + rng.integers(-spread // 2, spread // 2 + 1,
                                   (13, 17, 3))) % 256).astype(np.uint8)
        assert (imaging.qoi_decode(imaging.qoi_encode(px)) == px).all()
    # RGBA with varying alpha -> RGBA ops; output keeps 4 channels
    px = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    out = imaging.qoi_decode(imaging.qoi_encode(px))
    assert out.shape == (9, 11, 4) and (out == px).all()
    # grayscale expands to RGB
    g = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    assert (
        imaging.qoi_decode(imaging.qoi_encode(g))
        == np.stack([g] * 3, axis=-1)
    ).all()
    # dispatcher + lossless payload invariant
    px = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    assert imaging.payload_ok(imaging.encode(px, "qoi"), "qoi", px)
    with pytest.raises(ValueError):
        imaging.qoi_decode(b"notqoi" + b"\x00" * 30)
    with pytest.raises(ValueError):
        imaging.qoi_decode(imaging.qoi_encode(px)[:-9])  # lost end marker


# ----------------------------------------------------------- APNG


def _rgba(r, g, b, a=255):
    return np.array([r, g, b, a], np.uint8)


def test_apng_round_trip_full_frames():
    from mechaml_spark.imaging import apng_decode_frames, apng_encode

    rng = np.random.default_rng(8)
    frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
              for _ in range(3)]
    data = apng_encode(frames, delay_ms=40)
    got = apng_decode_frames(data)
    assert len(got) == 3
    for (delay, px), want in zip(got, frames):
        assert delay == 40
        assert (px == want).all()


def test_apng_region_and_dispose_ops():
    """Patch frames with every dispose op: NONE keeps the patch,
    BACKGROUND clears the region (black after flatten), PREVIOUS
    restores the pre-frame canvas."""
    from mechaml_spark.imaging import apng_decode_frames, apng_encode_ext

    base = np.full((4, 4, 4), 255, np.uint8)
    base[..., :3] = 10
    patch = np.zeros((2, 2, 4), np.uint8)
    patch[...] = _rgba(200, 0, 0)
    data = apng_encode_ext(4, 4, [
        {"x": 0, "y": 0, "px": base, "delay_ms": 10},
        {"x": 1, "y": 1, "px": patch, "delay_ms": 10, "dispose": 2},
        {"x": 0, "y": 0, "px": patch, "delay_ms": 10, "dispose": 1},
        {"x": 2, "y": 2, "px": patch, "delay_ms": 10},
    ])
    frames = [px for _, px in apng_decode_frames(data)]
    assert (frames[0] == 10).all()
    # frame 1: red patch at (1,1)
    assert tuple(frames[1][1, 1]) == (200, 0, 0)
    assert tuple(frames[1][0, 0]) == (10, 10, 10)
    # frame 2 rendered after PREVIOUS restore: patch at (0,0) only
    assert tuple(frames[2][1, 1]) == (200, 0, 0)  # inside new patch
    assert tuple(frames[2][2, 2]) == (10, 10, 10)  # restored
    # frame 3 rendered after BACKGROUND clear of (0,0) 2x2 region
    assert tuple(frames[3][0, 0]) == (0, 0, 0)  # cleared -> black
    assert tuple(frames[3][2, 2]) == (200, 0, 0)  # new patch
    assert tuple(frames[3][3, 3]) == (200, 0, 0)


def test_apng_blend_over():
    """OVER with 50%-alpha source: integer Porter-Duff mid-blend."""
    from mechaml_spark.imaging import apng_decode_frames, apng_encode_ext

    base = np.zeros((2, 2, 4), np.uint8)
    base[...] = _rgba(100, 200, 40)
    half = np.zeros((2, 2, 4), np.uint8)
    half[...] = _rgba(255, 0, 0, 128)
    data = apng_encode_ext(2, 2, [
        {"x": 0, "y": 0, "px": base},
        {"x": 0, "y": 0, "px": half, "blend": 1},
    ])
    frames = [px for _, px in apng_decode_frames(data)]
    # sa=128: out = round((255*128*255 + 100*255*127) / (128*255+255*127))
    r, g, b = frames[1][0, 0]
    assert (r, g, b) == (178, 100, 20), (r, g, b)


def test_apng_plain_png_single_frame():
    from mechaml_spark.imaging import apng_decode_frames, png_encode

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert len(apng_decode_frames(png_encode(px))) == 1


def test_apng_sample_video_frames_spark(spark):
    import pandas as pd

    from mechaml_spark import multimodal
    from mechaml_spark.imaging import apng_encode, png_decode

    frames = [np.full((3, 3, 3), 40 * (i + 1), np.uint8) for i in range(3)]
    df = spark.createDataFrame(pd.DataFrame([
        {"media_id": "m1", "fmt": "apng",
         "bytes": apng_encode(frames, delay_ms=500)},
    ]))
    rows = multimodal.sample_video_frames(df, every_ms=500).collect()
    assert [r["ts_ms"] for r in rows] == [0, 500, 1000]
    for r, want in zip(sorted(rows, key=lambda r: r["ts_ms"]), frames):
        assert (png_decode(bytes(r["frame"])) == want).all()


# --------------------------------------------- compressed TIFF


def test_tiff_compression_matrix():
    """LZW / Deflate / PackBits x predictor x multi-strip round
    trips, RGB and gray, incl. data large enough to cross the LZW
    9->10->11-bit width changes."""
    from mechaml_spark.imaging import tiff_decode, tiff_encode

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (33, 17), dtype=np.uint8)
    for comp in (1, 5, 8, 32773):
        for pred in (1, 2):
            for rps in (None, 3):
                d = tiff_encode(px, compression=comp, predictor=pred,
                                rows_per_strip=rps)
                assert (tiff_decode(d) == px).all(), (comp, pred, rps)
    d = tiff_encode(gray, compression=5, predictor=2)
    assert (tiff_decode(d) == np.repeat(gray[..., None], 3, 2)).all()


def test_tiff_lzw_clear_refresh():
    """Streams long enough to exhaust the 12-bit table force a
    mid-stream Clear; decode must survive the refresh."""
    from mechaml_spark.imaging import _tiff_lzw_decode, _tiff_lzw_encode

    rng = np.random.default_rng(5)
    blob = rng.integers(0, 256, 60000, dtype=np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(blob)) == blob


def test_tiff_unsupported_compression_raises():
    from mechaml_spark.imaging import tiff_decode, tiff_encode

    d = bytearray(tiff_encode(np.zeros((2, 2, 3), np.uint8)))
    # patch the Compression IFD value to 7 (JPEG-in-TIFF)
    i = d.find((259).to_bytes(2, "little"))
    d[i + 8] = 7
    with pytest.raises(NotImplementedError, match="compression 7"):
        tiff_decode(bytes(d))


def test_tiff_against_real_libtiff():
    """Ground truth: round trip THROUGH the reference C libtiff when
    the shared library is present (encoder output read by libtiff,
    libtiff LZW/Deflate+predictor output read by our decoder) — pins
    the LZW early-change convention to the real world, not to our
    own mirror-image pair."""
    import ctypes

    from mechaml_spark.imaging import tiff_decode, tiff_encode

    try:
        lt = ctypes.CDLL("libtiff.so.6")
    except OSError:
        pytest.skip("libtiff not present")
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)

    def libtiff_write(path, comp, pred, rps):
        tif = lt.TIFFOpen(path, b"w")
        assert tif

        def setf(tag, val):
            lt.TIFFSetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                ctypes.c_int(val),
            )

        setf(256, 64); setf(257, 64); setf(258, 8); setf(277, 3)
        setf(259, comp); setf(262, 2); setf(284, 1); setf(278, rps)
        if pred != 1:
            setf(317, pred)
        for y in range(64):
            assert lt.TIFFWriteScanline(
                ctypes.c_void_p(tif), px[y].tobytes(),
                ctypes.c_uint32(y), ctypes.c_uint16(0),
            ) == 1
        lt.TIFFClose(ctypes.c_void_p(tif))

    def libtiff_read(path):
        tif = lt.TIFFOpen(path, b"r")
        assert tif
        buf = ctypes.create_string_buffer(64 * 3)
        rows = []
        for y in range(64):
            assert lt.TIFFReadScanline(
                ctypes.c_void_p(tif), buf, ctypes.c_uint32(y),
                ctypes.c_uint16(0),
            ) == 1
            rows.append(np.frombuffer(buf.raw, np.uint8).copy())
        lt.TIFFClose(ctypes.c_void_p(tif))
        return np.stack(rows).reshape(64, 64, 3)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        for comp, pred, rps in [(5, 1, 64), (5, 2, 16), (8, 2, 16),
                                (32773, 1, 64)]:
            p = f"{td}/ref.tif".encode()
            libtiff_write(p, comp, pred, rps)
            got = tiff_decode(open(p, "rb").read())
            assert (got == px).all(), ("decode", comp, pred, rps)
        for comp, pred in [(5, 1), (5, 2), (8, 2), (32773, 1)]:
            p = f"{td}/mine.tif".encode()
            open(p, "wb").write(
                tiff_encode(px, compression=comp, predictor=pred)
            )
            assert (libtiff_read(p) == px).all(), ("encode", comp, pred)


def test_png_against_real_libpng():
    """Ground truth via the system libpng16 (simplified API) when
    present: libpng-written PNGs (real filter heuristics) decode
    bit-exact with ours; libpng decodes our encoder output."""
    import ctypes

    try:
        lp = ctypes.CDLL("libpng16.so.16")
    except OSError:
        pytest.skip("libpng not present")

    class PngImage(ctypes.Structure):
        _fields_ = [
            ("opaque", ctypes.c_void_p), ("version", ctypes.c_uint32),
            ("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
            ("format", ctypes.c_uint32), ("flags", ctypes.c_uint32),
            ("colormap_entries", ctypes.c_uint32),
            ("warning_or_error", ctypes.c_uint32),
            ("message", ctypes.c_char * 64),
        ]

    for seed, (h, w) in [(2, (21, 13)), (3, (64, 64)), (4, (5, 1))]:
        px = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        img = PngImage(version=1, width=w, height=h, format=2)  # RGB
        size = ctypes.c_size_t(0)
        assert lp.png_image_write_to_memory(
            ctypes.byref(img), None, ctypes.byref(size), 0,
            px.tobytes(), 0, None,
        )
        buf = ctypes.create_string_buffer(size.value)
        img = PngImage(version=1, width=w, height=h, format=2)
        assert lp.png_image_write_to_memory(
            ctypes.byref(img), buf, ctypes.byref(size), 0,
            px.tobytes(), 0, None,
        )
        assert (imaging.png_decode(buf.raw[: size.value]) == px).all()
        mine = imaging.png_encode(px)
        rd = PngImage(version=1)
        assert lp.png_image_begin_read_from_memory(
            ctypes.byref(rd), mine, len(mine)
        )
        rd.format = 2
        out = ctypes.create_string_buffer(w * h * 3)
        assert lp.png_image_finish_read(
            ctypes.byref(rd), None, out, 0, None
        ), rd.message
        assert (
            np.frombuffer(out.raw, np.uint8).reshape(h, w, 3) == px
        ).all()


def test_gif_against_real_giflib():
    """Ground truth via the system giflib when present: a
    giflib-written GIF (the reference LZW encoder) decodes bit-exact
    with our decoder."""
    import ctypes
    import tempfile

    try:
        lg = ctypes.CDLL("libgif.so.7")
    except OSError:
        pytest.skip("giflib not present")
    lg.EGifOpenFileName.restype = ctypes.c_void_p
    lg.EGifOpenFileName.argtypes = [
        ctypes.c_char_p, ctypes.c_bool, ctypes.POINTER(ctypes.c_int)
    ]
    lg.GifMakeMapObject.restype = ctypes.c_void_p
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (47, 61), dtype=np.uint8)
    err = ctypes.c_int(0)
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/ref.gif".encode()
        g = lg.EGifOpenFileName(path, False, ctypes.byref(err))
        assert g, err.value
        cmap = lg.GifMakeMapObject(8, pal.tobytes())
        assert lg.EGifPutScreenDesc(
            ctypes.c_void_p(g), 61, 47, 3, 0, ctypes.c_void_p(cmap)
        ) == 1
        assert lg.EGifPutImageDesc(
            ctypes.c_void_p(g), 0, 0, 61, 47, False, None
        ) == 1
        for y in range(47):
            assert lg.EGifPutLine(
                ctypes.c_void_p(g), idx[y].tobytes(), 61
            ) == 1
        assert lg.EGifCloseFile(ctypes.c_void_p(g), ctypes.byref(err)) == 1
        data = open(path, "rb").read()
    assert (imaging.gif_decode(data) == pal[idx]).all()


def test_median_cut_palette():
    from mechaml_spark.imaging import median_cut_palette

    # four-quadrant image: palette recovers the colors exactly
    colors = [(35, 25, 35), (95, 25, 35), (155, 25, 35), (215, 25, 35)]
    px = np.zeros((16, 16, 3), np.uint8)
    px[:8, :8], px[:8, 8:], px[8:, :8], px[8:, 8:] = colors
    assert [tuple(r) for r in median_cut_palette(px, 4)] == sorted(colors)
    # constant image: k duplicate rows, never fewer (stable schema)
    pal = median_cut_palette(np.full((4, 4, 3), 9, np.uint8), 4)
    assert pal.shape == (4, 3) and (pal == 9).all()
    # deterministic under pixel shuffling (set-of-pixels function)
    rng = np.random.default_rng(3)
    flat = px.reshape(-1, 3)
    shuffled = flat[rng.permutation(len(flat))].reshape(16, 16, 3)
    assert (median_cut_palette(shuffled, 4) == median_cut_palette(px, 4)).all()
    # RGBA input: alpha ignored
    rgba = np.concatenate([px, np.full((16, 16, 1), 7, np.uint8)], axis=2)
    assert (median_cut_palette(rgba, 4) == median_cut_palette(px, 4)).all()


def test_detect_crop_letterbox():
    from mechaml_spark.imaging import detect_crop

    # bright plate with 3-row letterbox and 5-col pillarbox borders
    px = np.zeros((24, 32, 3), np.uint8)
    px[3:21, 5:27] = (200, 180, 40)
    assert detect_crop(px) == (5, 3, 22, 18)
    # all-dark frame: degenerate (0, 0, 0, 0)
    assert detect_crop(np.full((24, 32, 3), 15, np.uint8)) == (0, 0, 0, 0)
    # luma exactly at the threshold is still border (strict >):
    # (77*24 + 150*24 + 29*24) >> 8 == 24
    assert detect_crop(np.full((8, 8, 3), 24, np.uint8)) == (0, 0, 0, 0)
    px = np.full((8, 8, 3), 24, np.uint8)
    px[2:6, 3:7] = 25  # luma 25 > 24
    assert detect_crop(px) == (3, 2, 4, 4)
    # a dark-blue plate (R=G=0, B=220 -> luma 24) stays border while a
    # green plate of equal max channel is content - BT.601 weighting
    blue = np.zeros((8, 8, 3), np.uint8)
    blue[:, :, 2] = 220
    assert detect_crop(blue) == (0, 0, 0, 0)
    green = np.zeros((8, 8, 3), np.uint8)
    green[:, :, 1] = 220
    assert detect_crop(green) == (0, 0, 8, 8)
    # full-bleed content: crop == frame
    assert detect_crop(np.full((6, 7, 3), 200, np.uint8)) == (0, 0, 7, 6)
