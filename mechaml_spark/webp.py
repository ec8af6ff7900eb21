"""WebP lossless (VP8L) codec — pure numpy/stdlib, no image libs.

Decoder: the full VP8L surface per the public WebP Lossless Bitstream
Specification (the ``VP8L`` chunk of RIFF/WEBP containers):

* all four transforms — predictor (the 14 spatial modes, per-tile),
  cross-color (signed fixed-point ``(t*c) >> 5`` deltas, per-tile),
  subtract-green, and color-indexing including sub-byte pixel
  bundling (1/2/4-bit palette indices packed into the green channel);
* color cache (the ``0x1e35a7bd`` multiplicative hash, 1..11 bits);
* meta-Huffman (spatially varying code groups via an entropy-coded
  Huffman image);
* LZ77 backward references with the 120-entry two-dimensional
  distance mapping and the DEFLATE-shaped prefix coding of
  lengths/distances;
* both Huffman code styles — "simple" (1-2 symbols, zero/one bit) and
  normal (code-length codes in the spec's fixed symbol order, repeat
  ops 16/17/18, optional max-symbol header), canonical DEFLATE code
  assignment read MSB-first from the LSB-first bitstream.

Animated WebP (``ANIM``/``ANMF``) is implemented — chunk walk,
frame compositing (dispose/blend), encoder for fixtures (see
``webp_decode_anim``/``webp_encode_anim``).  Lossy WebP (``VP8 ``
keyframes) decodes through vp8.py — a from-scratch RFC 6386
implementation pinned bit-exact (YUV) against the system libwebp;
``webp_decode`` routes both flavors.

Encoder: a real, conformant VP8L writer used for fixtures and
round-trip tests — optional subtract-green or color-indexing
transform (auto-picked), per-channel depth-limited canonical Huffman
codes with run-length-coded code lengths, simple codes where the
alphabet collapses.  It emits literals only (no LZ77 / cache); the
decoder's LZ77, cache, predictor, cross-color and meta paths are
exercised by hand-built conformant streams in tests.

The reference (mechaml) has no media layer; this extends the engine
brief's multimodal surface (SURVEY §2.12) the same way jpeg.py /
imaging.py do.  Decode runs inside mapInPandas over already-localized
bytes — pixels never shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from mechaml_spark.imaging import pixel_gate

# ----------------------------------------------------------- bit I/O


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("data", "pos", "end")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.end = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.end:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _BitWriter:
    """LSB-first bit writer; Huffman codes go MSB-of-code first."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------- canonical Huffman

#: code-length-code symbol transmission order (spec section
#: "Decoding the Code Lengths")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_MAX_CODE_LEN = 15


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """DEFLATE canonical assignment: symbols sorted by (length,
    symbol), codes count upward, left-shift on length increase."""
    code = 0
    prev_len = 0
    out: dict[int, tuple[int, int]] = {}
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


class _Huff:
    """Decode side: (length, code) -> symbol map walked bit-by-bit."""

    __slots__ = ("map", "single")

    def __init__(
        self,
        lengths: dict[int, int] | None = None,
        single: int | None = None,
        pair: tuple[int, int] | None = None,
    ) -> None:
        self.single = single
        self.map: dict[tuple[int, int], int] = {}
        if pair is not None:  # simple 2-symbol code: stream order
            self.map = {(1, 0): pair[0], (1, 1): pair[1]}
        elif lengths:
            used = {s: l for s, l in lengths.items() if l > 0}
            if len(used) == 1:
                self.single = next(iter(used))
                return
            if not used:
                raise ValueError("VP8L: empty Huffman code")
            kraft = sum(1 << (_MAX_CODE_LEN - l) for l in used.values())
            if kraft != 1 << _MAX_CODE_LEN:
                raise ValueError("VP8L: Huffman code not complete")
            self.map = {
                (ln, code): s
                for s, (code, ln) in _canonical_codes(used).items()
            }

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.bit()
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid Huffman stream")


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Code lengths from frequencies, depth-limited with a Kraft
    fix-up (lengthen the deepest shallow code / shorten the deepest
    code until the code is exactly complete)."""
    used = [s for s, f in freqs.items() if f > 0]
    if not used:
        raise ValueError("empty alphabet")
    if len(used) == 1:
        return {used[0]: 1}
    import heapq

    heap: list[tuple[int, int, object]] = [
        (freqs[s], s, s) for s in used
    ]
    heapq.heapify(heap)
    counter = max(used) + 1
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, counter, (n1, n2)))
        counter += 1
    lengths: dict[int, int] = {}

    def walk(node: object, depth: int) -> None:
        if isinstance(node, tuple):
            walk(node[0], depth + 1)
            walk(node[1], depth + 1)
        else:
            lengths[node] = max(depth, 1)

    walk(heap[0][2], 0)
    if max(lengths.values()) <= max_len:
        return lengths
    # clamp + Kraft fix-up
    for s in lengths:
        lengths[s] = min(lengths[s], max_len)
    cap = 1 << max_len

    def kraft() -> int:
        return sum(1 << (max_len - l) for l in lengths.values())

    while kraft() > cap:  # over-subscribed: lengthen deepest shallow
        s = max(
            (s for s in lengths if lengths[s] < max_len),
            key=lambda s: lengths[s],
        )
        lengths[s] += 1
    while kraft() < cap:  # incomplete: shorten the deepest that fits
        room = cap - kraft()
        for s in sorted(lengths, key=lambda s: -lengths[s]):
            if 1 << (max_len - lengths[s]) <= room:
                lengths[s] -= 1
                break
        else:  # pragma: no cover - flat code always completes
            raise AssertionError("Kraft fix-up failed")
    return lengths


# ------------------------------------------------ prefix (LZ77) code


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decode (spec "Decoding of backward
    references"): codes 0-3 literal, then (2 + (code&1)) << extra."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


#: plane-code lut: index = yoffset*16 + (8 - xoffset) -> distance code
#: (the spec's 120-entry close-neighborhood ordering; 255 = unused)
_PLANE_TO_CODE = (
    96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
    101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
    102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
    105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
    110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
    115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
    118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
    119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
)

_CODE_TO_OFFSET: list[tuple[int, int]] = [(0, 0)] * 120
for _i, _c in enumerate(_PLANE_TO_CODE):
    if _c != 255:
        _CODE_TO_OFFSET[_c] = (8 - (_i & 15), _i >> 4)


def _plane_code_to_distance(value: int, xsize: int) -> int:
    if value > 120:
        return value - 120
    xoff, yoff = _CODE_TO_OFFSET[value - 1]
    return max(1, yoff * xsize + xoff)


# ------------------------------------------------------- decode core


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huff:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 2:
            return _Huff(pair=(sym0, br.read(8)))
        return _Huff(single=sym0)
    num_codes = br.read(4) + 4
    clc_lengths: dict[int, int] = {}
    for i in range(num_codes):
        ln = br.read(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    clc = _Huff(lengths=clc_lengths)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L: code length repeat overflows")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _Huff(lengths={s: l for s, l in enumerate(lengths) if l})


def _decode_image_stream(
    br: _BitReader, w: int, h: int, level0: bool = False
) -> tuple[np.ndarray, list]:
    """Entropy-coded image -> ((h*w, 4) uint8 ARGB rows, transforms).

    ``level0`` (the spatially-coded main image) additionally reads
    transforms and the meta-Huffman bit; sub-images (transform data,
    palette, meta image) read neither, per the spec.
    """
    transforms: list[tuple] = []
    if level0:
        seen_types = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen_types:
                raise ValueError("VP8L: duplicate transform")
            seen_types.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                tw = -(-w // (1 << bits))
                th = -(-h // (1 << bits))
                tiles, _ = _decode_image_stream(br, tw, th)
                transforms.append((ttype, bits, w, tiles))
            elif ttype == 2:  # subtract green
                transforms.append((2,))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal_deltas, _ = _decode_image_stream(br, n_colors, 1)
                palette = np.cumsum(
                    pal_deltas.astype(np.uint32), axis=0
                ).astype(np.uint8)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, w, palette))
                w = -(-w // (1 << width_bits))

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"VP8L: bad color cache size {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.read(1):  # meta-Huffman image
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        mimg, _ = _decode_image_stream(br, mw, mh)
        meta = (
            mimg[:, 1].astype(np.int32) << 8 | mimg[:, 2].astype(np.int32)
        )
        num_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = [
        tuple(
            _read_huffman_code(br, n)
            for n in (green_alpha, 256, 256, 256, 40)
        )
        for _ in range(num_groups)
    ]

    pixel_gate(w, h, "VP8L")
    n = w * h
    buf = np.zeros((n, 4), np.uint8)
    pos = 0
    mw = -(-w // (1 << meta_bits)) if meta is not None else 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            grp = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        else:
            grp = groups[0]
        g = grp[0].read(br)
        if g < 256:
            r = grp[1].read(br)
            b = grp[2].read(br)
            a = grp[3].read(br)
            buf[pos] = (a, r, g, b)
            if cache is not None:
                argb = a << 24 | r << 16 | g << 8 | b
                cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (
                    32 - cache_bits
                )] = argb
            pos += 1
        elif g < 280:  # backward reference
            length = _prefix_value(g - 256, br)
            dist = _plane_code_to_distance(
                _prefix_value(grp[4].read(br), br), w
            )
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                buf[pos] = buf[pos - dist]
                if cache is not None:
                    a, r, gg, b = (int(v) for v in buf[pos])
                    argb = a << 24 | r << 16 | gg << 8 | b
                    cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (
                        32 - cache_bits
                    )] = argb
                pos += 1
        else:  # color cache hit
            if cache is None or g - 280 >= len(cache):
                raise ValueError("VP8L: cache index without cache")
            argb = cache[g - 280]
            buf[pos] = (
                argb >> 24 & 0xFF,
                argb >> 16 & 0xFF,
                argb >> 8 & 0xFF,
                argb & 0xFF,
            )
            pos += 1
    return buf, transforms


# -------------------------------------------------- transform inverse


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _pred_pixel(mode: int, L, T, TL, TR) -> tuple[int, int, int, int]:
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(
            _avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4)
        )
    if mode == 6:
        return tuple(_avg2(L[i], TL[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(L[i], T[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(TL[i], T[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(T[i], TR[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i])) for i in range(4)
        )
    if mode == 11:  # Select
        p = tuple(L[i] + T[i] - TL[i] for i in range(4))
        pL = sum(abs(p[i] - L[i]) for i in range(4))
        pT = sum(abs(p[i] - T[i]) for i in range(4))
        return L if pL < pT else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(_clamp(L[i] + T[i] - TL[i]) for i in range(4))
    if mode == 13:  # ClampAddSubtractHalf (C-style trunc division)
        out = []
        for i in range(4):
            ave = _avg2(L[i], T[i])
            d = ave - TL[i]
            half = -((-d) // 2) if d < 0 else d // 2
            out.append(_clamp(ave + half))
        return tuple(out)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(
    buf: np.ndarray, w: int, h: int, bits: int, tiles: np.ndarray
) -> None:
    tw = -(-w // (1 << bits))
    rows = [[tuple(int(v) for v in buf[y * w + x]) for x in range(w)]
            for y in range(h)]
    tile_modes = tiles[:, 2]  # green channel carries the mode
    for y in range(h):
        row = rows[y]
        above = rows[y - 1] if y else None
        for x in range(w):
            if y == 0:
                pred = (255, 0, 0, 0) if x == 0 else row[x - 1]
            elif x == 0:
                pred = above[0]
            else:
                mode = int(tile_modes[(y >> bits) * tw + (x >> bits)])
                TR = above[x + 1] if x + 1 < w else row[0]
                pred = _pred_pixel(
                    mode, row[x - 1], above[x], above[x - 1], TR
                )
            px = row[x]
            row[x] = tuple((px[i] + pred[i]) & 0xFF for i in range(4))
    flat = [c for r in rows for px in r for c in px]
    buf[:] = np.array(flat, np.uint8).reshape(h * w, 4)


def _inv_color_transform(
    buf: np.ndarray, w: int, h: int, bits: int, tiles: np.ndarray
) -> None:
    tw = -(-w // (1 << bits))
    px = buf.reshape(h, w, 4)
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    tidx = ys[:, None] * tw + xs[None, :]
    g2r = tiles[:, 3].astype(np.int8).astype(np.int32)[tidx]
    g2b = tiles[:, 2].astype(np.int8).astype(np.int32)[tidx]
    r2b = tiles[:, 1].astype(np.int8).astype(np.int32)[tidx]
    green = px[..., 2].astype(np.int8).astype(np.int32)
    red = (
        px[..., 1].astype(np.int32) + ((g2r * green) >> 5)
    ) & 0xFF
    px[..., 1] = red.astype(np.uint8)
    red_s = red.astype(np.uint8).astype(np.int8).astype(np.int32)
    blue = (
        px[..., 3].astype(np.int32)
        + ((g2b * green) >> 5)
        + ((r2b * red_s) >> 5)
    ) & 0xFF
    px[..., 3] = blue.astype(np.uint8)


def _inv_subtract_green(buf: np.ndarray) -> None:
    g = buf[:, 2].astype(np.int32)
    buf[:, 1] = ((buf[:, 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
    buf[:, 3] = ((buf[:, 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)


def _inv_color_indexing(
    buf: np.ndarray, w: int, h: int, width_bits: int, palette: np.ndarray
) -> np.ndarray:
    """Packed-index buffer -> full-width ARGB rows via palette."""
    packed_w = -(-w // (1 << width_bits))
    idx_packed = buf.reshape(h, packed_w, 4)[..., 2].astype(np.int32)
    if width_bits:
        bpp = 8 >> width_bits
        per = 1 << width_bits
        xs = np.arange(w)
        shifts = (xs % per) * bpp
        idx = (idx_packed[:, xs // per] >> shifts[None, :]) & ((1 << bpp) - 1)
    else:
        idx = idx_packed
    if int(idx.max(initial=0)) >= palette.shape[0]:
        raise ValueError("VP8L: palette index out of range")
    return palette[idx.reshape(-1)]


# ---------------------------------------------------------- decoders


def vp8l_decode(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> uint8 (h, w, 4) ARGB-channel array
    ordered [a, r, g, b] along the last axis."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(data)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    buf, transforms = _decode_image_stream(br, w, h, level0=True)
    cur_w = w
    for t in transforms:
        if t[0] == 3:
            cur_w = -(-t[2] // (1 << t[1]))
    for t in reversed(transforms):
        if t[0] == 0:
            _inv_predictor(buf, cur_w, h, t[1], t[3])
        elif t[0] == 1:
            _inv_color_transform(buf, cur_w, h, t[1], t[3])
        elif t[0] == 2:
            _inv_subtract_green(buf)
        else:
            buf = _inv_color_indexing(buf, t[2], h, t[1], t[3])
            cur_w = t[2]
    return buf.reshape(h, w, 4)


def webp_decode(data: bytes) -> np.ndarray:
    """WebP bytes -> uint8 HxWx3 RGB (alpha dropped, repo-wide
    convention — the pipeline consumes pixels for features/dedup).
    Both still flavors decode: lossless (VP8L, this module) and
    lossy (VP8 keyframes, vp8.py — bit-exact YUV vs libwebp, RGB via
    the documented BT.601 conversion)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if fourcc == b"VP8L":
            argb = vp8l_decode(payload)
            return np.ascontiguousarray(argb[..., 1:4])
        if fourcc == b"VP8 ":
            from mechaml_spark import vp8 as _vp8

            return _vp8.vp8_decode_rgb(payload)
        if fourcc == b"ANMF" or (
            fourcc == b"VP8X" and size >= 1 and payload[0] & 0x02
        ):
            raise NotImplementedError(
                "webp_decode returns ONE still image; this file is "
                "animated — use webp_decode_frames / webp_decode_anim"
            )
        # VP8X / ICCP / EXIF / XMP / ALPH: keep scanning for VP8L
    raise ValueError("WebP: no VP8L/VP8 image chunk found")


def webp_encode_lossy_flat(
    width: int, height: int, vy: int, vu: int, vv: int, qi: int = 0
) -> bytes:
    """RIFF/WEBP container around :func:`vp8.vp8_encode_flat` — a
    conformant flat-color LOSSY WebP whose decoded planes are the
    closed forms of :func:`vp8.webp_lossy_flat_value` (fixture
    writer for oracle queries and tests; libwebp-verified)."""
    from mechaml_spark import vp8 as _vp8

    payload = _vp8.vp8_encode_flat(width, height, vy, vu, vv, qi)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------- encoders


def _rle_code_lengths(lengths: list[int]) -> list[tuple[int, int, int]]:
    """(clc_symbol, extra_value, extra_bits) tokens with repeat ops
    16 (prev x3-6), 17 (zero x3-10), 18 (zero x11-138)."""
    tokens: list[tuple[int, int, int]] = []
    prev = 8
    i = 0
    n = len(lengths)
    while i < n:
        v = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == v:
            run += 1
        i += run
        if v == 0:
            while run >= 11:
                t = min(run, 138)
                tokens.append((18, t - 11, 7))
                run -= t
            while run >= 3:
                t = min(run, 10)
                tokens.append((17, t - 3, 3))
                run -= t
            tokens.extend((0, 0, 0) for _ in range(run))
        else:
            if v != prev:
                tokens.append((v, 0, 0))
                prev = v
                run -= 1
            while run >= 3:
                t = min(run, 6)
                tokens.append((16, t - 3, 2))
                run -= t
            tokens.extend((v, 0, 0) for _ in range(run))
    return tokens


def _write_huffman_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Write one Huffman code, return symbol -> (code, length)."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) <= 2 and max(used) < 256:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        first_8bit = 1 if used[0] > 1 else 0
        bw.write(first_8bit, 1)
        bw.write(used[0], 8 if first_8bit else 1)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    length_by_sym = _huffman_lengths(freqs, _MAX_CODE_LEN)
    if len(length_by_sym) == 1:  # lone symbol >= 256: pad to a pair
        length_by_sym = {next(iter(length_by_sym)): 1, 0: 1}
    lengths = [length_by_sym.get(s, 0) for s in range(alphabet_size)]
    tokens = _rle_code_lengths(lengths)
    clc_freqs: dict[int, int] = {}
    for sym, _, _ in tokens:
        clc_freqs[sym] = clc_freqs.get(sym, 0) + 1
    clc_lengths = _huffman_lengths(clc_freqs, 7)
    if len(clc_lengths) == 1:  # complete the code with a dead symbol
        lone = next(iter(clc_lengths))
        clc_lengths = {lone: 1, (lone + 1) % 19: 1}
    clc_codes = _canonical_codes(clc_lengths)
    bw.write(0, 1)  # normal code
    bw.write(19 - 4, 4)
    for s in _CLC_ORDER:
        bw.write(clc_lengths.get(s, 0), 3)
    bw.write(0, 1)  # no explicit max symbol
    for sym, extra_val, extra_bits in tokens:
        code, ln = clc_codes[sym]
        bw.code(code, ln)
        if extra_bits:
            bw.write(extra_val, extra_bits)
    return _canonical_codes(length_by_sym)


def _write_pixels(bw: _BitWriter, buf: np.ndarray, level0: bool = False) -> None:
    """Literal-only entropy-coded image body: cache bit (then, at
    level0 only, the meta-Huffman bit — spec order), Huffman codes
    (green/red/blue/alpha/distance), then per-pixel codes."""
    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta-Huffman image
    chans = [buf[:, 2], buf[:, 1], buf[:, 3], buf[:, 0]]  # G R B A
    tables = []
    for ch, alpha_size in zip(chans, (256 + 24, 256, 256, 256)):
        vals, counts = np.unique(ch, return_counts=True)
        freqs = {int(v): int(c) for v, c in zip(vals, counts)}
        tables.append(_write_huffman_code(bw, freqs, alpha_size))
    _write_huffman_code(bw, {0: 1}, 40)  # unused distance tree
    g, r, b, a = tables
    for pix in buf:
        bw.code(*g[int(pix[2])])
        bw.code(*r[int(pix[1])])
        bw.code(*b[int(pix[3])])
        bw.code(*a[int(pix[0])])


def vp8l_encode(pixels: np.ndarray, mode: str = "auto") -> bytes:
    """uint8 (h, w, 3|4) -> VP8L payload.  ``mode``: 'none',
    'subtract-green', 'palette', or 'auto' (palette when <= 256
    distinct colors, else subtract-green)."""
    if pixels.ndim == 2:
        pixels = np.repeat(pixels[..., None], 3, axis=2)
    h, w = pixels.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L: image dimensions out of range")
    argb = np.empty((h * w, 4), np.uint8)
    argb[:, 0] = (
        pixels[..., 3].reshape(-1) if pixels.shape[2] == 4 else 255
    )
    argb[:, 1] = pixels[..., 0].reshape(-1)
    argb[:, 2] = pixels[..., 1].reshape(-1)
    argb[:, 3] = pixels[..., 2].reshape(-1)

    colors = np.unique(argb, axis=0)
    if mode == "auto":
        mode = "palette" if colors.shape[0] <= 256 else "subtract-green"

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if pixels.shape[2] == 4 else 0, 1)
    bw.write(0, 3)  # version

    if mode == "subtract-green":
        bw.write(1, 1)
        bw.write(2, 2)
        g = argb[:, 2].astype(np.int32)
        argb[:, 1] = ((argb[:, 1].astype(np.int32) - g) & 0xFF).astype(
            np.uint8
        )
        argb[:, 3] = ((argb[:, 3].astype(np.int32) - g) & 0xFF).astype(
            np.uint8
        )
        bw.write(0, 1)  # end of transforms
    elif mode == "palette":
        n = colors.shape[0]
        if n > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        deltas = np.diff(
            colors.astype(np.int32), axis=0, prepend=np.zeros((1, 4), int)
        ) & 0xFF
        _write_pixels(bw, deltas.astype(np.uint8))
        key = {tuple(c): i for i, c in enumerate(colors)}
        idx = np.array([key[tuple(px)] for px in argb], np.int32)
        if n <= 2:
            width_bits = 3
        elif n <= 4:
            width_bits = 2
        elif n <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            bpp = 8 >> width_bits
            packed_w = -(-w // per)
            rows = idx.reshape(h, w)
            packed = np.zeros((h, packed_w), np.int32)
            for k in range(per):
                col = rows[:, k::per]
                packed[:, : col.shape[1]] |= col << (k * bpp)
        else:
            packed_w = w
            packed = idx.reshape(h, w)
        argb = np.zeros((h * packed_w, 4), np.uint8)
        argb[:, 2] = packed.reshape(-1).astype(np.uint8)
        bw.write(0, 1)  # end of transforms
    elif mode == "none":
        bw.write(0, 1)
    else:
        raise ValueError(f"unknown VP8L encode mode {mode!r}")

    _write_pixels(bw, argb, level0=True)
    return bw.done()


def webp_encode(pixels: np.ndarray, mode: str = "auto") -> bytes:
    """uint8 HxWx3 RGB -> lossless WebP (RIFF + VP8L) bytes."""
    payload = vp8l_encode(pixels, mode=mode)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ------------------------------------------------- animated WebP (ANMF)


def _u24(n: int) -> bytes:
    return struct.pack("<I", n)[:3]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def webp_encode_anim(
    frames: list,
    canvas_wh: tuple[int, int] | None = None,
    bg: tuple[int, int, int, int] = (255, 255, 255, 255),
    loop: int = 0,
) -> bytes:
    """Animated lossless WebP writer (RIFF + VP8X + ANIM + ANMF*).

    ``frames``: list of ``(duration_ms, x, y, rgb_subframe, dispose,
    blend)`` — ``x``/``y`` MUST be even (the ANMF header stores them
    divided by 2, per spec §Animation); ``dispose`` True = restore
    the frame rectangle to the ANIM background color after display;
    ``blend`` True = alpha-blend over the canvas (opaque VP8L frames
    overwrite either way).  Used as the fixture writer for the
    animated-WebP decode path, same role as the GIF/APNG writers."""
    if canvas_wh is None:
        cw = max(x + f.shape[1] for _, x, _, f, _, _ in frames)
        ch = max(y + f.shape[0] for _, _, y, f, _, _ in frames)
    else:
        cw, ch = canvas_wh
    body = _chunk(
        b"VP8X",
        bytes([0x02]) + b"\x00\x00\x00" + _u24(cw - 1) + _u24(ch - 1),
    )
    b_, g_, r_, a_ = bg[2], bg[1], bg[0], bg[3]
    body += _chunk(
        b"ANIM", bytes([b_, g_, r_, a_]) + struct.pack("<H", loop)
    )
    for dur, x, y, sub, dispose, blend in frames:
        if x % 2 or y % 2:
            raise ValueError("ANMF frame offsets must be even")
        payload = vp8l_encode(sub)
        inner = _chunk(b"VP8L", payload)
        flags = (0 if blend else 0x02) | (0x01 if dispose else 0)
        hdr = (
            _u24(x // 2) + _u24(y // 2)
            + _u24(sub.shape[1] - 1) + _u24(sub.shape[0] - 1)
            + _u24(dur) + bytes([flags])
        )
        body += _chunk(b"ANMF", hdr + inner)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def webp_decode_frames(data: bytes) -> list:
    """Animated WebP -> ``[(delay_ms, rgb_canvas HxWx3), ...]`` —
    the composited canvas on display for each frame, matching the
    ``gif_decode_frames`` / ``apng_decode_frames`` convention so the
    shared video sampling stage consumes all three.

    Spec semantics (WebP container spec, Animation): canvas starts
    fully transparent; each ANMF sub-frame is placed at (2*frame_x,
    2*frame_y), alpha-BLENDED when blending method is 0 or copied
    when 1; after display, disposal 1 restores the frame rectangle
    to the ANIM background color.  A still (non-animated) WebP
    decodes as one zero-delay frame.  Emitted canvases drop alpha
    (repo-wide HxWx3 convention)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    canvas = None
    bg = np.zeros(4, dtype=np.uint8)
    frames: list = []
    animated = False
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if fourcc == b"VP8X":
            animated = bool(payload[0] & 0x02)
            cw = 1 + int.from_bytes(payload[4:7], "little")
            ch = 1 + int.from_bytes(payload[7:10], "little")
            pixel_gate(cw, ch, "WebP canvas")
            canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        elif fourcc == b"ANIM":
            # stored B,G,R,A
            bg = np.array(
                [payload[2], payload[1], payload[0], payload[3]],
                dtype=np.uint8,
            )
        elif fourcc == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF before VP8X")
            x = 2 * int.from_bytes(payload[0:3], "little")
            y = 2 * int.from_bytes(payload[3:6], "little")
            fw = 1 + int.from_bytes(payload[6:9], "little")
            fh = 1 + int.from_bytes(payload[9:12], "little")
            dur = int.from_bytes(payload[12:15], "little")
            flags = payload[15]
            # embedded chunks: find the VP8L frame data
            ip = 16
            argb = None
            while ip + 8 <= len(payload):
                fc = payload[ip : ip + 4]
                (sz,) = struct.unpack_from("<I", payload, ip + 4)
                if fc == b"VP8L":
                    argb = vp8l_decode(payload[ip + 8 : ip + 8 + sz])
                    break
                if fc == b"VP8 ":
                    from mechaml_spark import vp8 as _vp8

                    rgb = _vp8.vp8_decode_rgb(payload[ip + 8 : ip + 8 + sz])
                    argb = np.concatenate(
                        [np.full(rgb.shape[:2] + (1,), 255, np.uint8), rgb],
                        axis=-1,
                    )
                    break
                ip += 8 + sz + (sz & 1)
            if argb is None or argb.shape[:2] != (fh, fw):
                raise ValueError("ANMF frame data missing or wrong size")
            rgba = argb[..., [1, 2, 3, 0]].astype(np.uint16)
            rect = canvas[y : y + fh, x : x + fw].astype(np.uint16)
            if flags & 0x02:  # no blend: overwrite
                merged = rgba
            else:  # alpha blend over canvas (integer, a in 0..255)
                a = rgba[..., 3:4]
                merged = rgba.copy()
                merged[..., :3] = (
                    rgba[..., :3] * a + rect[..., :3] * (255 - a) + 127
                ) // 255
                merged[..., 3] = np.maximum(rgba[..., 3], rect[..., 3])
            canvas[y : y + fh, x : x + fw] = merged.astype(np.uint8)
            frames.append((dur, canvas[..., :3].copy()))
            if flags & 0x01:  # dispose to background color
                canvas[y : y + fh, x : x + fw] = bg
        elif fourcc == b"VP8L" and not animated:
            argb = vp8l_decode(payload)
            frames.append(
                (0, np.ascontiguousarray(argb[..., 1:4]))
            )
    if not frames:
        raise ValueError("WebP: no frames found")
    return frames
