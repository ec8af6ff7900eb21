"""Lossy WebP (VP8) intra-frame decoder — RFC 6386, from scratch.

Real-web WebP is overwhelmingly lossy (``VP8 `` chunks); until this
module the engine decoded only VP8L (lossless) and routed lossy files
through header-level probes.  This implements the full VP8 keyframe
decode path in numpy/pure Python from the public spec (RFC 6386, "VP8
Data Format and Decoding Guide"):

* boolean arithmetic decoder (section 7);
* keyframe header: segmentation, loop-filter params, token
  partitions, quantizer indices, token-probability updates
  (sections 9-10);
* intra mode parsing: 16x16 luma modes, 4x4 B_PRED submodes with the
  (above, left) conditional probability tables, 8x8 chroma modes
  (section 11);
* token/coefficient decode with per-band/per-context probability
  trees, the no-EOB-after-zero rule, category extra bits
  (sections 12-13);
* dequantization (section 14.1), 4x4 inverse DCT with the 20091 /
  35468 fixed-point constants, and the inverse Walsh-Hadamard for
  the Y2 block (section 14.3);
* intra prediction: all four 16x16 / chroma modes and all ten 4x4
  B_PRED modes with the 127 / 129 edge conventions (section 12);
* both loop filters (normal and simple) with segment / delta
  adjusted per-macroblock filter levels (section 15).

Only keyframes are decoded — a still WebP image IS a single VP8
keyframe, so interframe tools (motion vectors, reference buffers,
probability persistence) are out of scope by construction, not a
shortcut.

Correctness is pinned by tests/test_vp8.py: YUV output is compared
BIT-EXACTLY against the system libwebp (``WebPDecodeYUV`` via
ctypes) over randomized images, sizes, and quality levels — a single
wrong table value or filter tap desyncs the arithmetic decoder or
perturbs pixels, so bit-equality over a fuzz corpus is a very strong
conformance proof.  RGB conversion (BT.601 limited-range, bilinear
"fancy upsampling"-free chroma) is compared with a PSNR floor
instead, since libwebp's RGB path uses its own upsampler.

Scale posture: decode runs row-batched inside mapInPandas like every
other codec in this engine (jpeg.py, webp.py); pixels never shuffle.
The reference (mechaml) has no media layer; this extends the engine
brief's multimodal surface the same way jpeg.py does.
"""

from __future__ import annotations

import struct

import numpy as np

from mechaml_spark.imaging import pixel_gate

from mechaml_spark.vp8_tables import (
    AC_QLOOKUP,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
)

# ------------------------------------------------------------ trees

# Intra luma modes (16x16) and the B_PRED escape
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 subblock modes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

# Trees are flat arrays: tree[2*k] / tree[2*k+1] are the children of
# internal node k; negative entries are -leaf_value (RFC 6386 §8.2).
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# DCT token tree (11 internal nodes -> 11 probs per context).
# Leaves: 0=EOB, 1..5 literal value-1 .. hmm -- leaf ids below.
T_EOB, T_ZERO, T_ONE, T_TWO, T_THREE, T_FOUR = 0, 1, 2, 3, 4, 5
T_CAT1, T_CAT2, T_CAT3, T_CAT4, T_CAT5, T_CAT6 = 6, 7, 8, 9, 10, 11
COEFF_TREE = (
    -T_EOB, 2,
    -T_ZERO, 4,
    -T_ONE, 6,
    8, 12,
    -T_TWO, 10,
    -T_THREE, -T_FOUR,
    14, 16,
    -T_CAT1, -T_CAT2,
    18, 20,
    -T_CAT3, -T_CAT4,
    -T_CAT5, -T_CAT6,
)
CAT_BASE = {T_CAT1: 5, T_CAT2: 7, T_CAT3: 11, T_CAT4: 19,
            T_CAT5: 35, T_CAT6: 67}
CAT_PROBS = {
    T_CAT1: (159,),
    T_CAT2: (165, 145),
    T_CAT3: (173, 148, 140),
    T_CAT4: (176, 155, 140, 135),
    T_CAT5: (180, 157, 141, 134, 130),
    T_CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# Subblock-mode context implied by a non-B_PRED neighbor's 16x16 mode
# (RFC 6386 §11.3: DC->B_DC, V->B_VE, H->B_HE, TM->B_TM).
MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


class VP8Error(ValueError):
    pass


# ----------------------------------------------------- bool decoder


class BoolDecoder:
    """RFC 6386 §7.3 boolean arithmetic decoder (exact reference
    algorithm: 8-bit probabilities, 8-bit renormalized range)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0
        )
        self.range = 255
        self.bit_count = 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.read(128)
        return v

    def signed(self, bits: int) -> int:
        v = self.literal(bits)
        return -v if self.read(128) else v

    def flag_signed(self, bits: int) -> int:
        """Optional signed literal: update-flag, then value+sign."""
        return self.signed(bits) if self.read(128) else 0

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read(probs[i >> 1])]
            if i <= 0:
                return -i


# ------------------------------------------------------ dequant


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _dequant_factors(q: int, deltas: dict) -> dict:
    """Per-segment dequant factors (RFC 6386 §14.1)."""
    y1dc = DC_QLOOKUP[_clamp_q(q + deltas["y1dc"])]
    y1ac = AC_QLOOKUP[_clamp_q(q)]
    y2dc = DC_QLOOKUP[_clamp_q(q + deltas["y2dc"])] * 2
    y2ac = AC_QLOOKUP[_clamp_q(q + deltas["y2ac"])] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(q + deltas["uvdc"])]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(q + deltas["uvac"])]
    return {"y1": (y1dc, y1ac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


# ------------------------------------------------- inverse transforms


def _idct4x4(coeffs) -> np.ndarray:
    """RFC 6386 §14.3 fixed-point inverse DCT (20091/35468 taps);
    Python's arithmetic >> matches C's signed shift."""
    c1, c2 = 20091, 35468
    ip = [int(v) for v in coeffs]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * c2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * c1) >> 16)
        cc = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * c1) >> 16)
        t2 = (ip[12 + i] * c2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + cc
        tmp[8 + i] = b1 - cc
    out = np.empty((4, 4), np.int32)
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * c2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * c1) >> 16)
        cc = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * c1) >> 16)
        t2 = (tmp[r + 3] * c2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + cc + 4) >> 3
        out[i, 2] = (b1 - cc + 4) >> 3
    return out


def _iwht4x4(coeffs) -> list:
    """RFC 6386 §14.3 inverse Walsh-Hadamard; output i is the DC of
    Y subblock i (raster order)."""
    ip = [int(v) for v in coeffs]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# --------------------------------------------------- intra prediction


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_dc(above, left, has_above, has_left, size):
    if has_above and has_left:
        dc = (int(above.sum()) + int(left.sum()) + size) >> (
            5 if size == 16 else 4
        )
    elif has_above:
        dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    elif has_left:
        dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return np.full((size, size), dc, np.uint8)


def _pred_tm(above, left, corner, size):
    p = (left.astype(np.int32)[:, None] + above.astype(np.int32)[None, :]
         - int(corner))
    return np.clip(p, 0, 255).astype(np.uint8)


def _predict_block(mode, above, left, corner, has_above, has_left, size):
    if mode == DC_PRED:
        return _pred_dc(above, left, has_above, has_left, size)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    return _pred_tm(above, left, corner, size)


def _predict_b(mode, A, AR, L, P):
    """All ten 4x4 B_PRED modes (RFC 6386 §12.3).  A: above[4],
    AR: above-right[4], L: left[4], P: above-left corner."""
    A = [int(v) for v in A]
    AR = [int(v) for v in AR]
    L = [int(v) for v in L]
    P = int(P)
    o = np.empty((4, 4), np.int32)
    if mode == B_DC:
        o[:] = (sum(A) + sum(L) + 4) >> 3
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                o[r, c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == B_VE:
        e = [P] + A + [AR[0]]
        row = [_avg3(e[c], e[c + 1], e[c + 2]) for c in range(4)]
        o[:] = row
    elif mode == B_HE:
        e = [P] + L
        col = [_avg3(e[r], e[r + 1], e[r + 2]) for r in range(3)]
        col.append(_avg3(L[2], L[3], L[3]))
        o[:] = np.array(col)[:, None]
    elif mode == B_LD:
        t = A + AR
        for r in range(4):
            for c in range(4):
                d = r + c
                if d < 6:
                    o[r, c] = _avg3(t[d], t[d + 1], t[d + 2])
                else:
                    o[r, c] = _avg3(t[6], t[7], t[7])
    elif mode == B_RD:
        s = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                o[r, c] = _avg3(s[i - 1], s[i], s[i + 1])
    elif mode == B_VR:
        row0 = [_avg2(P, A[0]), _avg2(A[0], A[1]), _avg2(A[1], A[2]),
                _avg2(A[2], A[3])]
        row1 = [_avg3(L[0], P, A[0]), _avg3(P, A[0], A[1]),
                _avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3])]
        o[0] = row0
        o[1] = row1
        o[2] = [_avg3(L[1], L[0], P)] + row0[:3]
        o[3] = [_avg3(L[2], L[1], L[0])] + row1[:3]
    elif mode == B_VL:
        t = A + AR
        row0 = [_avg2(t[0], t[1]), _avg2(t[1], t[2]), _avg2(t[2], t[3]),
                _avg2(t[3], t[4])]
        row1 = [_avg3(t[0], t[1], t[2]), _avg3(t[1], t[2], t[3]),
                _avg3(t[2], t[3], t[4]), _avg3(t[3], t[4], t[5])]
        o[0] = row0
        o[1] = row1
        o[2] = row0[1:] + [_avg3(t[4], t[5], t[6])]
        o[3] = row1[1:] + [_avg3(t[5], t[6], t[7])]
    elif mode == B_HD:
        r0 = [_avg2(L[0], P), _avg3(L[0], P, A[0]), _avg3(P, A[0], A[1]),
              _avg3(A[0], A[1], A[2])]
        r1 = [_avg2(L[1], L[0]), _avg3(L[1], L[0], P), r0[0], r0[1]]
        r2 = [_avg2(L[2], L[1]), _avg3(L[2], L[1], L[0]), r1[0], r1[1]]
        r3 = [_avg2(L[3], L[2]), _avg3(L[3], L[2], L[1]), r2[0], r2[1]]
        o[0], o[1], o[2], o[3] = r0, r1, r2, r3
    else:  # B_HU
        r0 = [_avg2(L[0], L[1]), _avg3(L[0], L[1], L[2]),
              _avg2(L[1], L[2]), _avg3(L[1], L[2], L[3])]
        r1 = [r0[2], r0[3], _avg2(L[2], L[3]), _avg3(L[2], L[3], L[3])]
        r2 = [r1[2], r1[3], L[3], L[3]]
        r3 = [L[3]] * 4
        o[0], o[1], o[2], o[3] = r0, r1, r2, r3
    return o.astype(np.uint8)


# ------------------------------------------------------ token decode


class _Plane:
    """Token-decode nonzero-context tracking for one plane."""

    __slots__ = ("above", "left")

    def __init__(self, mb_w: int, per: int):
        self.above = np.zeros(mb_w * per, np.uint8)
        self.left = np.zeros(per, np.uint8)


def _read_block(bd, probs, plane, first, ctx, qdc, qac):
    """RFC 6386 §13.3: one block's token string -> dequantized
    coefficients in raster order.  Returns (coeffs, nonzero_count,
    eob_position)."""
    coeffs = np.zeros(16, np.int32)
    i = first
    nonzero = 0
    prev_zero = False
    while i < 16:
        row = probs[plane][COEFF_BANDS[i]][ctx]
        tok = bd.tree(COEFF_TREE, row, start=2 if prev_zero else 0)
        if tok == T_EOB:
            break
        if tok == T_ZERO:
            prev_zero = True
            ctx = 0
            i += 1
            continue
        prev_zero = False
        if tok <= T_FOUR:
            val = tok - 1  # T_ONE..T_FOUR -> 1..4
        else:
            val = CAT_BASE[tok]
            extra = 0
            for p in CAT_PROBS[tok]:
                extra = (extra << 1) | bd.read(p)
            val += extra
        ctx = 1 if val == 1 else 2
        if bd.read(128):
            val = -val
        coeffs[ZIGZAG[i]] = val * (qdc if i == 0 else qac)
        nonzero += 1
        i += 1
    return coeffs, nonzero, i


# ------------------------------------------------------- loop filter


def _u2s(x):
    return x.astype(np.int32) - 128


def _c128(x):
    return np.clip(x, -128, 127)


def _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge):
    return (
        (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge)
        & (np.abs(p3 - p2) <= interior) & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior) & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior) & (np.abs(q3 - q2) <= interior)
    )


def _hev_mask(p1, p0, q0, q1, thresh):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _common_filter(p1, p0, q0, q1, use_outer, mask):
    """RFC 6386 §15.3 filter_common on signed values, vectorized.
    Returns (new_p0, new_q0, F1) with updates applied under mask."""
    a = _c128(np.where(use_outer, _c128(p1 - q1), 0) + 3 * (q0 - p0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    q0n = np.where(mask, _c128(q0 - f1), q0)
    p0n = np.where(mask, _c128(p0 + f2), p0)
    return p0n, q0n, f1


def _filter_edge(seg, kind, interior, edge, hev_t):
    """Filter one edge given an (8, n) signed pixel matrix ``seg``
    (rows p3,p2,p1,p0,q0,q1,q2,q3).  kind: 'mb' (6-tap) or 'sub'."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (seg[i] for i in range(8))
    mask = _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge)
    hev = _hev_mask(p1, p0, q0, q1, hev_t)
    if kind == "sub":
        p0n, q0n, f1 = _common_filter(p1, p0, q0, q1, hev, mask)
        a = (f1 + 1) >> 1
        outer = mask & ~hev
        seg[5] = np.where(outer, _c128(q1 - a), q1)
        seg[2] = np.where(outer, _c128(p1 + a), p1)
        seg[3], seg[4] = p0n, q0n
    else:
        nh = mask & ~hev
        w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
        a = _c128((27 * w + 63) >> 7)
        q0n = np.where(nh, _c128(q0 - a), q0)
        p0n = np.where(nh, _c128(p0 + a), p0)
        a = _c128((18 * w + 63) >> 7)
        seg[5] = np.where(nh, _c128(q1 - a), q1)
        seg[2] = np.where(nh, _c128(p1 + a), p1)
        a = _c128((9 * w + 63) >> 7)
        seg[6] = np.where(nh, _c128(q2 - a), q2)
        seg[1] = np.where(nh, _c128(p2 + a), p2)
        # hev pixels get the common 4-tap filter on p0/q0 only
        hm = mask & hev
        p0h, q0h, _ = _common_filter(p1, p0, q0, q1, True, hm)
        seg[3] = np.where(hm, p0h, p0n)
        seg[4] = np.where(hm, q0h, q0n)
    return seg


def _apply_edge(plane, y0, y1, x, horiz, kind, interior, edge, hev_t):
    """Filter the edge at column x (vertical) or row x (horizontal)
    of ``plane`` over rows/cols [y0, y1), in place."""
    if horiz:
        win = plane[x - 4:x + 4, y0:y1]
        seg = _u2s(win.copy())
    else:
        win = plane[y0:y1, x - 4:x + 4]
        seg = _u2s(win.copy()).T
    seg = _filter_edge(seg, kind, interior, edge, hev_t)
    out = (seg + 128).astype(np.uint8)
    if horiz:
        plane[x - 4:x + 4, y0:y1] = out
    else:
        plane[y0:y1, x - 4:x + 4] = out.T


def _simple_edge(plane, y0, y1, x, horiz, edge):
    """Simple loop filter (§15.1): 4-tap common filter gated only by
    the p0/q0 + p1/q1 magnitude test; luma only."""
    if horiz:
        seg = _u2s(plane[x - 2:x + 2, y0:y1].copy())
    else:
        seg = _u2s(plane[y0:y1, x - 2:x + 2].copy()).T
    p1, p0, q0, q1 = seg[0], seg[1], seg[2], seg[3]
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge
    p0n, q0n, _ = _common_filter(p1, p0, q0, q1, True, mask)
    seg[1], seg[2] = p0n, q0n
    out = (seg + 128).astype(np.uint8)
    if horiz:
        plane[x - 2:x + 2, y0:y1] = out
    else:
        plane[y0:y1, x - 2:x + 2] = out.T


# --------------------------------------------------------- decoder


def decode_frame(data: bytes) -> dict:
    """Decode a VP8 keyframe (the payload of a ``VP8 `` chunk).

    Returns {"y", "u", "v" (uint8 planes, mb-padded), "width",
    "height"} — planes are cropped by the caller/RGB wrapper.
    """
    if len(data) < 10:
        raise VP8Error("VP8: truncated frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise VP8Error("VP8: not a keyframe (still WebP must be)")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise VP8Error("VP8: bad keyframe start code")
    (wr,) = struct.unpack_from("<H", data, 6)
    (hr,) = struct.unpack_from("<H", data, 8)
    width, height = wr & 0x3FFF, hr & 0x3FFF
    pixel_gate(width, height, "VP8 frame")
    if not width or not height:
        raise VP8Error("VP8: zero dimension")
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4

    part0 = data[10:10 + first_part_size]
    if len(part0) < first_part_size:
        raise VP8Error("VP8: first partition truncated")
    bd = BoolDecoder(part0)

    bd.literal(1)  # color_space (0 only)
    bd.literal(1)  # clamping_type

    # --- segmentation (§9.3)
    seg_enabled = bd.read(128)
    update_map = False
    seg_abs = False
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        update_map = bool(bd.read(128))
        update_data = bd.read(128)
        if update_data:
            seg_abs = bool(bd.read(128))
            for i in range(4):
                seg_quant[i] = bd.flag_signed(7)
            for i in range(4):
                seg_lf[i] = bd.flag_signed(6)
        if update_map:
            for i in range(3):
                if bd.read(128):
                    seg_tree_probs[i] = bd.literal(8)

    # --- loop filter header (§9.4)
    simple_filter = bool(bd.read(128))
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bool(bd.read(128))
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled and bd.read(128):
        for i in range(4):
            ref_lf_deltas[i] = bd.flag_signed(6)
        for i in range(4):
            mode_lf_deltas[i] = bd.flag_signed(6)

    # --- token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    part_area = data[10 + first_part_size:]
    if n_parts > 1:
        sizes = []
        off = 3 * (n_parts - 1)
        for i in range(n_parts - 1):
            sizes.append(int.from_bytes(part_area[3 * i:3 * i + 3],
                                        "little"))
        parts = []
        for s in sizes:
            parts.append(part_area[off:off + s])
            off += s
        parts.append(part_area[off:])
    else:
        parts = [part_area]
    token_bd = [BoolDecoder(p) for p in parts]

    # --- quantizers (§9.6)
    y_ac_qi = bd.literal(7)
    deltas = {
        "y1dc": bd.flag_signed(4),
        "y2dc": bd.flag_signed(4),
        "y2ac": bd.flag_signed(4),
        "uvdc": bd.flag_signed(4),
        "uvac": bd.flag_signed(4),
    }
    dq = []
    for s in range(4):
        if seg_enabled:
            q = seg_quant[s] if seg_abs else y_ac_qi + seg_quant[s]
        else:
            q = y_ac_qi
        dq.append(_dequant_factors(_clamp_q(q), deltas))

    bd.read(128)  # refresh_entropy_probs (no-op for a single keyframe)

    # --- token probability updates (§13.4)
    probs = DEFAULT_COEFF_PROBS.copy()
    upd = COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    if bd.read(int(upd[i, j, k, m])):
                        probs[i, j, k, m] = bd.literal(8)
    probs = [[[list(probs[i, j, k]) for k in range(3)]
              for j in range(8)] for i in range(4)]

    skip_enabled = bool(bd.read(128))
    prob_skip = bd.literal(8) if skip_enabled else 0

    # --- per-MB mode parsing (first partition, §11)
    mbs = []
    above_bmodes = np.full((mb_w, 4), B_DC, np.int32)
    for my in range(mb_h):
        left_bmodes = np.full(4, B_DC, np.int32)
        for mx in range(mb_w):
            seg_id = 0
            if seg_enabled and update_map:
                seg_id = bd.tree(MB_SEGMENT_TREE, seg_tree_probs)
            skip = bd.read(prob_skip) if skip_enabled else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            bmodes = None
            if ymode == B_PRED:
                bmodes = np.empty(16, np.int32)
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    amode = (bmodes[sb - 4] if r else above_bmodes[mx][c])
                    lmode = (bmodes[sb - 1] if c else left_bmodes[r])
                    bmodes[sb] = bd.tree(
                        BMODE_TREE, KF_BMODE_PROBS[amode][lmode]
                    )
                above_bmodes[mx] = bmodes[12:]
                left_bmodes = bmodes[3::4].copy()
            else:
                bm = MODE_TO_BMODE[ymode]
                above_bmodes[mx] = bm
                left_bmodes[:] = bm
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            mbs.append({"seg": seg_id, "skip": skip, "ymode": ymode,
                        "bmodes": bmodes, "uvmode": uvmode})

    # --- buffers with prediction borders (top=127 incl. corner and
    # above-right extension, left=129 — §12.2)
    yb = np.empty((16 * mb_h + 1, 16 * mb_w + 5), np.uint8)
    ub = np.empty((8 * mb_h + 1, 8 * mb_w + 1), np.uint8)
    vb = np.empty_like(ub)
    for buf in (yb, ub, vb):
        buf[0, :] = 127
        buf[1:, 0] = 129

    # --- nonzero-coefficient contexts
    y_nz = _Plane(mb_w, 4)
    u_nz = _Plane(mb_w, 2)
    v_nz = _Plane(mb_w, 2)
    y2_nz = _Plane(mb_w, 1)

    mb_has_coeffs = np.zeros(mb_w * mb_h, bool)

    for my in range(mb_h):
        tbd = token_bd[my % n_parts]
        for pl in (y_nz, u_nz, v_nz, y2_nz):
            pl.left[:] = 0
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            q = dq[mb["seg"]]
            has_y2 = mb["ymode"] != B_PRED
            blocks = np.zeros((25, 16), np.int32)
            total_nz = 0
            if mb["skip"]:
                # §13.1: skipped MBs zero Y/U/V contexts; Y2 context
                # is cleared only when the MB carries a Y2 block.
                for pl, per in ((y_nz, 4), (u_nz, 2), (v_nz, 2)):
                    pl.above[mx * per:(mx + 1) * per] = 0
                    pl.left[:] = 0
                if has_y2:
                    y2_nz.above[mx] = 0
                    y2_nz.left[0] = 0
            else:
                y2_dcs = None
                if has_y2:
                    ctx = int(y2_nz.above[mx] + y2_nz.left[0])
                    co, nz, _ = _read_block(
                        tbd, probs, 1, 0, ctx, q["y2"][0], q["y2"][1]
                    )
                    y2_nz.above[mx] = y2_nz.left[0] = 1 if nz else 0
                    total_nz += nz
                    y2_dcs = _iwht4x4(co)
                plane = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    ctx = int(y_nz.above[mx * 4 + c] + y_nz.left[r])
                    co, nz, _ = _read_block(
                        tbd, probs, plane, first, ctx,
                        q["y1"][0], q["y1"][1]
                    )
                    if has_y2:
                        co[0] = y2_dcs[sb]
                    blocks[sb] = co
                    flag = 1 if nz else 0
                    y_nz.above[mx * 4 + c] = y_nz.left[r] = flag
                    total_nz += nz
                for half, pl_nz in ((0, u_nz), (1, v_nz)):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        ctx = int(pl_nz.above[mx * 2 + c] + pl_nz.left[r])
                        co, nz, _ = _read_block(
                            tbd, probs, 2, 0, ctx, q["uv"][0], q["uv"][1]
                        )
                        blocks[16 + 4 * half + sb] = co
                        flag = 1 if nz else 0
                        pl_nz.above[mx * 2 + c] = pl_nz.left[r] = flag
                        total_nz += nz
            mb_has_coeffs[my * mb_w + mx] = total_nz > 0

            # ---- reconstruction
            by, bx = 1 + 16 * my, 1 + 16 * mx
            if mb["ymode"] == B_PRED:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    sy, sx = by + 4 * r, bx + 4 * c
                    A = yb[sy - 1, sx:sx + 4]
                    L = yb[sy:sy + 4, sx - 1]
                    P = yb[sy - 1, sx - 1]
                    if c == 3 and r > 0:
                        # right-column subblocks reuse the MB's own
                        # top-right pixels (§12.3 quirk)
                        AR = yb[by - 1, bx + 16:bx + 20]
                    else:
                        AR = yb[sy - 1, sx + 4:sx + 8]
                    pred = _predict_b(int(mb["bmodes"][sb]), A, AR, L, P)
                    res = _idct4x4(blocks[sb])
                    yb[sy:sy + 4, sx:sx + 4] = np.clip(
                        pred.astype(np.int32) + res, 0, 255
                    ).astype(np.uint8)
            else:
                above = yb[by - 1, bx:bx + 16]
                left = yb[by:by + 16, bx - 1]
                corner = yb[by - 1, bx - 1]
                pred = _predict_block(
                    mb["ymode"], above, left, corner, my > 0, mx > 0, 16
                ).astype(np.int32)
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] += _idct4x4(
                        blocks[sb]
                    )
                yb[by:by + 16, bx:bx + 16] = np.clip(
                    pred, 0, 255
                ).astype(np.uint8)
            # chroma
            cy, cx = 1 + 8 * my, 1 + 8 * mx
            for half, cb in ((0, ub), (1, vb)):
                above = cb[cy - 1, cx:cx + 8]
                left = cb[cy:cy + 8, cx - 1]
                corner = cb[cy - 1, cx - 1]
                pred = _predict_block(
                    mb["uvmode"], above, left, corner, my > 0, mx > 0, 8
                ).astype(np.int32)
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    pred[4 * r:4 * r + 4, 4 * c:4 * c + 4] += _idct4x4(
                        blocks[16 + 4 * half + sb]
                    )
                cb[cy:cy + 8, cx:cx + 8] = np.clip(
                    pred, 0, 255
                ).astype(np.uint8)
        # extend the above-right border: replicate this row's last
        # luma column so the next MB row's rightmost B_PRED subblocks
        # read defined pixels
        yb[by:by + 16, 16 * mb_w + 1:] = yb[
            by:by + 16, 16 * mb_w:16 * mb_w + 1
        ]

    y = yb[1:, 1:16 * mb_w + 1]
    u = ub[1:, 1:]
    v = vb[1:, 1:]

    # --- loop filter (§15)
    if filter_level:
        _loop_filter(
            y, u, v, mbs, mb_has_coeffs, mb_w, mb_h, filter_level,
            sharpness, simple_filter, seg_enabled, seg_abs, seg_lf,
            lf_delta_enabled, ref_lf_deltas, mode_lf_deltas,
        )

    return {"y": y, "u": u, "v": v, "width": width, "height": height,
            "mbs": mbs, "filter_level": filter_level,
            "simple_filter": simple_filter}


def _loop_filter(y, u, v, mbs, mb_has_coeffs, mb_w, mb_h, base_level,
                 sharpness, simple, seg_enabled, seg_abs, seg_lf,
                 delta_enabled, ref_deltas, mode_deltas):
    """Per-MB loop filtering in raster order, in place (§15)."""
    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            lvl = base_level
            if seg_enabled:
                lvl = (seg_lf[mb["seg"]] if seg_abs
                       else base_level + seg_lf[mb["seg"]])
                lvl = max(0, min(63, lvl))
            if delta_enabled:
                lvl += ref_deltas[0]  # INTRA_FRAME
                if mb["ymode"] == B_PRED:
                    lvl += mode_deltas[0]
                lvl = max(0, min(63, lvl))
            if lvl == 0:
                continue
            interior = lvl
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior == 0:
                interior = 1
            hev_t = 0
            if lvl >= 40:
                hev_t = 2
            elif lvl >= 15:
                hev_t = 1
            mb_edge = ((lvl + 2) * 2) + interior
            sub_edge = (lvl * 2) + interior
            inner = (mb_has_coeffs[my * mb_w + mx]
                     or mb["ymode"] == B_PRED)
            yy, yx = 16 * my, 16 * mx
            cy, cx = 8 * my, 8 * mx
            if simple:
                if mx:
                    _simple_edge(y, yy, yy + 16, yx, False, mb_edge)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_edge(y, yy, yy + 16, yx + dx, False,
                                     sub_edge)
                if my:
                    _simple_edge(y, yx, yx + 16, yy, True, mb_edge)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_edge(y, yx, yx + 16, yy + dy, True,
                                     sub_edge)
                continue
            if mx:
                _apply_edge(y, yy, yy + 16, yx, False, "mb", interior,
                            mb_edge, hev_t)
                for p in (u, v):
                    _apply_edge(p, cy, cy + 8, cx, False, "mb",
                                interior, mb_edge, hev_t)
            if inner:
                for dx in (4, 8, 12):
                    _apply_edge(y, yy, yy + 16, yx + dx, False, "sub",
                                interior, sub_edge, hev_t)
                for p in (u, v):
                    _apply_edge(p, cy, cy + 8, cx + 4, False, "sub",
                                interior, sub_edge, hev_t)
            if my:
                _apply_edge(y, yx, yx + 16, yy, True, "mb", interior,
                            mb_edge, hev_t)
                for p in (u, v):
                    _apply_edge(p, cx, cx + 8, cy, True, "mb",
                                interior, mb_edge, hev_t)
            if inner:
                for dy in (4, 8, 12):
                    _apply_edge(y, yx, yx + 16, yy + dy, True, "sub",
                                interior, sub_edge, hev_t)
                for p in (u, v):
                    _apply_edge(p, cx, cx + 8, cy + 4, True, "sub",
                                interior, sub_edge, hev_t)


def decode_yuv(data: bytes) -> tuple:
    """VP8 chunk payload -> (y, u, v) uint8 planes cropped to the
    frame size (chroma at ceil(size/2))."""
    f = decode_frame(data)
    w, h = f["width"], f["height"]
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    return f["y"][:h, :w], f["u"][:ch, :cw], f["v"][:ch, :cw]


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 limited-range YUV 4:2:0 -> RGB with 2x nearest chroma
    upsampling.  Documented engine conversion — libwebp's own RGB
    output uses a bicubic-ish "fancy upsampler", so cross-decoder
    comparisons are done on YUV planes (bit-exact) or RGB at a PSNR
    floor, mirroring the PSNR>=40dB lossy-payload invariant."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    yy = y.astype(np.int32)
    c = 298 * (yy - 16)
    r = (c + 409 * (vv - 128) + 128) >> 8
    g = (c - 100 * (uu - 128) - 208 * (vv - 128) + 128) >> 8
    b = (c + 516 * (uu - 128) + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def vp8_decode_rgb(data: bytes) -> np.ndarray:
    """VP8 chunk payload -> uint8 HxWx3 RGB."""
    return yuv_to_rgb(*decode_yuv(data))


# ------------------------------------------------------ fixture writer
#
# A minimal conformant VP8 keyframe ENCODER for flat-color images,
# mirroring the repo's fixture-writer pattern (ogg_write, mp3_write,
# VP8L webp_encode): MB (0,0) carries one DC coefficient per Y2/U/V
# block; every other MB is coded skip (DC_PRED reproduces the flat
# color exactly from its neighbors), loop filter level 0, no
# probability updates.  The decode of such a frame is a closed-form
# integer expression (see webp_lossy_flat_value), which is what the
# oracle queries check; the decoder itself is pinned bit-exactly to
# libwebp by the differential fuzz tests.


class BoolEncoder:
    """RFC 6386 §7.2 boolean arithmetic encoder, big-int carry form:
    ``low`` accumulates at the current renormalization scale, so
    carry propagation is ordinary integer addition."""

    def __init__(self):
        self.low = 0
        self.rng = 255
        self.n_bits = 0

    def write(self, prob: int, bit: int) -> None:
        split = 1 + (((self.rng - 1) * int(prob)) >> 8)
        if bit:
            self.low += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            self.low <<= 1
            self.n_bits += 1

    def literal(self, bits: int, value: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.write(128, (value >> i) & 1)

    def tree(self, tree, probs, leaf: int) -> None:
        path = _tree_path(tree, leaf)
        for node, bit in path:
            self.write(probs[node >> 1], bit)

    def flush(self) -> bytes:
        # low < 256 << n_bits, so n_bits + 8 bits suffice; pad right
        # to a byte boundary and add two zero bytes for the decoder's
        # two-byte prefetch
        total = self.n_bits + 8
        nbytes = (total + 7) >> 3
        v = self.low << (nbytes * 8 - total)
        return v.to_bytes(nbytes, "big") + b"\x00\x00"


def _tree_path(tree, leaf: int):
    """(node_index, bit) path from the root to ``-leaf``."""
    return _tree_path_from(tree, leaf, 0)


def _write_token(be: BoolEncoder, probs_row, value: int,
                 prev_zero: bool) -> None:
    """One DCT token (with category extra bits + sign) for |value|>=1.
    ``prev_zero`` starts the tree at node 2 (no EOB after a zero)."""
    mag = abs(value)
    if mag <= 4:
        tok = T_ZERO + mag  # 1..4 -> T_ONE..T_FOUR
    elif mag <= 6:
        tok = T_CAT1
    elif mag <= 10:
        tok = T_CAT2
    elif mag <= 18:
        tok = T_CAT3
    elif mag <= 34:
        tok = T_CAT4
    elif mag <= 66:
        tok = T_CAT5
    else:
        tok = T_CAT6
    for node, bit in _tree_path_from(COEFF_TREE, tok,
                                     2 if prev_zero else 0):
        be.write(probs_row[node >> 1], bit)
    if tok > T_FOUR:
        extra = mag - CAT_BASE[tok]
        cp = CAT_PROBS[tok]
        for i, p in enumerate(cp):
            be.write(p, (extra >> (len(cp) - 1 - i)) & 1)
    be.write(128, 1 if value < 0 else 0)


def _tree_path_from(tree, leaf: int, start: int):
    def walk(i, path):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == -leaf and nxt <= 0:
                return path + [(i, bit)]
            if nxt > 0:
                r = walk(nxt, path + [(i, bit)])
                if r is not None:
                    return r
        return None

    r = walk(start, [])
    if r is None:  # pragma: no cover
        raise VP8Error(f"leaf {leaf} unreachable from node {start}")
    return r


def _write_eob(be, probs_row):
    be.write(probs_row[0], 0)


def vp8_encode_flat(width: int, height: int, vy: int, vu: int, vv: int,
                    qi: int = 0, n_token_partitions: int = 1) -> bytes:
    """Conformant VP8 keyframe: flat image whose decoded planes are
    the closed forms in :func:`webp_lossy_flat_value` for DC tokens
    ``vy``/``vu``/``vv`` (each in [-2048, 2047]) at quantizer index
    ``qi``.  Loop filter off; MB (0,0) carries the coefficients and
    every other MB is skip-coded.

    ``n_token_partitions`` in {1, 2, 4, 8} exercises the
    multi-partition token layout (§9.5: 3-byte little-endian sizes
    for all but the last partition; MB row r reads partition
    r % n).  With n > 1 the FIRST MB of every row is coded skip=0
    with explicit all-EOB token blocks so every partition carries
    real reads — libwebp's simple encoder only ever writes one
    partition, so this writer is the only in-sandbox source of
    multi-partition streams (validated against libwebp decode)."""
    if n_token_partitions not in (1, 2, 4, 8):
        raise VP8Error("n_token_partitions must be 1, 2, 4, or 8")
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4

    # ---- partition 0: header + modes
    b0 = BoolEncoder()
    b0.literal(1, 0)  # color space
    b0.literal(1, 0)  # clamping
    b0.write(128, 0)  # segmentation off
    b0.write(128, 0)  # filter type normal
    b0.literal(6, 0)  # loop filter level 0
    b0.literal(3, 0)  # sharpness
    b0.write(128, 0)  # no lf deltas
    b0.literal(2, {1: 0, 2: 1, 4: 2, 8: 3}[n_token_partitions])
    b0.literal(7, qi)  # y_ac_qi
    for _ in range(5):
        b0.write(128, 0)  # no quant deltas
    b0.write(128, 0)  # refresh_entropy_probs
    upd = COEFF_UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    b0.write(int(upd[i, j, k, m]), 0)
    b0.write(128, 1)  # mb_no_coeff_skip enabled
    b0.literal(8, 128)  # prob_skip_false
    # with multi-partition output, the first MB of every row carries
    # explicit (all-EOB beyond MB 0,0) token blocks so each partition
    # gets real reads; everything else is skip-coded
    def has_tokens(mb_r: int, mb_c: int) -> bool:
        if mb_r == 0 and mb_c == 0:
            return True
        return n_token_partitions > 1 and mb_c == 0

    for mb_r in range(mb_h):
        for mb_c in range(mb_w):
            b0.write(128, 0 if has_tokens(mb_r, mb_c) else 1)
            b0.tree(KF_YMODE_TREE, KF_YMODE_PROBS, DC_PRED)
            b0.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, DC_PRED)
    part0 = b0.flush()

    # ---- token partitions (MB row r -> partition r % n)
    probs = DEFAULT_COEFF_PROBS
    bts = [BoolEncoder() for _ in range(n_token_partitions)]

    def write_mb_tokens(bt: BoolEncoder, y2_ctx: int, uv_ctx,
                        dcs) -> None:
        """One MB's token blocks.  ``dcs`` = (vy, vu, vv) or all-0
        for an explicit empty MB; ``uv_ctx`` = first-coeff ctx for
        chroma subblocks [sb0, sb1] (sb2/sb3 are always 0 here)."""
        wy, wu, wv = dcs
        # Y2: DC token + EOB.  vy == 0 must be an EMPTY block
        # (immediate EOB): ZERO then EOB is non-conformant (§13.3).
        row = probs[1][COEFF_BANDS[0]][y2_ctx]
        if wy:
            _write_token(bt, row, wy, prev_zero=False)
            _write_eob(
                bt, probs[1][COEFF_BANDS[1]][1 if abs(wy) == 1 else 2]
            )
        else:
            _write_eob(bt, row)
        # 16 Y blocks: immediate EOB at coeff 1; all neighbor nz = 0
        # (Y blocks never carry their own coeffs in this writer)
        for _sb in range(16):
            _write_eob(bt, probs[0][COEFF_BANDS[1]][0])
        # chroma: 4 U then 4 V
        for vc, ctx01 in ((wu, uv_ctx[0]), (wv, uv_ctx[1])):
            nz_a = [ctx01, ctx01]
            nz_l = [0, 0]
            for sb in range(4):
                r, c = sb >> 1, sb & 1
                ctx = nz_a[c] + nz_l[r]
                row = probs[2][COEFF_BANDS[0]][ctx]
                if vc:
                    _write_token(bt, row, vc, prev_zero=False)
                    _write_eob(
                        bt,
                        probs[2][COEFF_BANDS[1]][1 if abs(vc) == 1 else 2],
                    )
                    nz_a[c] = nz_l[r] = 1
                else:
                    _write_eob(bt, row)
                    nz_a[c] = nz_l[r] = 0

    write_mb_tokens(bts[0], 0, (0, 0), (vy, vu, vv))
    if n_token_partitions > 1:
        for mb_r in range(1, mb_h):
            # contexts at the row's first MB: above = MB (r-1, 0)'s
            # flags (nonzero only for r == 1, inherited from the DC
            # carrier), left = 0 (row start)
            y2_ctx = 1 if (mb_r == 1 and vy) else 0
            uvc = (1 if (mb_r == 1 and vu) else 0,
                   1 if (mb_r == 1 and vv) else 0)
            write_mb_tokens(
                bts[mb_r % n_token_partitions], y2_ctx, uvc, (0, 0, 0)
            )
    parts = [bt.flush() for bt in bts]

    first_part_size = len(part0)
    tag = (0) | (0 << 1) | (1 << 4) | (first_part_size << 5)
    header = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    header += b"\x9d\x01\x2a"
    header += struct.pack("<H", width)
    header += struct.pack("<H", height)
    sizes = b"".join(
        len(p).to_bytes(3, "little") for p in parts[:-1]
    )
    return header + part0 + sizes + b"".join(parts)


def webp_lossy_flat_value(vy: int, vu: int, vv: int, qi: int = 0):
    """Closed-form decoded (Y, U, V) for :func:`vp8_encode_flat` —
    the oracle-side integer math (dequant -> IWHT/IDCT DC path ->
    128 + residual, clipped)."""
    y2dc = DC_QLOOKUP[_clamp_q(qi)] * 2
    uvdc = min(DC_QLOOKUP[_clamp_q(qi)], 132)
    wht = (vy * y2dc + 3) >> 3
    yv = 128 + ((wht + 4) >> 3)
    uv_ = 128 + ((vu * uvdc + 4) >> 3)
    vv_ = 128 + ((vv * uvdc + 4) >> 3)
    clip = lambda x: 0 if x < 0 else (255 if x > 255 else x)  # noqa: E731
    return clip(yv), clip(uv_), clip(vv_)
