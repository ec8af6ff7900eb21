"""Extended VP8 differential fuzz vs system libwebp.

The pytest differential (tests/test_vp8.py) runs a 32-combo corpus in
seconds; this script scales the same bit-exactness check to hundreds
of streams across more content classes (gradients+noise, hard tiles,
text-like glyph grids, photo-ish low-frequency fields), sizes up to
640x480, and the full quality range — single-process, single-core,
suitable for running alongside other work.

Usage: python scripts/vp8_fuzz.py [n_streams] [seed]
Prints one JSON line: {"streams": N, "bit_exact": N, "failures": [...]}
"""

from __future__ import annotations

import ctypes
import json
import struct
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from mechaml_spark import vp8  # noqa: E402

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)


def encode(px, q):
    h, w, _ = px.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(px).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ), w, h, w * 3, ctypes.c_float(q), ctypes.byref(out),
    )
    data = bytes(bytearray(
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents
    ))
    lib.WebPFree(out)
    return data


def lib_yuv(data):
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    s = ctypes.c_int()
    us = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp), ctypes.byref(s),
        ctypes.byref(us),
    )
    W, H, S, US = w.value, h.value, s.value, us.value
    y = np.ctypeslib.as_array(yp, shape=(H * S,)).reshape(H, S)[:, :W].copy()
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = np.ctypeslib.as_array(up, shape=(ch * US,)).reshape(ch, US)[
        :, :cw].copy()
    v = np.ctypeslib.as_array(vp, shape=(ch * US,)).reshape(ch, US)[
        :, :cw].copy()
    lib.WebPFree(yp)
    return y, u, v


def payload(data):
    pos = 12
    while pos + 8 <= len(data):
        four = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if four == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


def content(rng, w, h, kind):
    if kind == 0:  # gradient + noise + hard band
        x = np.linspace(0, 255, w)
        yy = np.linspace(0, 255, h)
        gr = (yy[:, None] + x[None, :]) / 2
        px = np.stack([gr, 255 - gr, gr * 0.5 + 64], -1)
        px += rng.normal(0, 25, px.shape)
        if h >= 3:
            px[h // 3:h // 2] = rng.integers(0, 255, 3)
    elif kind == 1:  # hard tiles (B_PRED stress)
        t = rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, 3))
        px = np.repeat(np.repeat(t, 8, 0), 8, 1)[:h, :w].astype(float)
    elif kind == 2:  # text-like glyph grid
        px = np.full((h, w, 3), 245.0)
        for _ in range(max(4, w * h // 600)):
            gx = int(rng.integers(0, max(1, w - 6)))
            gy = int(rng.integers(0, max(1, h - 10)))
            px[gy:gy + 9, gx:gx + 5] = rng.integers(0, 70)
    else:  # photo-ish low-frequency field
        small = rng.normal(128, 60, ((h + 15) // 16, (w + 15) // 16, 3))
        px = np.repeat(np.repeat(small, 16, 0), 16, 1)[:h, :w]
        px = px + rng.normal(0, 8, (h, w, 3))
    return np.clip(px, 0, 255).astype(np.uint8)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    rng = np.random.default_rng(seed)
    ok = 0
    failures = []
    for i in range(n):
        w = int(rng.integers(1, 641))
        h = int(rng.integers(1, 481))
        q = float(rng.integers(1, 101))
        kind = i % 4
        px = content(rng, w, h, kind)
        data = encode(px, q)
        tag = f"{w}x{h} q{q:.0f} kind{kind}"
        try:
            y, u, v = vp8.decode_yuv(payload(data))
            ly, lu, lv = lib_yuv(data)
            if (np.array_equal(y, ly) and np.array_equal(u, lu)
                    and np.array_equal(v, lv)):
                ok += 1
            else:
                failures.append(tag)
        except Exception as e:  # noqa: BLE001 - report, keep fuzzing
            failures.append(f"{tag}: {type(e).__name__}: {e}")
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{n} ({ok} exact)", file=sys.stderr, flush=True)
    print(json.dumps(
        {"streams": n, "bit_exact": ok, "failures": failures[:20]}
    ))


if __name__ == "__main__":
    main()
