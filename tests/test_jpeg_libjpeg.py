"""Ground-truth JPEG cross-validation against the system libjpeg62
(driven in a subprocess — libjpeg's default error handler exits the
process).  JPEG decode is NOT bit-exact across conformant decoders
(IDCT accuracy is a tolerance in the standard), so comparisons allow
a small per-sample delta, in the spirit of ITU T.83 accuracy tests.
"""

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from mechaml_spark.jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
)

HELPER = os.path.join(os.path.dirname(__file__), "helpers", "libjpeg_cli.py")


def _have_libjpeg():
    try:
        ctypes.CDLL("libjpeg.so.62")
        return True
    except OSError:
        return False


def _run(*args):
    r = subprocess.run(
        [sys.executable, HELPER, *map(str, args)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    return r


def _smooth(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.empty((h, w, 3), np.uint8)
    px[..., 0] = np.clip(110 + 2 * xx - yy, 0, 255)
    px[..., 1] = np.clip(90 + xx + yy // 2, 0, 255)
    px[..., 2] = np.clip(140 - xx // 2 + yy, 0, 255)
    return px


@pytest.mark.skipif(not _have_libjpeg(), reason="libjpeg62 not present")
@pytest.mark.parametrize("progressive", [0, 1])
def test_decode_real_libjpeg_streams(progressive):
    """libjpeg-encoded baseline (default 4:2:0 subsampling!) and
    progressive (jpeg_simple_progression scan script) streams decode
    within IDCT tolerance of libjpeg's own decode."""
    px = _smooth(64, 48)
    with tempfile.TemporaryDirectory() as td:
        raw, jpg, ref = f"{td}/in.raw", f"{td}/a.jpg", f"{td}/ref.raw"
        open(raw, "wb").write(px.tobytes())
        _run("encode", raw, 64, 48, 90, progressive, jpg)
        data = open(jpg, "rb").read()
        assert (b"\xff\xc2" in data) == bool(progressive)  # SOF2
        mine = jpeg_decode(data)
        _run("decode", jpg, 64, 48, ref)
        theirs = np.frombuffer(
            open(ref, "rb").read(), np.uint8
        ).reshape(48, 64, 3)
    d = np.abs(mine.astype(int) - theirs.astype(int))
    assert d.max() <= 4, d.max()
    assert np.abs(mine.astype(int) - px.astype(int)).max() <= 6


@pytest.mark.skipif(not _have_libjpeg(), reason="libjpeg62 not present")
@pytest.mark.parametrize("progressive", [0, 1])
def test_libjpeg_decodes_our_streams(progressive):
    """The reference decoder accepts our encoder's baseline and
    progressive output and agrees with our decoder within IDCT
    tolerance."""
    px = _smooth(40, 24)
    data = (
        jpeg_encode_progressive(px, quality=90)
        if progressive
        else jpeg_encode(px, quality=90)
    )
    mine = jpeg_decode(data)
    with tempfile.TemporaryDirectory() as td:
        jpg, ref = f"{td}/m.jpg", f"{td}/ref.raw"
        open(jpg, "wb").write(data)
        _run("decode", jpg, 40, 24, ref)
        theirs = np.frombuffer(
            open(ref, "rb").read(), np.uint8
        ).reshape(24, 40, 3)
    d = np.abs(mine.astype(int) - theirs.astype(int))
    assert d.max() <= 4, d.max()
