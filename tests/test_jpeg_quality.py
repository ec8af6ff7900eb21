"""Quality-factor estimation from DQT tables (jpeg.quality_estimate):
round-trip proof over the FULL q range for both encoders, DQT parse
robustness, and custom-table nearest-match behavior."""

from __future__ import annotations

import numpy as np
import pytest

from mechaml_spark import jpeg


PX8 = np.full((8, 8, 3), 100, dtype=np.uint8)
PX16 = np.full((16, 16, 3), 57, dtype=np.uint8)


def test_roundtrip_every_quality_baseline():
    for q in range(1, 101):
        est, exact, nt = jpeg.quality_estimate(
            jpeg.jpeg_encode(PX8, quality=q)
        )
        assert (est, exact, nt) == (q, True, 2), q


def test_roundtrip_progressive_sample():
    for q in (1, 7, 35, 50, 77, 90, 95, 100):
        est, exact, nt = jpeg.quality_estimate(
            jpeg.jpeg_encode_progressive(PX16, quality=q)
        )
        assert (est, exact, nt) == (q, True, 2), q


def test_parse_dqt_natural_order():
    data = jpeg.jpeg_encode(PX8, quality=90)
    tables = jpeg.parse_dqt(data)
    assert [tq for tq, _ in tables] == [0, 1]
    want_y = jpeg._quality_scale(jpeg._QY, 90)
    want_c = jpeg._quality_scale(jpeg._QC, 90)
    assert np.array_equal(tables[0][1], want_y)
    assert np.array_equal(tables[1][1], want_c)


def test_custom_tables_nearest_not_exact():
    # perturb one DQT byte: estimator returns nearest q, exact=False
    data = bytearray(jpeg.jpeg_encode(PX8, quality=80))
    i = data.index(b"\xff\xdb") + 5  # first zigzag entry of luma DQT
    data[i] = min(255, data[i] + 3)
    est, exact, nt = jpeg.quality_estimate(bytes(data))
    assert nt == 2 and not exact
    assert abs(est - 80) <= 2


def test_sixteen_bit_dqt_parses():
    # hand-build a DQT segment with Pq=1 (16-bit) carrying the q50
    # luma table; splice it in place of the 8-bit tables
    import struct

    want = jpeg._quality_scale(jpeg._QY, 50)
    zz = want.ravel()[jpeg._ZIGZAG]
    seg = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + b"\x10"
    seg += b"".join(struct.pack(">H", int(v)) for v in zz)
    base = jpeg.jpeg_encode(PX8, quality=90)
    soi, rest = base[:2], base[2:]
    tables = jpeg.parse_dqt(soi + seg + rest)
    assert np.array_equal(tables[0][1], want)
    est, exact, _ = jpeg.quality_estimate(soi + seg + rest)
    # first table (16-bit q50 luma) + original q90 chroma: not exact,
    # estimator still lands between the two
    assert not exact and 50 <= est <= 90


def test_not_jpeg_and_no_dqt_raise():
    with pytest.raises(ValueError):
        jpeg.parse_dqt(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        jpeg.quality_estimate(b"\xff\xd8\xff\xd9")


def test_sof_probe_structures():
    px = np.full((16, 16, 3), 90, np.uint8)
    base = jpeg.jpeg_encode(px, quality=80)
    assert jpeg.jpeg_sof_probe(base) == (False, 16, 16, 3, "4:4:4")
    prog = jpeg.jpeg_encode_progressive(px, quality=80)
    assert jpeg.jpeg_sof_probe(prog) == (True, 16, 16, 3, "4:4:4")
    for byte, want in ((0x22, "4:2:0"), (0x21, "4:2:2"),
                       (0x12, "4:4:0"), (0x31, "other")):
        b = bytearray(base)
        b[base.index(b"\xff\xc0") + 11] = byte
        assert jpeg.jpeg_sof_probe(bytes(b))[4] == want, hex(byte)
    with pytest.raises(ValueError):
        jpeg.jpeg_sof_probe(b"\xff\xd8\xff\xd9")
