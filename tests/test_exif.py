"""EXIF encode/parse/strip + baseline TIFF codec (pure byte work —
no Spark session needed; the Spark stages are covered by the
``image_exif`` / ``image_tiff_features`` driver queries)."""

import struct

import numpy as np
import pytest

from mechaml_spark import exif, imaging
from mechaml_spark.jpeg import jpeg_decode, jpeg_encode

TAGS = {
    "Make": "camco",
    "Model": "m-7",
    "Orientation": 6,
    "DateTime": "2021:03:04 05:06:07",
    "PixelXDimension": 24,
    "PixelYDimension": 16,
    "GPSLatitudeRef": "N",
    "GPSLatitude": [(47, 1), (36, 1), (1234, 100)],
    "GPSLongitudeRef": "W",
    "GPSLongitude": [(122, 1), (19, 1), (5678, 100)],
}


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_payload_round_trip(bo):
    parsed = exif.exif_parse(exif.exif_payload(TAGS, byte_order=bo))
    assert parsed == TAGS


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_jpeg_embed_parse_strip(bo):
    px = np.full((16, 16, 3), 77, np.uint8)
    clean = jpeg_encode(px, quality=95)
    tagged = exif.jpeg_set_exif(clean, exif.exif_payload(TAGS, byte_order=bo))
    # metadata reads back; pixels untouched
    assert exif.exif_parse(tagged) == TAGS
    assert (jpeg_decode(tagged) == jpeg_decode(clean)).all()
    # privacy scrub restores the original bytes exactly
    assert exif.exif_strip(tagged) == clean
    assert exif.exif_parse(exif.exif_strip(tagged)) == {}


def test_set_replaces_existing_app1():
    px = np.full((8, 8, 3), 10, np.uint8)
    clean = jpeg_encode(px, quality=95)
    a = exif.jpeg_set_exif(clean, exif.exif_payload({"Orientation": 3}))
    b = exif.jpeg_set_exif(a, exif.exif_payload({"Orientation": 8}))
    assert exif.exif_parse(b) == {"Orientation": 8}
    assert exif.exif_strip(b) == clean


def test_parse_no_exif_and_errors():
    px = np.full((8, 8, 3), 10, np.uint8)
    assert exif.exif_parse(jpeg_encode(px)) == {}
    with pytest.raises(exif.ExifError):
        exif.exif_parse(b"II\x2b\x00")  # bad TIFF magic (43 != 42)
    with pytest.raises(exif.ExifError):
        exif.jpeg_set_exif(b"\x89PNG", b"Exif\x00\x00")
    with pytest.raises(exif.ExifError):
        exif.jpeg_set_exif(jpeg_encode(px), b"x" * 0x10000)
    with pytest.raises(exif.ExifError):
        exif.exif_payload({}, byte_order="II")
    with pytest.raises(exif.ExifError):
        exif.exif_payload({"Orientation": 1}, byte_order="XX")


def test_tiff_round_trip_rgb_and_gray():
    px = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    data = imaging.tiff_encode(px)
    assert (imaging.tiff_decode(data) == px).all()
    assert (imaging.decode(data, "tiff") == px).all()
    # lossless: dHash invariant vs other lossless encodings
    assert imaging.dhash64(imaging.tiff_decode(data)) == imaging.dhash64(px)

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = imaging.tiff_decode(imaging.tiff_encode(g))
    assert out.shape == (8, 8, 3)
    assert (out == g[..., None]).all()


def test_tiff_big_endian_and_multistrip():
    # Hand-build an MM, two-strip 4x4 grayscale TIFF: the decoder must
    # honor byte order and strip concatenation (TIFF 6.0 baseline).
    rows = np.arange(16, dtype=np.uint8).reshape(4, 4)
    s0, s1 = rows[:2].tobytes(), rows[2:].tobytes()
    entries = [
        (256, 4, 4), (257, 4, 4), (258, 3, 8), (259, 3, 1), (262, 3, 1),
        (277, 3, 1), (278, 4, 2), (279, 4, [len(s0), len(s1)]),
    ]
    probe, ov = exif._build_ifd(">", entries + [(273, 4, [0, 0])], 8)
    off = 8 + len(probe) + len(ov)
    body, ov = exif._build_ifd(
        ">", entries + [(273, 4, [off, off + len(s0)])], 8
    )
    data = b"MM" + struct.pack(">HI", 42, 8) + body + ov + s0 + s1
    assert (imaging.tiff_decode(data)[..., 0] == rows).all()


def test_tiff_refusals():
    px = np.zeros((4, 4), np.uint8)
    entries = [
        (256, 4, 4), (257, 4, 4), (258, 3, 8), (259, 3, 7),  # JPEG-in-TIFF
        (262, 3, 1), (273, 4, 8), (277, 3, 1), (278, 4, 4), (279, 4, 16),
    ]
    body, ov = exif._build_ifd("<", entries, 8)
    lzw = b"II" + struct.pack("<HI", 42, 8) + body + ov + px.tobytes()
    with pytest.raises(NotImplementedError, match="compression"):
        imaging.tiff_decode(lzw)
    with pytest.raises(ValueError):
        imaging.tiff_decode(b"not a tiff at all")
    with pytest.raises(ValueError):
        imaging.tiff_encode(np.zeros((4, 4, 2), np.uint8))


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_ifd1_thumbnail_round_trip(bo):
    # EXIF 2.3 §4.6.3: IFD1 chained from IFD0's next-pointer,
    # Compression=6 + JPEGInterchangeFormat/-Length
    thumb = jpeg_encode(np.full((8, 8, 3), 128, np.uint8), quality=95)
    p = exif.exif_payload(
        {"Make": "CamX", "Orientation": 3}, byte_order=bo, thumbnail=thumb
    )
    tags = exif.exif_parse(p)
    assert tags["ThumbnailCompression"] == 6
    assert tags["ThumbnailLength"] == len(thumb)
    assert exif.exif_thumbnail(p) == thumb
    assert (jpeg_decode(exif.exif_thumbnail(p)) == 128).all()
    # embedded in a real JPEG container, extraction still works
    host = jpeg_encode(np.full((16, 16, 3), 200, np.uint8), quality=95)
    j = exif.jpeg_set_exif(host, p)
    assert exif.exif_thumbnail(j) == thumb
    # IFD0 tags unaffected by the chain
    assert exif.exif_parse(j)["Make"] == "CamX"


def test_thumbnail_absent_and_bounds():
    p = exif.exif_payload({"Make": "CamX"})
    assert exif.exif_thumbnail(p) is None
    assert "ThumbnailOffset" not in exif.exif_parse(p)
    # thumbnail-only payload (no IFD0 tags) is valid TIFF
    thumb = jpeg_encode(np.full((8, 8, 3), 7, np.uint8), quality=95)
    only = exif.exif_payload({}, thumbnail=thumb)
    assert exif.exif_thumbnail(only) == thumb
    # out-of-range bounds raise loudly instead of slicing garbage
    bad = bytearray(exif.exif_payload({"Make": "x"}, thumbnail=thumb))
    bad = bytes(bad[: len(bad) - len(thumb) + 2])  # truncate the bytes
    with pytest.raises(exif.ExifError, match="bounds"):
        exif.exif_thumbnail(bad)


def test_strip_gps_surgical():
    import numpy as np

    from mechaml_spark import exif, jpeg

    base = jpeg.jpeg_encode(np.full((8, 8, 3), 77, np.uint8), quality=90)
    tags = {
        "Make": "Cam", "Model": "X1", "Orientation": 5,
        "DateTime": "2024:01:02 03:04:05",
        "PixelXDimension": 8, "PixelYDimension": 8,
        "GPSLatitudeRef": "N", "GPSLatitude": [(52, 1), (30, 1), (0, 1)],
        "GPSLongitudeRef": "E", "GPSLongitude": [(13, 1), (24, 1), (30, 1)],
    }
    for order in ("II", "MM"):
        j = exif.jpeg_set_exif(base, exif.exif_payload(tags, byte_order=order))
        out, had = exif.exif_strip_gps(j)
        assert had
        after = exif.exif_parse(out)
        assert not any(k.startswith("GPS") for k in after)
        # keepers survive the rebuild
        for k in ("Make", "Model", "Orientation", "DateTime",
                  "PixelXDimension", "PixelYDimension"):
            assert after[k] == tags[k], k
        # byte order preserved, pixels untouched, idempotent
        assert exif._tiff_body(out)[:2].decode() == order
        assert jpeg.jpeg_decode(out).tobytes() == jpeg.jpeg_decode(j).tobytes()
        out2, had2 = exif.exif_strip_gps(out)
        assert not had2 and out2 == out


def test_strip_gps_thumbnail_carried():
    import numpy as np

    from mechaml_spark import exif, jpeg

    base = jpeg.jpeg_encode(np.full((8, 8, 3), 10, np.uint8), quality=90)
    thumb = jpeg.jpeg_encode(np.full((8, 8, 3), 200, np.uint8), quality=80)
    tags = {"Orientation": 3, "GPSLatitudeRef": "S",
            "GPSLatitude": [(1, 1), (2, 1), (3, 1)]}
    j = exif.jpeg_set_exif(
        base, exif.exif_payload(tags, thumbnail=thumb)
    )
    out, had = exif.exif_strip_gps(j)
    assert had and exif.exif_thumbnail(out) == thumb
    assert not any(k.startswith("GPS") for k in exif.exif_parse(out))


def test_strip_gps_no_exif_passthrough():
    import numpy as np

    from mechaml_spark import exif, jpeg

    base = jpeg.jpeg_encode(np.full((8, 8, 3), 50, np.uint8), quality=85)
    out, had = exif.exif_strip_gps(base)
    assert not had and out == base


def test_exif_in_png_and_webp_containers():
    import numpy as np

    from mechaml_spark import exif, imaging, webp

    payload = exif.exif_payload(
        {"Make": "Cam", "Orientation": 6, "GPSLatitudeRef": "N",
         "GPSLatitude": [(48, 1), (30, 1), (0, 1)]}, "MM")
    tiff = payload[6:]
    px = np.zeros((4, 6, 3), np.uint8)

    png = exif.png_add_exif(imaging.png_encode(px), tiff)
    got = exif.exif_from_container(png)
    assert got["Orientation"] == 6 and got["Make"] == "Cam"
    assert imaging.png_decode(png).shape == (4, 6, 3)

    wp = exif.webp_add_exif(webp.webp_encode(px), tiff)
    got = exif.exif_from_container(wp)
    assert got["Orientation"] == 6
    assert webp.webp_decode(wp).shape == (4, 6, 3)
    # odd-length payload exercises RIFF even-padding
    wp2 = exif.webp_add_exif(webp.webp_encode(px), tiff + b"\x00")
    assert exif.exif_from_container(wp2)["Orientation"] == 6
    # Exif\0\0-prefixed WebP payloads (some writers) also parse
    wp3 = exif.webp_add_exif(webp.webp_encode(px), payload)
    assert exif.exif_from_container(wp3)["Orientation"] == 6

    # containers without EXIF -> {}
    assert exif.exif_from_container(imaging.png_encode(px)) == {}
    assert exif.exif_from_container(webp.webp_encode(px)) == {}
