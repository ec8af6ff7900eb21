"""Content sniffing (mechaml_spark.sniff): magic-byte MIME, charset
detection, and expression-only text decode — all must classify real
bytes from the repo's own codecs and survive malformed input without
failing a task (everything stays in Catalyst expressions)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mechaml_spark import imaging, multimodal
from mechaml_spark.sniff import decode_text, sniff_charset, sniff_mime


def _classify(spark, payloads):
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(payloads)], "id int, bytes binary"
    )
    out = df.select(
        "id",
        sniff_mime(F.col("bytes")).alias("mime"),
        sniff_charset(F.col("bytes")).alias("cs"),
    )
    return [
        (r["mime"], r["cs"]) for r in out.orderBy("id").collect()
    ]


def test_real_codec_bytes_classify(spark):
    px = np.full((8, 8, 3), 99, np.uint8)
    cases = [
        (imaging.png_encode(px), "image/png"),
        (imaging.encode(px, "jpg"), "image/jpeg"),
        (imaging.gif_encode(px), "image/gif"),
        (imaging.bmp_encode(px), "image/bmp"),
        (imaging.tiff_encode(px), "image/tiff"),
        (imaging.ppm_encode(px), "image/x-portable-pixmap"),
        (multimodal.wav_encode(np.zeros(16, dtype="<i2"), 8000), "audio/wav"),
        (multimodal.avi_mjpeg_encode([px]), "video/x-msvideo"),
    ]
    got = _classify(spark, [c[0] for c in cases])
    assert [m for m, _ in got] == [c[1] for c in cases]


def test_text_heuristics_and_fallthrough(spark):
    cases = [
        (b"\n\t  <!DOCTYPE HTML><html>", "text/html", "utf-8"),
        (b"<HtMl><body>x</body>", "text/html", "utf-8"),
        (b"<?xml version='1.0'?><a/>", "text/xml", "utf-8"),
        (
            b"<html><meta charset = 'Windows-1252'>",
            "text/html",
            "windows-1252",
        ),
        (b"\xef\xbb\xbfplain text", "application/octet-stream", "utf-8"),
        (b"\xff\xfeh\x00i\x00", "application/octet-stream", "utf-16le"),
        (b"\xfe\xff\x00h\x00i", "application/octet-stream", "utf-16be"),
        (b"\x01\x02garbage\xff", "application/octet-stream", "utf-8"),
        (b"", "application/octet-stream", "utf-8"),
        (None, None, None),
    ]
    got = _classify(spark, [c[0] for c in cases])
    assert got == [(m, cs) for _, m, cs in cases]


def test_decode_text_round_trips(spark):
    s = "café — naïve"
    rows = [
        (0, s.encode("utf-8")),
        (1, b"\xef\xbb\xbf" + s.encode("utf-8")),
        (2, b"\xff\xfe" + s.encode("utf-16le")),
        (3, b"\xfe\xff" + s.encode("utf-16be")),
        (4, "<meta charset='iso-8859-1'>café".encode("latin-1")),
        # malformed utf-8 must not fail the task (lenient decode)
        (5, b"ok \xff\xfe\xfa bad"),
    ]
    df = spark.createDataFrame(rows, "id int, bytes binary")
    out = {
        r["id"]: r["txt"]
        for r in df.select(
            "id",
            decode_text(F.col("bytes"), sniff_charset(F.col("bytes"))).alias(
                "txt"
            ),
        ).collect()
    }
    assert out[0] == s
    assert out[1] == s
    assert out[2] == s
    assert out[3] == s
    assert out[4] == "<meta charset='iso-8859-1'>café"
    assert isinstance(out[5], str)  # no exception, replacement chars fine


def test_whole_stage_codegen(spark):
    """The sniffers must stay JVM-side: one codegen Project, no
    Python/Arrow eval nodes in the plan."""
    df = spark.createDataFrame([(b"x",)], "bytes binary")
    plan = (
        df.select(sniff_mime(F.col("bytes")), sniff_charset(F.col("bytes")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
