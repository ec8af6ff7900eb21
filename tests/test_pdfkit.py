"""PDF text extraction (pdfkit): writer round trips, operator
surface, filter boundaries, Spark stage."""

import zlib

import pytest

from mechaml_spark.pdfkit import (
    extract_pdf_text_stage,
    pdf_extract_text,
    pdf_write,
)


def _single_stream_pdf(cs: bytes, head_extra: bytes = b"") -> bytes:
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< " + head_extra + b"/Length "
        + str(len(cs)).encode() + b" >>\nstream\n" + cs
        + b"\nendstream\nendobj\n"
    )


def test_round_trip_compressed_and_plain():
    pages = [["Hello world", "Line (two) & \\ back"], ["Page2 here"]]
    want = "Hello world\nLine (two) & \\ back\nPage2 here"
    for compress in (True, False):
        assert pdf_extract_text(pdf_write(pages, compress)) == want


def test_operator_surface():
    """Octal escape, TJ kerning array, T*, hex string, ' op,
    comments — the full text-op grammar in one stream."""
    cs = (b"BT /F1 12 Tf (A\\101) Tj [(kern)-120(ed)] TJ T* "
          b"<48 65 6C6C6F> Tj (next) ' % comment\nET")
    assert pdf_extract_text(_single_stream_pdf(cs)) == \
        "AAkerned\nHello\nnext"


def test_nested_parens_and_continuation():
    cs = b"BT ((a(b)c)) Tj (one\\\ntwo) Tj ET"
    assert pdf_extract_text(_single_stream_pdf(cs)) == "(a(b)c)onetwo"


def test_text_outside_bt_et_ignored():
    cs = b"(not shown) Tj BT (shown) Tj ET (also not) Tj"
    assert pdf_extract_text(_single_stream_pdf(cs)) == "shown"


def test_contents_array_and_page_order():
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Contents [2 0 R 3 0 R] >>\nendobj\n"
        b"2 0 obj\n<< /Length 16 >>\nstream\nBT (first) Tj ET"
        b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Length 18 >>\nstream\nBT ( second) Tj ET"
        b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Contents 5 0 R >>\nendobj\n"
        b"5 0 obj\n<< /Length 14 >>\nstream\nBT (p2) Tj ET"
        b"\nendstream\nendobj\n"
    )
    assert pdf_extract_text(body) == "first second\np2"


def test_unsupported_filter_raises():
    raw = zlib.compress(b"BT (x) Tj ET")
    pdf = _single_stream_pdf(raw, b"/Filter [/ASCII85Decode /FlateDecode] ")
    with pytest.raises(NotImplementedError, match="ASCII85Decode"):
        pdf_extract_text(pdf)
    with pytest.raises(ValueError):
        pdf_extract_text(b"not a pdf")


def test_spark_stage(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame([
        {"doc": "a", "bytes": pdf_write([["alpha", "beta"]])},
        {"doc": "b", "bytes": pdf_write([["gamma"]], compress=False)},
        {"doc": "c", "bytes": b"%PDF-1.4 garbage"},
    ]))
    rows = {r["doc"]: r["pdf_text"]
            for r in extract_pdf_text_stage(df).collect()}
    assert rows["a"] == "alpha\nbeta"
    assert rows["b"] == "gamma"
    assert rows["c"] == ""  # parses, no pages -> empty text


def test_pdf_images_roundtrip():
    import numpy as np

    from mechaml_spark import jpeg, pdfkit

    j1 = jpeg.jpeg_encode(np.full((8, 8, 3), 60, np.uint8), quality=95)
    j2 = jpeg.jpeg_encode(np.full((4, 16, 3), 180, np.uint8), quality=95)
    doc = pdfkit.pdf_write(
        [["fig caption"], ["page 2"]], images=[(8, 8, j1), (16, 4, j2)]
    )
    # text layer unaffected by the image objects
    text = pdfkit.pdf_extract_text(doc)
    assert "fig caption" in text and "page 2" in text
    imgs = pdfkit.pdf_extract_images(doc)
    assert [(w, h, f) for _, w, h, f, _ in imgs] == [
        (8, 8, "DCTDecode"), (16, 4, "DCTDecode")
    ]
    # DCT streams verbatim -> repo decoder round-trips exactly
    assert imgs[0][4] == j1 and imgs[1][4] == j2
    assert (jpeg.jpeg_decode(imgs[0][4]) == 60).all()
    assert (jpeg.jpeg_decode(imgs[1][4]) == 180).all()


def test_pdf_images_flate_and_unknown_filters():
    import zlib as _z

    from mechaml_spark import pdfkit

    raw = bytes(range(48))  # 4x4 RGB samples
    flate = (
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 4 "
        b"/Height 4 /ColorSpace /DeviceRGB /BitsPerComponent 8 "
        b"/Filter /FlateDecode /Length "
        + str(len(_z.compress(raw))).encode()
        + b" >>\nstream\n" + _z.compress(raw) + b"\nendstream\nendobj\n"
    )
    jbig = (
        b"6 0 obj\n<< /Subtype /Image /Width 2 /Height 2 "
        b"/Filter /JBIG2Decode /Length 3 >>\nstream\nabc\nendstream\n"
        b"endobj\n"
    )
    doc = pdfkit.pdf_write([["x"]]) + flate + jbig
    imgs = pdfkit.pdf_extract_images(doc)
    assert len(imgs) == 2
    assert imgs[0][3] == "FlateDecode" and imgs[0][4] == raw
    assert imgs[1][3] == "JBIG2Decode" and imgs[1][4] is None


def test_pdf_without_images_yields_none():
    from mechaml_spark import pdfkit

    assert pdfkit.pdf_extract_images(pdfkit.pdf_write([["t"]])) == []
