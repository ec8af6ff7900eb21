"""ZIP walk / DOCX / EPUB extraction semantics (office.py)."""

from __future__ import annotations

import zlib

from mechaml_spark import office as of


def test_zip_walk_members_and_trailing_garbage():
    z = of.zip_write([("a.txt", b"hello"), ("dir/b.bin", b"\x00" * 7)])
    for data in (z, z + b"garbage-after-eocd" * 3):
        got = of.zip_walk(data)
        assert [(m["name"], m["usize"], m["method"]) for m in got] == [
            ("a.txt", 5, 0), ("dir/b.bin", 7, 0)]
        assert got[0]["crc32"] == zlib.crc32(b"hello")


def test_zip_walk_deflated_records_method_8():
    z = of.zip_write([("a.txt", b"x" * 100)], deflate=True)
    (m,) = of.zip_walk(z)
    assert m["method"] == 8 and m["usize"] == 100
    assert m["csize"] < 100
    assert m["crc32"] == zlib.crc32(b"x" * 100)


def test_zip_walk_rejects_corrupt():
    assert of.zip_walk(b"") is None
    assert of.zip_walk(b"PK\x03\x04 not a full zip") is None
    import struct
    # EOCD whose central directory lies beyond EOF
    bad = (b"PK\x05\x06" + b"\x00" * 4
           + struct.pack("<HH", 1, 1)
           + struct.pack("<II", 100, 0) + b"\x00\x00")
    assert of.zip_walk(bad) is None
    # EOCD pointing at bytes that are not a central-directory record
    bad2 = (b"A" * 50 + b"PK\x05\x06" + b"\x00" * 4
            + struct.pack("<HH", 1, 1)
            + struct.pack("<II", 46, 0) + b"\x00\x00")
    assert of.zip_walk(bad2) is None


def test_docx_paragraphs_tabs_breaks():
    d = of.docx_write(["plain para", "with\ttab", ""])
    assert of.docx_text(d) == ["plain para", "with\ttab", ""]


def test_docx_escaping_roundtrip():
    d = of.docx_write(["a < b & c > d"])
    assert of.docx_text(d) == ["a < b & c > d"]


def test_docx_rejects_non_docx():
    assert of.docx_text(b"not a zip") is None
    # a zip without word/document.xml is not a docx
    assert of.docx_text(of.zip_write([("x.txt", b"y")])) is None


def test_epub_spine_order_not_zip_order():
    e = of.epub_write([("One", "first"), ("Two", "second"),
                       ("Three", "third")])
    # zip member order is REVERSED on purpose
    names = [m["name"] for m in of.zip_walk(e)]
    assert names[-3:] == ["OEBPS/ch2.xhtml", "OEBPS/ch1.xhtml",
                          "OEBPS/ch0.xhtml"]
    got = of.epub_text(e)
    assert [h for h, _ in got] == ["ch0.xhtml", "ch1.xhtml",
                                   "ch2.xhtml"]
    assert got[0][1] == "One first"
    assert got[2][1] == "Three third"


def test_epub_rejects_broken_chain():
    assert of.epub_text(b"junk") is None
    # zip but no container.xml
    assert of.epub_text(of.zip_write([("mimetype",
                                       b"application/epub+zip")])) is None
