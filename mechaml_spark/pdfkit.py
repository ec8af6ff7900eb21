"""PDF text extraction — stdlib-only (zlib + re), crawl-grade.

The reference (mechaml) is an HTML agent with no document-format
layer; this extends the engine brief's text-pipeline surface to the
web's second-most-common document format the same way warc.py /
imaging.py extend the container surface.

Decoder scope (the honest crawl-extractor contract):

* object scan without an xref (robust to the linearized/appended
  files real crawls contain), page objects in document order,
  ``/Contents`` single refs and arrays;
* ``FlateDecode`` and unfiltered content streams (other filters on a
  CONTENT stream raise ``NotImplementedError`` — the documented
  boundary; image/font streams are never touched);
* text operators ``Tj``, ``'``, ``"``, ``TJ`` (kerning numbers
  skipped), line moves ``Td``/``TD``/``T*`` as newlines, full literal
  string syntax (nested parens, ``\\``-escapes incl. octal, line
  continuations) and hex strings;
* bytes decode as PDFDocEncoding ~ Latin-1 — code-point-level
  extraction, like every naive extractor: custom font encodings /
  ToUnicode CMaps are out of scope (documented).

The writer emits minimal conformant PDFs (xref table, catalog, page
tree, Helvetica, optional FlateDecode) for fixtures and round-trip
tests.
"""

from __future__ import annotations

import re
import zlib

from mechaml_spark.imaging import inflate_bounded

# Bomb cap for PDF streams with no declared output size (content
# streams).  Image XObjects get a tighter /Width * /Height-derived cap.
_MAX_INFLATE = 1 << 26  # 64 MiB

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_CONTENTS_REF = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_REF = re.compile(rb"(\d+)\s+\d+\s+R")
_PAGE_TYPE = re.compile(rb"/Type\s*/Page\b")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """object number -> (dict/source part, raw stream bytes or None)."""
    out: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        body = m.group(2)
        si = body.find(b"stream")
        if si == -1:
            out[int(m.group(1))] = (body, None)
            continue
        head = body[:si]
        j = si + len(b"stream")
        if body[j : j + 2] == b"\r\n":
            j += 2
        elif body[j : j + 1] == b"\n":
            j += 1
        ei = body.rfind(b"endstream")
        raw = body[j:ei]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
        out[int(m.group(1))] = (head, raw)
    return out


def _content_bytes(head: bytes, raw: bytes) -> bytes:
    fm = re.search(rb"/Filter\s*(/\w+|\[[^\]]*\])", head)
    if fm is None:
        return raw
    filters = re.findall(rb"/(\w+)", fm.group(1))
    if filters == [b"FlateDecode"]:
        return inflate_bounded(raw, _MAX_INFLATE, "PDF content stream")
    raise NotImplementedError(
        f"PDF content-stream filter {[f.decode() for f in filters]} not "
        "available in-sandbox (FlateDecode/plain are real); plug a full "
        "PDF library on a cluster image"
    )


def _read_literal(cs: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting AFTER the open paren."""
    out = bytearray()
    depth = 1
    n = len(cs)
    while i < n:
        c = cs[i : i + 1]
        if c == b"\\":
            nxt = cs[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal, 1-3 digits
                j = i + 1
                while j < min(i + 4, n) and cs[j : j + 1].isdigit():
                    j += 1
                out.append(int(cs[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and cs[i : i + 1] == b"\n":
                    i += 1
            else:  # unknown escape: backslash dropped per spec
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out += c
            i += 1
        else:
            out += c
            i += 1
    raise ValueError("PDF: unterminated literal string")


def _content_text(cs: bytes) -> str:
    """Text shown by one content stream: Tj / ' / \" / TJ strings,
    Td/TD/T* as newlines, in stream order."""
    parts: list[str] = []
    pending: list[bytes] = []  # strings seen since the last operator
    i = 0
    n = len(cs)
    in_text = False
    while i < n:
        c = cs[i : i + 1]
        if c == b"(":
            s, i = _read_literal(cs, i + 1)
            pending.append(s)
        elif c == b"<":
            if cs[i + 1 : i + 2] == b"<":  # dictionary, skip balanced
                depth = 1
                i += 2
                while i < n and depth:
                    if cs[i : i + 2] == b"<<":
                        depth += 1
                        i += 2
                    elif cs[i : i + 2] == b">>":
                        depth -= 1
                        i += 2
                    else:
                        i += 1
            else:
                j = cs.index(b">", i)
                hx = re.sub(rb"\s", b"", cs[i + 1 : j])
                if len(hx) % 2:
                    hx += b"0"
                pending.append(bytes.fromhex(hx.decode("ascii")))
                i = j + 1
        elif c == b"/":
            i += 1
            while i < n and cs[i : i + 1] not in b" \t\r\n()<>[]/%":
                i += 1
        elif c == b"%":  # comment to end of line
            while i < n and cs[i : i + 1] not in b"\r\n":
                i += 1
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and (
                cs[j : j + 1].isalpha() or cs[j : j + 1] in b"'\"*"
            ):
                j += 1
            op = cs[i:j]
            i = j
            if op == b"BT":
                in_text = True
                pending = []
            elif op == b"ET":
                in_text = False
            elif in_text:
                if op in (b"Tj", b"TJ"):
                    parts.extend(
                        s.decode("latin-1") for s in pending
                    )
                elif op in (b"'", b'"'):
                    parts.append("\n")
                    parts.extend(
                        s.decode("latin-1") for s in pending
                    )
                elif op in (b"Td", b"TD") or op == b"T*":
                    parts.append("\n")
                pending = []
            else:
                pending = []
        else:
            i += 1  # numbers, brackets, whitespace: operands or noise
    return "".join(parts)


def pdf_extract_text(data: bytes) -> str:
    """PDF bytes -> extracted text, pages joined by newlines, leading
    /trailing newlines stripped per page."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (%PDF header missing)")
    objs = _objects(data)
    pages: list[str] = []
    for num in objs:  # document order (insertion-ordered dict)
        head, _ = objs[num]
        if not _PAGE_TYPE.search(head):
            continue
        refs: list[int] = []
        am = _CONTENTS_ARR.search(head)
        if am:
            refs = [int(r.group(1)) for r in _REF.finditer(am.group(1))]
        else:
            sm = _CONTENTS_REF.search(head)
            if sm:
                refs = [int(sm.group(1))]
        texts = []
        for r in refs:
            if r not in objs or objs[r][1] is None:
                continue
            chead, raw = objs[r]
            texts.append(_content_text(_content_bytes(chead, raw)))
        page_text = "".join(texts).strip("\n")
        if page_text:
            pages.append(page_text)
    return "\n".join(pages)


# ------------------------------------------------------------ writer


def _escape_literal(s: str) -> bytes:
    b = s.encode("latin-1")
    return (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def pdf_write(
    pages: list[list[str]],
    compress: bool = True,
    images: list[tuple[int, int, bytes]] | None = None,
) -> bytes:
    """Minimal conformant PDF: one content stream per page, each page
    a list of text lines (``T*`` line advance), Helvetica 12.

    ``images``: optional ``(width, height, jpeg_bytes)`` list embedded
    as DCTDecode image XObjects, painted on page 1 (``cm`` + ``Do``)
    — the fixture shape for :func:`pdf_extract_images`."""
    objs: list[bytes] = []  # bodies; object number = index + 1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    img_ids: list[int] = []
    for w, h, jb in images or []:
        img_ids.append(add(
            b"<< /Type /XObject /Subtype /Image /Width "
            + str(w).encode() + b" /Height " + str(h).encode()
            + b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
            + b" /Filter /DCTDecode /Length " + str(len(jb)).encode()
            + b" >>\nstream\n" + jb + b"\nendstream"
        ))
    page_ids: list[tuple[int, int]] = []
    for lines in pages:
        cs = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td")
        for k, line in enumerate(lines):
            if k:
                cs += b" T*"
            cs += b" (" + _escape_literal(line) + b") Tj"
        cs += b" ET"
        if img_ids and not page_ids:  # paint images on page 1
            for k, (w, h, _jb) in enumerate(images):
                cs += (
                    b" q " + str(w).encode() + b" 0 0 "
                    + str(h).encode() + b" "
                    + str(72 + 100 * k).encode()
                    + b" 100 cm /Im" + str(k).encode() + b" Do Q"
                )
        raw = zlib.compress(bytes(cs), 6) if compress else bytes(cs)
        filt = b"/Filter /FlateDecode " if compress else b""
        content = add(
            b"<< "
            + filt
            + b"/Length "
            + str(len(raw)).encode()
            + b" >>\nstream\n"
            + raw
            + b"\nendstream"
        )
        page_ids.append((content, 0))
    pages_obj = len(objs) + len(pages) + 1  # right after the page objs
    first_page = len(objs) + 1
    for k, (content, _) in enumerate(page_ids):
        add(
            b"<< /Type /Page /Parent "
            + str(pages_obj).encode()
            + b" 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 "
            + str(font).encode()
            + b" 0 R >>"
            + (
                b" /XObject << "
                + b" ".join(
                    b"/Im" + str(k).encode() + b" "
                    + str(oid).encode() + b" 0 R"
                    for k, oid in enumerate(img_ids)
                )
                + b" >>"
                if img_ids and k == 0
                else b""
            )
            + b" >> /Contents "
            + str(content).encode()
            + b" 0 R >>"
        )
    kids = b" ".join(
        str(first_page + k).encode() + b" 0 R" for k in range(len(pages))
    )
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(pages)).encode() + b" >>"
    ) == pages_obj
    catalog = add(
        b"<< /Type /Catalog /Pages " + str(pages_obj).encode() + b" 0 R >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# ------------------------------------------------------- Spark stage


def extract_pdf_text_stage(df, bytes_col: str = "bytes",
                           out_col: str = "pdf_text"):
    """Append extracted PDF text per row (mapInPandas — zlib inflate
    has no Column expression, same boundary as the media codecs).
    Undecodable bytes yield NULL (per-row catch, never a task kill);
    unsupported content-stream filters raise loudly."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType())]
    )
    cols = df.columns

    def run(batches):
        for pdf in batches:
            out = pdf[cols].copy()
            texts = []
            for b in pdf[bytes_col]:
                if b is None:
                    texts.append(None)
                    continue
                try:
                    texts.append(pdf_extract_text(bytes(b)))
                except NotImplementedError:
                    raise
                except Exception:
                    texts.append(None)
            out[out_col] = texts
            yield out

    return df.mapInPandas(run, schema=out_schema)


def pdf_extract_images(data: bytes) -> list:
    """Embedded-image mining — PDFs are a real image+caption source
    (figure + caption pairs), and the common embedding for photos is
    a DCTDecode XObject whose stream IS a JFIF/JPEG byte string.
    Walks the object table for ``/Subtype /Image`` and returns
    ``[(obj_num, width, height, filter, bytes)]`` in object order:
    DCTDecode streams come back verbatim (decode with the repo's
    JPEG codec downstream), FlateDecode raw-sample images come back
    inflated, anything else keeps its filter name with ``bytes =
    None`` (recorded, not crashed — the crawl rule)."""
    out = []
    objs = _objects(data)
    for num in sorted(objs):
        head, raw = objs[num]
        if raw is None or not re.search(rb"/Subtype\s*/Image", head):
            continue
        wm = re.search(rb"/Width\s+(\d+)", head)
        hm = re.search(rb"/Height\s+(\d+)", head)
        fm = re.search(rb"/Filter\s*/(\w+)", head)
        filt = fm.group(1).decode() if fm else "raw"
        if filt == "DCTDecode":
            payload = raw
        elif filt == "FlateDecode":
            # cap by the object's own declared dimensions when present
            # (<= 8 bytes/pixel covers 16-bit RGBA), else the global cap;
            # a bomb becomes payload=None (recorded, not crashed)
            cap = _MAX_INFLATE
            if wm and hm:
                cap = min(cap, int(wm.group(1)) * int(hm.group(1)) * 8 + 4096)
            try:
                payload = inflate_bounded(raw, cap, "PDF image stream")
            except (zlib.error, ValueError):
                payload = None
        elif filt == "raw":
            payload = raw
        else:
            payload = None
        out.append(
            (
                num,
                int(wm.group(1)) if wm else None,
                int(hm.group(1)) if hm else None,
                filt,
                payload,
            )
        )
    return out
