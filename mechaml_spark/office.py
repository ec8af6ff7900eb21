"""Office / archive payload extraction (ZIP, DOCX, EPUB) — stdlib only.

A web crawl at the 100-TB design point fetches far more than HTML and
images: office documents and ebooks are a meaningful fraction of the
long tail and are first-class *text* sources for a training corpus
(the public CommonCrawl-derived corpora all mine them).  All three
formats here are ZIP containers, so the module is built around one
honest central-directory walk and two format-specific readers on top:

* ``zip_walk`` — End-Of-Central-Directory scan-back + central
  directory parse with stdlib ``struct`` (APPNOTE.TXT layout): member
  name, compression method, compressed/uncompressed sizes, CRC-32.
  Routing facts without decompressing anything; tolerant of trailing
  garbage after the archive (common in crawled bytes) because EOCD is
  located by backward scan exactly as real unzip does.
* ``docx_text`` — ECMA-376 WordprocessingML: ``word/document.xml``
  paragraph (``w:p``) walk; text runs (``w:t``), tabs (``w:tab``),
  line breaks (``w:br``) concatenate in document order.  One
  paragraph string per ``w:p``, matching what "Save as text" emits.
* ``epub_text`` — EPUB OCF/OPF: ``META-INF/container.xml`` names the
  OPF package file; the OPF ``<spine>`` defines READING ORDER over
  manifest items — chapters are returned in spine order, not zip
  member order (the semantic a naive walk gets wrong), with visible
  text extracted from each XHTML chapter.

Per-row failure contract matches :mod:`mechaml_spark.mediaprobe`:
malformed payloads yield ``None`` (query surfaces ``ok=false``),
never a task kill.  Deterministic writers (``zip_write``,
``docx_write``, ``epub_write``) synthesize closed-form fixtures —
tests and driver queries need no external data, per the brief.

Reference parity note: mechaml stores fetched non-HTML payloads
opaquely (``save_content``, src/agent.ml:205-213); office extraction
is engine-side breadth for the text pipeline.
"""

from __future__ import annotations

import io
import re
import struct
import xml.etree.ElementTree as ET
import zipfile
import zlib

__all__ = [
    "zip_write", "zip_walk",
    "docx_write", "docx_text",
    "epub_write", "epub_text",
]

_FIXED_DT = (1980, 1, 1, 0, 0, 0)  # deterministic member mtime


def zip_write(members: list[tuple[str, bytes]], *,
              deflate: bool = False) -> bytes:
    """Deterministic ZIP: fixed mtime, fixed order, STORED by default
    (``deflate=True`` for the compressed-member path)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if deflate else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as z:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=_FIXED_DT)
            zi.compress_type = method
            zi.external_attr = 0o600 << 16
            z.writestr(zi, data)
    return buf.getvalue()


_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"


def zip_walk(data: bytes) -> list[dict] | None:
    """Central-directory member listing without any decompression.

    EOCD is found by backward scan from EOF (max comment 64 KiB, per
    APPNOTE) so trailing garbage is tolerated; each central-directory
    record yields name / method / csize / usize / crc32.  Returns
    None when no EOCD or the directory is truncated/corrupt.
    """
    tail_start = max(0, len(data) - 65536 - 22)
    pos = data.rfind(_EOCD_SIG, tail_start)
    if pos < 0 or pos + 22 > len(data):
        return None
    (n_total,) = struct.unpack("<H", data[pos + 10:pos + 12])
    (cd_size, cd_off) = struct.unpack("<II", data[pos + 12:pos + 20])
    out: list[dict] = []
    p = cd_off
    end = cd_off + cd_size
    if end > len(data):
        return None
    for _ in range(n_total):
        if p + 46 > len(data) or data[p:p + 4] != _CDIR_SIG:
            return None
        (method,) = struct.unpack("<H", data[p + 10:p + 12])
        (crc, csize, usize) = struct.unpack("<III", data[p + 16:p + 28])
        (nlen, elen, clen) = struct.unpack("<HHH", data[p + 28:p + 34])
        name = data[p + 46:p + 46 + nlen].decode("utf-8",
                                                 errors="replace")
        out.append({
            "name": name, "method": method, "crc32": crc,
            "csize": csize, "usize": usize,
        })
        p += 46 + nlen + elen + clen
    return out


# ------------------------------------------------------------------ DOCX

_W_NS = ("http://schemas.openxmlformats.org/wordprocessingml/2006/"
         "main")

_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.'
    'main+xml"/></Types>'
)

_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/'
    'officeDocument" Target="word/document.xml"/></Relationships>'
)


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def docx_write(paragraphs: list[str]) -> bytes:
    """Minimal conformant DOCX.  ``\\t`` in a paragraph becomes a
    ``w:tab`` element (run split around it), mirroring Word output."""
    body = []
    for para in paragraphs:
        runs = []
        for i, piece in enumerate(para.split("\t")):
            if i:
                runs.append("<w:r><w:tab/></w:r>")
            if piece:
                runs.append(
                    '<w:r><w:t xml:space="preserve">'
                    f"{_xml_escape(piece)}</w:t></w:r>"
                )
        body.append(f"<w:p>{''.join(runs)}</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        + "".join(body) + "</w:body></w:document>"
    )
    return zip_write([
        ("[Content_Types].xml", _DOCX_CONTENT_TYPES.encode()),
        ("_rels/.rels", _DOCX_RELS.encode()),
        ("word/document.xml", doc.encode()),
    ])


def docx_text(data: bytes) -> list[str] | None:
    """Paragraph strings from ``word/document.xml`` (w:t text, w:tab
    tab, w:br newline, document order).  None if not a DOCX."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            xml = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError, zlib.error, OSError):
        return None
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return None
    paras: list[str] = []
    for p in root.iter(f"{{{_W_NS}}}p"):
        parts: list[str] = []
        for el in p.iter():
            tag = el.tag.rsplit("}", 1)[-1]
            if tag == "t":
                parts.append(el.text or "")
            elif tag == "tab":
                parts.append("\t")
            elif tag == "br":
                parts.append("\n")
        paras.append("".join(parts))
    return paras


# ------------------------------------------------------------------ EPUB

_CONTAINER_XML = (
    '<?xml version="1.0"?><container version="1.0" xmlns="urn:oasis:'
    'names:tc:opendocument:xmlns:container"><rootfiles><rootfile '
    'full-path="OEBPS/content.opf" media-type="application/'
    'oebps-package+xml"/></rootfiles></container>'
)


def epub_write(chapters: list[tuple[str, str]]) -> bytes:
    """Minimal EPUB: ``mimetype`` stored first (OCF rule), container
    → OPF → spine.  Chapter FILES are written in REVERSE order while
    the spine lists reading order — so a reader that walks zip
    members instead of the spine provably gets it wrong."""
    items, spine, files = [], [], []
    for i, (title, body_text) in enumerate(chapters):
        fn = f"ch{i}.xhtml"
        items.append(
            f'<item id="c{i}" href="{fn}" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{i}"/>')
        files.append((
            f"OEBPS/{fn}",
            ('<?xml version="1.0" encoding="UTF-8"?><html xmlns='
             '"http://www.w3.org/1999/xhtml"><head><title>'
             f"{_xml_escape(title)}</title></head><body><h1>"
             f"{_xml_escape(title)}</h1><p>{_xml_escape(body_text)}"
             "</p></body></html>").encode(),
        ))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?><package xmlns='
        '"http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="id"><metadata xmlns:dc="http://purl.org/'
        'dc/elements/1.1/"><dc:identifier id="id">fixture</dc:'
        'identifier><dc:title>fixture</dc:title></metadata>'
        f"<manifest>{''.join(items)}</manifest>"
        f"<spine>{''.join(spine)}</spine></package>"
    )
    members: list[tuple[str, bytes]] = [
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", _CONTAINER_XML.encode()),
        ("OEBPS/content.opf", opf.encode()),
    ]
    members.extend(reversed(files))
    return zip_write(members)


_TAG_RE = re.compile(r"<[^>]+>")


def _xhtml_visible(xml: bytes) -> str:
    """Visible text of a chapter: same contract as
    extract.html_visible_text (tag strip + entity decode + whitespace
    collapse), Python-side for the per-member loop."""
    s = xml.decode("utf-8", errors="replace")
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"(?is)<(script|style|title)\b[^>]*>.*?</\1\s*>", " ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                    ("&amp;", "&")):
        s = s.replace(ent, ch)
    return re.sub(r"\s+", " ", s).strip()


def epub_text(data: bytes) -> list[tuple[str, str]] | None:
    """Chapters in SPINE order as (href, visible_text).  None when
    the container/OPF chain is broken."""
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError):
        return None
    try:
        with z:
            try:
                container = ET.fromstring(
                    z.read("META-INF/container.xml"))
            except (KeyError, ET.ParseError):
                return None
            opf_path = None
            for el in container.iter():
                if el.tag.rsplit("}", 1)[-1] == "rootfile":
                    opf_path = el.get("full-path")
                    break
            if not opf_path:
                return None
            try:
                opf = ET.fromstring(z.read(opf_path))
            except (KeyError, ET.ParseError):
                return None
            base = opf_path.rsplit("/", 1)[0] + "/" \
                if "/" in opf_path else ""
            hrefs: dict[str, str] = {}
            order: list[str] = []
            for el in opf.iter():
                tag = el.tag.rsplit("}", 1)[-1]
                if tag == "item" and el.get("id") and el.get("href"):
                    hrefs[el.get("id")] = el.get("href")
                elif tag == "itemref" and el.get("idref"):
                    order.append(el.get("idref"))
            out: list[tuple[str, str]] = []
            for idref in order:
                href = hrefs.get(idref)
                if href is None:
                    return None
                try:
                    xml = z.read(base + href)
                except KeyError:
                    return None
                out.append((href, _xhtml_visible(xml)))
            return out
    except zlib.error:
        return None
