"""SVG structure probe (XML-level, no rasterization).

SVG is one of the most common image formats on the web, yet it is the
one major format a crawl pipeline must treat as *markup*, not pixels:
routing and safety decisions (intrinsic size for aspect buckets,
"does this image execute script?" for sanitization, "does it phone
home?" for privacy) are all answerable from the XML structure alone,
with zero rasterization cost.  This module reads ONLY that structure
with stdlib ``xml.etree`` — cost per row bounded by markup size, bytes
never cross a shuffle (probe inside ``mapInPandas``, project the
struct, drop the binary).

Implemented from the public specs:

* SVG 1.1 / CSS Values 3 intrinsic sizing: ``width``/``height``
  attributes with absolute units converted to px at the CSS ratio
  (1in = 96px, 1pt = 1/72in, 1pc = 16px, 1mm = 96/25.4px,
  1cm = 96/2.54px); unitless numbers are px; relative units
  (``%``/``em``/``ex``) yield NULL px and the ``relative_size``
  flag; a missing width/height falls back to the ``viewBox``
  width/height (the CSS default-sizing rule for SVG-in-<img>).
  Pixel sizes are reported as exact milli-px integers via
  round-half-up rational arithmetic (``fractions.Fraction``) so the
  driver oracle can reproduce them with pure integer SQL.
* SVG sanitizer practice (the DOMPurify / Cure53 threat model):
  ``<script>`` elements, ``on*`` event attributes, ``javascript:``
  hrefs, ``<foreignObject>`` (arbitrary HTML smuggling), and
  external ``http(s)`` references (tracking / SSRF surface) are
  each surfaced as an independent flag — the crawl keeps the
  structure facts and lets policy decide.

The reference engine stores fetched images opaquely (mechaml's
``save_image``, src/agent.ml:214-224) — SVG structure probing is
engine-side breadth for the multimodal pipeline, same contract as
:mod:`mechaml_spark.mediaprobe`: per-row parse failure yields
``ok=false``, never a task kill.

``svg_write`` synthesizes deterministic closed-form fixtures so tests
and driver queries need no external data, per the brief.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from fractions import Fraction

__all__ = ["svg_write", "svg_probe", "length_to_milli_px"]

# CSS absolute-length → px ratio as exact rationals (num, den):
# px=1, in=96, pc=16, pt=96/72, mm=96/25.4=960/254, cm=96/2.54=9600/254.
_UNIT_RATIO = {
    "": (1, 1),
    "px": (1, 1),
    "in": (96, 1),
    "pc": (16, 1),
    "pt": (96, 72),
    "mm": (960, 254),
    "cm": (9600, 254),
}

_RELATIVE_UNITS = {"%", "em", "ex", "rem", "vw", "vh"}

_LEN_RE = re.compile(r"^\s*([0-9]+(?:\.[0-9]+)?)\s*([a-z%]*)\s*$")


def length_to_milli_px(value: str) -> tuple[int | None, bool]:
    """Parse an SVG length attribute → (milli-px int, is_relative).

    Absolute units convert at the CSS 96-dpi ratios with EXACT
    rational round-half-up (no float), so integer-valued fixtures are
    reproducible by integer SQL: ``(v*num*1000 + den//2) // den``.
    Relative units return ``(None, True)``; garbage ``(None, False)``.
    """
    m = _LEN_RE.match(value.lower())
    if not m:
        return None, False
    num_s, unit = m.groups()
    if unit in _RELATIVE_UNITS:
        return None, True
    ratio = _UNIT_RATIO.get(unit)
    if ratio is None:
        return None, False
    v = Fraction(num_s)
    exact = v * ratio[0] * 1000 / ratio[1]
    return int(exact + Fraction(1, 2)), False


def _local(tag_or_attr: str) -> str:
    return tag_or_attr.rsplit("}", 1)[-1]


_HREF_ATTRS = {"href"}  # matched on localname, covers xlink:href too


def svg_probe(data: bytes) -> dict | None:
    """Structure facts for one SVG payload; None if not well-formed SVG.

    Keys: w_milli_px/h_milli_px (None when relative/absent),
    relative_size, from_viewbox, n_elems, n_paths, n_rasters,
    n_texts, has_script, has_event_attrs, has_js_href,
    has_foreign_object, has_external_ref.
    """
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return None
    if _local(root.tag) != "svg":
        return None

    w_raw, h_raw = root.get("width"), root.get("height")
    relative = False
    w_milli = h_milli = None
    if w_raw is not None:
        w_milli, rel_w = length_to_milli_px(w_raw)
        relative = relative or rel_w
    if h_raw is not None:
        h_milli, rel_h = length_to_milli_px(h_raw)
        relative = relative or rel_h

    from_viewbox = False
    vb = root.get("viewBox")
    if (w_milli is None or h_milli is None) and not relative and vb:
        parts = re.split(r"[\s,]+", vb.strip())
        if len(parts) == 4:
            try:
                vb_w = Fraction(parts[2])
                vb_h = Fraction(parts[3])
            except (ValueError, ZeroDivisionError):
                vb_w = vb_h = None
            if vb_w is not None and vb_w > 0 and vb_h > 0:
                # viewBox units are user units == px for sizing.
                if w_milli is None:
                    w_milli = int(vb_w * 1000 + Fraction(1, 2))
                    from_viewbox = True
                if h_milli is None:
                    h_milli = int(vb_h * 1000 + Fraction(1, 2))
                    from_viewbox = True

    n_elems = n_paths = n_rasters = n_texts = 0
    has_script = has_event = has_js_href = False
    has_foreign = has_external = False
    for el in root.iter():
        if not isinstance(el.tag, str):  # comments / PIs
            continue
        tag = _local(el.tag)
        n_elems += 1
        if tag == "path":
            n_paths += 1
        elif tag == "image":
            n_rasters += 1
        elif tag == "text":
            n_texts += 1
        elif tag == "script":
            has_script = True
        elif tag == "foreignObject":
            has_foreign = True
        for attr, val in el.attrib.items():
            name = _local(attr)
            if name.startswith("on"):
                has_event = True
            if name in _HREF_ATTRS:
                v = val.strip().lower()
                if v.startswith("javascript:"):
                    has_js_href = True
                elif v.startswith(("http://", "https://", "//")):
                    has_external = True

    return {
        "w_milli_px": w_milli,
        "h_milli_px": h_milli,
        "relative_size": relative,
        "from_viewbox": from_viewbox,
        "n_elems": n_elems,
        "n_paths": n_paths,
        "n_rasters": n_rasters,
        "n_texts": n_texts,
        "has_script": has_script,
        "has_event_attrs": has_event,
        "has_js_href": has_js_href,
        "has_foreign_object": has_foreign,
        "has_external_ref": has_external,
    }


def svg_write(
    w: int,
    h: int,
    unit: str = "px",
    *,
    viewbox_only: bool = False,
    n_rects: int = 1,
    n_paths: int = 0,
    n_texts: int = 0,
    with_script: bool = False,
    with_event: bool = False,
    with_external_image: bool = False,
) -> bytes:
    """Deterministic SVG fixture.  ``viewbox_only`` drops the
    width/height attributes and leaves only ``viewBox`` (the
    sizing-fallback path); otherwise both attributes carry ``unit``."""
    if viewbox_only:
        dims = f'viewBox="0 0 {w} {h}"'
    else:
        dims = (
            f'width="{w}{unit}" height="{h}{unit}" '
            f'viewBox="0 0 {w} {h}"'
        )
    parts = [
        '<svg xmlns="http://www.w3.org/2000/svg" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" ' + dims + ">"
    ]
    for i in range(n_rects):
        ev = ' onclick="void(0)"' if with_event and i == 0 else ""
        parts.append(
            f'<rect x="{i}" y="0" width="1" height="1" '
            f'fill="#{(i * 37) % 256:02x}0000"{ev}/>'
        )
    for i in range(n_paths):
        parts.append(f'<path d="M0 {i}h1v1h-1z"/>')
    for i in range(n_texts):
        parts.append(f'<text x="0" y="{i}">t{i}</text>')
    if with_external_image:
        parts.append(
            '<image xlink:href="http://tracker.test/p.png" '
            'width="1" height="1"/>'
        )
    if with_script:
        parts.append("<script>void(0)</script>")
    parts.append("</svg>")
    return "".join(parts).encode("utf-8")
