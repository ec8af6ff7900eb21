"""SVG structure probe: CSS unit ratios, viewBox fallback, sanitizer
flags, malformed handling (svgkit.py)."""

from __future__ import annotations

from mechaml_spark import svgkit as svg


def test_unit_table_css_ratios():
    # CSS Values 3: 1in=96px, 1pt=1/72in, 1pc=16px, 1mm=96/25.4px.
    assert svg.length_to_milli_px("10px") == (10000, False)
    assert svg.length_to_milli_px("10") == (10000, False)
    assert svg.length_to_milli_px("1in") == (96000, False)
    assert svg.length_to_milli_px("72pt") == (96000, False)
    assert svg.length_to_milli_px("1pc") == (16000, False)
    assert svg.length_to_milli_px("25.4mm") == (96000, False)
    assert svg.length_to_milli_px("2.54cm") == (96000, False)
    # round-half-up on exact rationals: 1mm = 3779.527...px-milli
    assert svg.length_to_milli_px("1mm") == (3780, False)
    assert svg.length_to_milli_px("1pt") == ((96000 + 36) // 72, False)


def test_relative_and_garbage_lengths():
    for u in ("50%", "2em", "3ex"):
        assert svg.length_to_milli_px(u) == (None, True)
    assert svg.length_to_milli_px("abc") == (None, False)
    assert svg.length_to_milli_px("10foo") == (None, False)


def test_viewbox_fallback_and_counts():
    p = svg.svg_probe(svg.svg_write(30, 15, viewbox_only=True,
                                    n_rects=2, n_paths=3, n_texts=1))
    assert p["w_milli_px"] == 30000 and p["h_milli_px"] == 15000
    assert p["from_viewbox"] is True
    assert p["n_elems"] == 1 + 2 + 3 + 1
    assert p["n_paths"] == 3 and p["n_texts"] == 1


def test_explicit_dims_win_over_viewbox():
    p = svg.svg_probe(svg.svg_write(8, 4, "in"))
    assert p["w_milli_px"] == 8 * 96000
    assert p["from_viewbox"] is False


def test_relative_root_size_flagged():
    data = (b'<svg xmlns="http://www.w3.org/2000/svg" width="100%" '
            b'height="50%" viewBox="0 0 10 5"/>')
    p = svg.svg_probe(data)
    assert p["relative_size"] is True
    # relative size does NOT silently fall back to viewBox
    assert p["w_milli_px"] is None


def test_sanitizer_flags():
    p = svg.svg_probe(svg.svg_write(
        5, 5, with_script=True, with_event=True,
        with_external_image=True))
    assert p["has_script"] and p["has_event_attrs"]
    assert p["has_external_ref"] and p["n_rasters"] == 1
    clean = svg.svg_probe(svg.svg_write(5, 5))
    assert not (clean["has_script"] or clean["has_event_attrs"]
                or clean["has_external_ref"])


def test_js_href_and_foreign_object():
    data = (b'<svg xmlns="http://www.w3.org/2000/svg">'
            b'<a href="javascript:alert(1)"><text>x</text></a>'
            b'<foreignObject><div>h</div></foreignObject></svg>')
    p = svg.svg_probe(data)
    assert p["has_js_href"] and p["has_foreign_object"]
    assert not p["has_external_ref"]


def test_xlink_href_namespace_matched_on_localname():
    data = (b'<svg xmlns="http://www.w3.org/2000/svg" '
            b'xmlns:xlink="http://www.w3.org/1999/xlink">'
            b'<image xlink:href="https://cdn.test/a.png"/></svg>')
    assert svg.svg_probe(data)["has_external_ref"] is True


def test_malformed_and_non_svg_return_none():
    assert svg.svg_probe(b"<svg") is None
    assert svg.svg_probe(b"<html/>") is None
    assert svg.svg_probe(b"") is None
