"""Golden selector-count tests ported from the reference suite.

Source of truth: /root/reference/test/test.ml:209-225 (forms),
569-588 (links), 596-616 (images), run against the byte-identical
fixture test/page/index.html.  These exercise the pure-Python
htmlkit layer; the same counts are re-checked through the Spark
extraction pipeline in test_extract_spark.py.
"""

from __future__ import annotations

import pathlib

import pytest

from mechaml_spark.htmlkit import (
    leaf_text,
    parse_html,
    select,
    tag_selector,
)

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "index.html"


@pytest.fixture(scope="module")
def root():
    return parse_html(FIXTURE.read_text())


def nodes_with(root, default_tag, selector):
    """Reference semantics: tag_selector normalization + tag post-filter
    (src/page.ml:27-28, 63-67, 611-649)."""
    matched = select(root, tag_selector(default_tag, selector))
    return [el for el in matched if el.tag == default_tag]


FORM_CASES = [
    ("[id=form-one]", 1),
    ("[id=form-two]", 1),
    ("[id=form-none]", 0),
    ("form[id=form-one]", 1),
    ("form[id=form-none]", 0),
    ("li", 0),
    ("li[id=form-one]", 0),
    (".noneclass", 0),
    ("", 2),
    ("*", 2),
    ("form", 2),
    (".formclass", 2),
    ("div > form", 1),
]

LINK_CASES = [
    ("[id=a-one]", 1),
    ("[id=a-two]", 1),
    ("[id=a-none]", 0),
    ("a[id=a-one]", 1),
    ("a[id=a-none]", 0),
    ("ul", 0),
    ("ul[id=a-one]", 0),
    (".noneclass", 0),
    ("", 3),
    ("*", 3),
    ("[href^=https]", 1),
    ("[href$=.html]", 1),
    ("[href*=http]", 3),
    ("a", 3),
    (".aclass", 2),
    ("div > a", 1),
]

IMAGE_CASES = [
    ("[id=img1]", 1),
    ("[id=img2]", 1),
    ("[id=imgnone]", 0),
    ("img[id=img1]", 1),
    ("img[id=imgnone]", 0),
    ("div", 0),
    ("div[id=img1]", 0),
    (".noneclass", 0),
    ("", 3),
    ("*", 3),
    ("[src^=https]", 1),
    ("[src$=.jpg]", 1),
    ("[src*=http]", 3),
    ("img", 3),
    (".imgclass", 2),
    ("div + img", 1),
]


@pytest.mark.parametrize("selector,count", FORM_CASES)
def test_forms_with(root, selector, count):
    got = nodes_with(root, "form", selector)
    assert len(got) == count
    assert all(el.tag == "form" for el in got)


@pytest.mark.parametrize("selector,count", LINK_CASES)
def test_links_with(root, selector, count):
    got = nodes_with(root, "a", selector)
    assert len(got) == count
    assert all(el.tag == "a" for el in got)


@pytest.mark.parametrize("selector,count", IMAGE_CASES)
def test_images_with(root, selector, count):
    got = nodes_with(root, "img", selector)
    assert len(got) == count
    assert all(el.tag == "img" for el in got)


def test_tag_selector_normalization():
    # src/page.ml:63-67
    assert tag_selector("form", "") == "form"
    assert tag_selector("form", "*") == "*"
    assert tag_selector("form", "li") == "li"
    assert tag_selector("form", "[id=x]") == "form[id=x]"
    assert tag_selector("form", ".cls") == "form.cls"
    assert tag_selector("a", "#a-one") == "a#a-one"
    assert tag_selector("input[type=checkbox]", "[name=check1]") \
        == "input[type=checkbox][name=check1]"


def test_leaf_text():
    root = parse_html(
        "<a id='x'>First link</a>"
        "<textarea name='area3' rows='4' cols='20'>default</textarea>"
        "<select><option value='c1'>Choice 1</option></select>"
        "<div><span>two</span><span>texts</span></div>"
    )
    (a,) = select(root, "a")
    assert leaf_text(a) == "First link"
    (ta,) = select(root, "textarea")
    assert leaf_text(ta) == "default"
    (opt,) = select(root, "option")
    assert leaf_text(opt) == "Choice 1"
    (div,) = select(root, "div")
    assert leaf_text(div) is None  # ambiguous -> None (Lambdasoup parity)


def test_bare_attrs_and_first_attr_wins():
    root = parse_html('<select multiple><option selected value="v">T</option></select>')
    (sel,) = select(root, "select")
    assert sel.attrs.get("multiple") == ""
    (opt,) = select(root, "option[selected]")
    assert opt.attrs["value"] == "v"


def test_document_order_and_structure(root):
    links = select(root, "a")
    hrefs = [el.attrs["href"] for el in links]
    assert hrefs == [
        "https://www.mysecurecenter.com",
        "http://www.awebsite/index.html",
        "http://www.lambda-the-ultimate.org/",
    ]
    # div + img must be img1 (immediately after the second div)
    (img,) = select(root, "div + img")
    assert img.attrs["id"] == "img1"
