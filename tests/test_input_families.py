"""All 19 input-family selectors (SURVEY.md §2.3) over a purpose-built
fixture containing every family (the reference fixture only covers a
subset; the reference defines the families at src/page.ml:202-306).

Counts are asserted through the Spark path (`forms.input_predicate`
over exploded form inputs), including the family post-filters:
`field` = textarea|text|password|hidden, `numeric` = range|number,
and the `tag_selector` normalization of a non-identifier-leading
selector (`[name=...]` gets the family default tag prefixed).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mechaml_spark import extract, forms, page

HTML = """
<html><body>
<form id="all" action="/go" method="post">
  <input type="checkbox" name="cb" value="a" checked/>
  <input type="checkbox" name="cb" value="b"/>
  <input type="radio" name="rd" value="r1" checked/>
  <input type="radio" name="rd" value="r2"/>
  <select name="sel"><option value="o1" selected>one</option>
    <option>two</option></select>
  <select name="selm" multiple><option selected>x</option></select>
  <textarea name="area1">hello</textarea>
  <input type="text" name="t1" value="tv"/>
  <input type="password" name="pw"/>
  <input type="hidden" name="h1" value="hv"/>
  <input type="color" name="col" value="#A0B0C0"/>
  <input type="date" name="d" value="2020-02-29"/>
  <input type="email" name="em"/>
  <input type="month" name="mo"/>
  <input type="number" name="num" value="3"/>
  <input type="range" name="rng" value="5"/>
  <input type="tel" name="tel"/>
  <input type="search" name="se"/>
  <input type="time" name="ti" value="10:20:30"/>
  <input type="url" name="u"/>
</form>
</body></html>
"""

# (family, selector, expected count)
CASES = [
    ("checkbox", "", 2),
    ("checkbox", "[value=a]", 1),
    ("radio", "", 2),
    ("select_list", "", 2),
    ("select_list", "[multiple]", 1),
    ("textarea", "", 1),
    ("text", "", 1),
    ("password", "", 1),
    ("hidden", "", 1),
    ("field", "", 4),           # textarea + text + password + hidden
    ("field", "[name=t1]", 1),  # tag_selector: '*[name=t1]' + field_filter
    ("numeric", "", 2),         # range + number
    ("color", "", 1),
    ("date", "", 1),
    ("email", "", 1),
    ("month", "", 1),
    ("number", "", 1),
    ("tel", "", 1),
    ("search", "", 1),
    ("time", "", 1),
    ("url", "", 1),
    # cross-family misses: a selector matching another tag yields 0
    ("checkbox", "[name=rd]", 0),
    ("textarea", "[name=t1]", 0),
]


@pytest.fixture(scope="module")
def all_inputs(spark):
    pages = spark.createDataFrame(
        [("http://f.test/all", HTML)], "url string, body string"
    )
    parsed = extract.parse_pages(pages)
    form = page.forms_with(parsed, "[id=all]")
    return form.select(
        F.explode(F.col("node")["inputs"]).alias("node")
    ).cache()


@pytest.mark.parametrize("family,selector,expected", CASES)
def test_family_counts(all_inputs, family, selector, expected):
    n = all_inputs.where(
        forms.input_predicate(family, selector, F.col("node"))
    ).count()
    assert n == expected, (family, selector)


def test_default_state_across_families(spark):
    """reset_all default initialization across families: checked
    checkbox/radio, selected options (value defaults to text), field
    values, in the reference's reset order (src/page.ml:574-586)."""
    pages = spark.createDataFrame(
        [("http://f.test/all", HTML)], "url string, body string"
    )
    parsed = extract.parse_pages(pages)
    form = page.forms_with(parsed, "[id=all]")
    state = {
        r["key"]: list(r["vals"])
        for r in form.select(
            F.explode(F.col("node")["state"]).alias("key", "vals")
        ).collect()
    }
    assert state["cb"] == ["a"]
    assert state["rd"] == ["r1"]
    assert state["sel"] == ["o1"]
    assert state["selm"] == ["x"]       # value defaults to option text
    assert state["area1"] == ["hello"]
    assert state["t1"] == ["tv"]
    assert state["h1"] == ["hv"]
    # reset_all touches ONLY checkboxes -> radios -> selects -> fields
    # (text/password/hidden/textarea, src/page.ml:574-586): color /
    # number / range etc. carry NO default state
    assert "col" not in state
    assert "num" not in state
    assert "rng" not in state
