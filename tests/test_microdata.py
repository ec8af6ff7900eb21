"""schema.org microdata extraction: pinned spec-subset semantics."""

from mechaml_spark.microdata import (
    extract_microdata,
    extract_microdata_rows,
)


def test_value_rules_per_tag():
    h = ('<div itemscope>'
         '<span itemprop="t">  a  b </span>'
         '<img itemprop="i" src="/s.png">'
         '<a itemprop="h" href="/x">y</a>'
         '<meta itemprop="m" content="c">'
         '<data itemprop="d" value="42">x</data>'
         '<object itemprop="o" data="/o.bin"></object>'
         '<time itemprop="dt" datetime="2020-01-02">Jan</time>'
         '<time itemprop="dt2">March 5</time>'
         "</div>")
    got = dict((p, v) for _, p, v in extract_microdata_rows(h)
               if p != "@type")
    assert got == {
        "t": "a b", "i": "/s.png", "h": "/x", "m": "c", "d": "42",
        "o": "/o.bin", "dt": "2020-01-02", "dt2": "March 5",
    }


def test_missing_value_attr_is_empty_string_not_null():
    h = '<div itemscope><img itemprop="i"><meta itemprop="m"></div>'
    got = [(p, v) for _, p, v in extract_microdata_rows(h)]
    assert got == [("@type", None), ("i", ""), ("m", "")]


def test_nested_item_linkage_and_numbering():
    h = ('<div itemscope itemtype="T0"><div itemprop="child" itemscope '
         'itemtype="T1"><span itemprop="p">v</span></div>'
         '<span itemprop="after">w</span></div>')
    assert extract_microdata_rows(h) == [
        (0, "@type", "T0"),
        (0, "child", "#item:1"),
        (1, "@type", "T1"),
        (1, "p", "v"),
        (0, "after", "w"),
    ]


def test_multi_token_itemprop_and_prop_inside_prop():
    h = ('<div itemscope><span itemprop="a b">v</span>'
         '<span itemprop="outer">x<span itemprop="inner">y</span></span>'
         "</div>")
    got = [(p, v) for _, p, v in extract_microdata_rows(h)
           if p != "@type"]
    assert got == [("a", "v"), ("b", "v"),
                   ("outer", "xy"), ("inner", "y")]


def test_orphan_itemprop_ignored_and_sibling_items():
    h = ('<span itemprop="orphan">x</span>'
         "<div itemscope></div><div itemscope itemtype='T'></div>")
    assert extract_microdata_rows(h) == [
        (0, "@type", None), (1, "@type", "T"),
    ]


def test_spark_stage(spark):
    df = spark.createDataFrame(
        [(1, '<div itemscope><b itemprop="x">v</b></div>'),
         (2, "<p>none</p>"), (3, None)],
        "doc_id long, body string",
    )
    got = sorted(
        (r["doc_id"], r["item_idx"], r["prop"], r["value"])
        for r in extract_microdata(df).collect()
    )
    assert got == [(1, 0, "@type", None), (1, 0, "x", "v")]
