"""HTML -> Markdown: pinned subset rendering rules."""

from mechaml_spark.markdown import html_to_markdown as md
from mechaml_spark.markdown import to_markdown


def test_headings_paragraphs_and_inline_markup():
    out = md(
        "<h1>T</h1><h3>S</h3><p>a <b>b</b> <em>i</em> "
        '<code>c</code> <a href="/x">l</a> plain</p>'
    )
    assert out == "# T\n\n### S\n\na **b** *i* `c` [l](/x) plain"


def test_link_without_href_is_bare_text_and_img():
    assert md('<p><a>t</a> <img src="/i.png" alt="a b"></p>') == \
        "t ![a b](/i.png)"


def test_lists_nested_and_ordered():
    out = md("<ul><li>one</li><li>two<ol><li>x</li><li>y</li></ol>"
             "</li></ul>")
    assert out == "- one\n- two\n  1. x\n  2. y"


def test_pre_preserves_whitespace_fenced():
    out = md("<pre>  a()\n    b()</pre>")
    assert out == "```\n  a()\n    b()\n```"


def test_blockquote_prefixes_every_line():
    out = md("<blockquote><p>one</p><p>two</p></blockquote>")
    assert out == "> one\n>\n> two"


def test_table_pipe_layout_header_and_escape():
    out = md("<table><tr><th>A</th><th>B|C</th></tr>"
             "<tr><td>1</td><td>2</td></tr></table>")
    assert out == "| A | B\\|C |\n| --- | --- |\n| 1 | 2 |"


def test_table_without_th_has_no_separator():
    out = md("<table><tr><td>a</td></tr><tr><td>b</td></tr></table>")
    assert out == "| a |\n| b |"


def test_br_is_hard_break_inline_but_space_in_cells():
    assert md("<p>x<br>y</p>") == "x\ny"
    assert md("<table><tr><td>x<br>y</td></tr></table>") == "| x y |"


def test_script_style_head_dropped_and_hr():
    out = md("<head><title>T</title></head><body>"
             "<script>1<2</script><style>p{}</style>"
             "<p>a</p><hr><p>b</p></body>")
    assert out == "a\n\n---\n\nb"


def test_whitespace_collapse_and_stray_inline_run():
    assert md("<h2>Two</h2>  stray\n <b>tail</b>  text ") == \
        "## Two\n\nstray **tail** text"


def test_empty_emphasis_dropped():
    assert md("<p>a <b>  </b>b</p>") == "a b"


def test_spark_stage(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "<h1>X</h1>"), (2, None)], "doc_id long, body string"
    )
    got = {r["doc_id"]: r["md"] for r in df.select(
        "doc_id", to_markdown(F.col("body")).alias("md")).collect()}
    assert got == {1: "# X", 2: ""}
