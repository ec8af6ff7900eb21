"""HTML table → grid extraction: pinned grid semantics (spans,
sections, nesting, markup-soup recovery) + the Spark stage."""

from mechaml_spark.tables import extract_table_cells, extract_tables


def test_basic_grid_with_sections_and_nested_table():
    h = (
        "<table><thead><tr><th>H0</th><th>H1</th></tr></thead>"
        '<tbody><tr><td colspan="2">w</td></tr>'
        "<tr><td>a</td><td><table><tr><td>n</td></tr></table> x</td></tr>"
        "</tbody></table>"
    )
    got = extract_table_cells(h)
    assert got == [
        (0, 0, 0, "H0", True, "thead"),
        (0, 0, 1, "H1", True, "thead"),
        (0, 1, 0, "w", False, "tbody"),
        (0, 1, 1, "w", False, "tbody"),
        (0, 2, 0, "a", False, "tbody"),
        (0, 2, 1, "x", False, "tbody"),  # nested text excluded
        (1, 0, 0, "n", False, ""),       # nested = own table
    ]


def test_rowspan_fills_following_rows():
    h = ('<table><tr><td rowspan="2">r</td><td>b</td></tr>'
         "<tr><td>c</td></tr></table>")
    got = extract_table_cells(h)
    assert [(r, c, t) for (_, r, c, t, _, _) in got] == [
        (0, 0, "r"), (0, 1, "b"), (1, 0, "r"), (1, 1, "c"),
    ]


def test_rowspan_zero_extends_to_section_end_only():
    h = ("<table><tbody><tr><td rowspan=0>s<tr><td>t<td>u</tbody>"
         "<tfoot><tr><td>f</table>")
    got = extract_table_cells(h)
    assert got == [
        (0, 0, 0, "s", False, "tbody"),
        (0, 1, 0, "s", False, "tbody"),
        (0, 1, 1, "t", False, "tbody"),
        (0, 1, 2, "u", False, "tbody"),
        (0, 2, 0, "f", False, "tfoot"),  # NOT blocked by the span
    ]


def test_rowspan_clamped_to_table_and_spans_capped():
    # rowspan far past the last row: no phantom rows emitted
    h = '<table><tr><td rowspan="99">x</td></tr></table>'
    assert extract_table_cells(h) == [(0, 0, 0, "x", False, "")]
    # colspan above the HTML-spec max 1000 is clamped (not 10^9 cells)
    h2 = '<table><tr><td colspan="1000000000">y</td></tr></table>'
    assert len(extract_table_cells(h2)) == 1000


def test_invalid_span_attrs_default_to_one():
    h = ('<table><tr><td colspan="abc" rowspan="-2">a</td>'
         "<td>b</td></tr></table>")
    assert [(r, c) for (_, r, c, _, _, _) in extract_table_cells(h)] == [
        (0, 0), (0, 1),
    ]


def test_empty_table_consumes_an_index():
    h = "<table></table><table><tr><td>a</td></tr></table>"
    assert extract_table_cells(h) == [(1, 0, 0, "a", False, "")]


def test_td_under_inline_wrapper_belongs_to_row():
    # markup soup: a <td> buried under a <form>-ish inline wrapper
    h = "<table><tr><span><td>a</td></span><td>b</td></tr></table>"
    got = extract_table_cells(h)
    assert [(c, t) for (_, _, c, t, _, _) in got] == [(0, "a"), (1, "b")]


def test_tfoot_before_tbody_keeps_source_order():
    h = ("<table><tfoot><tr><td>f</td></tr></tfoot>"
         "<tbody><tr><td>b</td></tr></tbody></table>")
    assert extract_table_cells(h) == [
        (0, 0, 0, "f", False, "tfoot"),
        (0, 1, 0, "b", False, "tbody"),
    ]


def test_cell_text_skips_script_style_and_collapses_ws():
    h = ("<table><tr><td> a\n  <b>bold</b> <script>x<1</script>"
         "<style>p{}</style> z </td></tr></table>")
    assert extract_table_cells(h)[0][3] == "a bold z"


def test_spark_stage_explodes_cells(spark):
    df = spark.createDataFrame(
        [(1, "<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"),
         (2, "<p>no tables</p>"),
         (3, None)],
        "doc_id long, body string",
    )
    got = sorted(
        (r["doc_id"], r["row_idx"], r["cell"], r["is_header"])
        for r in extract_tables(df).collect()
    )
    assert got == [(1, 0, "h", True), (1, 1, "v", False)]
