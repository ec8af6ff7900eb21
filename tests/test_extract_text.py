"""Expression-only visible-text extraction (extract.html_visible_text):
block stripping, entity decode order, whitespace collapse — and the
plan must stay JVM-side."""

from pyspark.sql import functions as F

from mechaml_spark.extract import html_visible_text


def _run(spark, bodies):
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "id int, body string"
    )
    out = df.select("id", html_visible_text(F.col("body")).alias("t"))
    return [r["t"] for r in out.orderBy("id").collect()]


def test_blocks_tags_entities(spark):
    cases = [
        ("<p>a</p><p>b</p>", "a b"),
        ("<script>x<y && z>w</script>hi", "hi"),
        ("<SCRIPT a='b'>junk</SCRIPT >ok", "ok"),
        ("<style>p{color:red}</style>text", "text"),
        ("<head><title>Page Title</title></head><body>seen</body>", "seen"),
        ("<!-- <p>gone</p> -->kept", "kept"),
        ("a&nbsp;b &amp; c &lt;d&gt; &quot;e&quot; &#39;f&#39;", 'a b & c <d> "e" \'f\''),
        # &amp;lt; is a double-escape: must decode to the LITERAL "&lt;"
        ("x &amp;lt; y", "x &lt; y"),
        ("  a\n\t b  ", "a b"),
        ("no markup at all", "no markup at all"),
        ("", ""),
        (None, None),
    ]
    got = _run(spark, [c[0] for c in cases])
    assert got == [c[1] for c in cases]


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "body string")
    plan = (
        df.select(html_visible_text(F.col("body")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
