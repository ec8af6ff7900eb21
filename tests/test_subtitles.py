"""Grammar tests for the expression-only SRT/WebVTT cue parser."""

from __future__ import annotations

from pyspark.sql import functions as F

from mechaml_spark.subtitles import cues_col


def _parse(spark, text):
    df = spark.createDataFrame([(text,)], "body string")
    rows = df.select(
        F.explode(cues_col(F.col("body"))).alias("c")
    ).select("c.start_ms", "c.end_ms", "c.text").collect()
    return [(r["start_ms"], r["end_ms"], r["text"]) for r in rows]


def test_srt_basic(spark):
    out = _parse(
        spark,
        "1\n00:00:03,250 --> 00:00:05,900\nline A\nline B\n\n"
        "2\n00:01:09,000 --> 00:01:11,005\nsecond\n",
    )
    assert out == [
        (3250, 5900, "line A\nline B"),
        (69000, 71005, "second"),
    ]


def test_webvtt_header_note_settings_dot_ms(spark):
    out = _parse(
        spark,
        "WEBVTT\n\nNOTE this is a comment\nspanning lines\n\n"
        "00:01:00.000 --> 00:01:02.250 align:start position:10%\nvtt text\n",
    )
    assert out == [(60000, 62250, "vtt text")]


def test_malformed_blocks_dropped_not_crashed(spark):
    out = _parse(
        spark,
        "garbage\nno arrow\n\n1\n00:00:01,000 --> 00:00:02,000\nok\n\n"
        "3\n99:99 --> nope\nbad times\n",
    )
    assert out == [(1000, 2000, "ok")]


def test_crlf_and_hours(spark):
    out = _parse(
        spark,
        "1\r\n01:02:03,004 --> 01:02:04,004\r\ncrlf text\r\n\r\n"
        "2\r\n10:00:00,000 --> 10:00:01,000\r\nten hours\r\n",
    )
    assert out == [
        (3723004, 3724004, "crlf text"),
        (36000000, 36001000, "ten hours"),
    ]


def test_empty_and_headerless_vtt_cue_without_index(spark):
    assert _parse(spark, "") == []
    # bare cue with neither index nor header: timing is line 0
    assert _parse(spark, "00:00:05,000 --> 00:00:06,000\nbare\n") == [
        (5000, 6000, "bare")
    ]


def test_random_cue_lists_roundtrip(spark):
    # randomized render -> parse equality: build SRT/VTT documents
    # from random cue lists, parse with the expression grammar, and
    # require exact (start, end, text) recovery
    import random

    rng = random.Random(77)
    docs = []
    want = {}
    for i in range(40):
        vtt = rng.random() < 0.5
        cues = []
        t = rng.randrange(0, 5000)
        for _ in range(rng.randrange(1, 6)):
            start = t
            end = start + rng.randrange(100, 4000)
            t = end + rng.randrange(100, 2000)
            lines = [
                rng.choice(["hello world", "caption text", "x -> y",
                            "1", "WEBVTT inside text", "a  b"])
                for _ in range(rng.randrange(1, 4))
            ]
            cues.append((start, end, "\n".join(lines)))

        def ts(ms):
            h, r = divmod(ms, 3600000)
            m, r2 = divmod(r, 60000)
            s, mil = divmod(r2, 1000)
            sep = "." if vtt else ","
            return f"{h:02d}:{m:02d}:{s:02d}{sep}{mil:03d}"

        blocks = []
        for k, (a, b, text) in enumerate(cues):
            idx = "" if vtt else f"{k + 1}\n"
            blocks.append(f"{idx}{ts(a)} --> {ts(b)}\n{text}")
        head = "WEBVTT\n\n" if vtt else ""
        docs.append((i, head + "\n\n".join(blocks) + "\n"))
        want[i] = cues

    from pyspark.sql import functions as F

    from mechaml_spark.subtitles import cues_col

    df = spark.createDataFrame(docs, "i int, body string")
    rows = (
        df.select("i", F.posexplode(cues_col(F.col("body"))).alias("k", "c"))
        .select("i", "k", "c.start_ms", "c.end_ms", "c.text")
        .collect()
    )
    got: dict = {}
    for r in rows:
        got.setdefault(r["i"], []).append(
            (r["start_ms"], r["end_ms"], r["text"])
        )
    for i, cues in want.items():
        assert got.get(i, []) == cues, i
