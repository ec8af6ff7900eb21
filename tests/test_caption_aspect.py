"""Caption-quality rules (metadata.caption_quality_cols) and
aspect-ratio bucketing (multimodal.aspect_bucket_expr) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mechaml_spark.metadata import caption_quality_cols
from mechaml_spark.multimodal import ASPECT_BUCKETS, aspect_bucket_expr


def _flags(spark, caption: str) -> dict:
    df = spark.createDataFrame([(caption,)], "caption string").select(
        *caption_quality_cols(F.col("caption"))
    )
    return df.collect()[0].asDict()


def test_caption_rules_semantics(spark):
    # a clean descriptive caption passes every gate
    good = _flags(spark, "a red bicycle leaning on a brick wall")
    assert good["keep"] and not any(
        good[k]
        for k in ("filename_like", "has_url", "boilerplate", "all_caps",
                  "too_short")
    )
    # camera-filename captions, any case / separator / extension
    for cap in ("IMG_0042.JPG", "dsc1234.jpeg", "photo 77.webp",
                "Untitled.png"):
        assert _flags(spark, cap)["filename_like"], cap
    assert not _flags(spark, "my dog img_0042.jpg story")["filename_like"]
    # URL and www forms
    assert _flags(spark, "buy at http://x.test now ok")["has_url"]
    assert _flags(spark, "visit www.example.com for more")["has_url"]
    # boilerplate phrases are substring, case-insensitive
    assert _flags(spark, "Sunset beach Stock Photo 123")["boilerplate"]
    assert _flags(spark, "Click To Enlarge the map")["boilerplate"]
    # all-caps needs >= 6 letters: 'OK GO' stays clean
    assert not _flags(spark, "OK GO")["all_caps"]
    assert _flags(spark, "BUY THIS GREAT ITEM")["all_caps"]
    # digit share is integer permille of trimmed length
    f = _flags(spark, "route 66 usa")  # 2 digits / 12 chars -> 166
    assert f["digit_permille"] == 166
    # too-short: under 3 tokens or under 8 chars
    assert _flags(spark, "a cat")["too_short"]
    assert _flags(spark, "nice red hat")["too_short"] is False


def test_aspect_bucket_assignment(spark):
    df = spark.createDataFrame(
        [(1024, 1024), (896, 1152), (2000, 500), (512, 512)],
        "w int, h int",
    ).select("w", "h", aspect_bucket_expr("w", "h").alias("b"))
    rows = {(r["w"], r["h"]): r["b"] for r in df.collect()}
    # exact bucket shapes land on themselves with zero error
    assert rows[(1024, 1024)]["i"] == 7
    assert rows[(1024, 1024)]["d"] == 0
    assert rows[(896, 1152)]["i"] == 6
    assert rows[(896, 1152)]["d"] == 0
    # 4:1 panorama snaps to the widest bucket
    assert rows[(2000, 500)]["i"] == len(ASPECT_BUCKETS) - 1
    # scale invariance: 512x512 is also ratio 1.0 -> square bucket
    assert rows[(512, 512)]["i"] == 7 and rows[(512, 512)]["d"] == 0


def test_aspect_bucket_tiebreak_is_lower_index(spark):
    # duplicate-distance construction: with w*bh == h*bw impossible
    # across two distinct buckets simultaneously, force a tie via the
    # micro quantization: ratio exactly midway in relative error is
    # rare, so assert the documented struct-order property directly:
    # array_min on (d, i) structs picks the smaller index at equal d.
    row = spark.range(1).select(
        F.expr(
            "array_min(array(struct(5L as d, 3 as i),"
            " struct(5L as d, 1 as i)))"
        ).alias("m")
    ).collect()[0]["m"]
    assert (row["d"], row["i"]) == (5, 1)
