"""multimodal.select_keyframes — prev/kept diffs, cuts, fades."""

from __future__ import annotations

import numpy as np

from mechaml_spark import imaging, multimodal


def _frames_df(spark, grays, media_id="m"):
    rows = []
    for k, g in enumerate(grays):
        px = np.full((4, 4, 3), g, dtype=np.uint8)
        rows.append(
            (media_id, k, k * 100, bytearray(imaging.png_encode(px)))
        )
    return spark.createDataFrame(
        rows, "media_id string, frame_idx int, ts_ms long, frame binary"
    )


def _run(spark, grays, **kw):
    df = _frames_df(spark, grays)
    out = multimodal.select_keyframes(df, **kw).collect()
    return sorted(out, key=lambda r: r["frame_idx"])


def test_prev_diff_closed_form_and_threshold(spark):
    got = _run(spark, [10, 50, 52], threshold_milli=30_000)
    assert [r["diff_milli"] for r in got] == [None, 40_000, 2_000]
    assert [r["is_keyframe"] for r in got] == [True, True, False]


def test_slow_fade_caught_by_kept_mode_only(spark):
    fade = [0, 20, 40, 60]  # each step 20 < 30 threshold
    prev = _run(spark, fade, threshold_milli=30_000, compare_to="prev")
    assert [r["is_keyframe"] for r in prev] == [True, False, False, False]
    kept = _run(spark, fade, threshold_milli=30_000, compare_to="kept")
    # vs frame 0: diffs 20, 40 (keyframe, new ref), 20
    assert [r["diff_milli"] for r in kept] == [None, 20_000, 40_000, 20_000]
    assert [r["is_keyframe"] for r in kept] == [True, False, True, False]


def test_canvas_size_change_is_a_cut(spark):
    small = np.full((4, 4, 3), 10, dtype=np.uint8)
    big = np.full((8, 8, 3), 10, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("m", 0, 0, bytearray(imaging.png_encode(small))),
            ("m", 1, 100, bytearray(imaging.png_encode(big))),
        ],
        "media_id string, frame_idx int, ts_ms long, frame binary",
    )
    got = sorted(
        multimodal.select_keyframes(df).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert got[1]["is_keyframe"] is True and got[1]["diff_milli"] is None


def test_groups_independent(spark):
    a = _frames_df(spark, [0, 200], media_id="a")
    b = _frames_df(spark, [100], media_id="b")
    got = multimodal.select_keyframes(a.union(b)).collect()
    by = {(r["media_id"], r["frame_idx"]): r for r in got}
    assert by[("b", 0)]["is_keyframe"] is True
    assert by[("a", 1)]["diff_milli"] == 200_000
