"""multimodal.image_quality — blur/brightness/contrast signals."""

from __future__ import annotations

import numpy as np

from mechaml_spark import imaging, multimodal


def _quality(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, bytes binary, fmt string")
    out = multimodal.image_quality(df).select("doc_id", "quality").collect()
    return {r["doc_id"]: r["quality"] for r in out}


def test_constant_image_has_zero_variance_and_blur(spark):
    px = np.full((8, 10, 3), 50, dtype=np.uint8)
    q = _quality(spark, [(1, bytearray(imaging.png_encode(px)), "png")])[1]
    assert q["ok"] and (q["w"], q["h"]) == (10, 8)
    assert q["brightness_milli"] == 50_000
    assert q["var_milli"] == 0 and q["lap_var_milli"] == 0
    assert q["aspect_milli"] == 1250


def test_stripe_image_closed_form(spark):
    va, vb = 40, 60  # d = 20
    px = np.empty((8, 10, 3), dtype=np.uint8)
    px[:, 0::2, :] = va
    px[:, 1::2, :] = vb
    q = _quality(spark, [(1, bytearray(imaging.png_encode(px)), "png")])[1]
    assert q["brightness_milli"] == (va + vb) * 500
    assert q["var_milli"] == (vb - va) ** 2 * 250
    assert q["lap_var_milli"] == 4 * (vb - va) ** 2 * 1000


def test_nongray_luma_weights(spark):
    # pure red 200: luma = (77*200) >> 8 = 60
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[..., 0] = 200
    q = _quality(spark, [(1, bytearray(imaging.png_encode(px)), "png")])[1]
    assert q["brightness_milli"] == ((77 * 200) >> 8) * 1000


def test_tiny_image_skips_laplacian(spark):
    px = np.full((2, 2, 3), 10, dtype=np.uint8)
    q = _quality(spark, [(1, bytearray(imaging.png_encode(px)), "png")])[1]
    assert q["ok"] and q["lap_var_milli"] == 0


def test_undecodable_and_null_rows_flagged_not_failed(spark):
    got = _quality(
        spark,
        [(1, bytearray(b"not a png"), "png"), (2, None, "png")],
    )
    assert got[1]["ok"] is False and got[2]["ok"] is False
    assert got[1]["lap_var_milli"] is None


def test_image_ssim_invariants(spark):
    """Identical planes score EXACTLY 1000 milli (the integer-exact
    rational hits 1 with zero float drift); any shifted pair scores
    strictly below; stronger shifts never score above weaker ones at
    the same base level."""
    import pyspark.sql.functions as F

    from mechaml_spark.queries import QUERIES

    df = QUERIES["image_ssim"](spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r["ssim_milli"] for r in df.collect()}
    assert rows
    for did, v in rows.items():
        if did % 17 == 0:
            assert v == 1000, (did, v)
        else:
            assert v < 1000, (did, v)


def test_edge_density_thirds_closed_forms():
    import numpy as np

    from mechaml_spark import imaging as im

    # flat image: no edges anywhere
    px = np.full((24, 18, 3), 120, dtype=np.uint8)
    assert im.edge_density_thirds(px) == (0, 0, 0)
    # bottom-third period-2 stripes: 8 boundaries/row, 17 pairs
    cols = np.arange(18)
    px2 = px.copy()
    px2[16:, :, :] = (120 + 55 * ((cols // 2) % 2))[None, :, None]
    assert im.edge_density_thirds(px2) == (0, 0, 1000 * 64 // 136)
    # full period-1 stripes: every pair an edge
    px3 = np.empty_like(px)
    px3[:, :, :] = (120 + 55 * (cols % 2))[None, :, None]
    assert im.edge_density_thirds(px3) == (1000, 1000, 1000)
    # sub-threshold contrast is not an edge
    px4 = np.empty_like(px)
    px4[:, :, :] = (120 + 20 * (cols % 2))[None, :, None]
    assert im.edge_density_thirds(px4) == (0, 0, 0)
    # threshold is on LUMA, not raw channels: green dominates
    px5 = px.copy()
    px5[..., 1] = (60 + 80 * (cols % 2))[None, :]
    t, m, b = im.edge_density_thirds(px5)
    assert t == m == b == 1000  # 80*150>>8 = 46 > 32


def test_otsu_stats_integer_exact():
    import numpy as np

    from mechaml_spark import imaging as im

    # two-level stripes: lowest-maximizer tie-break -> dark level
    px = np.empty((16, 16, 3), np.uint8)
    cols = np.arange(16)
    px[:, :, :] = (30 + 190 * (cols % 2))[None, :, None]
    assert im.otsu_stats(px) == (30, 500, 1000)
    # degenerate single level
    assert im.otsu_stats(np.full((8, 8, 3), 200, np.uint8)) == (200, 1000, 0)
    # half split: 1 transition per row, 15 pairs per row
    half = np.empty((16, 16, 3), np.uint8)
    half[:, :8] = 30
    half[:, 8:] = 220
    assert im.otsu_stats(half) == (30, 500, 1000 * 16 // 240)


def test_otsu_matches_float_reference():
    import numpy as np

    from mechaml_spark import imaging as im

    rng = np.random.RandomState(7)
    for trial in range(300):
        shape = int(rng.choice([4, 8, 16]))
        px = rng.randint(0, 256, (shape, shape, 3)).astype(np.uint8)
        if trial % 3 == 0:
            px[:, : shape // 2] = rng.randint(0, 60)
            px[:, shape // 2:] = rng.randint(150, 256)
        t, ink, _ = im.otsu_stats(px)
        p = px.astype(np.int64)
        luma = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2]) >> 8
        hist = np.bincount(
            luma.reshape(-1), minlength=256
        ).astype(np.float64)
        n = hist.sum()
        tot = float((hist * np.arange(256)).sum())
        best, bt, n0, s0 = -1.0, 0, 0.0, 0.0
        for tt in range(256):
            n0 += hist[tt]
            s0 += hist[tt] * tt
            n1 = n - n0
            if n0 == 0 or n1 == 0:
                continue
            v = (s0 * n1 - (tot - s0) * n0) ** 2 / (n0 * n1)
            if v > best * (1 + 1e-12):
                best, bt = v, tt
        assert t == bt, trial
        assert ink == 1000 * int((luma <= t).sum()) // luma.size
