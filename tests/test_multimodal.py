"""Multimodal column ops: real PNG paths + stub contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mechaml_spark import imaging, multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(6):
        px = np.random.default_rng(i).integers(0, 256, (12, 16, 3), dtype=np.uint8)
        rows.append((f"m{i}", imaging.png_encode(px), "png"))
    return spark.createDataFrame(
        rows, "media_id string, bytes binary, fmt string"
    ).cache()


def test_image_features(spark, media_df):
    out = multimodal.image_features(media_df).collect()
    assert len(out) == 6
    for r in out:
        f = r["features"]
        assert f["ok"] and f["w"] == 16 and f["h"] == 12
        assert 0 <= f["mean_r"] <= 255_000
        assert sum(f["luma_hist"]) == 12 * 16
        # cross-check against local numpy on the same bytes
        px = imaging.png_decode(bytes(r["bytes"]))
        assert f["mean_r"] == int(round(px[..., 0].mean() * 1000))


def test_image_features_bad_bytes(spark):
    df = spark.createDataFrame(
        [("x", b"not a png", "png")], "media_id string, bytes binary, fmt string"
    )
    (r,) = multimodal.image_features(df).collect()
    assert r["features"]["ok"] is False  # error row, not a task failure


def test_resize(spark, media_df):
    out = multimodal.resize_images(media_df, 8, 6).collect()
    for r in out:
        px = imaging.png_decode(bytes(r["resized"]))
        assert px.shape == (6, 8, 3)
        # nearest-neighbor: every output pixel exists in the source
        src = imaging.png_decode(bytes(r["bytes"]))
        assert px[0, 0].tolist() in src.reshape(-1, 3).tolist()


def test_frame_sampling_fake_codec(spark):
    dur = (3500).to_bytes(4, "big")
    df = spark.createDataFrame(
        [("v1", dur, "fakevid"), ("v2", (1200).to_bytes(4, "big"), "fakevid")],
        "media_id string, bytes binary, fmt string",
    )
    out = multimodal.sample_video_frames(df, every_ms=1000)
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id["v1"]) == 4  # 0,1000,2000,3000
    assert len(by_id["v2"]) == 2
    f = sorted(by_id["v1"], key=lambda r: r["frame_idx"])[0]
    px = imaging.png_decode(bytes(f["frame"]))
    assert px.shape == (4, 4, 3)
    # deterministic fake: same (id, idx) -> same frame bytes
    rows2 = multimodal.sample_video_frames(df, every_ms=1000).collect()
    assert {bytes(r["frame"]) for r in rows} == {bytes(r["frame"]) for r in rows2}


def test_real_video_format_raises(spark):
    df = spark.createDataFrame(
        [("v", b"\x00\x00\x00\x01", "mp4")], "media_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception) as ei:
        multimodal.sample_video_frames(df).collect()
    assert "NotImplementedError" in str(ei.value) or "no 'mp4'" in str(ei.value)


def test_audio_wav_roundtrip(spark):
    # 1 kHz-ish square wave: 100 frames of +/-2000 flipping every 10,
    # stereo second channel all zeros (features are channel-0)
    sign = np.repeat([1, -1] * 5, 10)[:100]
    mono = (sign * 2000).astype("<i2")
    # channel 1 LOUD and constant-positive: if any feature leaked
    # channel-1 samples, rms/peak would jump to ~30000 and
    # zero_crossings would drop — all features must be channel-0
    stereo = np.stack([mono, np.full(100, 30000, dtype="<i2")], axis=1)
    df = spark.createDataFrame(
        [
            ("a", multimodal.wav_encode(mono, 8000), "wav"),
            ("b", multimodal.wav_encode(stereo, 16000), "wav"),
            ("c", b"not a wav", "wav"),
            ("d", None, "wav"),
            ("e", b"\x00\x01", None),  # NULL fmt = bad row, not a crash
        ],
        "media_id string, bytes binary, fmt string",
    )
    rows = {r["media_id"]: r["audio"] for r in multimodal.decode_audio(df).collect()}
    for mid, sr, nch in [("a", 8000, 1), ("b", 16000, 2)]:
        f = rows[mid]
        assert f["ok"] and f["sample_rate"] == sr and f["n_channels"] == nch
        assert f["n_samples"] == 100
        assert f["duration_ms"] == 100 * 1000 // sr
        assert f["rms_x1000"] == 2000_000  # all samples +/-2000
        assert f["peak"] == 2000
        assert f["zero_crossings"] == 9  # sign flips at 10,20,...,90
    # local numpy cross-check on the same bytes
    sr, frames = multimodal.wav_decode(multimodal.wav_encode(mono, 8000))
    assert sr == 8000 and np.array_equal(frames[:, 0], mono.astype(np.int32))
    assert rows["c"]["ok"] is False  # error row, not a task failure
    assert rows["d"]["ok"] is False
    assert rows["e"]["ok"] is False


def test_audio_real_format_raises(spark):
    df = spark.createDataFrame(
        [("x", b"\xff\xfb", "mp3")], "media_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception) as ei:
        multimodal.decode_audio(df).collect()
    assert "NotImplementedError" in str(ei.value) or "no 'mp3'" in str(ei.value)


def test_wav_codec_pure_roundtrip_and_widths():
    """Pure-Python codec checks (no Spark): 16-bit round-trip is
    bit-exact for arbitrary arrays (hypothesis); 8/24/32-bit decode
    reaches the same int16-domain values stdlib `wave` implies."""
    import io
    import struct
    import wave as wave_mod

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=200,
        ),
        st.sampled_from([1, 2]),
        st.sampled_from([8000, 44100]),
    )
    def roundtrip(vals, nch, sr):
        arr = np.array(vals, dtype="<i2")
        frames = arr[: len(arr) - (len(arr) % nch)].reshape(-1, nch)
        if frames.size == 0:
            return
        sr2, out = multimodal.wav_decode(multimodal.wav_encode(frames, sr))
        assert sr2 == sr
        assert np.array_equal(out, frames.astype(np.int32))

    roundtrip()

    def raw_wav(sampwidth, payload, sr=8000, nch=1):
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sampwidth)
            w.setframerate(sr)
            w.writeframes(payload)
        return buf.getvalue()

    # 8-bit unsigned: 0 -> -32768, 128 -> 0, 255 -> +32512
    _, out8 = multimodal.wav_decode(raw_wav(1, bytes([0, 128, 255])))
    assert out8[:, 0].tolist() == [-32768, 0, 32512]
    # 24-bit packed: min / -1 / 0 / +1 / max in the 24-bit domain
    vals24 = [-(1 << 23), -256, 0, 256, (1 << 23) - 1]
    payload = b"".join(
        struct.pack("<i", v)[:3] for v in vals24
    )
    _, out24 = multimodal.wav_decode(raw_wav(3, payload))
    assert out24[:, 0].tolist() == [-32768, -1, 0, 1, 32767]
    # 32-bit: top 16 bits survive
    payload32 = struct.pack("<2i", -(1 << 31), (1 << 31) - 1)
    _, out32 = multimodal.wav_decode(raw_wav(4, payload32))
    assert out32[:, 0].tolist() == [-32768, 32767]


def test_frame_sampling_real_gif(spark):
    """Video frame sampling is REAL for animated GIF: sampled rows are
    the canvases on display at each every_ms tick, per GCE delays."""
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 4, (6, 6))] for _ in range(3)]
    data = imaging.gif_encode_animated(frames, [100, 50, 100])  # total 250
    df = spark.createDataFrame(
        [("g1", data, "gif")], "media_id string, bytes binary, fmt string"
    )
    rows = sorted(
        multimodal.sample_video_frames(df, every_ms=50).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [
        (0, 0), (1, 50), (2, 100), (3, 150), (4, 200)
    ]
    # frame0 shows [0,100), frame1 [100,150), frame2 [150,250)
    want = [frames[0], frames[0], frames[1], frames[2], frames[2]]
    for r, w in zip(rows, want):
        assert np.array_equal(imaging.png_decode(bytes(r["frame"])), w)


def test_frame_sampling_gif_zero_delay_and_corrupt(spark):
    """Zero-delay frames are clamped to 100 ms (every frame sampled,
    like real players); a corrupt GIF row yields zero frames without
    failing the task or dropping other rows."""
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (3, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 3, (4, 4))] for _ in range(3)]
    data = imaging.gif_encode_animated(frames, [0, 0, 0])
    df = spark.createDataFrame(
        [("z", data, "gif"), ("bad", b"GIF89a\x00garbage", "gif")],
        "media_id string, bytes binary, fmt string",
    )
    rows = multimodal.sample_video_frames(df, every_ms=100).collect()
    assert {r["media_id"] for r in rows} == {"z"}
    by_idx = sorted(rows, key=lambda r: r["frame_idx"])
    assert len(by_idx) == 3  # every zero-delay frame sampled once
    for r, w in zip(by_idx, frames):
        assert np.array_equal(imaging.png_decode(bytes(r["frame"])), w)


def test_avi_mjpeg_roundtrip_pure():
    """AVI container: encode -> parse recovers usec_per_frame and every
    JPEG frame; constant 8x8 planes at q95 decode bit-exactly."""
    from mechaml_spark import jpeg

    frames = []
    for k in range(4):
        px = np.empty((8, 8, 3), dtype=np.uint8)
        px[..., 0] = (7 + k * 31) % 251
        px[..., 1] = (11 + k * 37) % 251
        px[..., 2] = (13 + k * 41) % 251
        frames.append(px)
    avi = multimodal.avi_mjpeg_encode(frames, usec_per_frame=40_000, quality=95)
    uspf, jpgs = multimodal.avi_mjpeg_frames(avi)
    assert uspf == 40_000 and len(jpgs) == 4
    for k, j in enumerate(jpgs):
        assert np.array_equal(jpeg.jpeg_decode(j), frames[k])
    # word-alignment: odd-length JPEG payloads must still parse
    with pytest.raises(ValueError):
        multimodal.avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(ValueError):
        multimodal.avi_mjpeg_frames(b"not an avi")


def test_avi_non_mjpeg_codec_raises():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    avi = multimodal.avi_mjpeg_encode([px])
    with pytest.raises(NotImplementedError, match="XVID"):
        multimodal.avi_mjpeg_frames(avi.replace(b"MJPG", b"XVID"))


def test_frame_sampling_real_avi(spark):
    """Frame sampling is REAL for MJPEG-in-AVI: RIFF parse + baseline
    JPEG decode; 100 ms frames sampled at 50 ms ticks repeat each
    frame twice; a corrupt AVI row yields zero frames."""
    frames = []
    for k in range(3):
        px = np.empty((8, 8, 3), dtype=np.uint8)
        px[..., 0] = (5 * 7 + k * 31) % 251
        px[..., 1] = (5 * 11 + k * 37) % 251
        px[..., 2] = (5 * 13 + k * 41) % 251
        frames.append(px)
    data = multimodal.avi_mjpeg_encode(frames, usec_per_frame=100_000, quality=95)
    df = spark.createDataFrame(
        [("a1", data, "avi"), ("bad", b"RIFF\xff\xff\xff\xffAVI junk", "avi")],
        "media_id string, bytes binary, fmt string",
    )
    rows = sorted(
        multimodal.sample_video_frames(df, every_ms=50).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert {r["media_id"] for r in rows} == {"a1"}
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [
        (0, 0), (1, 50), (2, 100), (3, 150), (4, 200), (5, 250)
    ]
    want = [frames[0], frames[0], frames[1], frames[1], frames[2], frames[2]]
    for r, w in zip(rows, want):
        assert np.array_equal(imaging.png_decode(bytes(r["frame"])), w)


def test_g711_tables_exact_pure():
    """Every mu-law/A-law code decodes to the closed-form magnitude the
    inverse code helpers target (all 128 magnitudes x 2 signs, both
    laws) — the exactness the audio_g711_features oracle relies on."""
    for e in range(8):
        for m in range(16):
            a = (((m << 3) + 0x84) << e) - 0x84
            dp = multimodal.g711_ulaw_decode(
                np.array([multimodal.g711_ulaw_code(True, e, m)]))[0]
            dn = multimodal.g711_ulaw_decode(
                np.array([multimodal.g711_ulaw_code(False, e, m)]))[0]
            assert (dp, dn) == (a, -a)
    for seg in range(8):
        for m in range(16):
            a = (m << 4) + 8 if seg == 0 else ((m << 4) + 0x108) << (seg - 1)
            dp = multimodal.g711_alaw_decode(
                np.array([multimodal.g711_alaw_code(True, seg, m)]))[0]
            dn = multimodal.g711_alaw_decode(
                np.array([multimodal.g711_alaw_code(False, seg, m)]))[0]
            assert (dp, dn) == (a, -a)


def test_g711_wav_roundtrip_pure():
    n, h, e, m = 4000, 7, 5, 10
    a = (((m << 3) + 0x84) << e) - 0x84
    sign = 1 - 2 * ((np.arange(n) // h) % 2)
    codes = np.where(
        sign > 0,
        multimodal.g711_ulaw_code(True, e, m),
        multimodal.g711_ulaw_code(False, e, m),
    ).astype(np.uint8)
    wav = multimodal.wav_encode_compressed(7, 1, 8000, 8, 1, codes.tobytes(), n)
    sr, frames = multimodal.wav_decode(wav)
    assert sr == 8000 and frames.shape == (n, 1)
    assert np.array_equal(frames[:, 0], sign * a)


def test_ima_adpcm_zero_nibble_blocks_exact():
    """All-zero nibble areas keep the block predictor constant (step 7
    >> 3 == 0) — the audio_adpcm_features oracle's closed form."""
    ba = 256
    spb = (ba - 4) * 2 + 1
    payload = b"".join(
        int(p).to_bytes(2, "little", signed=True) + bytes((0, 0))
        + b"\x00" * (ba - 4)
        for p in (1200, -1200, 1200)
    )
    wav = multimodal.wav_encode_compressed(
        0x11, 1, 8000, 4, ba, payload, 3 * spb, samples_per_block=spb
    )
    sr, frames = multimodal.wav_decode(wav)
    assert frames.shape == (3 * spb, 1)
    assert np.array_equal(np.unique(np.abs(frames)), [1200])
    nonneg = frames[:, 0] >= 0
    assert int(np.sum(nonneg[1:] != nonneg[:-1])) == 2


def test_ima_adpcm_encode_decode_bounded_error():
    """Own-encoder round trip: ADPCM is lossy, but tracking error stays
    within the quantizer's step bound; stereo channels stay separated."""
    rng = np.random.default_rng(3)
    sig = (3000 * np.sin(np.arange(2000) / 15)
           + rng.normal(0, 50, 2000)).astype(np.int16)
    payload, spb = multimodal.ima_adpcm_encode(sig, 256)
    dec = multimodal.ima_adpcm_decode(payload, 1, 256)[:2000, 0]
    err = np.abs(dec - sig.astype(np.int32))
    assert err.max() < 2000 and err.mean() < 100
    st = np.stack([sig, (-sig // 2).astype(np.int16)], axis=1)
    p2, _ = multimodal.ima_adpcm_encode(st, 256)
    d2 = multimodal.ima_adpcm_decode(p2, 2, 256)[:2000]
    assert np.abs(d2 - st.astype(np.int32)).max() < 2000


def test_wav_unknown_tag_raises_not_implemented():
    wav = multimodal.wav_encode_compressed(0x55, 1, 8000, 8, 1, b"\0" * 8, 8)
    with pytest.raises(NotImplementedError, match="0x55"):
        multimodal.wav_decode(wav)


def test_decode_audio_spark_compressed(spark):
    """decode_audio handles G.711 and IMA ADPCM WAVs through the same
    mapInPandas stage as PCM; corrupt rows stay ok=false."""
    e, m = 3, 4
    a = (((m << 3) + 0x84) << e) - 0x84
    codes = bytes(
        multimodal.g711_ulaw_code(k % 2 == 0, e, m) for k in range(800)
    )
    g711 = multimodal.wav_encode_compressed(7, 1, 8000, 8, 1, codes, 800)
    spb = (256 - 4) * 2 + 1
    ima = multimodal.wav_encode_compressed(
        0x11, 1, 8000, 4, 256,
        int(900).to_bytes(2, "little", signed=True) + bytes((0, 0))
        + b"\x00" * 252,
        spb, samples_per_block=spb,
    )
    df = spark.createDataFrame(
        [("u", g711, "wav"), ("i", ima, "wav"), ("bad", b"RIFFxxxxWAVE", "wav")],
        "media_id string, bytes binary, fmt string",
    )
    out = {r["media_id"]: r["audio"] for r in multimodal.decode_audio(df).collect()}
    assert out["u"]["ok"] and out["u"]["peak"] == a
    assert out["u"]["n_samples"] == 800 and out["u"]["zero_crossings"] == 799
    assert out["i"]["ok"] and out["i"]["peak"] == 900
    assert out["i"]["n_samples"] == spb and out["i"]["zero_crossings"] == 0
    assert out["bad"]["ok"] is False


def test_orient_ops_dihedral_group():
    """The eight EXIF orientation transforms: each upright op undoes
    its distortion (stored = distort(upright) -> op(stored) ==
    upright), on a non-square array so dimension swaps are exercised."""
    import numpy as np

    from mechaml_spark import multimodal

    rng = np.random.default_rng(3)
    up = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    for tag in range(1, 9):
        stored = multimodal.ORIENT_DISTORT[tag](up)
        if tag in (5, 6, 7, 8):
            assert stored.shape == (10, 6, 3)  # rotated/transposed
        back = multimodal._ORIENT_OPS[tag](stored)
        assert back.shape == up.shape and (back == up).all(), tag


def test_normalize_orientation_spark(spark):
    """Distorted JPEGs with EXIF Orientation 1-8 come back upright,
    dimensions corrected, EXIF baked out; missing-EXIF rows pass as
    tag 1."""
    import numpy as np
    import pandas as pd

    from mechaml_spark import exif, multimodal
    from mechaml_spark.jpeg import jpeg_decode, jpeg_encode

    up = np.empty((16, 16, 3), np.uint8)
    up[:8, :8], up[:8, 8:], up[8:, :8], up[8:, 8:] = 40, 90, 140, 190
    rows = []
    for tag in range(1, 9):
        stored = np.ascontiguousarray(multimodal.ORIENT_DISTORT[tag](up))
        data = exif.jpeg_set_exif(
            jpeg_encode(stored, quality=95),
            exif.exif_payload({"Orientation": tag}),
        )
        rows.append({"tag": tag, "bytes": data})
    rows.append({"tag": 0, "bytes": jpeg_encode(up, quality=95)})  # no EXIF
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        r["tag"]: r["upright"]
        for r in multimodal.normalize_orientation(df).collect()
    }
    for tag in range(1, 9):
        u = got[tag]
        assert u["orientation"] == tag
        assert (u["w"], u["h"]) == (16, 16)
        px = jpeg_decode(bytes(u["bytes"]))
        assert (px == up).all(), tag
        assert exif.exif_parse(bytes(u["bytes"])) == {}
    assert got[0]["orientation"] == 1
    assert (jpeg_decode(bytes(got[0]["bytes"])) == up).all()


def test_area_downsample_and_center_crop_pure():
    import numpy as np
    import pytest

    from mechaml_spark import multimodal

    # floor-mean over 2x2 blocks, exact
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = multimodal.area_downsample(px, 2, 2)
    assert small.shape == (2, 2, 3)
    blk = px[:2, :2].astype(int)
    assert (small[0, 0] == blk.reshape(4, 3).sum(0) // 4).all()
    # asymmetric factors
    assert multimodal.area_downsample(px, 4, 2).shape == (1, 2, 3)
    with pytest.raises(ValueError):
        multimodal.area_downsample(px, 3, 2)  # 4 % 3 != 0
    crop = multimodal.center_crop(px, 2, 2)
    assert (crop == px[1:3, 1:3]).all()
    with pytest.raises(ValueError):
        multimodal.center_crop(px, 8, 2)


def test_thumbnail_images_spark(spark):
    import numpy as np
    import pandas as pd

    from mechaml_spark import imaging, multimodal

    up = np.empty((32, 32, 3), np.uint8)
    up[:16, :16], up[:16, 16:], up[16:, :16], up[16:, 16:] = 10, 20, 30, 40
    rows = [
        {"fmt": fmt, "bytes": imaging.encode(up, fmt)}
        for fmt in ("png", "bmp", "qoi")
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    for r in multimodal.thumbnail_images(df, 2, 2, 8, 8).collect():
        px = imaging.decode(bytes(r["thumb"]), r["fmt"])
        assert px.shape == (8, 8, 3)
        # crop spans all four quadrants
        assert (px[0, 0, 0], px[0, 7, 0], px[7, 0, 0], px[7, 7, 0]) == (
            10, 20, 30, 40,
        )


def test_bilinear_resize_pure():
    """Fixed-point half-pixel-center bilinear: exact on even-slope
    ramps at integer downscale; within 2 of the float reference
    anywhere (1/256 coordinate quantization); bit-reproducible."""
    import numpy as np

    from mechaml_spark.multimodal import bilinear_resize

    yy, xx = np.mgrid[0:16, 0:16]
    for a in (0, 7, 100, 193):
        px = np.empty((16, 16, 3), np.uint8)
        px[...] = (a + 2 * xx + 2 * yy)[..., None]
        out = bilinear_resize(px, 8, 8)
        oy, ox = np.mgrid[0:8, 0:8]
        assert (out[..., 0] == (a + 2 + 4 * (ox + oy)).astype(np.uint8)).all()

    rng = np.random.default_rng(5)
    for (h, w, oh, ow) in [(16, 16, 8, 8), (9, 13, 17, 5), (4, 4, 11, 11),
                           (1, 1, 3, 3), (12, 16, 7, 9)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = bilinear_resize(px, oh, ow).astype(np.float64)
        cy = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
        cx = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
        y0 = np.floor(cy).astype(int); x0 = np.floor(cx).astype(int)
        y1 = np.minimum(y0 + 1, h - 1); x1 = np.minimum(x0 + 1, w - 1)
        fy = (cy - y0)[:, None, None]; fx = (cx - x0)[None, :, None]
        p = px.astype(np.float64)
        top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
        bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
        ref = top * (1 - fy) + bot * fy
        assert np.abs(got - ref).max() <= 2.0, (h, w, oh, ow)
        # deterministic
        assert (bilinear_resize(px, oh, ow) == got.astype(np.uint8)).all()


def test_resize_images_bilinear_spark(spark):
    import numpy as np
    import pandas as pd

    from mechaml_spark import imaging, multimodal

    yy, xx = np.mgrid[0:16, 0:16]
    px = np.empty((16, 16, 3), np.uint8)
    px[...] = (10 + 2 * xx + 2 * yy)[..., None]
    df = spark.createDataFrame(
        pd.DataFrame([{"fmt": "png", "bytes": imaging.png_encode(px)}])
    )
    [r] = multimodal.resize_images(df, 8, 8, method="bilinear").collect()
    out = imaging.decode(bytes(r["resized"]), "png")
    oy, ox = np.mgrid[0:8, 0:8]
    assert (out[..., 0] == (12 + 4 * (ox + oy)).astype(np.uint8)).all()


# --------------------------------------------------- AU + AIFF containers


def test_au_round_trip_pcm16():
    import numpy as np

    from mechaml_spark.multimodal import au_decode, au_encode

    frames = (np.arange(-50, 50, dtype=np.int32) * 100).reshape(-1, 2)
    sr, got = au_decode(au_encode(8000, frames))
    assert sr == 8000 and got.shape == frames.shape
    assert (got == frames).all()


def test_au_mulaw_and_alaw_codes():
    import numpy as np

    from mechaml_spark import multimodal as mm

    cp = mm.g711_ulaw_code(True, 3, 5)
    cn = mm.g711_ulaw_code(False, 3, 5)
    codes = bytes([cp, cn] * 10)
    sr, frames = mm.au_decode(
        mm.au_encode(8000, None, encoding=1, codes=codes)
    )
    a = ((5 * 8 + 132) << 3) - 132
    assert sr == 8000
    assert (np.abs(frames[:, 0]) == a).all()
    # A-law, encoding 27
    cap = mm.g711_alaw_code(True, 2, 7)
    sr, fr = mm.au_decode(
        b".snd" + __import__("struct").pack(">IIIII", 24, 4, 27, 8000, 1)
        + bytes([cap] * 4)
    )
    assert fr.shape == (4, 1) and (fr > 0).all()


def test_au_wide_pcm_and_errors():
    import struct

    import numpy as np
    import pytest

    from mechaml_spark.multimodal import au_decode

    # 24-bit BE: value 0x123456 -> int16 domain 0x1234
    payload = b"\x12\x34\x56" * 3
    data = b".snd" + struct.pack(">IIIII", 24, len(payload), 4, 44100, 1)
    data += payload
    sr, fr = au_decode(data)
    assert sr == 44100 and (fr == 0x1234).all()
    with pytest.raises(ValueError):
        au_decode(b"nope")
    with pytest.raises(NotImplementedError):  # encoding 23 = G.721 ADPCM
        au_decode(b".snd" + struct.pack(">IIIII", 24, 0, 23, 8000, 1))


def test_aiff_round_trips():
    import numpy as np
    import pytest

    from mechaml_spark.multimodal import aiff_decode, aiff_encode

    frames = (np.arange(-30, 30, dtype=np.int32) * 500).reshape(-1, 2)
    for sowt in (False, True):
        sr, got = aiff_decode(aiff_encode(44100, frames, sowt=sowt))
        assert sr == 44100 and (got == frames).all(), sowt
    with pytest.raises(ValueError):
        aiff_decode(b"FORMxxxxWAVE")
    with pytest.raises(NotImplementedError, match="ima4"):
        import struct
        comm = struct.pack(">HIH", 1, 4, 16) + b"\x40\x0e" + b"\xac\x44" + \
            b"\x00" * 6 + b"ima4" + b"\x00\x00"
        body = b"AIFC" + b"COMM" + struct.pack(">I", len(comm)) + comm + \
            b"SSND" + struct.pack(">I", 8) + struct.pack(">II", 0, 0)
        aiff_decode(b"FORM" + struct.pack(">I", len(body)) + body)


def test_f80_sample_rates():
    from mechaml_spark.multimodal import _f80_decode, _f80_encode

    for sr in (8000, 11025, 22050, 44100, 48000, 96000, 1):
        assert _f80_decode(_f80_encode(sr)) == sr
    # the canonical 44100 bytes real AIFFs carry
    assert _f80_decode(b"\x40\x0e\xac\x44\x00\x00\x00\x00\x00\x00") == 44100


def test_decode_audio_stage_au_aiff(spark):
    import numpy as np
    import pandas as pd

    from mechaml_spark import multimodal as mm

    sq = np.where((np.arange(800) // 4) % 2 == 0, 700, -700).astype(
        np.int32
    )[:, None]
    df = spark.createDataFrame(pd.DataFrame([
        {"fmt": "au", "bytes": mm.au_encode(8000, sq)},
        {"fmt": "aiff", "bytes": mm.aiff_encode(8000, sq)},
        {"fmt": "aifc", "bytes": mm.aiff_encode(8000, sq, sowt=True)},
    ]))
    rows = mm.decode_audio(df).select("fmt", "audio.*").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["ok"] and r["sample_rate"] == 8000
        assert r["n_samples"] == 800 and r["peak"] == 700
        assert r["rms_x1000"] == 700000
        assert r["zero_crossings"] == 799 // 4


def test_color_histogram_stage(spark):
    import numpy as np

    from mechaml_spark import imaging, multimodal

    flat = np.full((4, 4, 3), 200, dtype=np.uint8)     # one bin: 3*21=63
    half = np.zeros((4, 4, 3), dtype=np.uint8)         # bins 0 and 63
    half[:, 2:, :] = 255
    df = spark.createDataFrame(
        [
            (0, bytearray(imaging.png_encode(flat)), "png"),
            (1, bytearray(imaging.png_encode(half)), "png"),
            (2, None, "png"),
        ],
        "doc_id long, bytes binary, fmt string",
    )
    got = {
        r["doc_id"]: r["colorhist"]
        for r in multimodal.color_histogram(df).collect()
    }
    assert got[0]["dom_bin"] == 63 and got[0]["dom_milli"] == 1000
    assert got[0]["hist"][63] == 16 and sum(got[0]["hist"]) == 16
    # two equal halves: dominant ties break to the LOWEST bin id
    assert got[1]["dom_bin"] == 0 and got[1]["dom_milli"] == 500
    assert got[1]["hist"][0] == 8 and got[1]["hist"][63] == 8
    assert got[2]["ok"] is False and got[2]["hist"] is None


def test_silence_stats_semantics():
    import numpy as np

    from mechaml_spark import multimodal as mm

    # 3 lead silent, 2 loud, 1 trail silent @ 8kHz, 100ms windows
    win = 800
    sig = np.zeros(6 * win, np.int16)
    sig[3 * win : 5 * win] = np.tile(
        np.array([8000, -8000], np.int16), win
    )
    assert mm.silence_stats(sig, 8000) == (6, 4, 300, 100)
    # ragged 50ms silent tail
    sig2 = np.concatenate([sig, np.zeros(400, np.int16)])
    assert mm.silence_stats(sig2, 8000) == (7, 5, 300, 150)
    # sub-threshold noise still counts as silence; at-threshold not
    noisy = np.full(2 * win, 327, np.int16)
    assert mm.silence_stats(noisy, 8000)[1] == 2
    loud = np.full(2 * win, 328, np.int16)
    assert mm.silence_stats(loud, 8000)[1] == 0
    # all-silent and empty
    assert mm.silence_stats(np.zeros(win, np.int16), 8000) == (
        1, 1, 100, 0
    )
    assert mm.silence_stats(np.zeros(0, np.int16), 8000) == (0, 0, 0, 0)
    # stereo: first channel decides
    st = np.zeros((2 * win, 2), np.int16)
    st[:, 1] = 8000
    assert mm.silence_stats(st, 8000)[1] == 2


def test_posterize_stats_semantics():
    import numpy as np

    from mechaml_spark import imaging as im

    cols = np.arange(16)
    px = np.empty((16, 16, 3), np.uint8)
    px[:, :, :] = (32 * (cols // 2))[None, :, None]
    assert im.posterize_stats(px) == (8, 32)
    two = np.empty((16, 16, 3), np.uint8)
    two[:, :, :] = (20 + 190 * (cols % 2))[None, :, None]
    assert im.posterize_stats(two) == (2, 190)
    ramp = np.arange(256, dtype=np.uint8).reshape(16, 16)
    g = np.stack([ramp] * 3, axis=-1)
    assert im.posterize_stats(g) == (256, 1)
    # single color: step 0 by convention
    assert im.posterize_stats(np.full((4, 4, 3), 9, np.uint8)) == (1, 0)
    # cap
    rng = np.random.RandomState(0)
    big = rng.randint(0, 256, (80, 80, 3)).astype(np.uint8)
    dc, _ = im.posterize_stats(big, cap=100)
    assert dc == 100


def test_patchify_tiling_and_crop(spark):
    """patchify: exact x1000 per-tile means, right/bottom crop on
    non-divisible sizes, zero rows for undecodable payloads."""
    import numpy as np

    from mechaml_spark import imaging, multimodal

    px = np.zeros((10, 13, 3), np.uint8)
    px[:4, :4] = (8, 16, 24)       # tile (0,0)
    px[:4, 4:8] = (100, 0, 50)     # tile (0,1)
    px[4:8, :4] = 7                # tile (1,0)
    # cols 8..12 and rows 8..9 are cropped at patch=4 (13//4=3, 10//4=2)
    px[4:8, 4:8] = (1, 2, 3)
    px[4:8, 8:12] = 9
    px[:4, 8:12] = 5
    df = spark.createDataFrame(
        [(1, imaging.png_encode(px), "png"), (2, b"junk", "png"),
         (3, None, "png")],
        "doc_id long, bytes binary, fmt string",
    )
    rows = {(r["doc_id"], r["patch_row"], r["patch_col"]):
            (r["mean_r"], r["mean_g"], r["mean_b"])
            for r in multimodal.patchify(df, 4).collect()}
    assert len(rows) == 6  # 2x3 grid from doc 1 only
    assert rows[(1, 0, 0)] == (8000, 16000, 24000)
    assert rows[(1, 0, 1)] == (100000, 0, 50000)
    assert rows[(1, 1, 0)] == (7000, 7000, 7000)
    assert rows[(1, 1, 1)] == (1000, 2000, 3000)
    assert rows[(1, 0, 2)] == (5000, 5000, 5000)
    assert rows[(1, 1, 2)] == (9000, 9000, 9000)


def test_patchify_mixed_tile_rounding(spark):
    """Non-flat tile: mean is sum*1000 with round-half-up division."""
    import numpy as np

    from mechaml_spark import imaging, multimodal

    px = np.zeros((4, 4, 3), np.uint8)
    px[0, 0] = (255, 0, 0)  # R sum 255 over 16 px -> (255000+8)//16
    df = spark.createDataFrame(
        [(1, imaging.png_encode(px), "png")],
        "doc_id long, bytes binary, fmt string",
    )
    [r] = multimodal.patchify(df, 4).collect()
    assert r["mean_r"] == (255 * 1000 + 8) // 16 == 15938
    assert r["mean_g"] == 0
