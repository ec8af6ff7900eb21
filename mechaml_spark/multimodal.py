"""Multimodal columns: image/audio/video as opaque binary + typed ops.

Design (training-data pipeline over ~100 TB of media):
  * media stays an opaque ``binary`` column with typed metadata
    (``fmt``, dims, duration) — never exploded to pixels at rest;
  * decode / feature-extract / resize / frame-sample are Arrow-batched
    ``mapInPandas`` stages so pixel work happens per batch inside the
    Python worker and never crosses a shuffle;
  * the PNG/PPM/BMP/GIF/JPEG image paths and the PCM WAV audio path
    are REAL (pure numpy/stdlib codecs: :mod:`mechaml_spark.imaging`,
    :mod:`mechaml_spark.jpeg`, ``wave``); compressed audio and
    non-GIF video need libs absent in-sandbox, so those stages are
    explicit ``NotImplementedError`` stubs (or a deterministic fake
    for frame-sampling) behind the same schema/partitioning — swap
    the codec, keep the plan.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mechaml_spark import imaging

FEATURE_T = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("mean_r", T.LongType()),  # x1000 fixed-point
        T.StructField("mean_g", T.LongType()),
        T.StructField("mean_b", T.LongType()),
        T.StructField("luma_hist", T.ArrayType(T.LongType())),  # 8 bins
    ]
)


def _feature_row(data: bytes | None, fmt: str) -> dict:
    bad = {
        "ok": False, "w": None, "h": None,
        "mean_r": None, "mean_g": None, "mean_b": None, "luma_hist": None,
    }
    if data is None:
        return bad
    try:
        px = imaging.decode(bytes(data), fmt)
    except NotImplementedError:
        raise
    except Exception:
        return bad
    means = px.reshape(-1, 3).mean(axis=0)
    luma = (
        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    ).astype(np.int32)
    hist = np.bincount(np.clip(luma // 32, 0, 7).ravel(), minlength=8)
    return {
        "ok": True,
        "w": int(px.shape[1]),
        "h": int(px.shape[0]),
        "mean_r": int(round(means[0] * 1000)),
        "mean_g": int(round(means[1] * 1000)),
        "mean_b": int(round(means[2] * 1000)),
        "luma_hist": [int(x) for x in hist],
    }


def image_features(
    df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """Append a ``features`` struct (decode + stats per Arrow batch)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", FEATURE_T)]
    )
    cols = df.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["features"] = [
                _feature_row(b, f) for b, f in zip(pdf[bytes_col], pdf[fmt_col])
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def patchify(
    df: DataFrame,
    patch: int,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """ViT-style patch extraction — the tiling stage in front of a
    vision encoder: decode once, split the pixel grid into
    ``patch`` x ``patch`` tiles (excess right/bottom pixels cropped,
    the standard ViT convention), and emit ONE ROW PER PATCH with its
    grid position and exact per-channel mean (x1000 fixed point, the
    repo's cross-engine integer convention).

    Scale posture: decode + tiling happen inside one mapInPandas
    batch (pixels never leave the task); the output rows carry 6
    small integers per patch, so a 100-TB image corpus shuffles
    patch statistics, not pixels.  Undecodable rows yield zero
    patches (crawl-tolerant), matching image_features' ok=False
    convention."""
    out_fields = [df.schema[c] for c in id_cols]
    out_schema = T.StructType(
        list(out_fields) + [
            T.StructField("patch_row", T.IntegerType()),
            T.StructField("patch_col", T.IntegerType()),
            T.StructField("mean_r", T.LongType()),
            T.StructField("mean_g", T.LongType()),
            T.StructField("mean_b", T.LongType()),
        ]
    )
    idc = list(id_cols)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = idc + ["patch_row", "patch_col",
                      "mean_r", "mean_g", "mean_b"]
        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                data = rec[bytes_col]
                if data is None:
                    continue
                try:
                    px = imaging.decode(bytes(data), rec[fmt_col])
                except NotImplementedError:
                    raise
                except Exception:
                    continue
                h, w = px.shape[:2]
                nr, nc = h // patch, w // patch
                if nr == 0 or nc == 0:
                    continue
                tiles = (
                    px[:nr * patch, :nc * patch]
                    .reshape(nr, patch, nc, patch, 3)
                    .astype(np.int64)
                )
                # exact x1000 integer mean per tile (sum*1000 then
                # round-half-up division — reproducible in SQL)
                sums = tiles.sum(axis=(1, 3))
                n = patch * patch
                means = (sums * 1000 + n // 2) // n
                base = [rec[c] for c in idc]
                for r in range(nr):
                    for c in range(nc):
                        rows.append(base + [
                            r, c,
                            int(means[r, c, 0]),
                            int(means[r, c, 1]),
                            int(means[r, c, 2]),
                        ])
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    out_col: str = "resized",
    method: str = "nearest",
) -> DataFrame:
    """Resize (``method='nearest'`` or ``'bilinear'`` — fixed-point
    half-pixel-center bilinear, bit-reproducible), re-encoded in the
    same format.  Real for every repo codec (JPEG re-encodes at
    quality 90); other formats raise (no codecs in-sandbox)."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method {method!r}")
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )
    cols = df.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(data, fmt):
            if data is None:
                return None
            px = imaging.decode(bytes(data), fmt)
            if method == "bilinear":
                return imaging.encode(
                    np.ascontiguousarray(bilinear_resize(px, out_h, out_w)),
                    fmt,
                )
            ys = (np.arange(out_h) * px.shape[0] // out_h).astype(np.int64)
            xs = (np.arange(out_w) * px.shape[1] // out_w).astype(np.int64)
            return imaging.encode(px[ys][:, xs], fmt)

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [
                one(b, f) for b, f in zip(pdf[bytes_col], pdf[fmt_col])
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


EXIF_T = T.StructType(
    [
        T.StructField("has_exif", T.BooleanType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("px_w", T.IntegerType()),
        T.StructField("px_h", T.IntegerType()),
        T.StructField("lat_ref", T.StringType()),
        T.StructField("lat_deg", T.IntegerType()),
        T.StructField("lat_min", T.IntegerType()),
        T.StructField("lat_sec_num", T.LongType()),
        T.StructField("lat_sec_den", T.LongType()),
    ]
)


def _exif_row(data: bytes | None) -> dict:
    from mechaml_spark import exif as _exif

    empty = {f.name: None for f in EXIF_T.fields}
    empty["has_exif"] = False
    if data is None:
        return empty
    try:
        tags = _exif.exif_parse(bytes(data))
    except Exception:
        return empty
    if not tags:
        return empty
    out = dict(empty)
    out["has_exif"] = True
    if "Orientation" in tags:
        out["orientation"] = int(tags["Orientation"])
    out["make"] = tags.get("Make")
    out["model"] = tags.get("Model")
    if "PixelXDimension" in tags:
        out["px_w"] = int(tags["PixelXDimension"])
    if "PixelYDimension" in tags:
        out["px_h"] = int(tags["PixelYDimension"])
    out["lat_ref"] = tags.get("GPSLatitudeRef")
    lat = tags.get("GPSLatitude")
    if lat and len(lat) == 3:
        out["lat_deg"] = int(lat[0][0] // max(lat[0][1], 1))
        out["lat_min"] = int(lat[1][0] // max(lat[1][1], 1))
        out["lat_sec_num"] = int(lat[2][0])
        out["lat_sec_den"] = int(lat[2][1])
    return out


def exif_metadata(
    df: DataFrame, bytes_col: str = "bytes", out_col: str = "exif"
) -> DataFrame:
    """Append an ``exif`` struct parsed from JPEG APP1 bytes
    (:mod:`mechaml_spark.exif`).  Header-only work: the parse stops at
    SOS, so cost is independent of image size — the cheap pre-decode
    metadata pass a 100-TB image table wants (orientation fix-up, size
    filters, GPS presence) before any pixel touches memory."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, EXIF_T)]
    )
    cols = df.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [_exif_row(b) for b in pdf[bytes_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


THUMB_T = T.StructType(
    [
        T.StructField("present", T.BooleanType()),
        T.StructField("tw", T.IntegerType()),
        T.StructField("th", T.IntegerType()),
        T.StructField("mean_px", T.IntegerType()),
    ]
)


def exif_thumbnails(
    df: DataFrame, bytes_col: str = "bytes", out_col: str = "thumb"
) -> DataFrame:
    """Append a ``thumb`` struct: the IFD1 JPEG thumbnail (EXIF 2.3
    §4.6.3) extracted and DECODED (own jpeg codec) — dims + integer
    pixel mean.  The cheap preview path a 100-TB image table wants:
    thumbnails are ~KB where originals are ~MB, so preview features
    (dedup pre-screens, gallery sampling) never touch full pixels.
    Full-size bytes stay in their scan partition — only the struct
    crosses any downstream shuffle."""
    from mechaml_spark import exif as _exif
    from mechaml_spark.jpeg import jpeg_decode

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, THUMB_T)]
    )
    cols = df.columns
    absent = (False, None, None, None)

    def one(data):
        if data is None:
            return absent
        try:
            t = _exif.exif_thumbnail(bytes(data))
        except _exif.ExifError:
            return absent
        if t is None:
            return absent
        px = jpeg_decode(t)
        h, w = px.shape[:2]
        # constant planes decode exactly at q95, so the mean is the
        # plane value; sums stay far below 2^53 so the float mean is
        # exact for any thumbnail our encoder emits
        return (True, int(w), int(h), int(px.mean()))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [one(b) for b in pdf[bytes_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def strip_exif(
    df: DataFrame, bytes_col: str = "bytes", out_col: str = "scrubbed"
) -> DataFrame:
    """Privacy scrub: remove every Exif APP1 segment from JPEG bytes
    (GPS + camera identifiers leave; entropy-coded pixels stay
    byte-identical).  Non-JPEG / already-clean rows pass through
    unchanged; only the segment table is rewritten, never the image
    data, so payload invariants (PSNR, phash) are preserved exactly."""
    from mechaml_spark import exif as _exif

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )
    cols = df.columns

    def one(data):
        if data is None:
            return None
        b = bytes(data)
        try:
            return _exif.exif_strip(b)
        except Exception:
            return b

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [one(b) for b in pdf[bytes_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def bilinear_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with the standard half-pixel-center convention
    (align_corners=False: source coordinate = (dst + 0.5) * scale -
    0.5, edges clamped).  Fixed-point integer arithmetic — weights in
    1/256ths, rounded half-up — so results are bit-reproducible
    across platforms, like every other pixel op in the repo.
    Vectorized numpy; runs inside mapInPandas."""
    h, w = px.shape[:2]
    arr = px.reshape(h, w, -1).astype(np.int64)

    def axis_coords(n_out, n_in):
        # fixed-point source centers in 1/256ths of a pixel
        c = ((2 * np.arange(n_out, dtype=np.int64) + 1) * n_in * 256) // (
            2 * n_out
        ) - 128
        c = np.clip(c, 0, (n_in - 1) * 256)
        i0 = c // 256
        frac = c - i0 * 256
        i1 = np.minimum(i0 + 1, n_in - 1)
        return i0, i1, frac

    y0, y1, fy = axis_coords(out_h, h)
    x0, x1, fx = axis_coords(out_w, w)
    fy = fy[:, None, None]
    fx = fx[None, :, None]
    top = arr[y0][:, x0] * (256 - fx) + arr[y0][:, x1] * fx
    bot = arr[y1][:, x0] * (256 - fx) + arr[y1][:, x1] * fx
    out = (top * (256 - fy) + bot * fy + 32768) // 65536
    return np.clip(out, 0, 255).astype(np.uint8).reshape(
        out_h, out_w, *px.shape[2:]
    )


def area_downsample(px: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Exact integer box-filter downsample by (fy, fx): each output
    pixel is the floor-mean of its fy x fx block (the standard
    thumbnail filter, deterministic across platforms).  Dimensions
    must divide evenly — loud failure otherwise."""
    h, w = px.shape[:2]
    if h % fy or w % fx:
        raise ValueError(f"{h}x{w} not divisible by {fy}x{fx}")
    acc = (
        px.reshape(h // fy, fy, w // fx, fx, -1)
        .astype(np.uint32)
        .sum(axis=(1, 3))
    )
    return (acc // (fy * fx)).astype(np.uint8)


def center_crop(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Center crop to (out_h, out_w); floor-offset like the common
    training-pipeline transform; loud failure when the crop exceeds
    the image."""
    h, w = px.shape[:2]
    if out_h > h or out_w > w:
        raise ValueError(f"crop {out_h}x{out_w} exceeds image {h}x{w}")
    y0 = (h - out_h) // 2
    x0 = (w - out_w) // 2
    return px[y0 : y0 + out_h, x0 : x0 + out_w]


def thumbnail_images(
    df: DataFrame,
    fy: int,
    fx: int,
    crop_h: int,
    crop_w: int,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    out_col: str = "thumb",
) -> DataFrame:
    """Training-data preprocessing chain: decode -> exact area
    downsample by (fy, fx) -> center crop to (crop_h, crop_w) ->
    re-encode in the same format.  One decode per row inside
    mapInPandas; only encoded bytes cross stage boundaries."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )
    cols = df.columns

    def one(data, fmt):
        if data is None:
            return None
        px = imaging.decode(bytes(data), fmt)
        small = area_downsample(px, fy, fx)
        return imaging.encode(
            np.ascontiguousarray(center_crop(small, crop_h, crop_w)), fmt
        )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [
                one(b, f) for b, f in zip(pdf[bytes_col], pdf[fmt_col])
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


_ORIENT_OPS = {
    # EXIF orientation tag -> upright transform of the STORED pixels
    # (TIFF 6.0 / EXIF 2.32 table: 2 mirror-H, 3 rot180, 4 mirror-V,
    # 5 transpose, 6 rotate-90-CW, 7 transverse, 8 rotate-270-CW)
    1: lambda px: px,
    2: lambda px: px[:, ::-1],
    3: lambda px: px[::-1, ::-1],
    4: lambda px: px[::-1, :],
    5: lambda px: np.transpose(px, (1, 0, 2)),
    6: lambda px: np.rot90(px, k=-1),
    7: lambda px: np.transpose(px[::-1, ::-1], (1, 0, 2)),
    8: lambda px: np.rot90(px, k=1),
}

# inverse transforms (stored = distort(upright)); 2/3/4/5/7 are
# self-inverse, 6 and 8 swap
ORIENT_DISTORT = {**_ORIENT_OPS, 6: _ORIENT_OPS[8], 8: _ORIENT_OPS[6]}


def normalize_orientation(
    df: DataFrame,
    bytes_col: str = "bytes",
    out_col: str = "upright",
    quality: int = 95,
) -> DataFrame:
    """Bake the EXIF Orientation tag into the pixels: decode the
    JPEG, apply the upright transform for tags 2-8 (rotations swap
    w/h), re-encode with the orientation metadata gone.  Tag 1 /
    missing EXIF rows re-encode untransformed.  Adds a struct column
    ``out_col``: (orientation, w, h, bytes) where w/h are the
    UPRIGHT dimensions.  Runs per Arrow batch inside mapInPandas —
    encoded bytes in, encoded bytes out, nothing decoded crosses a
    shuffle."""
    from mechaml_spark import exif as _exif
    from mechaml_spark.jpeg import jpeg_decode, jpeg_encode

    out_t = T.StructType(
        [
            T.StructField("orientation", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, out_t)]
    )
    cols = df.columns

    def one(data):
        if data is None:
            return {"orientation": None, "w": None, "h": None, "bytes": None}
        b = bytes(data)
        try:
            tag = int(_exif.exif_parse(b).get("Orientation", 1))
        except Exception:
            tag = 1
        px = jpeg_decode(b)
        up = _ORIENT_OPS.get(tag, _ORIENT_OPS[1])(px)
        return {
            "orientation": tag,
            "w": int(up.shape[1]),
            "h": int(up.shape[0]),
            "bytes": jpeg_encode(np.ascontiguousarray(up), quality=quality),
        }

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [one(b) for b in pdf[bytes_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def dhash64_udf():
    """Arrow-batched perceptual-hash column: (bytes, fmt) -> int64
    dHash (see :func:`mechaml_spark.imaging.dhash64`).  NULL for
    undecodable rows — per-row catch, never a task failure."""
    from pyspark.sql import functions as F

    @F.pandas_udf(T.LongType())
    def _dhash(data: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for b, f in zip(data, fmt):
            if b is None:
                out.append(None)
                continue
            try:
                out.append(imaging.dhash64(imaging.decode(bytes(b), f)))
            except NotImplementedError:
                raise
            except Exception:
                out.append(None)
        return pd.Series(out, dtype="Int64")

    return _dhash


QUALITY_T = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("aspect_milli", T.LongType()),
        T.StructField("brightness_milli", T.LongType()),
        T.StructField("var_milli", T.LongType()),
        T.StructField("lap_var_milli", T.LongType()),
    ]
)


def _quality_row(data: bytes | None, fmt: str) -> dict:
    bad = {f.name: None for f in QUALITY_T.fields}
    bad["ok"] = False
    if data is None:
        return bad
    try:
        px = imaging.decode(bytes(data), fmt)
    except NotImplementedError:
        raise
    except Exception:
        return bad
    h, w = px.shape[:2]
    # Integer BT.601-style luma: weights 77/150/29 sum to 256, so a
    # gray pixel (r=g=b=v) has luma exactly v — what keeps the
    # closed-form oracles exact.
    p = px.astype(np.int64)
    luma = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2]) >> 8
    mean = luma.mean()
    var = luma.var()
    if h >= 3 and w >= 3:
        # 4-neighbour Laplacian on the interior ("valid" region) —
        # no border-padding policy to disagree about.
        lap = (
            luma[:-2, 1:-1] + luma[2:, 1:-1]
            + luma[1:-1, :-2] + luma[1:-1, 2:]
            - 4 * luma[1:-1, 1:-1]
        )
        lap_var = lap.var()
    else:
        lap_var = 0.0
    return {
        "ok": True,
        "w": int(w),
        "h": int(h),
        "aspect_milli": int(w * 1000 // h),
        "brightness_milli": int(round(mean * 1000)),
        "var_milli": int(round(var * 1000)),
        "lap_var_milli": int(round(lap_var * 1000)),
    }


def image_quality(
    df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """Append a ``quality`` struct — the LAION/DataComp-style image
    filter signals a 100-TB image-text pipeline gates on before
    spending embedding compute: size/aspect, brightness (mean integer
    luma), global contrast (luma variance), and sharpness (variance
    of the 4-neighbour Laplacian — the standard blur detector).  All
    x1000 fixed-point ints so downstream thresholds and the DuckDB
    oracles are exact; decode happens once per Arrow batch inside
    mapInPandas and pixels never cross a shuffle."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("quality", QUALITY_T)]
    )
    cols = df.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["quality"] = [
                _quality_row(b, f)
                for b, f in zip(pdf[bytes_col], pdf[fmt_col])
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


FRAME_T = T.StructType(
    [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


KEYFRAME_T = T.StructType(
    [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("diff_milli", T.LongType()),
        T.StructField("is_keyframe", T.BooleanType()),
    ]
)


def select_keyframes(
    frames: DataFrame,
    threshold_milli: int = 30_000,
    id_col: str = "media_id",
    frame_col: str = "frame",
    compare_to: str = "prev",
) -> DataFrame:
    """Keyframe selection over sampled frames (the video-dedup gate a
    training pipeline runs before captioning/embedding ticks): per
    media, frames ordered by ``frame_idx``; ``diff_milli`` is the
    mean absolute integer-luma difference vs the reference frame
    x1000 (same 77/150/29 >> 8 luma as :func:`image_quality`, so the
    oracles stay exact); a frame is a keyframe when it is the first
    or its diff >= ``threshold_milli``.

    ``compare_to='prev'`` (default) diffs against the previous
    SAMPLED frame — the standard shot-boundary form, and closed-form
    for constant frames; ``'kept'`` diffs against the last KEPT
    keyframe — the stronger dedup (a slow fade never sneaks through
    N small steps), inherently sequential per media, same plan.

    Plan shape: groupBy(media) + applyInPandas — one shuffle keyed on
    media_id; a video's frames are bounded (sampling already
    decimated), so a group always fits a worker; pixels never cross a
    second shuffle (diff happens where the group lands)."""
    if compare_to not in ("prev", "kept"):
        raise ValueError(f"unknown compare_to {compare_to!r}")
    id_field = [f for f in frames.schema.fields if f.name == id_col][0]
    out_schema = T.StructType([id_field] + list(KEYFRAME_T.fields))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("frame_idx")
        rows = []
        ref_luma = None
        for _, r in pdf.iterrows():
            px = imaging.decode(bytes(r[frame_col]), "png")
            p = px.astype(np.int64)
            luma = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2]) >> 8
            if ref_luma is None or luma.shape != ref_luma.shape:
                # first frame, or a mid-stream canvas-size change
                # (container edit): always a cut
                diff = None
                keep = True
            else:
                diff = int(round(np.abs(luma - ref_luma).mean() * 1000))
                keep = diff >= threshold_milli
            if ref_luma is None or keep or compare_to == "prev":
                ref_luma = luma
            rows.append(
                {
                    id_col: r[id_col],
                    "frame_idx": int(r["frame_idx"]),
                    "ts_ms": int(r["ts_ms"]),
                    "diff_milli": diff,
                    "is_keyframe": bool(keep),
                }
            )
        return pd.DataFrame(
            rows, columns=[id_col] + [f.name for f in KEYFRAME_T.fields]
        )

    return frames.groupBy(id_col).applyInPandas(run, schema=out_schema)


# ------------------------------------------------------- MJPEG-in-AVI (RIFF)
# The AVI container is a plain RIFF parse (stdlib struct); with the
# repo's own baseline JPEG codec (mechaml_spark.jpeg) that makes
# MJPEG-in-AVI a REAL video path with zero external deps.  Spec:
# Microsoft "AVI RIFF File Reference" (public), OpenDML extensions not
# required for baseline files.


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + len(payload).to_bytes(4, "little") + payload + pad


def _riff_list(list_type: bytes, payload: bytes, tag: bytes = b"LIST") -> bytes:
    return _riff_chunk(tag, list_type + payload)


def avi_mjpeg_encode(
    frames: list[np.ndarray],
    usec_per_frame: int = 100_000,
    quality: int = 95,
) -> bytes:
    """Minimal spec-valid MJPEG AVI: RIFF('AVI ' hdrl(avih,
    strl(strh,strf)) movi('00dc' JPEG per frame) idx1).  Each frame is
    encoded with the repo's baseline JPEG encoder."""
    import struct

    from mechaml_spark import jpeg

    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape[:2]
    jpgs = [jpeg.jpeg_encode(f, quality=quality) for f in frames]
    n = len(jpgs)
    bufsize = max(len(j) for j in jpgs)
    avih = _riff_chunk(
        b"avih",
        struct.pack(
            "<14I",
            usec_per_frame, 0, 0, 0x10, n, 0, 1, bufsize, w, h, 0, 0, 0, 0
        ),
    )
    strh = _riff_chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I4H",
            0, 0, 0,                      # flags, prio/lang, initial frames
            usec_per_frame, 1_000_000,    # scale, rate (fps = rate/scale)
            0, n, bufsize, 0xFFFFFFFF, 0, # start, length, bufsize, quality, samplesize
            0, 0, w, h,                   # rcFrame
        ),
    )
    strf = _riff_chunk(
        b"strf",
        struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                    w * h * 3, 0, 0, 0, 0),
    )
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi_payload = b""
    idx_entries = []
    for j in jpgs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_payload), len(j)))
        movi_payload += _riff_chunk(b"00dc", j)
    movi = _riff_list(b"movi", movi_payload)
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, sz)
            for off, sz in idx_entries
        ),
    )
    return _riff_list(b"AVI ", hdrl + movi + idx1, tag=b"RIFF")


def _riff_walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [start, end); chunks are word-aligned."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def avi_mjpeg_frames(data: bytes) -> tuple[int, list[bytes]]:
    """Parse an AVI container -> (usec_per_frame, [JPEG bytes per
    frame]).  Raises ``ValueError`` for non-AVI/corrupt bytes and
    ``NotImplementedError`` for a video stream that is not MJPEG
    (the documented in-sandbox codec boundary — the container parse
    is complete, only the codec is gated)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    usec_per_frame: int | None = None
    vids_handler: bytes | None = None
    strf_compression: bytes | None = None
    frames: list[bytes] = []

    def walk_movi(s: int, e: int) -> None:
        for fcc, body, size in _riff_walk(data, s, e):
            if fcc == b"LIST" and data[body:body + 4] == b"rec ":
                walk_movi(body + 4, body + size)
            elif fcc[2:4] in (b"dc", b"db") and size > 0:
                frames.append(data[body:body + size])

    for fcc, body, size in _riff_walk(data, 12, len(data)):
        if fcc != b"LIST":
            continue
        ltype = data[body:body + 4]
        if ltype == b"hdrl":
            for f2, b2, s2 in _riff_walk(data, body + 4, body + size):
                if f2 == b"avih" and s2 >= 4:
                    usec_per_frame = int.from_bytes(data[b2:b2 + 4], "little")
                elif f2 == b"LIST" and data[b2:b2 + 4] == b"strl":
                    sh = dict()
                    for f3, b3, s3 in _riff_walk(data, b2 + 4, b2 + s2):
                        sh[f3] = (b3, s3)
                    if b"strh" in sh and data[sh[b"strh"][0]:sh[b"strh"][0] + 4] == b"vids":
                        if vids_handler is None:
                            vids_handler = data[sh[b"strh"][0] + 4:sh[b"strh"][0] + 8]
                            if b"strf" in sh and sh[b"strf"][1] >= 20:
                                o = sh[b"strf"][0]
                                strf_compression = data[o + 16:o + 20]
        elif ltype == b"movi":
            walk_movi(body + 4, body + size)
    if usec_per_frame is None or usec_per_frame <= 0:
        raise ValueError("AVI without a usable avih header")
    if vids_handler is None:
        raise ValueError("AVI without a video stream")
    codec = (strf_compression or vids_handler).upper()
    if codec not in (b"MJPG", b"JPEG"):
        raise NotImplementedError(
            f"AVI video codec {codec!r} not decodable in-sandbox (only "
            "MJPEG via the repo's baseline JPEG codec); deploy with "
            "ffmpeg/pyav and keep this stage's schema"
        )
    return usec_per_frame, frames


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (PNG bytes).

    REAL for animated WebP (``fmt == 'webp'``:
    :func:`mechaml_spark.webp.webp_decode_frames` — VP8X/ANIM/ANMF
    compositing, alpha blend + dispose-to-background, still WebP =
    one frame), animated GIF (``fmt == 'gif'``: frames decoded via
    :func:`mechaml_spark.imaging.gif_decode_frames`) and animated PNG
    (``fmt == 'apng'``: :func:`mechaml_spark.imaging.apng_decode_frames`
    — full fcTL/fdAT compositing, dispose + blend ops), composited
    canvases sampled at every ``every_ms`` tick using the per-frame
    delays — the frame on display at each tick is emitted;
    zero delays are clamped to 100 ms like real players, so
    all-zero-delay GIFs still sample every frame) and for MJPEG-in-AVI
    (``fmt == 'avi'``: RIFF parse via :func:`avi_mjpeg_frames`, each
    sampled frame decoded with the repo's baseline JPEG decoder,
    constant frame duration from the ``avih`` header).  Undecodable
    GIF/AVI rows yield ZERO frames (per-row catch, never a task
    failure); an AVI whose video codec is NOT MJPEG raises
    NotImplementedError (codec boundary, not data corruption).
    ``fmt == 'fakevid'`` keeps the deterministic fake decoder
    (duration in the first 4 bytes; frame = solid color keyed by
    (media_id, frame_idx)) for codec-free stage tests; any other fmt
    raises NotImplementedError — plug ffmpeg/pyav on a full image."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.StringType())] + list(FRAME_T.fields)
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        def emit(rows, mid, k, ts, canvas):
            rows.append(
                {
                    id_col: mid,
                    "frame_idx": k,
                    "ts_ms": ts,
                    "frame": imaging.png_encode(canvas),
                }
            )

        for pdf in batches:
            rows = []
            for mid, data, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                if fmt in ("gif", "apng", "webp"):
                    if fmt == "gif":
                        decode_frames = imaging.gif_decode_frames
                    elif fmt == "apng":
                        decode_frames = imaging.apng_decode_frames
                    else:
                        from mechaml_spark.webp import webp_decode_frames
                        decode_frames = webp_decode_frames
                    try:
                        frames = decode_frames(bytes(data))
                    except ValueError:
                        continue  # corrupt row: zero frames, task lives
                    # zero delays (the "as fast as possible" encoding)
                    # display for ~100 ms in real players
                    starts = np.cumsum(
                        [0] + [d if d > 0 else 100 for d, _ in frames]
                    )
                    total = int(starts[-1])
                    # PNG-encode each distinct canvas once, not per tick
                    enc_cache: dict = {}
                    for k, ts in enumerate(range(0, max(total, 1), every_ms)):
                        # frame on display at time ts: last start <= ts
                        fi = int(np.searchsorted(starts[1:], ts, "right"))
                        fi = min(fi, len(frames) - 1)
                        if fi not in enc_cache:
                            enc_cache[fi] = imaging.png_encode(frames[fi][1])
                        rows.append(
                            {
                                id_col: mid,
                                "frame_idx": k,
                                "ts_ms": ts,
                                "frame": enc_cache[fi],
                            }
                        )
                elif fmt == "avi":
                    from mechaml_spark import jpeg

                    try:
                        uspf, jpgs = avi_mjpeg_frames(bytes(data))
                    except ValueError:
                        continue  # corrupt row: zero frames, task lives
                    if not jpgs:
                        continue
                    total = len(jpgs) * uspf // 1000  # ms, floor
                    enc_cache = {}
                    for k, ts in enumerate(range(0, max(total, 1), every_ms)):
                        # constant frame duration: frame on display at
                        # ts is floor(ts / (uspf/1000)), capped at last
                        fi = min(ts * 1000 // uspf, len(jpgs) - 1)
                        if fi not in enc_cache:
                            try:
                                px = jpeg.jpeg_decode(jpgs[fi])
                            except ValueError:
                                enc_cache[fi] = None  # bad frame: skip ticks
                            else:
                                enc_cache[fi] = imaging.png_encode(px)
                        if enc_cache[fi] is None:
                            continue
                        rows.append(
                            {
                                id_col: mid,
                                "frame_idx": k,
                                "ts_ms": ts,
                                "frame": enc_cache[fi],
                            }
                        )
                elif fmt == "fakevid":
                    # fake: duration encoded in the first 4 bytes (ms)
                    dur_ms = int.from_bytes(bytes(data[:4]), "big")
                    for k, ts in enumerate(range(0, dur_ms, every_ms)):
                        key = zlib.crc32(f"{mid}:{k}".encode())
                        color = np.full(
                            (4, 4, 3),
                            [(key >> 16) & 255, (key >> 8) & 255, key & 255],
                            dtype=np.uint8,
                        )
                        emit(rows, mid, k, ts, color)
                else:
                    raise NotImplementedError(
                        f"no {fmt!r} video codec in-sandbox; deploy with "
                        "ffmpeg/pyav and keep this stage's schema"
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "ts_ms", "frame"]
            )

    return df.mapInPandas(run, schema=out_schema)


AUDIO_T = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),  # frames per channel
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_x1000", T.LongType()),  # int16-domain RMS, x1000
        T.StructField("peak", T.IntegerType()),  # max |sample|, int16 domain
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit PCM RIFF/WAV from an int16 array shaped (frames,) or
    (frames, channels) — stdlib ``wave``, no audio libs needed."""
    import io
    import wave

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


# --------------------------------------------------- compressed WAV codecs
# G.711 mu-law / A-law (vectorized numpy port of the public CCITT
# reference tables) and IMA/DVI ADPCM (block-based, WAVE_FORMAT tag
# 0x11) — the compressed encodings that actually occur in crawled WAV
# files.  Everything closed-form, zero external deps.

_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
_IMA_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 81, 89, 98, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def g711_ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16-domain linear (CCITT G.711, max 32124)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32)
    t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 0x7)
    return np.where(u & 0x80, 0x84 - t, t - 0x84)


def g711_ulaw_code(positive: bool, exp: int, mant: int) -> int:
    """The mu-law byte whose decode is exactly
    ``(((mant<<3)+0x84)<<exp)-0x84`` (sign per ``positive``)."""
    u = (0 if positive else 0x80) | (exp << 4) | mant
    return (~u) & 0xFF


def g711_alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16-domain linear (CCITT G.711, max 32256)."""
    a = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a >> 4) & 0x7
    mag = np.where(
        seg == 0,
        t + 8,
        (t + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, mag, -mag)


def g711_alaw_code(positive: bool, seg: int, mant: int) -> int:
    """The A-law byte whose decode is exactly the segment/mantissa
    magnitude (seg 0: ``(mant<<4)+8``; else ``((mant<<4)+0x108) <<
    (seg-1)``), sign per ``positive``."""
    a = (0x80 if positive else 0) | (seg << 4) | mant
    return a ^ 0x55


def ima_adpcm_decode(
    payload: bytes, n_channels: int, block_align: int
) -> np.ndarray:
    """IMA/DVI ADPCM blocks -> int16 samples shaped (frames, channels).

    Standard block layout: a 4-byte header per channel (int16
    predictor = the block's first sample, verbatim; uint8 step index;
    reserved), then nibble data interleaved in 4-byte groups per
    channel, low nibble first.  Sequential state machine per the
    public IMA spec — runs per row inside mapInPandas, never crosses
    a shuffle."""
    nch = max(1, n_channels)
    out: list[list[int]] = [[] for _ in range(nch)]
    hdr = 4 * nch
    if block_align < hdr:
        raise ValueError("IMA ADPCM block_align smaller than header")
    for bpos in range(0, len(payload) - hdr + 1, block_align):
        block = payload[bpos:bpos + block_align]
        preds, idxs = [], []
        for c in range(nch):
            o = 4 * c
            pred = int.from_bytes(block[o:o + 2], "little", signed=True)
            idx = min(max(block[o + 2], 0), 88)
            preds.append(pred)
            idxs.append(idx)
            out[c].append(pred)
        data = block[hdr:]
        for g in range(0, len(data) - 4 * nch + 1, 4 * nch):
            for c in range(nch):
                for byte in data[g + 4 * c:g + 4 * c + 4]:
                    for nib in (byte & 0xF, byte >> 4):
                        step = _IMA_STEP[idxs[c]]
                        vpdiff = step >> 3
                        if nib & 1:
                            vpdiff += step >> 2
                        if nib & 2:
                            vpdiff += step >> 1
                        if nib & 4:
                            vpdiff += step
                        p = preds[c] + (-vpdiff if nib & 8 else vpdiff)
                        p = max(-32768, min(32767, p))
                        preds[c] = p
                        out[c].append(p)
                        idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX[nib]))
    return np.array(out, dtype=np.int32).T


def ima_adpcm_encode(
    samples: np.ndarray, block_align: int = 256
) -> tuple[bytes, int]:
    """int16 samples shaped (frames,) or (frames, channels) -> (IMA
    ADPCM payload, samples_per_block).  Standard quantizer (the exact
    inverse state machine of :func:`ima_adpcm_decode`); final partial
    block is zero-nibble padded."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    spb = (block_align - 4 * nch) * 2 // nch + 1
    payload = bytearray()
    for b0 in range(0, n, spb):
        blk = arr[b0:b0 + spb]
        idxs = [0] * nch
        preds = [int(blk[0, c]) for c in range(nch)]
        for c in range(nch):
            payload += int(preds[c]).to_bytes(2, "little", signed=True)
            payload += bytes((idxs[c], 0))
        nibbles: list[list[int]] = [[] for _ in range(nch)]
        for c in range(nch):
            for s in blk[1:, c]:
                step = _IMA_STEP[idxs[c]]
                delta = int(s) - preds[c]
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                vpdiff = step >> 3
                if nib & 1:
                    vpdiff += step >> 2
                if nib & 2:
                    vpdiff += step >> 1
                if nib & 4:
                    vpdiff += step
                p = preds[c] + (-vpdiff if nib & 8 else vpdiff)
                preds[c] = max(-32768, min(32767, p))
                idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX[nib]))
                nibbles[c].append(nib)
        for c in range(nch):  # zero-pad to fill the block's nibble area
            nibbles[c] += [0] * ((spb - 1) - len(nibbles[c]))
        for g in range(0, spb - 1, 8):
            for c in range(nch):
                for j in range(g, g + 8, 2):
                    lo = nibbles[c][j] if j < len(nibbles[c]) else 0
                    hi = nibbles[c][j + 1] if j + 1 < len(nibbles[c]) else 0
                    payload.append(lo | (hi << 4))
    return bytes(payload), spb


def wav_encode_compressed(
    fmt_tag: int,
    n_channels: int,
    sample_rate: int,
    bits_per_sample: int,
    block_align: int,
    payload: bytes,
    n_frames: int,
    samples_per_block: int | None = None,
) -> bytes:
    """RIFF/WAVE container for a non-PCM payload (mu-law tag 7, A-law
    tag 6, IMA ADPCM tag 0x11): fmt chunk with cbSize extension, fact
    chunk (required for compressed formats), data chunk."""
    import struct

    extra = (
        b"" if samples_per_block is None
        else struct.pack("<H", samples_per_block)
    )
    byte_rate = sample_rate * block_align // max(
        1, samples_per_block or 1
    ) if samples_per_block else sample_rate * n_channels * bits_per_sample // 8
    fmt_body = struct.pack(
        "<HHIIHH", fmt_tag, n_channels, sample_rate, byte_rate,
        block_align, bits_per_sample,
    ) + struct.pack("<H", len(extra)) + extra
    chunks = (
        _riff_chunk(b"fmt ", fmt_body)
        + _riff_chunk(b"fact", struct.pack("<I", n_frames))
        + _riff_chunk(b"data", payload)
    )
    return _riff_list(b"WAVE", chunks, tag=b"RIFF")


def _wav_decode_compressed(data: bytes) -> tuple[int, np.ndarray]:
    """Manual RIFF/WAVE parse for format tags stdlib ``wave`` refuses:
    dispatch mu-law / A-law / IMA ADPCM; anything else is a codec
    boundary (NotImplementedError), not corruption."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = payload = None
    fact = None
    for fcc, body, size in _riff_walk(data, 12, len(data)):
        if fcc == b"fmt ":
            fmt = data[body:body + size]
        elif fcc == b"data":
            payload = data[body:body + size]
        elif fcc == b"fact" and size >= 4:
            fact = int.from_bytes(data[body:body + 4], "little")
    if fmt is None or len(fmt) < 16 or payload is None:
        raise ValueError("WAVE without fmt/data chunks")
    tag = int.from_bytes(fmt[0:2], "little")
    nch = max(1, int.from_bytes(fmt[2:4], "little"))
    sr = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    if tag == 7:
        arr = g711_ulaw_decode(np.frombuffer(payload, dtype=np.uint8))
    elif tag == 6:
        arr = g711_alaw_decode(np.frombuffer(payload, dtype=np.uint8))
    elif tag == 0x11:
        frames = ima_adpcm_decode(payload, nch, block_align)
        if fact is not None:
            frames = frames[:fact]
        return sr, frames
    else:
        raise NotImplementedError(
            f"WAV format tag 0x{tag:x} not decodable in-sandbox (PCM, "
            "G.711 mu-law/A-law, IMA ADPCM are real); deploy with "
            "soundfile and keep this stage's schema"
        )
    frames = arr[: (len(arr) // nch) * nch].reshape(-1, nch)
    if fact is not None:
        frames = frames[:fact]
    return sr, frames


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAV -> (sample_rate, int32 samples shaped
    (frames, channels), int16-domain).  Handles 8/16/24/32-bit PCM —
    everything stdlib ``wave`` can read (24-bit via a packed-3-byte
    unpack; 24/32-bit are truncated to the int16 domain) — plus the
    compressed encodings G.711 mu-law (tag 7), A-law (tag 6), and IMA
    ADPCM (tag 0x11) via the manual parser; other compressed tags
    raise NotImplementedError (codec boundary)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except wave.Error:
        return _wav_decode_compressed(data)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif sw == 1:  # 8-bit WAV is unsigned; rescale to int16 domain
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128) * 256
    elif sw == 3:  # packed little-endian 24-bit -> int16 domain
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        arr = ((v ^ 0x800000) - 0x800000) >> 8  # sign-extend, to 16-bit
    elif sw == 4:
        arr = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int32)
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return sr, arr.reshape(-1, nch)


def _pcm_be_to_int16_domain(payload: bytes, bits: int) -> np.ndarray:
    """Big-endian signed PCM -> int32 in the int16 domain (the repo's
    audio-feature domain; wider widths truncate like the WAV path)."""
    if bits == 8:  # AIFF/AU 8-bit is SIGNED (unlike RIFF/WAV)
        return np.frombuffer(payload, np.int8).astype(np.int32) * 256
    if bits == 16:
        return np.frombuffer(payload, ">i2").astype(np.int32)
    if bits == 24:
        b = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        v = (
            (b[:, 0].astype(np.int32) << 16)
            | (b[:, 1].astype(np.int32) << 8)
            | b[:, 2].astype(np.int32)
        )
        return ((v ^ 0x800000) - 0x800000) >> 8
    if bits == 32:
        return (np.frombuffer(payload, ">i4") >> 16).astype(np.int32)
    raise ValueError(f"unsupported PCM sample size {bits}")


def au_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Sun/NeXT .au (audio/basic) -> (sample_rate, int32 frames,
    int16-domain).  Big-endian header; encodings 1 (G.711 mu-law,
    the RFC 2046 audio/basic payload), 2/3/4/5 (8/16/24/32-bit
    signed linear PCM) and 27 (A-law) decode; anything else raises
    NotImplementedError (codec boundary)."""
    if len(data) < 24 or data[:4] != b".snd":
        raise ValueError("not a Sun AU stream")
    offset, size, enc, sr, nch = struct.unpack(">IIIII", data[4:24])
    if offset < 24 or nch < 1:
        raise ValueError("bad AU header")
    payload = (
        data[offset:]
        if size == 0xFFFFFFFF
        else data[offset : offset + size]
    )
    if enc == 1:
        arr = g711_ulaw_decode(np.frombuffer(payload, np.uint8))
    elif enc == 27:
        arr = g711_alaw_decode(np.frombuffer(payload, np.uint8))
    elif enc in (2, 3, 4, 5):
        arr = _pcm_be_to_int16_domain(payload, 8 * (enc - 1))
    else:
        raise NotImplementedError(
            f"AU encoding {enc} not available in-sandbox (mu-law/A-law/"
            "linear PCM are real); plug a real codec on a full image"
        )
    usable = (arr.size // nch) * nch
    return int(sr), arr[:usable].reshape(-1, nch)


def au_encode(
    sr: int, frames: np.ndarray, encoding: int = 3,
    codes: bytes | None = None, n_channels: int | None = None,
) -> bytes:
    """Fixture writer: 16-bit linear PCM from ``frames`` (encoding 3)
    or raw ``codes`` bytes for companded encodings (1/27)."""
    if codes is not None:
        payload, nch = codes, n_channels or 1
    elif encoding == 3:
        payload = frames.astype(">i2").tobytes()
        nch = frames.shape[1] if frames.ndim == 2 else 1
    else:
        raise ValueError("au_encode writes PCM16 or raw codes")
    return (
        b".snd"
        + struct.pack(">IIIII", 24, len(payload), encoding, sr, nch)
        + payload
    )


def _f80_decode(b: bytes) -> int:
    """80-bit IEEE 754 extended (AIFF sample rate) -> int Hz."""
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0
    val = mant * 2.0 ** (exp - 16383 - 63)
    return int(round(-val if b[0] & 0x80 else val))


def _f80_encode(n: int) -> bytes:
    if n <= 0:
        return b"\x00" * 10
    e = n.bit_length() - 1
    mant = n << (63 - e)
    return struct.pack(">H", 16383 + e) + mant.to_bytes(8, "big")


def aiff_decode(data: bytes) -> tuple[int, np.ndarray]:
    """AIFF / AIFF-C -> (sample_rate, int32 frames, int16-domain).
    IFF big-endian walk: COMM (channels, frames, bits, 80-bit-float
    rate [+ AIFC compression fourcc]) + SSND.  PCM 8 (signed)/16/24/
    32-bit; AIFC 'NONE' (BE) and 'sowt' (little-endian 16-bit, the
    Mac-era variant real crawls contain) decode; other compressors
    raise NotImplementedError."""
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (
        b"AIFF", b"AIFC",
    ):
        raise ValueError("not an AIFF stream")
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    nch = bits = sr = None
    comp = b"NONE"
    ssnd = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"COMM":
            nch, _nf, bits = struct.unpack(">HIH", body[:8])
            sr = _f80_decode(body[8:18])
            if is_aifc and len(body) >= 22:
                comp = body[18:22]
        elif tag == b"SSND":
            off, _block = struct.unpack(">II", body[:8])
            ssnd = body[8 + off :]
    if nch is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND")
    if comp == b"sowt":
        if bits != 16:
            raise ValueError("AIFC sowt must be 16-bit")
        arr = np.frombuffer(ssnd, "<i2").astype(np.int32)
    elif comp == b"NONE":
        arr = _pcm_be_to_int16_domain(ssnd, bits)
    else:
        raise NotImplementedError(
            f"AIFC compression {comp!r} not available in-sandbox; "
            "plug a real codec on a full image"
        )
    usable = (arr.size // nch) * nch
    return int(sr), arr[:usable].reshape(-1, nch)


def aiff_encode(
    sr: int, frames: np.ndarray, sowt: bool = False
) -> bytes:
    """Fixture writer: 16-bit AIFF (big-endian) or AIFC 'sowt'."""
    if frames.ndim == 1:
        frames = frames[:, None]
    nf, nch = frames.shape
    payload = frames.astype("<i2" if sowt else ">i2").tobytes()
    if sowt:
        comm_body = (
            struct.pack(">HIH", nch, nf, 16) + _f80_encode(sr)
            + b"sowt" + b"\x05not_c\x00"  # pascal-string compressor name
        )
    else:
        comm_body = struct.pack(">HIH", nch, nf, 16) + _f80_encode(sr)
    comm = b"COMM" + struct.pack(">I", len(comm_body)) + comm_body
    if len(comm_body) & 1:
        comm += b"\x00"
    ssnd_body = struct.pack(">II", 0, 0) + payload
    ssnd = b"SSND" + struct.pack(">I", len(ssnd_body)) + ssnd_body
    if len(ssnd_body) & 1:
        ssnd += b"\x00"
    if sowt:
        fver = b"FVER" + struct.pack(">II", 4, 0xA2805140)
        body = b"AIFC" + fver + comm + ssnd
    else:
        body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def _audio_row(data: bytes | None, fmt: str) -> dict:
    bad = {
        "ok": False, "sample_rate": None, "n_channels": None,
        "n_samples": None, "duration_ms": None, "rms_x1000": None,
        "peak": None, "zero_crossings": None,
    }
    if fmt is None:
        return bad  # missing format metadata = bad row, not a stage kill
    decoders = {
        "wav": wav_decode,
        "au": au_decode, "snd": au_decode,
        "aiff": aiff_decode, "aif": aiff_decode, "aifc": aiff_decode,
    }
    if fmt not in decoders:
        raise NotImplementedError(
            f"no {fmt!r} audio codec in-sandbox (PCM/G.711/ADPCM WAV, "
            "Sun AU, AIFF are real); deploy with soundfile/librosa "
            "and keep this stage's schema"
        )
    if data is None:
        return bad
    try:
        sr, frames = decoders[fmt](bytes(data))
    except NotImplementedError:
        raise
    except Exception:
        return bad
    ch0 = frames[:, 0].astype(np.float64)
    n = frames.shape[0]
    rms = float(np.sqrt(np.mean(ch0 * ch0))) if n else 0.0
    nonneg = ch0 >= 0
    return {
        "ok": True,
        "sample_rate": int(sr),
        "n_channels": int(frames.shape[1]),
        "n_samples": int(n),
        "duration_ms": int(n * 1000 // sr) if sr else None,
        "rms_x1000": int(round(rms * 1000)),
        "peak": int(np.max(np.abs(frames[:, 0]))) if n else 0,
        "zero_crossings": int(np.sum(nonneg[1:] != nonneg[:-1])),
    }


def decode_audio(
    df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """Audio decode + feature stage: appends an ``audio`` struct
    (sample_rate / channels / duration / int16-domain RMS / peak /
    zero-crossings) per Arrow batch.  REAL for PCM WAV (stdlib
    ``wave`` — 8/16/32-bit, any channel count); other KNOWN formats
    raise NotImplementedError behind the same schema (the explicit
    stub contract, same as the image/video codecs).  Undecodable
    bytes and NULL fmt yield ``ok=false`` rows — per-row catch, never
    a task failure.  ALL features (rms/peak/zero-crossings) are
    computed on channel 0; PCM never crosses a shuffle."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("audio", AUDIO_T)]
    )
    cols = df.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["audio"] = [
                _audio_row(b, f) for b, f in zip(pdf[bytes_col], pdf[fmt_col])
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


# ------------------------------------------------------- color histogram

COLORHIST_T = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("hist", T.ArrayType(T.LongType())),  # 64 bins
        T.StructField("dom_bin", T.IntegerType()),
        T.StructField("dom_milli", T.LongType()),  # dominant fraction x1000
    ]
)


def _colorhist_row(data: bytes | None, fmt: str) -> dict:
    bad = {"ok": False, "n_px": None, "hist": None,
           "dom_bin": None, "dom_milli": None}
    if data is None:
        return bad
    try:
        px = imaging.decode(bytes(data), fmt)
    except NotImplementedError:
        raise
    except Exception:
        return bad
    bins = (
        (px[..., 0].astype(np.int64) >> 6) * 16
        + (px[..., 1].astype(np.int64) >> 6) * 4
        + (px[..., 2].astype(np.int64) >> 6)
    ).ravel()
    hist = np.bincount(bins, minlength=64)
    dom = int(np.argmax(hist))  # ties -> lowest bin id (pinned)
    n = int(bins.size)
    return {
        "ok": True,
        "n_px": n,
        "hist": [int(x) for x in hist],
        "dom_bin": dom,
        "dom_milli": int(hist[dom]) * 1000 // n,
    }


def color_histogram(
    df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """Append a ``colorhist`` struct: 64-bin quantized RGB histogram
    (2 bits per channel — bin = (r>>6)*16 + (g>>6)*4 + (b>>6)),
    dominant bin (ties break to the LOWEST bin id, pinned so the
    result is engine-portable), and the dominant fraction in exact
    x1000 fixed-point.  The LAION/DataComp-style color gate: a
    dom_milli near 1000 is a flat/monochrome image not worth caption
    or embedding spend; the histogram is the cheap palette signature
    for near-dup blocking.

    Same scale posture as ``image_features``: decode happens inside
    mapInPandas per Arrow batch, pixels never shuffle — only the
    64-long histogram leaves the task."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("colorhist", COLORHIST_T)]
    )
    cols = df.columns

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["colorhist"] = [
                _colorhist_row(b, f)
                for b, f in zip(pdf[bytes_col], pdf[fmt_col])
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# Aspect-ratio bucketing (SDXL / kohya-style training prep)
# ---------------------------------------------------------------------------

# Pinned bucket table: 64-multiple (w, h) shapes around a 1024x1024
# budget, the published SDXL multi-aspect training set (paper app. I /
# kohya bucketing).  Order is the tie-break: equal-distance images go
# to the LOWER index.
ASPECT_BUCKETS = (
    (512, 2048), (576, 1792), (640, 1536), (704, 1408), (768, 1344),
    (832, 1216), (896, 1152), (1024, 1024), (1152, 896), (1216, 832),
    (1344, 768), (1408, 704), (1536, 640), (1792, 576), (2048, 512),
)


def aspect_bucket_expr(w_col: str, h_col: str):
    """Nearest-aspect bucket assignment as ONE whole-stage-codegen
    expression (no UDF, no shuffle): per bucket the exact-integer
    quantized ratio distance ``abs(w*bh - h*bw) * 10^6 div (h*bw)``
    (the |w/h - bw/bh| / (bw/bh) relative error in micro units, all
    64-bit-safe), then ``array_min`` over ``struct(d, i, w, h)`` whose
    lexicographic struct order IS the pinned (distance, index)
    tie-break.  Truncating ``div`` on non-negative operands matches
    DuckDB's floor ``//`` bit-for-bit, so the oracle can replay the
    same arithmetic.  Returns a struct column ``(d, i, w, h)``."""
    buckets = ", ".join(
        f"struct({i} as i, {bw} as w, {bh} as h)"
        for i, (bw, bh) in enumerate(ASPECT_BUCKETS)
    )
    return F.expr(
        f"array_min(transform(array({buckets}), b -> struct("
        f"(abs(cast({w_col} as bigint) * b.h - cast({h_col} as bigint) * b.w)"
        f" * 1000000) div (cast({h_col} as bigint) * b.w) as d, "
        f"b.i as i, b.w as w, b.h as h)))"
    )


def silence_stats(
    samples: np.ndarray,
    sample_rate: int,
    window_ms: int = 100,
    threshold: int = 328,
) -> tuple[int, int, int, int]:
    """Silence segmentation in exact integer arithmetic — the
    trim-and-gate stage of an audio corpus (drop dead air, measure
    lead/trail silence before cutting clips).  The first channel is
    split into fixed ``window_ms`` windows (the ragged tail window
    counts too); a window is SILENT when its mean absolute int16
    amplitude (floor division) is below ``threshold`` (default 328
    ~= 1% of full scale, the common -40 dBFS-ish gate).  Returns
    ``(n_windows, n_silent, lead_ms, trail_ms)`` where lead/trail
    are whole silent windows x window_ms (a partial trailing window
    reports its true residual length)."""
    ch0 = samples[:, 0].astype(np.int64) if samples.ndim == 2 else (
        samples.astype(np.int64)
    )
    n = len(ch0)
    win = max(1, sample_rate * window_ms // 1000)
    n_windows = -(-n // win) if n else 0
    flags = []
    for i in range(n_windows):
        seg = ch0[i * win : (i + 1) * win]
        flags.append(int(np.abs(seg).sum()) // len(seg) < threshold)
    n_silent = sum(flags)
    lead = 0
    while lead < n_windows and flags[lead]:
        lead += 1
    trail = 0
    while trail < n_windows - lead and flags[n_windows - 1 - trail]:
        trail += 1

    def win_len_ms(idx: int) -> int:
        size = min(win, n - idx * win)
        return size * 1000 // sample_rate

    lead_ms = sum(win_len_ms(i) for i in range(lead))
    trail_ms = sum(win_len_ms(n_windows - 1 - i) for i in range(trail))
    return n_windows, n_silent, lead_ms, trail_ms
