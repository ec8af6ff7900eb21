"""Deterministic synthetic crawl corpus (seed-keyed, no network).

One pure function — :func:`server_response` — defines the entire
"web": the Spark fetch stage materializes it as a DataFrame
(distributed generation via ``spark.range`` + ``mapInPandas``) and
the sequential oracle calls it directly, so both sides see
byte-identical content by construction (FIXTURES.md §5).

Topology per (host i, page j), all arithmetic — no RNG in page
content, so the corpus scales to any size without coordination:
  * in-host links to pages (j+k+1) %% P in mixed representations
    (relative, absolute, ./ + fragment, duplicate) — exercises
    resolution + canonicalization + dedup;
  * one cross-host link to host (i+j+1) %% H;
  * pages with j %% 3 == 0 link to a redirect entry ``/r{j}``
    (301 for even j, 302 for odd) landing on ``/p{(j+5) %% P}``;
  * host 0 page 1 links to a 7-hop redirect chain ``/chain0..6`` —
    the reference stops after max_redirect=5 hops and returns the
    3xx response as-is (src/agent.ml:65, 93-97);
  * a ``/blocked/b{j}`` link everywhere; robots.txt disallows
    ``/blocked`` on every host;
  * pages with j %% 5 == 2 carry ``<base href=".../basedir/">`` so
    their relative links 404 — exercises base-uri override + error
    rows;
  * every 200 response sets a cookie; redirect hops set their own
    (per-hop jar update, src/agent.ml:84-88).

Image payloads: ``images.test/im/{image_id}.png``; pixels from a
crc32-keyed numpy PRNG per image_id; caption embedded as the img
``alt``.  The images table carries (image_id, bytes, w, h, fmt,
caption, phash=dhash64(pixels) — a perceptual hash).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mechaml_spark import imaging


@dataclass(frozen=True)
class CorpusSpec:
    n_hosts: int = 4
    pages_per_host: int = 12
    links_per_page: int = 4
    images_per_page: int = 2
    img_w: int = 16
    img_h: int = 12
    seed: int = 42
    # opt-in payload format mix (plain PNG / Adam7 PNG / baseline JPEG
    # / progressive JPEG by image-id hash) — default off so bench
    # corpora stay byte-identical across rounds; the crawl payload
    # invariant (lossless bit-exact, lossy PSNR >= 40 dB) is format-
    # agnostic and tested with the mix on
    img_fmt_mix: bool = False

    @property
    def hosts(self) -> list[str]:
        return [f"host{i}.test" for i in range(self.n_hosts)]


def page_url(spec: CorpusSpec, i: int, j: int) -> str:
    return f"http://host{i}.test/p{j}"


def image_id(spec: CorpusSpec, i: int, j: int, k: int) -> str:
    return f"img-{i}-{j}-{k}"


def n_images(spec: CorpusSpec) -> int:
    return spec.n_hosts * spec.pages_per_host * spec.images_per_page


def image_id_of_index(spec: CorpusSpec, idx: int) -> str:
    per_host = spec.pages_per_host * spec.images_per_page
    i, rem = divmod(idx, per_host)
    j, k = divmod(rem, spec.images_per_page)
    return image_id(spec, i, j, k)


def image_ids(spec: CorpusSpec) -> list[str]:
    return [image_id_of_index(spec, i) for i in range(n_images(spec))]


def img_variant(spec: CorpusSpec, iid: str) -> int:
    """0 plain PNG / 1 Adam7 PNG / 2 baseline JPEG / 3 progressive
    JPEG / 4 QOI / 5 lossless WebP (VP8L) / 6 lossy WebP (VP8) —
    deterministic per image id; always 0 with the mix off."""
    if not spec.img_fmt_mix:
        return 0
    return (zlib.crc32(iid.encode()) ^ spec.seed) % 7


def vp8_flat_tokens(spec: CorpusSpec, iid: str) -> tuple:
    """(vy, vu, vv, qi) DC tokens for the variant-6 lossy-WebP
    payload — the in-sandbox VP8 encoder writes flat keyframes, so
    the 'original' pixels ARE the decoded closed form (the payload
    invariant then holds exactly; real lossy round-trip tolerance is
    exercised by the JPEG variants and the libwebp differential
    suite in tests/test_vp8.py)."""
    key = zlib.crc32(iid.encode()) ^ spec.seed
    return ((key >> 3) % 256, (key >> 11) % 200, (key >> 19) % 200,
            (key >> 27) % 128)


def image_pixels(spec: CorpusSpec, iid: str) -> np.ndarray:
    key = zlib.crc32(iid.encode()) ^ spec.seed
    rng = np.random.default_rng(key)
    if img_variant(spec, iid) == 6:
        from mechaml_spark import vp8

        vy, vu, vv, qi = vp8_flat_tokens(spec, iid)
        yv, uv_, vv_ = vp8.webp_lossy_flat_value(vy, vu, vv, qi)
        rgb = vp8.yuv_to_rgb(
            np.full((spec.img_h, spec.img_w), yv, np.uint8),
            np.full(((spec.img_h + 1) // 2, (spec.img_w + 1) // 2),
                    uv_, np.uint8),
            np.full(((spec.img_h + 1) // 2, (spec.img_w + 1) // 2),
                    vv_, np.uint8),
        )
        return rgb
    if img_variant(spec, iid) in (2, 3):
        # JPEG variants get SMOOTH content (linear ramps, no clipping)
        # — random noise is the DCT worst case and would not clear the
        # payload rule's 40 dB at q90; the web's lossy images are
        # natural/smooth, which is what this models
        base = rng.integers(70, 186, 3)
        gx = rng.integers(-2, 3, 3)
        gy = rng.integers(-2, 3, 3)
        yy, xx = np.mgrid[0 : spec.img_h, 0 : spec.img_w]
        return (
            base[None, None, :] + yy[..., None] * gy + xx[..., None] * gx
        ).astype(np.uint8)
    return rng.integers(0, 256, (spec.img_h, spec.img_w, 3), dtype=np.uint8)


def caption_of(iid: str) -> str:
    return f"caption-{iid}"


def _page_html(spec: CorpusSpec, i: int, j: int) -> str:
    P, H = spec.pages_per_host, spec.n_hosts
    parts = [f"<html><head><title>h{i} p{j}</title>"]
    if j % 5 == 2:
        parts.append(f'<base href="http://host{i}.test/basedir/">')
    parts.append("</head><body>")
    for k in range(spec.links_per_page):
        t = (j + k + 1) % P
        style = k % 4
        if style == 0:
            href = f"p{t}"
        elif style == 1:
            href = page_url(spec, i, t)
        elif style == 2:
            href = f"./p{t}#frag{k}"
        else:  # duplicate of k=0's target, absolute form
            href = page_url(spec, i, (j + 1) % P)
        parts.append(f'<a href="{href}">link{k}</a>')
    cross = (i + j + 1) % H
    parts.append(f'<a href="{page_url(spec, cross, j)}">cross</a>')
    if j % 3 == 0:
        parts.append(f'<a href="/r{j}">promo</a>')
    if i == 0 and j == 1:
        parts.append('<a href="/chain0">chain</a>')
    parts.append(f'<a href="/blocked/b{j}">private</a>')
    for k in range(spec.images_per_page):
        iid = image_id(spec, i, j, k)
        parts.append(
            f'<img src="http://images.test/im/{iid}.png" alt="{caption_of(iid)}"/>'
        )
    if j == 0:
        parts.append(
            f'<form id="search" action="/p0" method="get">'
            f'<input type="text" name="q" value="default{i}"/></form>'
        )
    parts.append("</body></html>")
    return "".join(parts)


def robots_rules(spec: CorpusSpec) -> dict[str, list[tuple[bool, str]]]:
    """host -> robots rules as (allow, pattern), RFC 9309 shape."""
    return {h: [(False, "/blocked")] for h in spec.hosts}


def server_response(spec: CorpusSpec, url: str) -> dict | None:
    """The synthetic origin server: url -> response dict
    {status, location, set_cookie(list), body} or None (404)."""
    if not url.startswith("http://"):
        return None
    rest = url[len("http://") :]
    host, _, path = rest.partition("/")
    path = "/" + path
    P = spec.pages_per_host
    if host == "images.test":
        return None  # image bytes come from the images table, not HTML fetch
    if host not in set(spec.hosts):
        return None
    i = int(host[4:].split(".")[0])
    if path == "/robots.txt":
        return {
            "status": 200,
            "location": None,
            "set_cookie": [],
            "body": "User-agent: *\nDisallow: /blocked\n",
        }
    if path.startswith("/p") and path[2:].isdigit():
        j = int(path[2:])
        if j < P:
            return {
                "status": 200,
                "location": None,
                "set_cookie": [f"visited_p{j}=1; Path=/"],
                "body": _page_html(spec, i, j),
            }
        return None
    if path.startswith("/r") and path[2:].isdigit():
        j = int(path[2:])
        if j < P:
            return {
                "status": 301 if j % 2 == 0 else 302,
                "location": page_url(spec, i, (j + 5) % P),
                "set_cookie": [f"redir_r{j}=1; Path=/"],
                "body": "",
            }
        return None
    if i == 0 and path.startswith("/chain") and path[6:].isdigit():
        k = int(path[6:])
        if k < 6:
            return {
                "status": 302,
                "location": f"http://host0.test/chain{k + 1}",
                "set_cookie": [f"chain{k}=1"],
                "body": "",
            }
        if k == 6:
            return {
                "status": 200,
                "location": None,
                "set_cookie": [],
                "body": "<html><body>end of chain</body></html>",
            }
    return None


def n_urls(spec: CorpusSpec) -> int:
    # pages + redirects per host, the chain, plus /robots.txt per host
    return spec.n_hosts * spec.pages_per_host * 2 + 7 + spec.n_hosts


def url_of_index(spec: CorpusSpec, idx: int) -> str:
    """Arithmetic index -> URL mapping so distributed generation never
    materializes the URL list (O(1) per row at any corpus size)."""
    P = spec.pages_per_host
    body = spec.n_hosts * P * 2
    if idx < body:
        i, r = divmod(idx, 2 * P)
        if r < P:
            return page_url(spec, i, r)
        return f"http://host{i}.test/r{r - P}"
    if idx < body + 7:
        return f"http://host0.test/chain{idx - body}"
    return f"http://host{idx - body - 7}.test/robots.txt"


def enumerate_urls(spec: CorpusSpec) -> list[str]:
    return [url_of_index(spec, i) for i in range(n_urls(spec))]


# ------------------------------------------------------------- Spark tables

RESPONSE_T = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("status", T.IntegerType()),
        T.StructField("location", T.StringType()),
        T.StructField("set_cookie", T.ArrayType(T.StringType())),
        T.StructField("body", T.StringType()),
    ]
)


def corpus_df(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """The synthetic web as a DataFrame keyed by canonical URL.

    Distributed generation: ``spark.range`` over the URL index space,
    page HTML built per-partition in Arrow batches — no driver-side
    materialization, scales to arbitrarily large synthetic webs.
    """
    idx = spark.range(n_urls(spec)).repartition(
        max(spark.sparkContext.defaultParallelism, 4)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mechaml_spark import urlkit

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                u = url_of_index(spec, int(i))
                r = server_response(spec, u)
                if r is None:
                    continue
                rows.append(
                    {
                        "url_norm": urlkit.canonicalize(u),
                        "status": r["status"],
                        "location": r["location"],
                        "set_cookie": r["set_cookie"],
                        "body": r["body"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url_norm", "status", "location", "set_cookie", "body"]
            )

    return idx.mapInPandas(gen, schema=RESPONSE_T)


IMAGE_ROW_T = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def images_df(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """Image+caption table per BASELINE.json input_hint.  ``phash`` is
    a real PERCEPTUAL hash (:func:`mechaml_spark.imaging.dhash64` over
    the pixels) — a content hash over the encoded bytes would miss
    re-encodes of the same picture, which is the whole point of the
    column; computed here in the same Arrow batch that already holds
    the pixels, so it costs no extra decode."""
    idx = spark.range(n_images(spec)).repartition(
        max(spark.sparkContext.defaultParallelism, 4)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                iid = image_id_of_index(spec, int(i))
                px = image_pixels(spec, iid)
                v = img_variant(spec, iid)
                if v == 1:
                    data, fmt = imaging.png_encode_ext(px, 2, interlace=1), "png"
                elif v == 2:
                    from mechaml_spark.jpeg import jpeg_encode

                    data, fmt = jpeg_encode(px, quality=90), "jpg"
                elif v == 3:
                    from mechaml_spark.jpeg import jpeg_encode_progressive

                    data, fmt = jpeg_encode_progressive(px, quality=90), "jpg"
                elif v == 4:
                    data, fmt = imaging.qoi_encode(px), "qoi"
                elif v == 5:
                    from mechaml_spark.webp import webp_encode

                    data, fmt = webp_encode(px), "webp"
                elif v == 6:
                    from mechaml_spark.webp import webp_encode_lossy_flat

                    data, fmt = webp_encode_lossy_flat(
                        spec.img_w, spec.img_h,
                        *vp8_flat_tokens(spec, iid),
                    ), "webp"
                else:
                    data, fmt = imaging.png_encode(px), "png"
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": data,
                        "w": spec.img_w,
                        "h": spec.img_h,
                        "fmt": fmt,
                        "caption": caption_of(iid),
                        "phash": imaging.dhash64(px),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                ],
            )

    return idx.mapInPandas(gen, schema=IMAGE_ROW_T)
