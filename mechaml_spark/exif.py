"""EXIF / TIFF-IFD metadata: encode, parse, strip — stdlib ``struct`` only.

Public specs: CIPA DC-008 (Exif 2.32) and TIFF 6.0.  The reference
engine (mechaml) has no EXIF surface — ``save_image`` stores raw bytes
(agent.ml: save_image writes the body verbatim) — so this module is
engine-brief breadth for the image payload axis: a 100-TB crawl
pipeline must read Orientation (display correctness), pixel dimensions
(size filters WITHOUT a full decode), and strip GPS tags (privacy
scrub before the rows land in a training set) with zero external deps.

Everything here is per-row byte work designed to run inside Arrow
batches (``mapInPandas`` / ``pandas_udf``); nothing touches Spark.

Scale posture: an APP1 parse is O(len(header)) — it never reads past
SOS — so orientation/dims/GPS filters cost a few hundred bytes per
image even when the payload is megabytes, and the scan's ``bytes``
column can stay unprojected for metadata-only queries that carry a
separate header-prefix column.
"""

from __future__ import annotations

import struct

__all__ = [
    "exif_payload",
    "exif_parse",
    "jpeg_set_exif",
    "exif_strip",
    "exif_strip_gps",
    "ifd_parse",
]

# TIFF field types we read/write (TIFF 6.0 §2).
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
_BYTE, _ASCII, _SHORT, _LONG, _RATIONAL = 1, 2, 3, 4, 5
_UNDEFINED, _SLONG, _SRATIONAL = 7, 9, 10

# Tag numbers (Exif 2.32 §4.6.4 / §4.6.5 / §4.6.6).
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
TAG_COMPRESSION = 0x0103
TAG_THUMB_OFFSET = 0x0201  # JPEGInterchangeFormat (IFD1)
TAG_THUMB_LENGTH = 0x0202  # JPEGInterchangeFormatLength (IFD1)
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

_IFD0_NAMES = {
    TAG_MAKE: "Make",
    TAG_MODEL: "Model",
    TAG_ORIENTATION: "Orientation",
    TAG_DATETIME: "DateTime",
}
_EXIF_NAMES = {TAG_PIXEL_X: "PixelXDimension", TAG_PIXEL_Y: "PixelYDimension"}
_GPS_NAMES = {
    TAG_GPS_LAT_REF: "GPSLatitudeRef",
    TAG_GPS_LAT: "GPSLatitude",
    TAG_GPS_LON_REF: "GPSLongitudeRef",
    TAG_GPS_LON: "GPSLongitude",
}


class ExifError(ValueError):
    """Malformed EXIF/TIFF structure (loud, typed — never a guess)."""


# --------------------------------------------------------------- encoding


def _pack_value(e: str, ftype: int, value) -> tuple[bytes, int]:
    """Return (payload bytes, count) for one IFD entry value."""
    if ftype == _ASCII:
        raw = value.encode("ascii") + b"\x00"
        return raw, len(raw)
    if ftype == _SHORT:
        vals = value if isinstance(value, (list, tuple)) else [value]
        return struct.pack(f"{e}{len(vals)}H", *vals), len(vals)
    if ftype == _LONG:
        vals = value if isinstance(value, (list, tuple)) else [value]
        return struct.pack(f"{e}{len(vals)}I", *vals), len(vals)
    if ftype == _RATIONAL:
        # value: sequence of (num, den) pairs
        out = b"".join(struct.pack(f"{e}II", n, d) for n, d in value)
        return out, len(value)
    if ftype in (_BYTE, _UNDEFINED):
        return bytes(value), len(value)
    raise ExifError(f"unsupported encode type {ftype}")


def _build_ifd(
    e: str,
    entries: list[tuple[int, int, object]],
    ifd_off: int,
    next_off: int = 0,
) -> tuple[bytes, bytes]:
    """Build one IFD at absolute offset ``ifd_off``: returns
    (ifd bytes incl. next-pointer, overflow value area that must be
    appended immediately after).  ``next_off`` is the next-IFD
    pointer (IFD0 -> IFD1 chaining for thumbnails; 0 = none)."""
    entries = sorted(entries)  # TIFF 6.0: ascending tag order
    n = len(entries)
    head_len = 2 + 12 * n + 4
    overflow = b""
    body = struct.pack(f"{e}H", n)
    for tag, ftype, value in entries:
        payload, count = _pack_value(e, ftype, value)
        if len(payload) <= 4:
            field = payload + b"\x00" * (4 - len(payload))
        else:
            off = ifd_off + head_len + len(overflow)
            field = struct.pack(f"{e}I", off)
            overflow += payload
        body += struct.pack(f"{e}HHI", tag, ftype, count) + field
    body += struct.pack(f"{e}I", next_off)  # next-IFD pointer
    return body, overflow


def exif_payload(
    tags: dict, byte_order: str = "II", thumbnail: bytes | None = None
) -> bytes:
    """Build an APP1 ``Exif\\x00\\x00`` payload (TIFF header + IFD0
    + Exif sub-IFD + GPS sub-IFD [+ IFD1 thumbnail]) from a flat
    ``tags`` dict.

    Recognized keys: Make, Model (str); Orientation (1..8);
    DateTime ("YYYY:MM:DD HH:MM:SS"); PixelXDimension,
    PixelYDimension (int); GPSLatitudeRef/GPSLongitudeRef ("N"/"S"/
    "E"/"W"); GPSLatitude/GPSLongitude ([(num, den)]*3 — deg, min,
    sec rationals).  ``byte_order`` "II" (little) or "MM" (big) —
    both occur in crawled bytes, so both are exercised in tests.

    ``thumbnail``: JPEG bytes embedded the standard way — IFD1
    chained from IFD0's next-pointer with Compression=6 +
    JPEGInterchangeFormat/-Length (EXIF 2.3 §4.6.3), the layout
    every camera writes."""
    if byte_order not in ("II", "MM"):
        raise ExifError(f"byte order {byte_order!r}")
    e = "<" if byte_order == "II" else ">"

    ifd0: list[tuple[int, int, object]] = []
    if "Make" in tags:
        ifd0.append((TAG_MAKE, _ASCII, tags["Make"]))
    if "Model" in tags:
        ifd0.append((TAG_MODEL, _ASCII, tags["Model"]))
    if "Orientation" in tags:
        ifd0.append((TAG_ORIENTATION, _SHORT, int(tags["Orientation"])))
    if "DateTime" in tags:
        ifd0.append((TAG_DATETIME, _ASCII, tags["DateTime"]))

    exif_ifd: list[tuple[int, int, object]] = []
    if "PixelXDimension" in tags:
        exif_ifd.append((TAG_PIXEL_X, _LONG, int(tags["PixelXDimension"])))
    if "PixelYDimension" in tags:
        exif_ifd.append((TAG_PIXEL_Y, _LONG, int(tags["PixelYDimension"])))

    gps_ifd: list[tuple[int, int, object]] = []
    if "GPSLatitudeRef" in tags:
        gps_ifd.append((TAG_GPS_LAT_REF, _ASCII, tags["GPSLatitudeRef"]))
    if "GPSLatitude" in tags:
        gps_ifd.append((TAG_GPS_LAT, _RATIONAL, tags["GPSLatitude"]))
    if "GPSLongitudeRef" in tags:
        gps_ifd.append((TAG_GPS_LON_REF, _ASCII, tags["GPSLongitudeRef"]))
    if "GPSLongitude" in tags:
        gps_ifd.append((TAG_GPS_LON, _RATIONAL, tags["GPSLongitude"]))

    # Layout: header(8) | IFD0+overflow | ExifIFD+overflow | GPS+overflow.
    # Pointer tags need the sub-IFD offsets, which depend on IFD0's own
    # size — IFD0's entry COUNT is known up front, so sizes resolve in
    # one pass per IFD (build with placholder offsets, then rebuild).
    n0 = len(ifd0) + (1 if exif_ifd else 0) + (1 if gps_ifd else 0)
    if n0 == 0 and thumbnail is None:
        raise ExifError("no tags")

    def sized(entries: list[tuple[int, int, object]], off: int) -> int:
        body, ov = _build_ifd(e, entries, off)
        return len(body) + len(ov)

    ifd0_off = 8
    ifd0_full = list(ifd0)
    # Placeholder pointers so the size of IFD0 is final.
    if exif_ifd:
        ifd0_full.append((TAG_EXIF_IFD, _LONG, 0))
    if gps_ifd:
        ifd0_full.append((TAG_GPS_IFD, _LONG, 0))
    exif_off = ifd0_off + sized(ifd0_full, ifd0_off)
    gps_off = exif_off + (sized(exif_ifd, exif_off) if exif_ifd else 0)
    after_gps = gps_off + (sized(gps_ifd, gps_off) if gps_ifd else 0)

    # IFD1 (thumbnail): 3 small-value entries -> fixed 2+36+4 bytes,
    # no overflow; the JPEG bytes follow the IFD directly
    ifd1_off = after_gps if thumbnail is not None else 0
    ifd1: list[tuple[int, int, object]] = []
    if thumbnail is not None:
        thumb_off = ifd1_off + 2 + 12 * 3 + 4
        ifd1 = [
            (TAG_COMPRESSION, _SHORT, 6),
            (TAG_THUMB_OFFSET, _LONG, thumb_off),
            (TAG_THUMB_LENGTH, _LONG, len(thumbnail)),
        ]

    ifd0_final = list(ifd0)
    if exif_ifd:
        ifd0_final.append((TAG_EXIF_IFD, _LONG, exif_off))
    if gps_ifd:
        ifd0_final.append((TAG_GPS_IFD, _LONG, gps_off))

    out = byte_order.encode("ascii") + struct.pack(f"{e}HI", 42, ifd0_off)
    body, ov = _build_ifd(e, ifd0_final, ifd0_off, next_off=ifd1_off)
    out += body + ov
    if exif_ifd:
        body, ov = _build_ifd(e, exif_ifd, exif_off)
        out += body + ov
    if gps_ifd:
        body, ov = _build_ifd(e, gps_ifd, gps_off)
        out += body + ov
    if thumbnail is not None:
        body, ov = _build_ifd(e, ifd1, ifd1_off)
        assert not ov and len(body) == 42
        out += body + thumbnail
    return b"Exif\x00\x00" + out


# ---------------------------------------------------------------- parsing


def ifd_parse(
    tiff: bytes, ifd_off: int, e: str
) -> tuple[dict[int, object], int]:
    """Parse one IFD of a TIFF body: returns ({tag: value}, next_ifd).

    Values decode by type: ASCII -> str (trailing NULs stripped),
    SHORT/LONG/SLONG -> int or list, RATIONAL/SRATIONAL -> (num, den)
    tuples, BYTE/UNDEFINED -> bytes.  Shared by EXIF and the TIFF
    image decoder (imaging.tiff_decode).
    """
    if ifd_off + 2 > len(tiff):
        raise ExifError("IFD offset out of range")
    (n,) = struct.unpack_from(f"{e}H", tiff, ifd_off)
    end = ifd_off + 2 + 12 * n
    if end + 4 > len(tiff):
        raise ExifError("IFD truncated")
    out: dict[int, object] = {}
    for i in range(n):
        tag, ftype, count = struct.unpack_from(
            f"{e}HHI", tiff, ifd_off + 2 + 12 * i
        )
        if ftype not in _TYPE_SIZES:
            continue  # unknown type: skip per TIFF readers' convention
        size = _TYPE_SIZES[ftype] * count
        voff = ifd_off + 2 + 12 * i + 8
        if size > 4:
            (voff,) = struct.unpack_from(f"{e}I", tiff, voff)
        if voff + size > len(tiff):
            raise ExifError(f"tag 0x{tag:04X} value out of range")
        raw = tiff[voff : voff + size]
        if ftype == _ASCII:
            out[tag] = raw.rstrip(b"\x00").decode("ascii", "replace")
        elif ftype in (_SHORT, _LONG, _SLONG):
            code = {3: "H", 4: "I", 9: "i"}[ftype]
            vals = list(struct.unpack(f"{e}{count}{code}", raw))
            out[tag] = vals[0] if count == 1 else vals
        elif ftype in (_RATIONAL, _SRATIONAL):
            code = "II" if ftype == _RATIONAL else "ii"
            pairs = [
                struct.unpack_from(f"{e}{code}", raw, 8 * k)
                for k in range(count)
            ]
            out[tag] = pairs[0] if count == 1 else pairs
        else:  # BYTE / UNDEFINED
            out[tag] = raw
    (nxt,) = struct.unpack_from(f"{e}I", tiff, end)
    return out, nxt


def tiff_byte_order(tiff: bytes) -> str:
    """Return the struct endian prefix for a TIFF body ('<' or '>')."""
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ExifError("not a TIFF body")
    if struct.unpack_from(f"{e}H", tiff, 2)[0] != 42:
        raise ExifError("bad TIFF magic")
    return e


def _iter_jpeg_segments(data: bytes):
    """Yield (marker, start, end) for each JPEG header segment up to
    (and excluding) SOS/EOI; start/end bound the WHOLE segment
    including the 0xFF marker bytes."""
    if data[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG")
    p = 2
    while p + 4 <= len(data):
        if data[p] != 0xFF:
            raise ExifError(f"bad marker sync at {p}")
        # ITU T.81 B.1.1.2: markers may be preceded by fill bytes
        while p + 1 < len(data) and data[p + 1] == 0xFF:
            p += 1
        if p + 4 > len(data):  # fill run reached the buffer end
            raise ExifError(f"truncated inside fill bytes at {p}")
        marker = data[p + 1]
        if marker in (0xDA, 0xD9):  # SOS / EOI: header section over
            return
        (seg_len,) = struct.unpack_from(">H", data, p + 2)
        yield marker, p, p + 2 + seg_len
        p = p + 2 + seg_len


def exif_parse(data: bytes) -> dict:
    """Parse EXIF from a JPEG (APP1 scan) or raw TIFF/payload body.

    Returns a flat dict with friendly names (Make, Model, Orientation,
    DateTime, PixelXDimension, PixelYDimension, GPSLatitudeRef,
    GPSLatitude, ...) — empty dict when a JPEG has no Exif APP1.
    GPS rationals come back as lists of (num, den) tuples.
    """
    tiff = _tiff_body(data)
    if tiff is None:
        return {}

    e = tiff_byte_order(tiff)
    (ifd0_off,) = struct.unpack_from(f"{e}I", tiff, 4)
    ifd0, ifd1_off = ifd_parse(tiff, ifd0_off, e)

    out: dict = {}
    for tag, name in _IFD0_NAMES.items():
        if tag in ifd0:
            out[name] = ifd0[tag]
    if TAG_EXIF_IFD in ifd0:
        sub, _ = ifd_parse(tiff, int(ifd0[TAG_EXIF_IFD]), e)
        for tag, name in _EXIF_NAMES.items():
            if tag in sub:
                out[name] = sub[tag]
    if TAG_GPS_IFD in ifd0:
        gps, _ = ifd_parse(tiff, int(ifd0[TAG_GPS_IFD]), e)
        for tag, name in _GPS_NAMES.items():
            if tag in gps:
                v = gps[tag]
                if tag in (TAG_GPS_LAT, TAG_GPS_LON) and isinstance(v, tuple):
                    v = [v]
                out[name] = v
    if ifd1_off:
        ifd1, _ = ifd_parse(tiff, ifd1_off, e)
        if TAG_THUMB_OFFSET in ifd1:
            out["ThumbnailOffset"] = int(ifd1[TAG_THUMB_OFFSET])
        if TAG_THUMB_LENGTH in ifd1:
            out["ThumbnailLength"] = int(ifd1[TAG_THUMB_LENGTH])
        if TAG_COMPRESSION in ifd1:
            out["ThumbnailCompression"] = int(ifd1[TAG_COMPRESSION])
    return out


def _tiff_body(data: bytes) -> bytes | None:
    """The TIFF body carrying the IFD chain: APP1 payload of a JPEG,
    a bare ``Exif\\x00\\x00`` payload, or raw TIFF bytes."""
    if data[:2] == b"\xff\xd8":
        for marker, s, t in _iter_jpeg_segments(data):
            if marker == 0xE1 and data[s + 4 : s + 10] == b"Exif\x00\x00":
                return data[s + 10 : t]
        return None
    if data[:6] == b"Exif\x00\x00":
        return data[6:]
    return data


def exif_thumbnail(data: bytes) -> bytes | None:
    """The embedded IFD1 JPEG thumbnail (EXIF 2.3 §4.6.3), or None.

    Offsets are relative to the TIFF header per the spec; only
    Compression=6 (JPEG interchange) thumbnails are returned —
    uncompressed (Compression=1) strip thumbnails are vanishingly
    rare in crawled bytes and yield None rather than garbage."""
    tiff = _tiff_body(data)
    if tiff is None:
        return None
    e = tiff_byte_order(tiff)
    (ifd0_off,) = struct.unpack_from(f"{e}I", tiff, 4)
    _, ifd1_off = ifd_parse(tiff, ifd0_off, e)
    if not ifd1_off:
        return None
    ifd1, _ = ifd_parse(tiff, ifd1_off, e)
    if ifd1.get(TAG_COMPRESSION, 6) != 6:
        return None
    off = ifd1.get(TAG_THUMB_OFFSET)
    ln = ifd1.get(TAG_THUMB_LENGTH)
    if off is None or ln is None:
        return None
    off, ln = int(off), int(ln)
    if off + ln > len(tiff):
        raise ExifError("thumbnail bounds out of range")
    return tiff[off : off + ln]


# ------------------------------------------------------------ JPEG editing


def jpeg_set_exif(jpeg: bytes, payload: bytes) -> bytes:
    """Insert an APP1 Exif segment right after SOI (replacing any
    existing Exif APP1) — the position Exif 2.32 §4.5.4 mandates."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG")
    if len(payload) + 2 > 0xFFFF:
        raise ExifError("EXIF payload exceeds one APP1 segment")
    stripped = exif_strip(jpeg)
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return stripped[:2] + seg + stripped[2:]


def exif_strip(jpeg: bytes) -> bytes:
    """Remove every Exif APP1 segment (privacy scrub: GPS and camera
    identifiers leave; pixels and every other segment stay byte-equal).
    """
    drop: list[tuple[int, int]] = []
    for marker, s, t in _iter_jpeg_segments(jpeg):
        if marker == 0xE1 and jpeg[s + 4 : s + 10] == b"Exif\x00\x00":
            drop.append((s, t))
    if not drop:
        return jpeg
    out, p = [], 0
    for s, t in drop:
        out.append(jpeg[p:s])
        p = t
    out.append(jpeg[p:])
    return b"".join(out)


def exif_strip_gps(jpeg: bytes) -> tuple[bytes, bool]:
    """Surgical location scrub: remove ONLY the GPS sub-IFD from a
    JPEG's Exif, keeping the tags downstream stages still need
    (Orientation for display normalization, pixel dims for size
    gates, Make/Model/DateTime, the IFD1 thumbnail) — the compliance
    middle ground between shipping location data and
    :func:`exif_strip`'s drop-everything.

    Returns ``(jpeg_out, had_gps)``.  A JPEG with no Exif or no GPS
    tags comes back byte-identical with ``had_gps=False``.  The
    surviving payload is REBUILT through :func:`exif_payload` (same
    byte order, thumbnail carried through), so only the spec-subset
    tags this module reads survive — documented behavior: a privacy
    scrub must whitelist what it keeps, not blacklist what it drops.
    """
    tags = exif_parse(jpeg)
    if not any(k.startswith("GPS") for k in tags):
        return jpeg, False
    kept = {k: v for k, v in tags.items() if not k.startswith("GPS")}
    tiff = _tiff_body(jpeg)
    order = "II" if tiff[:2] == b"II" else "MM"
    thumb = exif_thumbnail(jpeg)
    for k in ("ThumbnailOffset", "ThumbnailLength", "ThumbnailCompression"):
        kept.pop(k, None)
    payload = exif_payload(kept, byte_order=order, thumbnail=thumb)
    return jpeg_set_exif(jpeg, payload), True


# ------------------------------------------ non-JPEG EXIF containers

def png_add_exif(png: bytes, tiff: bytes) -> bytes:
    """Splice a PNG 1.5 ``eXIf`` chunk (raw TIFF payload, proper CRC)
    right after IHDR — the fixture writer for PNG-borne EXIF."""
    import zlib as _z

    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    ihdr_end = 8 + 8 + struct.unpack(">I", png[8:12])[0] + 4
    chunk = (struct.pack(">I", len(tiff)) + b"eXIf" + tiff
             + struct.pack(">I", _z.crc32(b"eXIf" + tiff)))
    return png[:ihdr_end] + chunk + png[ihdr_end:]


def webp_add_exif(webp: bytes, tiff: bytes) -> bytes:
    """Rewrite a simple-format WebP into extended format (VP8X with
    the EXIF flag, RFC-draft/container spec) and append the ``EXIF``
    chunk.  Width/height for VP8X come from the existing decoder's
    canvas; chunks are padded to even length per RIFF."""
    from mechaml_spark import webp as _wp

    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    h, w = _wp.webp_decode(webp).shape[:2]
    body = webp[12:]
    vp8x = (b"VP8X" + struct.pack("<I", 10)
            + bytes([0x08, 0, 0, 0])        # EXIF flag bit 3
            + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3])
    exif = b"EXIF" + struct.pack("<I", len(tiff)) + tiff
    if len(tiff) % 2:
        exif += b"\x00"
    out_body = b"WEBP" + vp8x + body + exif
    return b"RIFF" + struct.pack("<I", len(out_body)) + out_body


def exif_from_container(data: bytes) -> dict:
    """Container-dispatched EXIF: JPEG APP1 (existing scan), PNG
    ``eXIf`` chunk, WebP ``EXIF`` chunk (with or without the
    ``Exif\\x00\\x00`` prefix some writers emit).  Empty dict when
    the container carries no EXIF."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        p = 8
        while p + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[p:p + 4])
            tag = data[p + 4:p + 8]
            if tag == b"eXIf":
                return exif_parse(data[p + 8:p + 8 + ln])
            if tag == b"IEND":
                break
            p += 12 + ln
        return {}
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        p = 12
        while p + 8 <= len(data):
            tag = data[p:p + 4]
            (ln,) = struct.unpack("<I", data[p + 4:p + 8])
            if tag == b"EXIF":
                payload = data[p + 8:p + 8 + ln]
                if payload[:6] == b"Exif\x00\x00":
                    payload = payload[6:]
                return exif_parse(payload)
            p += 8 + ln + (ln & 1)
        return {}
    return exif_parse(data)
