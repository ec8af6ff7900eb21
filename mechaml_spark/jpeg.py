"""Baseline JPEG (ITU T.81 sequential DCT, SOF0) in pure numpy.

The in-sandbox LOSSY codec: real 8x8 DCT, quality-scaled Annex-K
quantization tables, canonical Huffman entropy coding, JFIF container
— no PIL/libjpeg.  Scope (documented boundaries):

* encode: 4:4:4 (no chroma subsampling), one interleaved scan,
  fixed-length canonical Huffman tables written into DHT (DC symbols
  at 4 bits, AC symbols at 8 bits — spec-legal, simpler than optimal
  tables; any conforming decoder reads them from the DHT);
* decode: baseline sequential only (SOF0), any Huffman tables from
  the stream's DHT segments, ANY integer sampling factors — 4:4:4,
  4:2:0 (the dominant crawled encoding), 4:2:2, 4:4:0 — with
  nearest-neighbor chroma upsampling; progressive (SOF2) and restart
  markers still raise ValueError.

This is the codec behind the payload rule's "PSNR >= 40 dB for
lossy" branch (BASELINE.json input_hint): a quality-90 round trip of
natural/smooth content comfortably clears 40 dB (tests).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1/K.2 base quantization tables (natural row-major order)
_QY = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal 8-point DCT-II matrix
_D = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(0.5) if _u == 0 else 1.0
        _D[_u, _x] = 0.5 * c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# AC run/size symbols: EOB, ZRL, and (run 0-15, size 1-10)
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_SYMBOLS = list(range(12))


def _canonical_codes(sym_lengths: list[tuple[int, int]]):
    """(symbol, length) sorted by (length, symbol) -> canonical codes.
    Returns (bits[17], values, {symbol: (code, length)})."""
    bits = [0] * 17
    values = []
    enc = {}
    code = 0
    prev_len = 0
    for sym, ln in sorted(sym_lengths, key=lambda t: (t[1], t[0])):
        code <<= ln - prev_len
        prev_len = ln
        bits[ln] += 1
        values.append(sym)
        enc[sym] = (code, ln)
        code += 1
    return bits, values, enc


# fixed-length spec-legal tables: DC at 4 bits (12 codes < 15), AC at
# 8 bits (162 codes, last = 161 < 255 — the all-ones code is unused)
_DC_BITS, _DC_VALS, _DC_ENC = _canonical_codes([(s, 4) for s in _DC_SYMBOLS])
_AC_BITS, _AC_VALS, _AC_ENC = _canonical_codes([(s, 8) for s in _AC_SYMBOLS])


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriter, block: np.ndarray, qt: np.ndarray, dc_pred: int
) -> int:
    coef = _D @ (block - 128.0) @ _D.T
    q = np.round(coef / qt).astype(np.int32)
    zz = q.ravel()[_ZIGZAG]
    # DC
    diff = int(zz[0]) - dc_pred
    size = _category(diff)
    code, ln = _DC_ENC[size]
    w.put(code, ln)
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        w.put(bits, size)
    # AC
    run = 0
    for v in zz[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, n = _AC_ENC[0xF0]
            w.put(c, n)
            run -= 16
        size = _category(v)
        c, n = _AC_ENC[(run << 4) | size]
        w.put(c, n)
        bits = v if v > 0 else v + (1 << size) - 1
        w.put(bits, size)
        run = 0
    if run:
        c, n = _AC_ENC[0x00]  # EOB
        w.put(c, n)
    return int(zz[0])


def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """uint8 HxWx3 RGB -> baseline JFIF bytes (4:4:4, SOF0)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("jpeg_encode expects uint8 HxWx3 RGB")
    h, w0 = pixels.shape[:2]
    qy = _quality_scale(_QY, quality)
    qc = _quality_scale(_QC, quality)
    r = pixels[..., 0].astype(np.float64)
    g = pixels[..., 1].astype(np.float64)
    b = pixels[..., 2].astype(np.float64)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    ph, pw = -(-h // 8) * 8, -(-w0 // 8) * 8
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w0)), mode="edge") for p in planes
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, qt in ((0, qy), (1, qc)):
        zz = qt.ravel()[_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in zz)
    # SOF0: 8-bit, 3 components, all 1x1 sampling (4:4:4)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w0, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_BITS, _AC_VALS)
    out += _dht(0, 1, _DC_BITS, _DC_VALS)
    out += _dht(1, 1, _AC_BITS, _AC_VALS)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tables in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tables])
    out += b"\x00\x3f\x00"

    wtr = _BitWriter()
    preds = [0, 0, 0]
    qts = [qy, qc, qc]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(3):
                block = planes[ci][by : by + 8, bx : bx + 8]
                preds[ci] = _encode_block(wtr, block, qts[ci], preds[ci])
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.eof = False

    def _fill(self) -> None:
        if self.eof:  # past EOI: pure 1-padding, marker never consumed
            self.acc = (self.acc << 8) | 0xFF
            self.n += 8
            return
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif nxt == 0xD9:  # EOI reached while reading: spec padding
                self.eof = True
                byte = 0xFF
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02x} in scan")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _build_decoder(bits: list[int], vals: list[int]) -> dict:
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> uint8 HxWx3 RGB.  SOF0 with any
    integer sampling factors (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0), one
    interleaved scan only; anything else — including truncated or
    garbled streams — raises ValueError (see module docstring)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    try:
        return _jpeg_decode(data)
    except ValueError:
        raise
    except Exception as e:  # truncated/garbled headers: typed error
        raise ValueError(f"malformed JPEG: {e!r}") from e


def _jpeg_decode(data: bytes) -> np.ndarray:
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w0 = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, qt id, hi, vi)
    scan: list[tuple[int, int, int]] = []  # (cid, dc table, ac table)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        # T.81 B.1.1.2: markers may be preceded by any number of
        # 0xFF fill bytes
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, bp + 1).astype(
                    np.int32
                )
                qt = np.zeros(64, np.int32)
                qt[_ZIGZAG] = zz
                qts[tq] = qt.reshape(8, 8)
                bp += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w0, nc = struct.unpack_from(">BHHB", body, 0)
            if nc != 3:
                raise ValueError("only 3-component JPEG supported")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 15
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("bad JPEG sampling factors")
                comps.append((cid, tq, hi, vi))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline SOF0 JPEG supported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 15
                bits = [0] + list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                huff[(tc, th)] = _build_decoder(bits, vals)
                bp += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 3:
                # Ns=1 per-component scans are legal baseline but this
                # decoder reads one interleaved scan only — refusing
                # beats silently leaving two planes at zero
                raise ValueError(
                    "non-interleaved (multi-scan) JPEG unsupported"
                )
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, tt >> 4, tt & 15))
            pos += seg_len
            break
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        pos += seg_len
    if not comps or not scan or h == 0:
        raise ValueError("JPEG missing SOF/SOS")

    # generalized MCU geometry (T.81 A.2.3): per-component sampling
    # factors (hi, vi); 4:4:4 is the hmax=vmax=1 special case, 4:2:0
    # the (2,2)/(1,1)/(1,1) one — the dominant encoding of crawled
    # JPEGs.  Chroma upsampling is nearest-neighbor replication
    # (spec-conformant; libjpeg's "fancy" bilinear is a quality
    # choice, not a conformance requirement).
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    if any(hmax % hi or vmax % vi for _, _, hi, vi in comps):
        raise ValueError("non-integer JPEG subsampling ratios unsupported")
    reader = _BitReader(data, pos)
    mcux = -(-w0 // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8)) for _, _, hi, vi in comps
    ]
    preds = [0] * len(comps)
    qt_of = {cid: qts[tq] for cid, tq, _, _ in comps}
    order = [next(i for i, (c, _, _, _) in enumerate(comps) if c == cid)
             for cid, _, _ in scan]
    for my in range(mcuy):
        for mx in range(mcux):
            for (cid, td, ta), ci in zip(scan, order):
                _, _, chi, cvi = comps[ci]
                for bv in range(cvi):
                    for bh in range(chi):
                        size = _read_symbol(reader, huff[(0, td)])
                        diff = (
                            _extend(reader.bits(size), size) if size else 0
                        )
                        preds[ci] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(reader, huff[(1, ta)])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 15
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index overflow"
                                )
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_ZIGZAG] = zz * qt_of[cid].ravel()[_ZIGZAG]
                        block = _D.T @ coef.reshape(8, 8) @ _D + 128.0
                        by = (my * cvi + bv) * 8
                        bx = (mx * chi + bh) * 8
                        planes[ci][by : by + 8, bx : bx + 8] = block
    full = []
    for ci, (_, _, chi, cvi) in enumerate(comps):
        p = planes[ci]
        if chi != hmax or cvi != vmax:
            p = np.repeat(
                np.repeat(p, vmax // cvi, axis=0), hmax // chi, axis=1
            )
        full.append(p[:h, :w0])
    y = full[0]
    cb = full[1] - 128.0
    cr = full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
