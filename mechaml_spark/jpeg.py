"""JPEG (ITU T.81 Huffman DCT — baseline SOF0 + progressive SOF2)
in pure numpy.

The in-sandbox LOSSY codec: real 8x8 DCT, quality-scaled Annex-K
quantization tables, canonical Huffman entropy coding, JFIF container
— no PIL/libjpeg.  Scope (documented boundaries):

* encode: baseline 4:4:4 one interleaved scan (jpeg_encode) and
  progressive 4:4:4 with the libjpeg-shaped scan script
  (jpeg_encode_progressive); fixed-length canonical Huffman tables
  written into DHT (DC symbols at 4 bits, AC at 8 — spec-legal; any
  conforming decoder reads them from the DHT);
* decode: baseline sequential (SOF0, interleaved or per-component
  scans) AND progressive (SOF2: spectral selection + successive
  approximation, T.81 Annex G), any Huffman tables from the stream's
  DHT segments, ANY integer sampling factors — 4:4:4, 4:2:0 (the
  dominant crawled encoding), 4:2:2, 4:4:0 — with nearest-neighbor
  chroma upsampling; restart intervals (DRI/RSTn, DC-predictor and
  EOB-run reset per interval); arithmetic-coded, hierarchical,
  lossless, and 12-bit modes raise ValueError.

This is the codec behind the payload rule's "PSNR >= 40 dB for
lossy" branch (BASELINE.json input_hint): a quality-90 round trip of
natural/smooth content comfortably clears 40 dB (tests).
"""

from __future__ import annotations

import struct

import numpy as np

from mechaml_spark.imaging import pixel_gate

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

# progressive AC symbol set (T.81 G.1.2.2): size 0 means EOBn for runs
# 0-14 and ZRL at 15, so EVERY (run, size 0-10) pair is a valid symbol
# — 176 codes, all at 8 bits (< 255, all-ones unused)
_AC_PROG_SYMBOLS = [(r << 4) | s for r in range(16) for s in range(11)]
_AC_PROG_BITS, _AC_PROG_VALS, _AC_PROG_ENC = _canonical_codes(
    [(s, 8) for s in _AC_PROG_SYMBOLS]
)


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


# ----------------------------------------------------- progressive encode
# T.81 Annex G (progressive DCT, Huffman): spectral selection +
# successive approximation.  The scan-script shape follows the one
# virtually all web encoders emit (libjpeg's default script): DC first
# at Al=1, luma AC split 1-5 / 6-63 at Al=2, chroma AC at Al=1, then
# refinement scans down to Al=0.  Used by the corpus generator so the
# decoder's progressive paths (EOB runs, refinement correction bits)
# are exercised by real in-repo streams.

# (kind, component indices, Ss, Se, Ah, Al)
_PROG_SCRIPT = [
    ("dc", [0, 1, 2], 0, 0, 0, 1),
    ("ac", [0], 1, 5, 0, 2),
    ("ac", [1], 1, 63, 0, 1),
    ("ac", [2], 1, 63, 0, 1),
    ("ac", [0], 6, 63, 0, 2),
    ("ac", [0], 1, 63, 2, 1),
    ("dc", [0, 1, 2], 0, 0, 1, 0),
    ("ac", [1], 1, 63, 1, 0),
    ("ac", [2], 1, 63, 1, 0),
    ("ac", [0], 1, 63, 1, 0),
]


def _put_sym(w: _BitWriter, enc: dict, sym: int) -> None:
    code, ln = enc[sym]
    w.put(code, ln)


def _emit_dc_scan(w, coefs, cis, sampling, mcux, mcuy, ah, al) -> None:
    """Interleaved DC scan over the full (padded) MCU grid — first
    pass (Ah=0): Huffman-coded diffs of DC >> Al; refinement: one raw
    bit (bit Al of DC) per block."""
    preds = {ci: 0 for ci in cis}
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in cis:
                hi, vi = sampling[ci]
                for bv in range(vi):
                    for bh in range(hi):
                        dc = int(coefs[ci][my * vi + bv, mx * hi + bh, 0])
                        if ah == 0:
                            diff = (dc >> al) - preds[ci]
                            preds[ci] = dc >> al
                            size = _category(diff)
                            _put_sym(w, _DC_ENC, size)
                            if size:
                                bits = (
                                    diff if diff > 0
                                    else diff + (1 << size) - 1
                                )
                                w.put(bits, size)
                        else:
                            w.put((dc >> al) & 1, 1)


def _emit_ac_first(w, blocks, ss, se, al) -> None:
    """Single-component AC first pass over band Ss..Se with EOB-run
    accumulation (T.81 G.1.2.2).  Point transform truncates the
    MAGNITUDE toward zero (|v| >> Al with sign reapplied), unlike the
    DC arithmetic shift."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            _put_sym(w, _AC_PROG_ENC, nbits << 4)
            if nbits:
                w.put(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                _put_sym(w, _AC_PROG_ENC, 0xF0)
                r -= 16
            size = t.bit_length()
            _put_sym(w, _AC_PROG_ENC, (r << 4) | size)
            sv = t if v > 0 else -t
            w.put(sv if sv > 0 else sv + (1 << size) - 1, size)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_ac_refine(w, blocks, ss, se, al) -> None:
    """Single-component AC refinement (T.81 G.1.2.3): newly
    significant coefficients (|v| >> Al == 1) get a run/size-1 symbol
    + sign bit; already-significant ones get buffered correction bits
    (bit Al of the magnitude) emitted after the next symbol; trailing
    zeros fold into an EOB run whose correction bits stay buffered
    until the run is flushed."""
    eobrun = 0
    pending: list[int] = []  # correction bits awaiting the next flush

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            nbits = eobrun.bit_length() - 1
            _put_sym(w, _AC_PROG_ENC, nbits << 4)
            if nbits:
                w.put(eobrun - (1 << nbits), nbits)
            eobrun = 0
        for b in pending:
            w.put(b, 1)
        pending = []

    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = 0  # band offset just past the last newly-significant coef
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1
        r = 0
        br: list[int] = []  # this block's buffered correction bits
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eob:
                flush_eob()
                _put_sym(w, _AC_PROG_ENC, 0xF0)
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            _put_sym(w, _AC_PROG_ENC, (r << 4) | 1)
            w.put(1 if int(zz[ss + i]) > 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_progressive(planes, sampling, w0, h, quality) -> bytes:
    """Component-resolution float planes + per-component (hi, vi) ->
    progressive (SOF2) JFIF bytes via _PROG_SCRIPT.  4:4:4 is
    sampling [(1,1)]*3; the test suite also drives subsampled
    geometries through here."""
    qy = _quality_scale(_QY, quality)
    qc = _quality_scale(_QC, quality)
    qts = [qy, qc, qc]
    hmax = max(hi for hi, _ in sampling)
    vmax = max(vi for _, vi in sampling)
    mcux = -(-w0 // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for p, (hi, vi), qt in zip(planes, sampling, qts):
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            p,
            ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
            mode="edge",
        )
        bh, bw = ph // 8, pw // 8
        # per-block, the EXACT expression _encode_block uses — so a
        # progressive stream carries bitwise-identical quantized
        # coefficients to the baseline stream of the same input and
        # the two decodes can be compared for equality
        q = np.zeros((bh, bw, 64), np.int32)
        for by in range(bh):
            for bx in range(bw):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _D @ (block - 128.0) @ _D.T
                q[by, bx] = np.round(coef / qt).astype(np.int32).ravel()[
                    _ZIGZAG
                ]
        coefs.append(q)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, qt in ((0, qy), (1, qc)):
        zz = qt.ravel()[_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in zz)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w0, 3)
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        hi, vi = sampling[ci]
        out += bytes([cid, (hi << 4) | vi, tq])
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_PROG_BITS, _AC_PROG_VALS)

    for kind, cis, ss, se, ah, al in _PROG_SCRIPT:
        ns = len(cis)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in cis:
            out += bytes([ci + 1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        w = _BitWriter()
        if kind == "dc":
            _emit_dc_scan(w, coefs, cis, sampling, mcux, mcuy, ah, al)
        else:
            ci = cis[0]
            hi, vi = sampling[ci]
            cbw = -(-(-(-w0 * hi // hmax)) // 8)
            cbh = -(-(-(-h * vi // vmax)) // 8)
            # non-interleaved scans walk the component's ACTUAL block
            # raster (T.81 A.2.2), not the MCU-padded array
            blocks = [
                coefs[ci][by, bx]
                for by in range(cbh)
                for bx in range(cbw)
            ]
            if ah == 0:
                _emit_ac_first(w, blocks, ss, se, al)
            else:
                _emit_ac_refine(w, blocks, ss, se, al)
        w.flush()
        out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """uint8 HxWx3 RGB -> progressive JFIF bytes (4:4:4, SOF2,
    libjpeg-shaped scan script).  Same colorspace/quantization as
    jpeg_encode, so for inputs whose baseline round trip is exact
    (e.g. constant planes at high quality) the progressive round trip
    is exact too — the closed-form-oracle property the corpus uses."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("jpeg_encode_progressive expects uint8 HxWx3 RGB")
    h, w0 = pixels.shape[:2]
    r = pixels[..., 0].astype(np.float64)
    g = pixels[..., 1].astype(np.float64)
    b = pixels[..., 2].astype(np.float64)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    return _encode_progressive(planes, [(1, 1)] * 3, w0, h, quality)


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

    def restart(self, m: int) -> None:
        """Consume the byte-aligned RSTm marker between restart
        intervals (T.81 E.1.4): discard the current interval's padding
        bits, then expect exactly 0xFFD0+m."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG truncated at restart marker")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or b1 != 0xD0 + m:
            raise ValueError(
                f"expected restart marker RST{m}, got 0x{b0:02x}{b1:02x}"
            )
        self.pos += 2

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
    """JFIF/JPEG bytes -> uint8 HxWx3 RGB.  Baseline (SOF0) or
    progressive (SOF2) Huffman streams, any integer sampling factors
    (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0), restart intervals; anything else
    — including truncated or garbled streams — raises ValueError (see
    module docstring)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    try:
        return _jpeg_decode(data)
    except ValueError:
        raise
    except Exception as e:  # truncated/garbled headers: typed error
        raise ValueError(f"malformed JPEG: {e!r}") from e


# ---------------------------------------------- per-block entropy decoders
# Coefficient storage is ZIGZAG-ordered int32 vectors of length 64 per
# block (numpy views into the per-component (bh, bw, 64) arrays);
# natural-order mapping + dequantization + IDCT happen once at the end.


def _block_full_band(reader, dc_table, ac_table, zz, pred: int) -> int:
    """Baseline sequential block: DC diff + full AC band (T.81 F.2)."""
    size = _read_symbol(reader, dc_table)
    diff = _extend(reader.bits(size), size) if size else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _read_symbol(reader, ac_table)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 15
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    return pred


def _block_dc_first(reader, dc_table, zz, pred: int, al: int) -> int:
    """Progressive DC, first pass (T.81 G.1.2.1): diffs of DC >> Al."""
    size = _read_symbol(reader, dc_table)
    diff = _extend(reader.bits(size), size) if size else 0
    pred += diff
    zz[0] = pred << al
    return pred


def _block_dc_refine(reader, zz, al: int) -> None:
    """Progressive DC refinement: one correction bit per block."""
    if reader.bit():
        zz[0] = int(zz[0]) | (1 << al)


def _block_ac_first(reader, ac_table, zz, ss, se, al, eobrun: int) -> int:
    """Progressive AC, first pass over band Ss..Se (T.81 G.1.2.2) with
    end-of-band run-lengths."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(reader, ac_table)
        run, size = sym >> 4, sym & 15
        if size == 0:
            if run != 15:  # EOBn: this and the next (2^run-1+bits) blocks
                eobrun = (1 << run) - 1
                if run:
                    eobrun += reader.bits(run)
                return eobrun
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(reader.bits(size), size) << al
        k += 1
    return 0


def _block_ac_refine(reader, ac_table, zz, ss, se, al, eobrun: int) -> int:
    """Progressive AC refinement (T.81 G.1.2.3): newly significant
    coefficients arrive at +/-2^Al; every already-nonzero coefficient
    in the band consumes a correction bit as the scan passes it —
    including inside end-of-band runs."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(reader, ac_table)
            run, size = sym >> 4, sym & 15
            val = 0
            if size == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.bits(run)
                    break  # correction pass below, then eobrun -= 1
                # run == 15: skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("bad refinement magnitude size")
                val = p1 if reader.bit() else m1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if reader.bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0 and reader.bit() and (c & p1) == 0:
                zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _skip_entropy(data: bytes, p: int) -> int:
    """Advance past entropy-coded data to the next true marker
    (stuffed 0x00 and RSTn are part of the scan; 0xFF fill bytes are
    not markers)."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            if nxt == 0xFF:
                p += 1
                continue
            return p
        p += 1
    raise ValueError("JPEG entropy data truncated (no trailing marker)")


def _decode_scan(
    data, start, comps, scan_comps, ss, se, ah, al,
    coefs, progressive, ri, hmax, vmax, mcux, mcuy, h, w0,
):
    """Entropy-decode one scan into the per-component coefficient
    arrays.  Interleaved scans (ns > 1) walk MCU order (T.81 A.2.3);
    single-component scans walk the component's own block raster over
    its ACTUAL block dims — ceil(ceil(w*hi/hmax)/8) etc., NOT the
    MCU-padded array shape (T.81 A.2.2).  Restart intervals reset DC
    predictors and the progressive EOB run, with RSTm markers cycling
    m = 0..7 (T.81 E.1.4)."""
    reader = _BitReader(data, start)
    interleaved = len(scan_comps) > 1
    if interleaved:
        units = []  # (ci, dc_table, ac_table, by, bx) in MCU order
        per_mcu = []
        for ci, dct, act in scan_comps:
            _, _, hi, vi = comps[ci]
            per_mcu.append((ci, dct, act, hi, vi))
        n_mcu = mcux * mcuy

        def mcu_blocks(m):
            my, mx = divmod(m, mcux)
            for ci, dct, act, hi, vi in per_mcu:
                for bv in range(vi):
                    for bh_ in range(hi):
                        yield ci, dct, act, my * vi + bv, mx * hi + bh_
    else:
        ci0, dct0, act0 = scan_comps[0]
        _, _, hi, vi = comps[ci0]
        cbw = -(-(-(-w0 * hi // hmax)) // 8)
        cbh = -(-(-(-h * vi // vmax)) // 8)
        n_mcu = cbw * cbh

        def mcu_blocks(m):
            my, mx = divmod(m, cbw)
            yield ci0, dct0, act0, my, mx

    dc_scan = ss == 0
    first = ah == 0
    preds = {ci: 0 for ci, _, _ in scan_comps}
    eobrun = 0
    rst_m = 0
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            reader.restart(rst_m)
            rst_m = (rst_m + 1) & 7
            preds = {ci: 0 for ci in preds}
            eobrun = 0
        for ci, dct, act, by, bx in mcu_blocks(m):
            zz = coefs[ci][by, bx]
            if not progressive:
                if dct is None or act is None:
                    raise ValueError("scan references undefined DHT table")
                preds[ci] = _block_full_band(reader, dct, act, zz, preds[ci])
            elif dc_scan and first:
                if dct is None:
                    raise ValueError("scan references undefined DHT table")
                preds[ci] = _block_dc_first(reader, dct, zz, preds[ci], al)
            elif dc_scan:
                _block_dc_refine(reader, zz, al)
            elif first:
                if act is None:
                    raise ValueError("scan references undefined DHT table")
                eobrun = _block_ac_first(reader, act, zz, ss, se, al, eobrun)
            else:
                if act is None:
                    raise ValueError("scan references undefined DHT table")
                eobrun = _block_ac_refine(reader, act, zz, ss, se, al, eobrun)


def _jpeg_decode(data: bytes) -> np.ndarray:
    pos = 2
    ri = 0  # restart interval (MCUs / blocks); 0 = none
    progressive = False
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w0 = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, qt id, hi, vi)
    # (scan_comps [(ci, dc_table, ac_table)], ss, se, ah, al, start, ri)
    scans: list[tuple] = []
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            _prec, h, w0, nc = struct.unpack_from(">BHHB", body, 0)
            pixel_gate(w0, h, "JPEG")
            if nc != 3:
                raise ValueError("only 3-component JPEG supported")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 15
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("bad JPEG sampling factors")
                comps.append((cid, tq, hi, vi))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCC, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) Huffman "
                "JPEG supported"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 15
                bits = [0] + list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                huff[(tc, th)] = _build_decoder(bits, vals)
                bp += 17 + nv
        elif marker == 0xDA:  # SOS — record the scan, skip its data
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if not (1 <= ns <= len(comps)):
                raise ValueError("bad scan component count")
            scan_comps = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    (j for j, (c, _, _, _) in enumerate(comps) if c == cid),
                    None,
                )
                if ci is None:
                    raise ValueError("scan references unknown component")
                # tables snapshotted NOW: progressive streams may
                # redefine DHT slots between scans
                scan_comps.append(
                    (ci, huff.get((0, tt >> 4)), huff.get((1, tt & 15)))
                )
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and ns != 1:
                    raise ValueError("progressive AC scan must be 1-comp")
                if ss > se or se > 63:
                    raise ValueError("bad spectral selection band")
            elif (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("bad baseline scan parameters")
            scans.append((scan_comps, ss, se, ah, al, pos + seg_len, ri))
            pos = _skip_entropy(data, pos + seg_len)
            continue
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            ri = struct.unpack_from(">H", body, 0)[0]
        pos += seg_len
    if not comps or not scans or h == 0:
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
    mcux = -(-w0 // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # zigzag-ordered coefficient planes, MCU-padded
    coefs = [
        np.zeros((mcuy * vi, mcux * hi, 64), np.int32)
        for _, _, hi, vi in comps
    ]

    for scan_comps, ss, se, ah, al, start, scan_ri in scans:
        _decode_scan(
            data, start, comps, scan_comps, ss, se, ah, al,
            coefs, progressive, scan_ri, hmax, vmax, mcux, mcuy, h, w0,
        )

    # dequantize + IDCT, one vectorized einsum per component
    full = []
    for ci, (_, tq, chi, cvi) in enumerate(comps):
        qtflat = qts[tq].ravel().astype(np.float64)
        bh, bw = coefs[ci].shape[:2]
        nat = np.zeros((bh, bw, 64), np.float64)
        nat[..., _ZIGZAG] = coefs[ci] * qtflat[_ZIGZAG]
        blocks = nat.reshape(bh, bw, 8, 8)
        out = np.einsum("ij,xyjk,kl->xyil", _D.T, blocks, _D) + 128.0
        p = out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
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


# --------------------------------------------------- quality estimation


def parse_dqt(data: bytes) -> list:
    """Walk the marker segments of a JPEG stream and return every
    quantization table as ``(tq, ndarray(8,8) natural order)`` in
    stream order.  8- and 16-bit (Pq=1) precisions both parse; a DQT
    segment may carry several tables (T.81 B.2.4.1).  Stops at SOS —
    tables after the first scan (rare, T.81-legal) are not chased,
    matching what quality estimators in curation pipelines do."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = []
    p = 2
    n = len(data)
    while p + 4 <= n:
        if data[p] != 0xFF:
            p += 1
            continue
        marker = data[p + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            p += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[p + 2 : p + 4])[0]
        body = data[p + 4 : p + 2 + seglen]
        if marker == 0xDB:
            q = 0
            while q < len(body):
                pq, tq = body[q] >> 4, body[q] & 0x0F
                q += 1
                if pq:
                    vals = np.frombuffer(
                        body[q : q + 128], dtype=">u2"
                    ).astype(np.int32)
                    q += 128
                else:
                    vals = np.frombuffer(
                        body[q : q + 64], dtype=np.uint8
                    ).astype(np.int32)
                    q += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = vals  # DQT is in zigzag order
                tables.append((tq, nat.reshape(8, 8)))
        elif marker == 0xDA:  # SOS — entropy data follows
            break
        p += 2 + seglen
    return tables


def quality_estimate(data: bytes):
    """Estimate the libjpeg quality factor a JPEG was encoded at by
    inverting the IJG scaling of the Annex-K tables — the standard
    curation gate (discard q below threshold) run by LAION-style
    image pipelines.  For each candidate q in 1..100 the expected
    luma/chroma tables are recomputed with the exact encoder formula
    (``_quality_scale``); the estimate is the LOWEST q minimizing the
    summed L1 distance to the observed tables (ties broken low,
    pinned for the oracle).  Returns ``(q_est, exact, n_tables)``
    where ``exact`` means zero distance — true for any stream written
    with unmodified IJG tables (libjpeg default, this repo's encoder);
    custom-table encoders get the nearest standard q with
    ``exact=False``."""
    tables = parse_dqt(data)
    if not tables:
        raise ValueError("JPEG stream carries no DQT segment")
    luma = next((t for tq, t in tables if tq == 0), tables[0][1])
    chroma = next((t for tq, t in tables if tq != 0), None)
    best_q, best_d = 1, None
    for qq in range(1, 101):
        d = int(np.abs(luma - _quality_scale(_QY, qq)).sum())
        if chroma is not None:
            d += int(np.abs(chroma - _quality_scale(_QC, qq)).sum())
        if best_d is None or d < best_d:
            best_q, best_d = qq, d
            if d == 0:
                break
    return best_q, best_d == 0, len(tables)


def jpeg_sof_probe(data: bytes):
    """Header-only stream-structure probe: walk to the first SOF
    marker and report ``(progressive, w, h, n_components,
    subsampling)`` where subsampling is the conventional J:a:b
    notation for the standard factor layouts ("4:4:4", "4:2:0",
    "4:2:2", "4:4:0", else "other"; single-component streams report
    "gray").  Curation pipelines gate on this next to
    :func:`quality_estimate` (heavy chroma subsampling under a
    quality bar) without ever entropy-decoding."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    p = 2
    n = len(data)
    while p + 4 <= n:
        if data[p] != 0xFF:
            p += 1
            continue
        marker = data[p + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            p += 2
            continue
        if marker in (0xD9, 0xDA):
            break
        seglen = struct.unpack(">H", data[p + 2 : p + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", data[p + 5 : p + 9])
            nc = data[p + 9]
            if nc == 1:
                sub = "gray"
            else:
                factors = [
                    (data[p + 11 + 3 * i] >> 4, data[p + 11 + 3 * i] & 15)
                    for i in range(nc)
                ]
                luma, chroma = factors[0], factors[1:]
                if any(c != chroma[0] for c in chroma):
                    sub = "other"
                else:
                    sub = {
                        ((1, 1), (1, 1)): "4:4:4",
                        ((2, 2), (1, 1)): "4:2:0",
                        ((2, 1), (1, 1)): "4:2:2",
                        ((1, 2), (1, 1)): "4:4:0",
                    }.get((luma, chroma[0]), "other")
            return progressive, w, h, nc, sub
        p += 2 + seglen
    raise ValueError("JPEG stream carries no SOF marker")
