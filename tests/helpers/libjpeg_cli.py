"""Subprocess driver for the system libjpeg62 (ground-truth JPEG in
codec cross-validation tests).  Runs ISOLATED in a child process
because libjpeg's default error handler exits the process.

Usage:
  libjpeg_cli.py encode  <raw_rgb_in> <w> <h> <quality> <prog 0|1> <jpg_out>
  libjpeg_cli.py decode  <jpg_in> <w> <h> <raw_rgb_out>

Raw files are HxWx3 uint8 RGB.  Struct sizes are probed at import
via the library's own mismatch diagnostic (run once by the caller);
only offsets inside the stable libjpeg62 ABI prefix are written:
jpeg_common_fields (40 bytes on LP64) + dest/src pointer, then
image_width/height/input_components/in_color_space.
"""

import ctypes
import sys

DEC_SIZE, COMP_SIZE = 632, 520  # libjpeg.so.62 LP64 (probed)

lj = ctypes.CDLL("libjpeg.so.62")
libc = ctypes.CDLL("libc.so.6")
lj.jpeg_std_error.restype = ctypes.c_void_p
libc.fopen.restype = ctypes.c_void_p
libc.fopen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]


def _cinfo(size):
    err = ctypes.create_string_buffer(1024)
    eptr = lj.jpeg_std_error(err)
    cinfo = ctypes.create_string_buffer(size)
    ctypes.memmove(cinfo, int(eptr).to_bytes(8, "little"), 8)
    return cinfo, err  # err buffer must stay alive


def _poke_u32(buf, off, val):
    ctypes.memmove(
        ctypes.byref(buf, off), int(val).to_bytes(4, "little"), 4
    )


def encode(raw_path, w, h, quality, progressive, out_path):
    data = open(raw_path, "rb").read()
    assert len(data) == w * h * 3
    cinfo, _err = _cinfo(COMP_SIZE)
    lj.jpeg_CreateCompress(cinfo, 62, ctypes.c_size_t(COMP_SIZE))
    fp = libc.fopen(out_path.encode(), b"wb")
    assert fp
    lj.jpeg_stdio_dest(cinfo, ctypes.c_void_p(fp))
    # jpeg_common_fields = 40 bytes; dest ptr at 40; then the four
    # caller-set fields of the classic IJG ABI
    _poke_u32(cinfo, 48, w)   # image_width
    _poke_u32(cinfo, 52, h)   # image_height
    _poke_u32(cinfo, 56, 3)   # input_components
    _poke_u32(cinfo, 60, 2)   # in_color_space = JCS_RGB
    lj.jpeg_set_defaults(cinfo)
    lj.jpeg_set_quality(cinfo, quality, 1)
    if progressive:
        lj.jpeg_simple_progression(cinfo)
    lj.jpeg_start_compress(cinfo, 1)
    row = ctypes.create_string_buffer(w * 3)
    rowp = (ctypes.c_char_p * 1)(ctypes.addressof(row))
    for y in range(h):
        row.raw = data[y * w * 3 : (y + 1) * w * 3]
        assert lj.jpeg_write_scanlines(cinfo, rowp, 1) == 1
    lj.jpeg_finish_compress(cinfo)
    lj.jpeg_destroy_compress(cinfo)
    libc.fclose(ctypes.c_void_p(fp))


def decode(jpg_path, w, h, out_path):
    cinfo, _err = _cinfo(DEC_SIZE)
    lj.jpeg_CreateDecompress(cinfo, 62, ctypes.c_size_t(DEC_SIZE))
    fp = libc.fopen(jpg_path.encode(), b"rb")
    assert fp
    lj.jpeg_stdio_src(cinfo, ctypes.c_void_p(fp))
    assert lj.jpeg_read_header(cinfo, 1) == 1
    assert lj.jpeg_start_decompress(cinfo) == 1
    row = ctypes.create_string_buffer(w * 3)
    rowp = (ctypes.c_char_p * 1)(ctypes.addressof(row))
    out = bytearray()
    for _ in range(h):
        got = lj.jpeg_read_scanlines(cinfo, rowp, 1)
        if got != 1:
            break
        out += row.raw
    lj.jpeg_finish_decompress(cinfo)
    lj.jpeg_destroy_decompress(cinfo)
    libc.fclose(ctypes.c_void_p(fp))
    assert len(out) == w * h * 3, len(out)
    open(out_path, "wb").write(bytes(out))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "encode":
        encode(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
               int(sys.argv[5]), int(sys.argv[6]), sys.argv[7])
    elif mode == "decode":
        decode(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5])
    else:
        raise SystemExit(f"unknown mode {mode}")
