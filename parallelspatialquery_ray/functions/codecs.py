"""Real, dependency-free media codecs (numpy + stdlib zlib): uncompressed
24-bit BMP images, 8-bit PNG images (gray / RGB / RGBA, all five row
filters, DEFLATE via stdlib zlib), baseline sequential JPEG (ITU-T T.81:
8x8 DCT, Annex-K quantization + Huffman tables, JFIF markers), and
16-bit PCM WAV audio.

These are genuine binary decoders — byte-level parsing of the BMP
BITMAPINFOHEADER / PNG chunk+filter / JPEG marker+entropy-segment /
RIFF-WAVE formats per their public specifications — so the engine's
media pipeline has REAL codec paths covering both stdlib-entropy (PNG
via zlib) and hand-rolled-entropy (JPEG Huffman) formats in this
container (no PIL/ffmpeg available).  Formats whose decoding is out of
scope for a data engine (MP3/H.264-class) remain behind the
``decoder="real"`` seam in :mod:`..stages.media`.

Encoders exist so tests and the synthetic media store can produce real
files; BMP/PNG/WAV decode(encode(x)) round-trips bit-exactly.  JPEG is
lossy by construction, but its entropy layer is exactly invertible:
``decode_jpeg(encode_jpeg(x, q)) == jpeg_reference_pixels(x, q)``
bit-for-bit, where :func:`jpeg_reference_pixels` computes the expected
reconstruction mathematically (DCT -> quantize -> dequantize -> IDCT)
WITHOUT touching bytes — so an oracle built on it independently
verifies the Huffman coder, the byte stuffing and the marker parser.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP (Windows bitmap, BITMAPINFOHEADER, 24-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP bytes (bottom-up)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "encode_bmp expects (h, w, 3) RGB"
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    image_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size,
                      2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + dib + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (h, w, 3) uint8 RGB.  Handles
    bottom-up (positive height) and top-down (negative height) bitmaps."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h_signed, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, "
                         f"compression={compression}); only 24-bit BI_RGB")
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=row_size * h, offset=offset)
    rows = raw.reshape(h, row_size)[:, :w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up -> top-down
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# PNG (ISO/IEC 15948: 8-bit gray / RGB / RGBA, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG filter 4), vectorized over channel lanes."""
    p = left.astype(np.int32) + up.astype(np.int32) - ul.astype(np.int32)
    pa_ = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - ul)
    return np.where((pa_ <= pb) & (pa_ <= pc), left,
                    np.where(pb <= pc, up, ul)).astype(np.int32)


def encode_png(img: np.ndarray, *, filter_type: int = 0,
               level: int = 6) -> bytes:
    """(h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA uint8 -> PNG bytes.

    ``filter_type`` (0=None 1=Sub 2=Up 3=Average 4=Paeth) is applied
    uniformly to every scanline; the decoder handles all five regardless.
    Filtering is vectorized (the encode direction has no sequential
    dependency — predictors read RECONSTRUCTED bytes, which at encode time
    are just the source image)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, px = 0, img[:, :, None]
    elif img.shape[2] == 3:
        color, px = 2, img
    elif img.shape[2] == 4:
        color, px = 6, img
    else:
        raise ValueError(f"unsupported channel count {img.shape[2]}")
    h, w, bpp = px.shape
    flat = px.reshape(h, w * bpp).astype(np.int32)
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, bpp:] = flat[:-1, :-bpp]
    if filter_type == 0:
        raw = flat
    elif filter_type == 1:
        raw = flat - left
    elif filter_type == 2:
        raw = flat - up
    elif filter_type == 3:
        raw = flat - ((left + up) >> 1)
    elif filter_type == 4:
        raw = flat - _paeth(left, up, ul)
    else:
        raise ValueError(f"unknown PNG filter {filter_type}")
    lines = np.empty((h, 1 + w * bpp), dtype=np.uint8)
    lines[:, 0] = filter_type
    lines[:, 1:] = (raw & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(lines.tobytes(), level))
            + _png_chunk(b"IEND", b""))


def _unfilter_row(f: int, raw: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """One scanline of PNG unfiltering.  raw/prev are (w*bpp,) uint8;
    returns the reconstructed row.  None/Sub/Up are fully vectorized; the
    Average/Paeth left-dependency forces a per-pixel walk (vectorized over
    the bpp channel lanes), which only runs on files that used them."""
    if f == 0:
        return raw.copy()
    if f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] — per-lane cumsum
        lanes = raw.reshape(-1, bpp).astype(np.uint64)
        return (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
    if f == 2:  # Up
        return ((raw.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
    r2 = raw.reshape(-1, bpp).astype(np.int32)
    p2 = prev.reshape(-1, bpp).astype(np.int32)
    out = np.empty_like(r2)
    left = np.zeros(bpp, dtype=np.int32)
    ul = np.zeros(bpp, dtype=np.int32)
    if f == 3:  # Average
        for x in range(r2.shape[0]):
            left = (r2[x] + ((left + p2[x]) >> 1)) & 0xFF
            out[x] = left
    elif f == 4:  # Paeth
        for x in range(r2.shape[0]):
            left = (r2[x] + _paeth(left, p2[x], ul)) & 0xFF
            out[x] = left
            ul = p2[x]
    else:
        raise ValueError(f"unknown PNG filter {f}")
    return out.astype(np.uint8).reshape(-1)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 gray or (h, w, 3|4) uint8 RGB(A).

    Real chunk walk (CRC-verified), stdlib-zlib inflate of the
    concatenated IDAT stream, and per-scanline unfiltering of all five
    PNG filter types.  8-bit non-interlaced gray/RGB/RGBA only (bit
    depths 1/2/4/16, palettes and Adam7 raise)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    w = h = depth = color = interlace = None
    idat = []
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + size]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + size)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    if depth != 8 or color not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); only 8-bit non-interlaced "
            "gray/RGB/RGBA")
    bpp = {0: 1, 2: 3, 6: 4}[color]
    stride = w * bpp
    lines = np.frombuffer(zlib.decompress(b"".join(idat)),
                          dtype=np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = _unfilter_row(int(lines[y, 0]), lines[y, 1:], prev, bpp)
        out[y] = row
        prev = row.astype(np.int32)
    return out.reshape(h, w) if color == 0 else out.reshape(h, w, bpp)


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 baseline sequential DCT, JFIF, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------
# The entropy layer (Huffman + byte stuffing) is exactly invertible, so
# decode_jpeg(encode_jpeg(x, q)) reproduces jpeg_reference_pixels(x, q)
# bit-for-bit: encoder and reference share _jpeg_forward, decoder and
# reference share _jpeg_reconstruct, and the decoder recovers the exact
# quantized coefficients from the bitstream.

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_L = (bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
              bytes(range(12)))
_HUFF_DC_C = (bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
              bytes(range(12)))
_HUFF_AC_L = (bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]),
              bytes.fromhex(
    "01020300041105122131410613516107227114328191a1082342b1c11552d1f0"
    "2433627282090a161718191a25262728292a343536373839"
    "3a434445464748494a535455565758595a636465666768696a"
    "737475767778797a838485868788898a92939495969798999a"
    "a2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9ca"
    "d2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9fa"))
_HUFF_AC_C = (bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]),
              bytes.fromhex(
    "000102031104052131061241510761711322328108144291a1b1c109233352f0"
    "156272d10a162434e125f11718191a262728292a35363738"
    "393a434445464748494a535455565758595a636465666768"
    "696a737475767778797a82838485868788898a9293949596"
    "9798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5"
    "c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9fa"))

_DCT_C = None  # built lazily (cos table)


def _dct_matrix() -> np.ndarray:
    global _DCT_C
    if _DCT_C is None:
        x = np.arange(8, dtype=np.float64)
        c = np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / 16.0)
        c[0] *= 1.0 / np.sqrt(8.0)
        c[1:] *= 0.5
        _DCT_C = c
    return _DCT_C


def _jpeg_qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the conventional quality formula."""
    q = int(min(100, max(1, quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(base):
        return np.clip((base * scale + 50) // 100, 1, 255)
    return s(_Q_LUMA), s(_Q_CHROMA)


def _canonical_codes(bits: bytes, vals: bytes) -> list[tuple[int, int, int]]:
    """(value, code, length) triples from a BITS/HUFFVAL spec (T.81 C.2)."""
    out = []
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((vals[k], code, ln))
            code += 1
            k += 1
        code <<= 1
    return out


def _enc_table(spec) -> dict[int, tuple[int, int]]:
    return {v: (c, ln) for v, c, ln in _canonical_codes(*spec)}


def _dec_table(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    return {(ln, c): v for v, c, ln in _canonical_codes(bits, vals)}


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64 with H, W multiples of 8 -> (n, 8, 8) raster order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(bh * bw, 8, 8))


def _jpeg_forward(img: np.ndarray, quality: int):
    """RGB -> per-component quantized coefficients in zigzag order.

    Returns (zs, (qy, qc), h, w, bw_blocks): zs is [Y, Cb, Cr] each
    (n_blocks, 64) int32.  Shared by the encoder and by
    :func:`jpeg_reference_pixels` so both quantize identically."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "JPEG path expects (h, w, 3) RGB"
    ph, pw = -h % 8, -w % 8
    px = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge"
                ).astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qy, qc = _jpeg_qtables(quality)
    cm = _dct_matrix()
    zs = []
    for plane, qt in ((y, qy), (cb, qc), (cr, qc)):
        d = np.matmul(np.matmul(cm, _blocks(plane) - 128.0), cm.T)
        z = np.round(d / qt.astype(np.float64)).astype(np.int32)
        zs.append(z.reshape(-1, 64)[:, _ZZ])
    return zs, (qy, qc), h, w, (w + pw) // 8


def _jpeg_reconstruct(zs, qts, h: int, w: int) -> np.ndarray:
    """Quantized zigzag coefficients -> (h, w, 3) uint8 RGB.  Shared by
    the decoder and by :func:`jpeg_reference_pixels`, so a bitstream
    decode and the mathematical reference follow ONE code path."""
    cm = _dct_matrix()
    bw = (w + 7) // 8
    bh = (h + 7) // 8
    planes = []
    for z, qt in zip(zs, qts):
        flat = np.zeros((z.shape[0], 64), dtype=np.float64)
        flat[:, _ZZ] = z.astype(np.float64)
        d = flat.reshape(-1, 8, 8) * qt.astype(np.float64)
        x = np.matmul(np.matmul(cm.T, d), cm) + 128.0
        plane = (x.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        planes.append(plane[:h, :w])
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def jpeg_reference_pixels(img: np.ndarray, quality: int = 85) -> np.ndarray:
    """The mathematically expected decode of ``encode_jpeg(img, quality)``
    — DCT -> quantize -> dequantize -> IDCT -> color convert — computed
    WITHOUT producing or parsing any bytes.  An oracle built on this
    independently verifies the encoder's Huffman coder, byte stuffing
    and marker layout, because the decoder only matches it if the
    bitstream round-trips every coefficient exactly."""
    zs, (qy, qc), h, w, _bw = _jpeg_forward(img, quality)
    return _jpeg_reconstruct(zs, (qy, qc, qc), h, w)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0)
            self.acc = self.n = 0


def _cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw_: _BitWriter, z: np.ndarray, pred: int,
                  dc_tbl, ac_tbl) -> int:
    dc = int(z[0])
    diff = dc - pred
    s = _cat(diff)
    code, ln = dc_tbl[s]
    bw_.write(code, ln)
    if s:
        bw_.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(z[1:])[0]
    last = -1
    for p in nz:
        run = int(p) - last - 1
        last = int(p)
        while run >= 16:
            code, ln = ac_tbl[0xF0]          # ZRL
            bw_.write(code, ln)
            run -= 16
        v = int(z[1 + p])
        s = _cat(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw_.write(code, ln)
        bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
    if last < 62:
        code, ln = ac_tbl[0x00]              # EOB
        bw_.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline sequential JFIF bytes (4:4:4,
    Annex K quantization + Huffman tables, no restart intervals)."""
    zs, (qy, qc), h, w, _bw = _jpeg_forward(img, quality)
    out = bytearray(b"\xff\xd8")                               # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00"
                + struct.pack(">HH", 1, 1) + b"\x00\x00")      # APP0
    out += _seg(0xDB, b"\x00" + bytes(qy.reshape(64)[_ZZ].astype(np.uint8)))
    out += _seg(0xDB, b"\x01" + bytes(qc.reshape(64)[_ZZ].astype(np.uint8)))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
                + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")     # SOF0
    for cls_id, spec in ((0x00, _HUFF_DC_L), (0x10, _HUFF_AC_L),
                         (0x01, _HUFF_DC_C), (0x11, _HUFF_AC_C)):
        out += _seg(0xC4, bytes([cls_id]) + spec[0] + spec[1])
    out += _seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    dc_l, ac_l = _enc_table(_HUFF_DC_L), _enc_table(_HUFF_AC_L)
    dc_c, ac_c = _enc_table(_HUFF_DC_C), _enc_table(_HUFF_AC_C)
    wtr = _BitWriter()
    preds = [0, 0, 0]
    tbls = ((dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c))
    for i in range(zs[0].shape[0]):                     # MCU raster order
        for c in range(3):
            preds[c] = _encode_block(wtr, zs[c][i], preds[c], *tbls[c])
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential JFIF bytes -> (h, w, 3) uint8 RGB.

    Real marker walk (DQT/SOF0/DHT/SOS), byte-unstuffed bitstream,
    canonical Huffman decode of every coefficient, then the same
    dequantize+IDCT path as :func:`jpeg_reference_pixels`.  Baseline
    8-bit 3-component 4:4:4 without restart markers only (progressive,
    subsampled and 12-bit scans raise)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q: list[int] = []
    scan_tbl: list[tuple[int, int]] = []
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        m = data[pos + 1]
        if m == 0xD9:
            raise ValueError("EOI before SOS")
        (size,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + size]
        if m == 0xDB:
            at = 0
            while at < len(body):
                if body[at] >> 4 != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tq = body[at] & 15
                flat = np.zeros(64, dtype=np.int64)
                flat[_ZZ] = np.frombuffer(body, np.uint8, 64, at + 1)
                qt[tq] = flat.reshape(8, 8)
                at += 65
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF marker 0x{m:02x}; "
                             "only baseline sequential (SOF0)")
        elif m == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component JPEG")
            for c in range(nc):
                _cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported "
                                     "(4:4:4 only)")
                comp_q.append(tq)
        elif m == 0xC4:
            at = 0
            while at < len(body):
                tc_th = body[at]
                bits = body[at + 1:at + 17]
                n = sum(bits)
                vals = body[at + 17:at + 17 + n]
                huff[(tc_th >> 4, tc_th & 15)] = _dec_table(bits, vals)
                at += 17 + n
        elif m == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif m == 0xDA:
            ns = body[0]
            if ns != 3:
                raise ValueError("only 3-component scans")
            for c in range(ns):
                td_ta = body[2 + 2 * c]
                scan_tbl.append((td_ta >> 4, td_ta & 15))
            pos += 2 + size
            break
        pos += 2 + size
    else:
        raise ValueError("missing SOS")
    if h is None or not qt or not huff:
        raise ValueError("missing SOF/DQT/DHT before SOS")
    # --- byte-unstuff the entropy-coded segment ---
    scan = bytearray()
    while pos < len(data):
        b = data[pos]
        if b == 0xFF:
            nxt = data[pos + 1] if pos + 1 < len(data) else 0xD9
            if nxt == 0x00:
                scan.append(0xFF)
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart markers unsupported")
            break                                # EOI or next marker
        scan.append(b)
        pos += 1
    bits = np.unpackbits(np.frombuffer(bytes(scan), dtype=np.uint8))
    p = 0

    def read_huff(tbl) -> int:
        nonlocal p
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | int(bits[p])
            p += 1
            v = tbl.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in scan")

    def read_val(s: int) -> int:
        nonlocal p
        v = 0
        for _ in range(s):
            v = (v << 1) | int(bits[p])
            p += 1
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    bh, bw = (h + 7) // 8, (w + 7) // 8
    n = bh * bw
    zs = [np.zeros((n, 64), dtype=np.int32) for _ in range(3)]
    preds = [0, 0, 0]
    dec_tbls = [(huff[(0, td)], huff[(1, ta)]) for td, ta in scan_tbl]
    for i in range(n):
        for c in range(3):
            dc_t, ac_t = dec_tbls[c]
            z = zs[c]
            s = read_huff(dc_t)
            preds[c] += read_val(s) if s else 0
            z[i, 0] = preds[c]
            k = 1
            while k < 64:
                rs = read_huff(ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break                        # EOB
                k += r
                z[i, k] = read_val(s)
                k += 1
    return _jpeg_reconstruct(zs, tuple(qt[comp_q[c]] for c in range(3)),
                             h, w)


def decode_image(data: bytes) -> np.ndarray:
    """Format-sniffing image decode: BMP, PNG or JPEG by magic bytes;
    gray PNG is expanded to (h, w, 3) so downstream stages see one
    layout."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        img = decode_png(data)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img[:, :, :3] if img.shape[2] == 4 else img
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    raise ValueError("unrecognized image format (not BMP, PNG or JPEG)")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    """Inverse of :func:`decode_image` for the formats the engine writes."""
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "jpeg":
        return encode_jpeg(img)
    raise ValueError(f"unsupported image format {fmt!r}")


def sniff_image_format(data: bytes) -> str:
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    raise ValueError("unrecognized image format (not BMP, PNG or JPEG)")


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 16-bit)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> PCM-16 WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    block_align = ch * 2
    byte_rate = sample_rate * block_align
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate,
                      block_align, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM-16 WAV bytes -> (sample_rate, (n, channels) int16).  Walks the
    RIFF chunk list, so extra chunks (LIST/fact/...) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            (audio_format, channels, sample_rate, _br, _ba,
             bits) = struct.unpack_from("<HHIIHH", data, body)
            if audio_format != 1:
                raise ValueError(f"unsupported WAV format {audio_format}; "
                                 "only PCM")
        elif cid == b"data":
            pcm = data[body:body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits}; only 16")
    s = np.frombuffer(pcm, dtype="<i2")
    n = len(s) // channels
    return sample_rate, s[:n * channels].reshape(n, channels)


# ---------------------------------------------------------------------------
# Deterministic asset stats — the media oracle's common ground
# ---------------------------------------------------------------------------
# Computed identically from a raw array by the GENERATOR (before encoding)
# and by the DECODE stage (after decoding), so an encode->ship->decode
# roundtrip is verifiable by exact integer comparison: any codec or
# plumbing bug (wrong payload attached to a ref, truncated bytes, filter
# mis-unapplied) changes pix_sum/crc32.

def image_stats(img: np.ndarray) -> tuple[int, int, int, int]:
    """(h, w, c) uint8 -> (width, height, pix_sum, crc32-of-raw-bytes)."""
    h, w = img.shape[:2]
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    return (int(w), int(h), int(arr.sum(dtype=np.int64)),
            int(zlib.crc32(arr.tobytes())))


def audio_stats(samples: np.ndarray) -> tuple[int, int, int, int]:
    """(n,) or (n, ch) int16 -> (n, channels, pcm_sum, crc32).  The byte
    stream of (n,) and (n, 1) is identical, so both shapes yield the same
    checksum."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    n = s.shape[0]
    ch = 1 if s.ndim == 1 else int(s.shape[1])
    return (int(n), ch, int(s.sum(dtype=np.int64)),
            int(zlib.crc32(s.tobytes())))
