"""Real, dependency-free media codecs (numpy + stdlib zlib): uncompressed
24-bit BMP images, 8-bit PNG images (gray / RGB / RGBA, all five row
filters, DEFLATE via stdlib zlib), and 16-bit PCM WAV audio.

These are genuine binary decoders — byte-level parsing of the BMP
BITMAPINFOHEADER / PNG chunk+filter / RIFF-WAVE formats per their public
specifications — so the engine's media pipeline has a REAL codec path
covering an entropy-coded format (PNG) in this container (no PIL/ffmpeg
available).  Formats whose entropy coding is not in the stdlib
(JPEG/MP3/H.264) remain behind the ``decoder="real"`` seam in
:mod:`..stages.media`.

Encoders exist so tests and the synthetic media store can produce real
files; decode(encode(x)) round-trips bit-exactly.
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


def decode_image(data: bytes) -> np.ndarray:
    """Format-sniffing image decode: BMP or PNG by magic bytes; gray PNG
    is expanded to (h, w, 3) so downstream stages see one layout."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        img = decode_png(data)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img[:, :, :3] if img.shape[2] == 4 else img
    raise ValueError("unrecognized image format (not BMP or PNG)")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    """Inverse of :func:`decode_image` for the formats the engine writes."""
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "png":
        return encode_png(img)
    raise ValueError(f"unsupported image format {fmt!r}")


def sniff_image_format(data: bytes) -> str:
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == _PNG_SIG:
        return "png"
    raise ValueError("unrecognized image format (not BMP or PNG)")


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
