"""Real, dependency-free media codecs (numpy only): uncompressed 24-bit
BMP images and 16-bit PCM WAV audio.

These are genuine binary decoders — byte-level parsing of the BMP
BITMAPINFOHEADER / RIFF-WAVE container formats per their public
specifications — so the engine's media pipeline has a REAL codec path that
runs in this container (no PIL/ffmpeg available).  Formats needing entropy
coding (JPEG/PNG/MP3/H.264) remain behind the ``decoder="real"`` seam in
:mod:`..stages.media`.

Encoders exist so tests and the synthetic media store can produce real
files; decode(encode(x)) round-trips bit-exactly.
"""

from __future__ import annotations

import struct

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
