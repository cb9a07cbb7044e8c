"""Minimal pure-NumPy PNG codec (public spec, RFC 2083 / W3C PNG).

The container ships no image libraries, but PNG's container format is
zlib + per-scanline byte filters — implementable exactly with stdlib
zlib and NumPy. Supports 8-bit greyscale (color type 0), RGB (2) and
RGBA (6), non-interlaced. The encoder emits filter 0 (None) scanlines;
the decoder reconstructs all five standard filters (None/Sub/Up/
Average/Paeth), so externally-produced images decode too.

This gives the multimodal operators a REAL decode path (pixels in,
statistics out) instead of a stub, while staying dependency-free.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (h, w) or (h, w, {1,3,4}) uint8 array as PNG."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = _COLOR_TYPE[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * ch)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, channels) uint8 array."""
    buf = bytes(data)
    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    idat = bytearray()
    w = h = ch = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        typ = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            ch = _CHANNELS[color_type]
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline data size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = rows[y, 1:].copy()
        f = int(filters[y])
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorized
            cur = line + prev
        elif f == 1:  # Sub — sequential in pixel steps
            cur = line
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif f == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                b = int(prev[i])
                cur[i] = (int(cur[i]) + int(_paeth(
                    np.uint8(a), np.uint8(b), np.uint8(c)
                ))) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: grey 8x8 block means thresholded by their
    mean — the standard perceptual fingerprint for near-dup images."""
    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    blocks = np.empty((8, 8))
    for i, rows in enumerate(np.array_split(arr, 8, axis=0)):
        for j, blk in enumerate(np.array_split(rows, 8, axis=1)):
            blocks[i, j] = blk.mean() if blk.size else 0.0
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed 64-bit
