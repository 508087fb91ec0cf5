"""Minimal pure-Python PNG codec — the pillow fallback for the real-codec
media path (VERDICT r04 #4).

Implements the public PNG format (W3C PNG spec / RFC 2083) with the
standard library only (zlib for DEFLATE + CRC32) plus numpy for pixel
arrays:

- ``png_size``: IHDR-only width/height probe (no decompression) — what
  ``decode_media(use_real_codecs=True)`` needs per payload.
- ``decode_png``: full decode of non-interlaced 8-bit images, color types
  0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), all five scanline filters
  (None/Sub/Up/Average/Paeth). Palette (3) and 16-bit images raise
  ``ValueError`` and are treated as undecodable by callers — same
  kept-row/zeroed-metadata contract as any corrupt payload.
- ``encode_png``: filter-0 scanlines + zlib, emitting the matching color
  type for 1/2/3/4-channel uint8 arrays.
- ``resize_nearest``: nearest-neighbor resampling via numpy indexing.

Scale note: the unfilter step runs per-byte Python for the sequential
filters (Sub/Average/Paeth depend on the previous reconstructed pixel), so
this codec is a correctness fallback for environments without pillow —
when pillow (C-backed) is importable the media operators prefer it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> channels
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def png_size(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR chunk — cheap, no decompression."""
    if data[:8] != SIGNATURE or data[12:16] != b"IHDR" or len(data) < 24:
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        yield typ, body
        pos += 12 + length  # length + type + body + crc
        if typ == b"IEND":
            break


def decode_png(data: bytes) -> np.ndarray:
    """Decode to a (height, width, channels) uint8 array."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG")
    ihdr = None
    idat = []
    for typ, body in _chunks(data):
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = row
    return out.reshape(h, w, ch)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array, filter-0 rows."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w, ch = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    flat = a.reshape(h, w * ch)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w[, c]) array via index maps."""
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot resize an empty image")
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    return arr[yi][:, xi]
