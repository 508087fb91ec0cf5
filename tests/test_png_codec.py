"""Unit tests for the bundled pure-Python PNG codec (functions/png.py).

The decoder is validated against fixtures built DIRECTLY from the W3C PNG
spec in this file (chunk grammar + filter formulas re-implemented
independently below), not against the bundled encoder — so an
encoder+decoder that agreed on a wrong format would still fail here. No
SparkSession: milliseconds."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from gmall_flink_yb_spark.functions.png import (
    SIGNATURE,
    decode_png,
    encode_png,
    png_size,
    resize_nearest,
)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _png_from_raw(w: int, h: int, color_type: int, raw: bytes) -> bytes:
    """Assemble a PNG around an already-filtered raw scanline stream."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_golden_2x2_rgb_filter0():
    """Hand-assembled 2x2 RGB image, filter 0 rows, pixels spelled out."""
    # row0: red, green ; row1: blue, white
    raw = (
        b"\x00" + bytes([255, 0, 0, 0, 255, 0])
        + b"\x00" + bytes([0, 0, 255, 255, 255, 255])
    )
    data = _png_from_raw(2, 2, 2, raw)
    assert png_size(data) == (2, 2)
    arr = decode_png(data)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert np.array_equal(arr, expect)


def _ref_filter(pixels: np.ndarray, ftype: int, ch: int) -> bytes:
    """Independent re-implementation of the spec's filter ENCODING
    (section 6: Sub/Up/Average/Paeth over the reconstructed bytes)."""
    h, stride = pixels.shape
    out = b""
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = pixels[y].astype(np.int32)
        filt = bytearray()
        for i in range(stride):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt.append((int(row[i]) - pred) & 0xFF)
        out += bytes([ftype]) + bytes(filt)
        prev = row
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch,color_type", [(1, 0), (3, 2), (4, 6)])
def test_every_filter_type_unfilters(ftype, ch, color_type):
    rng = np.random.default_rng(ftype * 10 + ch)
    pixels = rng.integers(0, 256, size=(5, 4 * ch), dtype=np.uint8)
    raw = _ref_filter(pixels, ftype, ch)
    arr = decode_png(_png_from_raw(4, 5, color_type, raw))
    assert np.array_equal(arr, pixels.reshape(5, 4, ch))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_encode_decode_roundtrip(ch):
    rng = np.random.default_rng(ch)
    img = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
    data = encode_png(img)
    assert png_size(data) == (5, 7)
    assert np.array_equal(decode_png(data), img)


def test_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        png_size(b"JFIF not a png")
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\x00 corrupted signature!")
    # 16-bit depth: valid grammar, unsupported depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(data)


def test_resize_nearest():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    up = resize_nearest(img, 12, 8)
    assert up.shape == (8, 12, 3)
    # every source pixel block replicated
    assert np.array_equal(up[::2, ::2], img)
    down = resize_nearest(img, 3, 2)
    assert down.shape == (2, 3, 3)
    assert np.array_equal(down, img[::2, ::2])
