"""Minimal pure-stdlib WAV/PCM header codec — real audio metadata for the
media path (VERDICT r05 #8), following the ``functions/png.py`` pattern.

Implements the public RIFF/WAVE container format (Microsoft/IBM WAVE
spec; also RFC 2361 for format tags) with ``struct`` only:

- ``wav_info``: parse the ``fmt `` chunk (+ ``data`` chunk size) into
  (sample_rate, n_channels, bits_per_sample, n_frames) WITHOUT touching
  sample data — the audio analogue of ``png.png_size``. Duration follows
  as n_frames / sample_rate.
- ``encode_wav``: canonical 44-byte-header PCM16 writer for fixtures and
  round-trip tests.

Chunk walking is tolerant of extra chunks (LIST/INFO, fact, cue) and of a
missing/truncated ``data`` chunk (n_frames 0) but rejects non-RIFF/WAVE
payloads and non-PCM format tags with ``ValueError`` — callers treat that
exactly like any undecodable payload (zeroed metadata, kept row).

Scale note: header-only parsing is O(#chunks), no sample decode — cheap
enough for per-row use inside an Arrow batch. Compressed codecs
(MP3/AAC/FLAC) need external libraries this container doesn't ship; they
raise ValueError here and fall into the undecodable contract.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_TAGS = {1, 3}  # integer PCM, IEEE float PCM (RFC 2361)


def wav_info(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, bits_per_sample, n_frames) from the
    RIFF/fmt/data chunk headers — no sample data is read."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(data)
    fmt = None
    data_size = 0
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            tag, channels, rate, _byte_rate, block_align, bits = (
                struct.unpack("<HHIIHH", body[:16])
            )
            if tag not in _PCM_TAGS:
                raise ValueError(f"non-PCM format tag {tag}")
            if channels == 0 or rate == 0 or block_align == 0:
                raise ValueError("degenerate fmt chunk")
            fmt = (rate, channels, bits, block_align)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("no fmt chunk")
    rate, channels, bits, block_align = fmt
    return rate, channels, bits, data_size // block_align


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """PCM16 WAV from an int16 array shaped (n_frames,) or
    (n_frames, n_channels) — canonical 44-byte header + interleaved data."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    block_align = channels * 2
    data = arr.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data
