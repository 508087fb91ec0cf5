"""WAV/PCM header codec (functions/wav.py) + the Spark audio-metadata
paths: chunk-walking mapInPandas decode, the zero-Python canonical-header
SQL scan, and their parity."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.multimodal import (
    decode_audio,
    decode_audio_headers_sql,
    synthesize_wav,
)
from gmall_flink_yb_spark.functions.wav import encode_wav, wav_info
from gmall_flink_yb_spark.plans.inspect import _simple_plan


def test_wav_roundtrip_and_rejects():
    w = encode_wav(np.zeros((1234, 2), dtype=np.int16), 22_050)
    assert wav_info(w) == (22_050, 2, 16, 1234)
    mono = encode_wav(np.arange(16, dtype=np.int16), 8_000)
    assert wav_info(mono) == (8_000, 1, 16, 16)
    # golden header bytes: canonical 44-byte layout
    assert mono[:4] == b"RIFF" and mono[8:16] == b"WAVEfmt "
    assert struct.unpack("<I", mono[24:28])[0] == 8_000
    for bad in (b"", b"RIFF", b"RIFFxxxxWAVX", b"\x89PNG\r\n\x1a\n"):
        with pytest.raises(ValueError):
            wav_info(bad)
    # non-PCM format tag (e.g. 0x55 = MP3-in-WAV) is undecodable here
    mp3ish = bytearray(mono)
    mp3ish[20:22] = struct.pack("<H", 0x55)
    with pytest.raises(ValueError):
        wav_info(bytes(mp3ish))


def test_wav_info_walks_extra_chunks():
    """Non-canonical but valid WAV: a LIST chunk between fmt and data must
    not break the chunk walker (this is exactly what the SQL fast path
    can't do — documented split)."""
    base = encode_wav(np.zeros(100, dtype=np.int16), 16_000)
    fmt_chunk = base[12:36]       # "fmt " + size + 16-byte body
    data_chunk = base[36:]        # "data" + size + samples
    info = b"INFOsoft"
    lst = b"LIST" + struct.pack("<I", len(info)) + info
    body = fmt_chunk + lst + data_chunk
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert wav_info(wav) == (16_000, 1, 16, 100)


def test_decode_audio_through_spark(spark):
    """Executed Spark-side audio decode on genuine PCM payloads, plus the
    kept-row/zeroed-metadata contract for undecodable bytes."""
    rows = [
        (1, "audio", bytearray(encode_wav(np.zeros((500, 2), dtype=np.int16), 12_000))),
        (2, "audio", bytearray(b"not audio at all")),
        (3, "audio", bytearray(b"")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    )
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert (
        got[1]["sample_rate"], got[1]["n_channels"],
        got[1]["bits_per_sample"], got[1]["n_frames"], got[1]["duration_ms"],
    ) == (12_000, 2, 16, 500, 41)  # floor(500000/12000)
    for mid in (2, 3):
        assert got[mid]["sample_rate"] == 0 and got[mid]["n_frames"] == 0


def test_audio_header_sql_matches_pandas_and_is_python_free(spark, sf_dir):
    """On canonical WAVs (what encode_wav/synthesize_wav emit) the
    codegen-only header scan must equal the chunk-walking decode row for
    row, with NO Python stage in its plan."""
    from gmall_flink_yb_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(50)
    wavs = synthesize_wav(docs)
    corrupt = spark.createDataFrame(
        [(9901, "audio", bytearray(b"RIFFxxxxWAVEjunk"))],
        "media_id long, media_type string, content binary",
    )
    inp = wavs.union(corrupt)
    cols = ["sample_rate", "n_channels", "bits_per_sample", "n_frames", "duration_ms"]
    via_sql = {
        r["media_id"]: tuple(r[c] for c in cols)
        for r in decode_audio_headers_sql(inp).collect()
    }
    via_pandas = {
        r["media_id"]: tuple(r[c] for c in cols)
        for r in decode_audio(inp).collect()
    }
    assert via_sql == via_pandas and len(via_sql) == 51

    plan = _simple_plan(decode_audio_headers_sql(corrupt))
    for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                 "BatchEvalPython"):
        assert node not in plan, f"audio header scan forked Python: {node}"
