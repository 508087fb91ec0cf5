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
    scan_audio_metadata,
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


def _list_chunked_wav(n_frames=100, rate=16_000) -> bytes:
    """Valid but NON-canonical WAV: a LIST/INFO chunk between fmt and
    data, so the fixed-offset SQL fast path cannot parse it."""
    base = encode_wav(np.zeros(n_frames, dtype=np.int16), rate)
    fmt_chunk = base[12:36]
    data_chunk = base[36:]
    info = b"INFOsoft"
    lst = b"LIST" + struct.pack("<I", len(info)) + info
    body = fmt_chunk + lst + data_chunk
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_scan_audio_metadata_two_tier(spark):
    """The composed operator (VERDICT r6 #7): canonical rows take the
    codegen tier, a LIST-chunked WAV gets REAL metadata via the chunk
    walker (where the SQL-only scan zeroes it), undecodable bytes keep
    the zeroed-row contract, and every input row appears exactly once."""
    rows = [
        (1, "audio", bytearray(encode_wav(np.zeros((500, 2), dtype=np.int16), 12_000))),
        (2, "audio", bytearray(_list_chunked_wav())),
        (3, "audio", bytearray(b"not audio at all")),
        (4, "audio", None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    )
    got = {r["media_id"]: r for r in scan_audio_metadata(df).collect()}
    assert sorted(got) == [1, 2, 3, 4]
    assert (
        got[1]["sample_rate"], got[1]["n_channels"], got[1]["n_frames"]
    ) == (12_000, 2, 500)
    # the fallback tier recovers the LIST-chunked file's real metadata...
    assert (
        got[2]["sample_rate"], got[2]["n_channels"],
        got[2]["bits_per_sample"], got[2]["n_frames"],
    ) == (16_000, 1, 16, 100)
    # ...which the SQL-only scan cannot (documented split)
    sql_only = {
        r["media_id"]: r for r in decode_audio_headers_sql(df).collect()
    }
    assert sql_only[2]["sample_rate"] == 0
    for mid in (3, 4):
        assert got[mid]["sample_rate"] == 0 and got[mid]["n_frames"] == 0


def test_scan_audio_metadata_persist_input_owned_and_released(spark):
    """persist_input=True evaluates a derived upstream once; the persist
    is tagged on the result and freed by release_cache (the repo's
    caller-owned cache contract)."""
    from gmall_flink_yb_spark.functions.cacheutil import release_cache

    def _ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(i) for i in jmap.keySet().toArray()}

    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("text"),
    )
    before = _ids()
    out = scan_audio_metadata(synthesize_wav(docs), persist_input=True)
    assert out.count() == 10
    release_cache(out)
    assert _ids() - before == set(), "persisted input leaked past release"


def test_scan_audio_metadata_adds_single_fallback_python_stage(spark):
    """The composed plan's ONLY added Python node is the fallback tier
    under the non-canonical filter; the canonical tier stays codegen-only.
    Counted against the input's own Python stages (synthesize_wav is
    itself one mapInPandas, and the union references the input twice)."""
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )
    wavs = synthesize_wav(docs)
    composed = scan_audio_metadata(wavs)
    # correctness: equals the chunk walker row for row
    assert sorted(map(tuple, composed.collect())) == sorted(
        map(tuple, decode_audio(wavs).collect())
    )
    base_stages = _simple_plan(wavs).count("MapInPandas")
    assert base_stages == 1  # synthesize_wav itself
    composed_stages = _simple_plan(composed).count("MapInPandas")
    # two branches re-scan the input (2 * base) + exactly 1 fallback tier
    assert composed_stages == 2 * base_stages + 1, (
        f"expected one fallback Python stage, plan has {composed_stages}"
    )
