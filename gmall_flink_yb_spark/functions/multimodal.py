"""Multimodal (image/audio/video) column plumbing for the LLM-data pipeline.

No reference counterpart (BASELINE.json north star). Media is carried as an
opaque ``binary`` column plus typed metadata — the Spark-native layout for
payloads the engine moves but does not interpret:

    media_id: long, media_type: string, content: binary,
    meta: struct<width int, height int, sample_rate int, duration_ms long>

Every transform is a ``mapInPandas`` stage: Arrow moves the binary batches to
Python zero-copy, the pandas function works on a whole batch, and the output
schema is declared up front so Catalyst keeps planning around the stage.
At 100 TB the content column dominates I/O — transforms that only need
metadata (routing, filtering, sampling decisions) must select around
``content`` so the parquet scan prunes it (binary columns are only fetched
when referenced).

The actual codec work runs behind ``use_real_codecs=True``: image decode
and resize prefer pillow WHEN IMPORTABLE (probed at plan time so the code
path is fixed before any executor task runs) and otherwise fall back to
the bundled pure-Python PNG codec (``functions/png.py``, VERDICT r04 #4)
— real PNG bytes decode and resize in this codec-free container, and
non-PNG payloads hit the same undecodable contract (zeroed metadata /
resize passthrough) as corrupt bytes. The default path uses a
deterministic fake payload format (FAKE_HEADER below) so the Spark-side
plumbing — schema, batching, partitioning, multi-row emission — is real
and testable end-to-end either way. Audio/video codecs (av) remain
stubbed: no pure-Python fallback is practical for them.

Fake payload format (deterministic, oracle-friendly):
    bytes 0..3   magic b"FMM1"
    bytes 4..5   width  (big-endian uint16)   -- images/video
    bytes 6..7   height (big-endian uint16)
    bytes 8..    body (opaque)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"FMM1"
HEADER_LEN = 8

MEDIA_SCHEMA = (
    "media_id long, media_type string, content binary, "
    "width int, height int, sample_rate int, duration_ms long"
)


def synthesize_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media table from the documents fixture: the text
    bytes become the payload body, width/height derive arithmetically from
    the id (reproducible in any engine — the decode query is oracle-checked).
    Pure column expressions; the header is assembled JVM-side."""
    width = (F.lit(64) + F.pmod(F.col(id_col), F.lit(32)) * 16).cast("int")
    height = (F.lit(64) + F.pmod(F.col(id_col), F.lit(24)) * 16).cast("int")
    # header assembled as hex -> unhex: magic 464D4D31 ("FMM1") + two
    # big-endian uint16 fields
    header = F.unhex(
        F.concat(
            F.lit(FAKE_MAGIC.hex().upper()),
            F.lpad(F.hex(width), 4, "0"),
            F.lpad(F.hex(height), 4, "0"),
        )
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.concat(header, F.encode(F.col(text_col), "UTF-8")).alias("content"),
    )


def decode_media_headers_sql(df: DataFrame) -> DataFrame:
    """Metadata-only decode as pure column expressions — zero Python workers.

    At 100 TB the dominant media workload is metadata scans (routing,
    size/shape filters, corpus stats) that never need the payload decoded;
    paying the Arrow round-trip into Python for a fixed-offset header parse
    wastes the cluster. This path stays entirely inside whole-stage
    codegen: magic check + big-endian uint16 extraction via
    substring/hex/conv on the binary column. Output matches
    ``decode_media(use_real_codecs=False)`` row for row (parity and the
    no-Python-node plan shape are both pytest-asserted), including the
    zeroed-metadata-kept-row contract for undecodable payloads.
    """
    content = F.col("content")
    ok = (F.length(content) >= HEADER_LEN) & (
        F.substring(content, 1, 4) == F.lit(FAKE_MAGIC)
    )

    def be16(pos: int):  # big-endian uint16 at 1-based byte offset
        return F.conv(F.hex(F.substring(content, pos, 2)), 16, 10).cast(
            "int"
        )

    return df.select(
        "media_id",
        "media_type",
        "content",
        F.when(ok, be16(5)).otherwise(0).alias("width"),
        F.when(ok, be16(7)).otherwise(0).alias("height"),
        F.greatest(F.length(content) - HEADER_LEN, F.lit(0))
        .cast("long")
        .alias("body_bytes"),
    )


def _have_pillow() -> bool:
    """Probe the preferred codec at PLAN time (driver) so the chosen code
    path is fixed before any executor task runs. When pillow is absent the
    real-codec path falls back to the bundled pure-Python PNG codec
    (``functions/png.py``) — PNG payloads decode/resize for real; other
    formats hit the same undecodable contract (zeroed metadata / resize
    passthrough) they would hit as corrupt bytes."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Parse each payload into typed metadata columns.

    Real mode: `content` is treated as an encoded image; width/height come
    from an actual decoder — pillow when importable (any format it knows),
    else the bundled pure-Python PNG codec (PNG only; an IHDR-only probe,
    no decompression). Payloads the decoder cannot open get zeroed
    metadata — same kept-row contract as the fake path, so downstream
    dirty-data routing is identical. Fake mode parses the FMM1 header.
    Both are Arrow batch-at-a-time mapInPandas with the same output
    schema.
    """
    if use_real_codecs:
        pillow = _have_pillow()

        def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from gmall_flink_yb_spark.functions.png import png_size

            if pillow:
                from PIL import Image

                def _size(b: bytes) -> tuple[int, int]:
                    with Image.open(io.BytesIO(b)) as im:
                        return im.size
            else:
                _size = png_size

            for pdf in batches:
                out = pdf[["media_id", "media_type", "content"]].copy()
                widths, heights, n_bytes = [], [], []
                for buf in pdf["content"]:
                    b = bytes(buf)
                    try:
                        w, h = _size(b)
                    except Exception:
                        w, h = 0, 0  # undecodable -> zeroed metadata
                    widths.append(w)
                    heights.append(h)
                    n_bytes.append(len(b))
                out["width"] = pd.Series(widths, dtype="int32")
                out["height"] = pd.Series(heights, dtype="int32")
                out["body_bytes"] = pd.Series(n_bytes, dtype="int64")
                yield out

        return df.mapInPandas(
            decode_real,
            "media_id long, media_type string, content binary, "
            "width int, height int, body_bytes long",
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "media_type", "content"]].copy()
            widths, heights, n_bytes = [], [], []
            for buf in pdf["content"]:
                b = bytes(buf)
                if len(b) >= HEADER_LEN and b[:4] == FAKE_MAGIC:
                    w, h = struct.unpack(">HH", b[4:8])
                else:
                    w, h = 0, 0  # undecodable -> zeroed metadata, kept row
                widths.append(w)
                heights.append(h)
                n_bytes.append(max(len(b) - HEADER_LEN, 0))
            out["width"] = pd.Series(widths, dtype="int32")
            out["height"] = pd.Series(heights, dtype="int32")
            out["body_bytes"] = pd.Series(n_bytes, dtype="int64")
            yield out

    return df.mapInPandas(
        decode,
        "media_id long, media_type string, content binary, "
        "width int, height int, body_bytes long",
    )


def resize_images(
    df: DataFrame, target_w: int, target_h: int, use_real_codecs: bool = False
) -> DataFrame:
    """Resize image payloads to the target dimensions. Real mode decodes,
    resizes, and re-encodes as PNG — via pillow when importable, else the
    bundled pure-Python PNG codec (nearest-neighbor resample); undecodable
    payloads pass through untouched. Fake mode rewrites the FMM1 header
    and carries the body through. Only media_type == 'image' rows are
    transformed; others pass through."""
    if use_real_codecs:
        pillow = _have_pillow()

        def resize_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from gmall_flink_yb_spark.functions import png as _png

            if pillow:
                from PIL import Image

                def _one(b: bytes) -> bytes:
                    try:
                        with Image.open(io.BytesIO(b)) as im:
                            resized = im.resize((target_w, target_h))
                        buf = io.BytesIO()
                        # inside the try: a decodable image whose mode PNG
                        # can't encode (CMYK JPEG, I;16 TIFF) must also
                        # pass through, not fail the task
                        resized.save(buf, format="PNG")
                        return buf.getvalue()
                    except Exception:
                        return b  # undecodable/unencodable -> unchanged
            else:

                def _one(b: bytes) -> bytes:
                    try:
                        return _png.encode_png(
                            _png.resize_nearest(
                                _png.decode_png(b), target_w, target_h
                            )
                        )
                    except Exception:
                        return b  # non-PNG/undecodable -> unchanged

            for pdf in batches:
                out = pdf.copy()
                is_img = out["media_type"] == "image"
                out.loc[is_img, "content"] = out.loc[is_img, "content"].map(
                    lambda b: _one(bytes(b))
                )
                yield out

        return df.mapInPandas(resize_real, df.schema)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = FAKE_MAGIC + struct.pack(">HH", target_w, target_h)
        for pdf in batches:
            out = pdf.copy()
            is_img = out["media_type"] == "image"
            out.loc[is_img, "content"] = out.loc[is_img, "content"].map(
                lambda b: header + bytes(b)[HEADER_LEN:]
            )
            yield out

    return df.mapInPandas(resize, df.schema)


def sample_frames(df: DataFrame, frame_stride: int = 32) -> DataFrame:
    """Video frame sampling: one OUTPUT ROW PER SAMPLED FRAME (multi-row
    emission — the mapInPandas analogue of explode). The fake format treats
    each ``frame_stride`` bytes of body as one frame; a real implementation
    would seek keyframes with av. Non-video rows are dropped."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            ids, frame_idx, frames = [], [], []
            for mid, buf in zip(vids["media_id"], vids["content"]):
                body = bytes(buf)[HEADER_LEN:]
                for i in range(0, max(len(body), 1), frame_stride):
                    ids.append(mid)
                    frame_idx.append(i // frame_stride)
                    frames.append(body[i : i + frame_stride])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(frame_idx, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(sample, "media_id long, frame_idx long, frame binary")


_FEATURE_PROJ_CACHE: dict[int, np.ndarray] = {}


def _feature_projection(dim: int) -> np.ndarray:
    """256 x dim INTEGER projection matrix, md5-derived (identical on every
    run/executor/engine): w[b][j] = md5_60bit("feat:b:j") % 2001 - 1000.
    Same portable-hash idiom as the MinHash family and the SRP hyperplanes,
    so any SQL engine with md5 can rebuild it row-for-row."""
    if dim not in _FEATURE_PROJ_CACHE:
        import hashlib

        _FEATURE_PROJ_CACHE[dim] = np.array(
            [
                [
                    int(hashlib.md5(f"feat:{b}:{j}".encode()).hexdigest()[:15], 16)
                    % 2001
                    - 1000
                    for j in range(dim)
                ]
                for b in range(256)
            ],
            dtype=np.int64,
        )
    return _FEATURE_PROJ_CACHE[dim]


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic feature vector per payload (array<double>[dim]) — the
    stand-in for a real image/audio embedding model: the body's byte
    histogram projected through an md5-derived INTEGER matrix. All-integer
    arithmetic (hist @ proj in int64), so the vectors are exact — no float
    summation order to disagree about — and the downstream cosine dedup is
    fully oracle-checkable cross-engine. Histogram normalization is
    deliberately omitted: it scales every component by the same factor and
    cancels in cosine similarity.
    Output feeds the similarity operators (brute_force_topk / lsh_bucket_topk)
    directly: media dedup by embedding is media -> extract_features ->
    cosine_near_dup_pairs.

    No spread_file_scan at entry (r13, measured): on the starved
    single-split driver layout the whole Arrow feature stage runs on one
    core (~0.74 s at sf0.1 inside cosine_near_dup_pairs' sizing count),
    but the repair measured NET-SLOWER (interleaved min 2.67 -> 3.11 s,
    med 3.15 -> 3.98): the round-robin exchange + AQE round-trip plus
    32x python-worker task launches on BOTH cached consumer sides cost
    more than the one serialized feature pass saves. On healthy
    multi-split layouts the stage parallelizes by itself."""

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = _feature_projection(dim)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"media_id": pd.Series([], dtype="int64"),
                     "embedding": pd.Series([], dtype="object")}
                )
                continue
            # whole-batch histogram (r7 perf): one flattened (row, byte)
            # bincount + one batch GEMM instead of a per-row Python loop —
            # same exact int64 arithmetic, ~4x less Python time per batch
            bodies = [bytes(buf)[HEADER_LEN:] for buf in pdf["content"]]
            lens = np.fromiter((len(b) for b in bodies), dtype=np.int64,
                               count=n)
            flat = np.frombuffer(b"".join(bodies), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            hist = np.bincount(
                row_idx * 256 + flat, minlength=n * 256
            ).reshape(n, 256)
            vecs = (hist @ proj).astype(np.float64)  # |v| <= body_len*1000
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "embedding": vecs.tolist(),
                }
            )

    return df.mapInPandas(embed, "media_id long, embedding array<double>")


# ---------------------------------------------------------------------------
# Audio: real WAV/PCM metadata (VERDICT r05 #8). The codec itself is the
# bundled pure-stdlib RIFF parser (functions/wav.py) — unlike images there
# is no optional C library to prefer, so the "real" path is always on.
# ---------------------------------------------------------------------------

def synthesize_wav(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic real-WAV audio table from the documents fixture:
    each doc becomes a silent PCM16 payload with n_frames = char count,
    sample_rate = 8000 + (id % 4) * 4000, channels = 1 + (id // 4) % 2 —
    derivable from (id, text) in any engine, so decode queries are
    oracle-checkable without shipping audio fixtures. Payload bytes are
    written by ``wav.encode_wav`` inside an Arrow batch (the one place
    Python is required: SQL cannot emit binary PCM)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from gmall_flink_yb_spark.functions.wav import encode_wav

        for pdf in batches:
            out = pd.DataFrame()
            out["media_id"] = pdf[id_col].astype("int64")
            out["media_type"] = "audio"
            contents = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                n = len(t or "")
                rate = 8000 + (int(i) % 4) * 4000
                ch = 1 + (int(i) // 4) % 2
                contents.append(
                    encode_wav(np.zeros((n, ch), dtype=np.int16), rate)
                )
            out["content"] = contents
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        gen, "media_id long, media_type string, content binary"
    )


AUDIO_SCHEMA = (
    "media_id long, media_type string, sample_rate int, n_channels int, "
    "bits_per_sample int, n_frames long, duration_ms long"
)


def decode_audio(df: DataFrame) -> DataFrame:
    """Parse each payload's WAV header into typed audio metadata columns
    (sample_rate, n_channels, bits_per_sample, n_frames, duration_ms).

    Arrow batch-at-a-time mapInPandas over ``wav.wav_info`` — header-only,
    no sample decode. Undecodable payloads (non-RIFF, compressed codecs
    this container can't read) get zeroed metadata with the row KEPT,
    the same dirty-data contract as ``decode_media``. The payload column
    is dropped on output: audio metadata scans shouldn't carry PCM bodies
    through the rest of the plan."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gmall_flink_yb_spark.functions.wav import wav_info

        for pdf in batches:
            out = pdf[["media_id", "media_type"]].copy()
            rates, chans, bits, frames, durs = [], [], [], [], []
            for buf in pdf["content"]:
                try:
                    r, c, b, n = wav_info(bytes(buf))
                    d = (1000 * n) // r
                except Exception:
                    r = c = b = n = d = 0
                rates.append(r)
                chans.append(c)
                bits.append(b)
                frames.append(n)
                durs.append(d)
            out["sample_rate"] = pd.Series(rates, dtype="int32")
            out["n_channels"] = pd.Series(chans, dtype="int32")
            out["bits_per_sample"] = pd.Series(bits, dtype="int32")
            out["n_frames"] = pd.Series(frames, dtype="int64")
            out["duration_ms"] = pd.Series(durs, dtype="int64")
            yield out

    return df.mapInPandas(parse, AUDIO_SCHEMA)


def _wav_le(c: Column, pos: int, nbytes: int) -> Column:
    """Little-endian uint field at 1-based byte offset ``pos`` of binary
    column ``c`` — per-byte hex concatenated in reverse order, all inside
    whole-stage codegen."""
    return F.conv(
        F.concat(
            *[
                F.lpad(F.hex(F.substring(c, pos + i, 1)), 2, "0")
                for i in range(nbytes - 1, -1, -1)
            ]
        ),
        16,
        10,
    ).cast("long")


def _canonical_wav(c: Column) -> Column:
    """True iff the payload is a canonical 44-byte-header PCM WAV (fmt
    chunk at offset 12, data chunk at 36, sane PCM fields) — exactly the
    layout the codegen fast path can parse. Shared by
    ``decode_audio_headers_sql`` (as its validity gate) and
    ``scan_audio_metadata`` (as its tier router)."""
    return (
        (F.length(c) >= 44)
        & (F.substring(c, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(c, 9, 8) == F.lit(b"WAVEfmt "))
        & (F.substring(c, 37, 4) == F.lit(b"data"))
        & _wav_le(c, 21, 2).isin(1, 3)
        & (_wav_le(c, 25, 4) > 0)
        & (_wav_le(c, 33, 2) > 0)
    )


def decode_audio_headers_sql(df: DataFrame) -> DataFrame:
    """Zero-Python audio metadata scan for CANONICAL WAV files (the
    44-byte-header layout ``encode_wav`` and most PCM writers emit: fmt
    chunk at offset 12, data chunk at 36). Same motivation as
    ``decode_media_headers_sql``: at 100 TB the dominant workload is
    metadata filtering, and a fixed-offset header parse has no business
    forking Python workers. Little-endian fields are assembled by
    concatenating per-byte hex in reverse order inside whole-stage
    codegen. Non-canonical-but-valid WAVs (extra LIST/fact chunks before
    ``data``) zero out here — route those through ``decode_audio``, the
    general chunk-walking path (parity on canonical files is
    pytest-asserted), or use :func:`scan_audio_metadata`, which composes
    the two automatically."""
    c = F.col("content")
    rate = _wav_le(c, 25, 4)
    block_align = _wav_le(c, 33, 2)
    ok = _canonical_wav(c)
    n_frames = F.floor(_wav_le(c, 41, 4) / block_align).cast("long")
    z = F.lit(0)
    return df.select(
        "media_id",
        "media_type",
        F.when(ok, rate.cast("int")).otherwise(z.cast("int")).alias("sample_rate"),
        F.when(ok, _wav_le(c, 23, 2).cast("int")).otherwise(z.cast("int")).alias("n_channels"),
        F.when(ok, _wav_le(c, 35, 2).cast("int")).otherwise(z.cast("int")).alias("bits_per_sample"),
        F.when(ok, n_frames).otherwise(z.cast("long")).alias("n_frames"),
        F.when(ok, F.floor(n_frames * 1000 / rate).cast("long"))
        .otherwise(z.cast("long"))
        .alias("duration_ms"),
    )


def scan_audio_metadata(
    df: DataFrame, persist_input: bool = False
) -> DataFrame:
    """Two-tier audio metadata scan (VERDICT r6 #7) — the audio twin of the
    png.py metadata pattern: payloads matching the canonical 44-byte-header
    WAV layout are parsed entirely inside whole-stage codegen
    (:func:`decode_audio_headers_sql`); everything else — LIST/fact-chunked
    but valid WAVs, plus genuinely undecodable bytes — routes through
    :func:`decode_audio`, the Arrow-batched chunk walker, which gives
    non-canonical WAVs real metadata and keeps undecodable rows under the
    zeroed-metadata contract.

    Scale shape: the router predicate is one codegen'd header probe per
    row; on a 100 TB corpus of PCM exports the Python tier sees only the
    (typically tiny) non-canonical slice, so no Python worker fork happens
    on the hot path. Both tiers prune to the same output schema and the
    union preserves every input row exactly once (the router predicate is
    deterministic per-row, NULL-safe via the coalesce).

    The two branches each scan ``df``. For a parquet-backed media table
    that is the right trade (two pruned scans beat caching 100 TB); for a
    DERIVED input with Python stages upstream, pass
    ``persist_input=True`` to evaluate the upstream once — the persist is
    tagged on the result via ``owns_cache``, so whoever materializes it
    calls ``cacheutil.release_cache`` afterwards (the bench/oracle
    harnesses already do)."""
    from gmall_flink_yb_spark.functions.cacheutil import owns_cache

    if persist_input:
        from pyspark.storagelevel import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    canonical = _canonical_wav(F.col("content"))
    fast = decode_audio_headers_sql(df.filter(canonical))
    slow = decode_audio(df.filter(~F.coalesce(canonical, F.lit(False))))
    out = fast.unionByName(slow)
    return owns_cache(out, df) if persist_input else out
