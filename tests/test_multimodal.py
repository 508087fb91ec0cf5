"""Multimodal binary-column plumbing tests: synthesize -> decode -> resize /
frame-sample / feature-extract, and the features -> similarity integration."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from gmall_flink_yb_spark.functions.multimodal import (
    FAKE_MAGIC,
    HEADER_LEN,
    decode_media,
    decode_media_headers_sql,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from gmall_flink_yb_spark.plans.inspect import _simple_plan
from gmall_flink_yb_spark.functions.similarity import cosine_near_dup_pairs


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),  # same body as 0
        (2, "the quick brown fox jumps over the lazy dog " * 4),
        (3, "x"),
        (4, ""),  # empty body
        (5, "some other content entirely different from the rest ok"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return synthesize_media(docs)


def test_synthesize_header_roundtrip(media):
    r = {x["media_id"]: x for x in media.collect()}
    b = bytes(r[2]["content"])
    assert b[:4] == FAKE_MAGIC
    w, h = struct.unpack(">HH", b[4:8])
    assert w == 64 + (2 % 32) * 16 and h == 64 + (2 % 24) * 16
    assert b[HEADER_LEN:].decode() == "the quick brown fox jumps over the lazy dog " * 4
    # media_type cycles image/audio/video by id
    assert r[0]["media_type"] == "image"
    assert r[1]["media_type"] == "audio"
    assert r[2]["media_type"] == "video"


def test_decode_media(media):
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert dec[3]["width"] == 64 + 3 * 16
    assert dec[3]["height"] == 64 + 3 * 16
    assert dec[3]["body_bytes"] == 1
    assert dec[4]["body_bytes"] == 0
    # corrupt payload -> zeroed metadata, row kept
    corrupt = media.sparkSession.createDataFrame(
        [(99, "image", bytearray(b"notmagic"))],
        "media_id long, media_type string, content binary",
    )
    got = decode_media(corrupt).first()
    assert got["width"] == 0 and got["height"] == 0


def test_header_scan_matches_pandas_decode(media):
    """The JVM-only header parse must agree with the mapInPandas decode
    row for row — including the corrupt-payload zeroed-metadata rows —
    and its plan must contain NO Python stage of any kind (the whole
    point: metadata scans shouldn't fork Python workers)."""
    corrupt = media.sparkSession.createDataFrame(
        [(99, "image", bytearray(b"notmagic")), (98, "audio", bytearray(b""))],
        "media_id long, media_type string, content binary",
    )
    inp = media.union(corrupt)
    cols = ["media_id", "media_type", "width", "height", "body_bytes"]
    via_sql = {
        r["media_id"]: tuple(r[c] for c in cols)
        for r in decode_media_headers_sql(inp).collect()
    }
    via_pandas = {
        r["media_id"]: tuple(r[c] for c in cols)
        for r in decode_media(inp).collect()
    }
    assert via_sql == via_pandas

    plan = _simple_plan(decode_media_headers_sql(inp))
    for node in (
        "ArrowEvalPython",
        "MapInPandas",
        "FlatMapGroupsInPandas",
        "BatchEvalPython",
    ):
        assert node not in plan, f"header scan forked Python: {node}"


def test_real_codec_decode_and_resize(spark):
    """Real-codec path, executed through Spark on a genuine PNG. Runs in
    every environment: pillow decodes any PNG and the bundled pure-Python
    codec (``functions/png.py``) decodes the one we build here, so whichever
    branch ``_have_pillow`` picks, the mapInPandas pipeline must produce the
    same dimensions — plus the undecodable-passthrough contract (mirrors
    the dirty-record side-output discipline of the reference's BaseLogApp)."""
    import numpy as np

    from gmall_flink_yb_spark.functions import png as _png

    arr = np.zeros((20, 32, 3), dtype=np.uint8)
    arr[:, :, 0] = 200  # solid-ish RGB so resample has real pixels
    arr[5:15, 8:24, 1] = 90
    png_bytes = _png.encode_png(arr)
    assert _png.png_size(png_bytes) == (32, 20)

    df = spark.createDataFrame(
        [(1, "image", png_bytes), (2, "image", b"not-an-image")],
        "media_id long, media_type string, content binary",
    )
    rows = {r["media_id"]: r for r in decode_media(df, use_real_codecs=True).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (32, 20)
    assert (rows[2]["width"], rows[2]["height"]) == (0, 0)  # kept, zeroed
    assert rows[2]["body_bytes"] == len(b"not-an-image")

    resized = decode_media(
        resize_images(df, 8, 8, use_real_codecs=True), use_real_codecs=True
    )
    rrows = {r["media_id"]: r for r in resized.collect()}
    assert (rrows[1]["width"], rrows[1]["height"]) == (8, 8)
    # the resized payload is itself a decodable PNG
    out_arr = _png.decode_png(bytes(rrows[1]["content"]))
    assert out_arr.shape == (8, 8, 3)
    assert bytes(rrows[2]["content"]) == b"not-an-image"  # passthrough


def test_real_codec_non_image_rows_untouched_by_resize(spark):
    """resize_images must only rewrite media_type == 'image' rows even in
    real-codec mode; audio/video payloads pass through byte-identical."""
    import numpy as np

    from gmall_flink_yb_spark.functions import png as _png

    png_bytes = _png.encode_png(np.full((4, 6, 3), 7, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, "image", png_bytes), (2, "audio", png_bytes), (3, "video", b"vv")],
        "media_id long, media_type string, content binary",
    )
    out = {r["media_id"]: bytes(r["content"])
           for r in resize_images(df, 2, 2, use_real_codecs=True).collect()}
    assert _png.png_size(out[1]) == (2, 2)
    assert out[2] == png_bytes  # audio: byte-identical passthrough
    assert out[3] == b"vv"


def test_resize_only_touches_images(media):
    resized = decode_media(resize_images(media, 224, 224))
    rows = {r["media_id"]: r for r in resized.collect()}
    assert rows[0]["width"] == 224 and rows[0]["height"] == 224  # image
    assert rows[1]["width"] == 64 + 1 * 16  # audio untouched
    # body survives the header rewrite
    assert rows[0]["body_bytes"] == len(
        "alpha beta gamma delta epsilon zeta eta theta"
    )


def test_sample_frames_multi_row_emission(media):
    frames = sample_frames(media, frame_stride=16)
    got = frames.filter(F.col("media_id") == 2).orderBy("frame_idx").collect()
    body_len = len("the quick brown fox jumps over the lazy dog " * 4)
    assert len(got) == (body_len + 15) // 16
    assert [r["frame_idx"] for r in got] == list(range(len(got)))
    assert b"".join(bytes(r["frame"]) for r in got).decode() == (
        "the quick brown fox jumps over the lazy dog " * 4
    )
    # only video rows sampled
    assert frames.select("media_id").distinct().count() == 2  # ids 2 and 5


def test_features_feed_similarity(media):
    feats = extract_features(media, dim=16)
    # exact integer-valued doubles: cross-engine reproducible (see
    # multimodal.extract_features)
    assert dict(feats.dtypes)["embedding"] == "array<double>"
    # identical bodies (0 and 1) -> identical vectors -> cosine 1.0 pair
    pairs = cosine_near_dup_pairs(
        feats, threshold=0.999, id_col="media_id", vec_col="embedding",
        n_blocks=4,
    )
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in pairs.collect()}
    assert got.get((0, 1)) == 1.0
    # empty body yields the zero vector and must not produce NaN pairs
    assert all(np_ok == np_ok for np_ok in got.values())  # no NaNs
