"""Multimodal column plumbing: binary payloads + typed metadata through
Arrow batches. Decode of real codecs is stubbed (no media libs in this
container); header sniffing and the fake container are fully real."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_meta,
    extract_features,
    frame_sample,
    make_rawvid,
)


def _png(w: int, h: int) -> bytes:
    return b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", w, h) + b"\x00" * 8


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 16


def _jpeg(w: int, h: int) -> bytes:
    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w)
    return b"\xff\xd8" + sof + b"\x00" * 32


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", _png(640, 480), "image/png"),
        (2, "image", _gif(100, 50), "image/gif"),
        (3, "image", _jpeg(1920, 1080), "image/jpeg"),
        (4, "image", b"not an image", "application/octet-stream"),
        (5, "video", make_rawvid([b"f0", b"f1", b"f2", b"f3", b"f4"]), "video/x-raw"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_meta(spark, media_df):
    got = {r["media_id"]: r for r in decode_image_meta(media_df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("gif", 100, 50)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("jpeg", 1920, 1080)
    assert got[4]["valid"] == "unknown-format"


def test_features_deterministic(spark, media_df):
    a = {r["media_id"]: r["embedding"] for r in extract_features(media_df).collect()}
    b = {r["media_id"]: r["embedding"] for r in extract_features(media_df).collect()}
    assert a == b
    assert len(a[1]) == 64
    # L2-normalized
    assert abs(sum(x * x for x in a[1]) - 1.0) < 1e-5


def test_frame_sample(spark, media_df):
    vid = media_df.where(F.col("kind") == "video")
    frames = sorted(
        frame_sample(vid, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [(r["frame_idx"], bytes(r["frame"])) for r in frames] == [
        (0, b"f0"),
        (2, b"f2"),
        (4, b"f4"),
    ]


def test_frame_sample_real_codec_stubbed(spark, media_df):
    img = media_df.where(F.col("media_id") == 1)
    with pytest.raises(Exception) as ei:
        frame_sample(img).collect()
    assert "NotImplementedError" in str(ei.value) or "rawvid" in str(ei.value)
