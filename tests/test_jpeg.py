"""Pure-stdlib baseline JPEG codec (kernel/jpeg.py). JPEG is lossy, so
the contract differs from png/gif: EXACT where the math is exact
(uniform blocks under q=1 tables reconstruct perfectly), error-BOUNDED
elsewhere, and structurally strict (markers, restart intervals,
sampling factors, scope errors). No Spark involvement."""

from __future__ import annotations

import numpy as np
import pytest

from xhtml_parser_spark.kernel.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)

ONES = (np.ones((8, 8), dtype=np.int32), np.ones((8, 8), dtype=np.int32))


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.dstack([
        128 + 100 * np.sin(x / 9) * np.cos(y / 7),
        128 + 80 * np.cos(x / 11),
        128 + 60 * np.sin((x + y) / 13),
    ]).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("val", [0, 17, 128, 254, 255])
def test_uniform_blocks_exact_roundtrip(val):
    arr = np.full((16, 24, 3), val, dtype=np.uint8)
    out, meta = decode_jpeg(encode_jpeg(arr, quality_tables=ONES))
    assert np.array_equal(out, arr)
    assert (meta["width"], meta["height"], meta["channels"]) == (24, 16, 3)


def test_gradient_q1_near_exact():
    y, x = np.mgrid[0:32, 0:40]
    arr = np.dstack([(x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256]).astype(
        np.uint8
    )
    out, _ = decode_jpeg(encode_jpeg(arr, quality_tables=ONES))
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 2


def test_standard_tables_error_bounded():
    arr = _smooth(32, 40)
    out, _ = decode_jpeg(encode_jpeg(arr))
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 22


@pytest.mark.parametrize("hw", [(16, 16), (17, 23), (8, 40), (33, 9)])
def test_subsampled_420_and_odd_dims(hw):
    arr = _smooth(*hw)
    out, meta = decode_jpeg(encode_jpeg(arr, subsample=True))
    assert out.shape == arr.shape
    assert meta["subsampling"] == "2x2"
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 40


def test_grayscale():
    y, x = np.mgrid[0:24, 0:24]
    g = ((x * 7 + y * 3) % 256).astype(np.uint8)
    out, meta = decode_jpeg(encode_jpeg(g, quality_tables=ONES))
    assert meta["channels"] == 1
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_restart_intervals(interval):
    arr = _smooth(32, 40)
    b = encode_jpeg(arr, quality_tables=ONES, restart_interval=interval)
    assert b"\xff\xdd" in b  # DRI segment present
    out, _ = decode_jpeg(b)
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 2


def test_decode_deterministic():
    b = encode_jpeg(_smooth(16, 16), subsample=True)
    a1, _ = decode_jpeg(b)
    a2, _ = decode_jpeg(b)
    assert np.array_equal(a1, a2)


@pytest.mark.parametrize(
    "mutate, why",
    [
        (lambda b: b"XX" + b[2:], "signature"),
        (lambda b: b[:40], "truncated segment"),
        (lambda b: b[: b.index(b"\xff\xda")] + b"\xff\xd9", "EOI before SOS"),
    ],
)
def test_malformed_raises(mutate, why):
    good = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(JpegError):
        decode_jpeg(mutate(good))


def test_progressive_out_of_scope():
    good = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    # rewrite the SOF0 marker to SOF2 (progressive)
    at = good.index(b"\xff\xc0")
    bad = good[:at] + b"\xff\xc2" + good[at + 2 :]
    with pytest.raises(JpegError, match="baseline"):
        decode_jpeg(bad)
