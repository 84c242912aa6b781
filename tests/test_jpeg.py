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


def test_arithmetic_sof_out_of_scope():
    good = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    # rewrite SOF0 to SOF9 (arithmetic sequential): genuinely out of scope
    at = good.index(b"\xff\xc0")
    bad = good[:at] + b"\xff\xc9" + good[at + 2 :]
    with pytest.raises(JpegError, match="baseline/progressive"):
        decode_jpeg(bad)


def test_baseline_stream_with_sof2_marker_rejected():
    # a baseline stream whose SOF marker is flipped to SOF2 presents an
    # interleaved full-band scan -- illegal progressive (T.81 G.1), and
    # must raise rather than misdecode
    good = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    at = good.index(b"\xff\xc0")
    bad = good[:at] + b"\xff\xc2" + good[at + 2 :]
    with pytest.raises(JpegError):
        decode_jpeg(bad)


# ------------------------------------------------------ progressive (SOF2)


def _smooth_img(rng, shape):
    base = np.linspace(0, 255, shape[1]).reshape(1, -1)
    if len(shape) == 3:
        base = base[:, :, None]
        noise = rng.normal(0, 12, shape)
    else:
        noise = rng.normal(0, 12, shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape, kw",
    [
        ((17, 13), {}),
        ((32, 32), {}),
        ((23, 9, 3), {}),
        ((64, 48, 3), {"subsample": True}),
        ((40, 33, 3), {"subsample": True}),  # dummy blocks on both axes
    ],
)
def test_progressive_decodes_pixel_identical_to_baseline(shape, kw):
    """The progressive scan script transmits the SAME quantized
    coefficients as the baseline stream, so the two decodes must agree
    bit-for-bit -- on smooth data AND pure noise (worst-case EOB/ZRL/
    refinement traffic), under standard and q=1 tables."""
    rng = np.random.default_rng(hash(shape) % 2**32)
    q1 = (np.ones((8, 8), np.int32), np.ones((8, 8), np.int32))
    for arr in (_smooth_img(rng, shape),
                rng.integers(0, 256, shape, dtype=np.uint8)):
        for qt in (None, q1):
            prog = decode_jpeg(
                encode_jpeg(arr, quality_tables=qt, progressive=True, **kw)
            )[0]
            base = decode_jpeg(encode_jpeg(arr, quality_tables=qt, **kw))[0]
            assert np.array_equal(prog, base)


def test_progressive_eob_runs_across_blocks():
    """Mostly-uniform image: AC scans see long runs of all-zero blocks,
    exercising EOBn codes with extension bits spanning many blocks."""
    arr = np.full((64, 64), 128, np.uint8)
    arr[5, 7] = 255
    arr[40, 50] = 0
    arr[63, 63] = 17
    prog = decode_jpeg(encode_jpeg(arr, progressive=True))[0]
    base = decode_jpeg(encode_jpeg(arr))[0]
    assert np.array_equal(prog, base)


def test_progressive_exact_on_uniform_q1():
    q1 = (np.ones((8, 8), np.int32), np.ones((8, 8), np.int32))
    arr = np.full((24, 24), 77, np.uint8)
    out, meta = decode_jpeg(
        encode_jpeg(arr, quality_tables=q1, progressive=True)
    )
    assert int(np.abs(out[:, :, 0].astype(int) - 77).max()) == 0
    assert (meta["width"], meta["height"]) == (24, 24)


def test_progressive_truncation_classes():
    """Progressive is the render-what-arrived format: truncation after
    >=1 complete scan yields a partial image; truncation before any
    scan raises."""
    rng = np.random.default_rng(3)
    arr = _smooth_img(rng, (48, 32, 3))
    full = encode_jpeg(arr, progressive=True)
    # before any scan data: raise
    with pytest.raises(JpegError):
        decode_jpeg(full[:40])
    # mid-stream: either a JpegError (first scan incomplete) or a
    # partial render of the completed passes; never garbage types
    got_partial = False
    for frac in (0.4, 0.7, 0.95):
        cut = full[: int(len(full) * frac)]
        try:
            out, meta = decode_jpeg(cut)
        except JpegError:
            continue
        assert out.shape == (48, 32, 3)
        got_partial = True
    assert got_partial
    # a complete stream missing only the EOI still renders
    out, _ = decode_jpeg(full[:-2])
    assert np.array_equal(out, decode_jpeg(full)[0])


def test_progressive_rejects_bad_scan_scripts():
    rng = np.random.default_rng(4)
    arr = _smooth_img(rng, (16, 16))
    full = encode_jpeg(arr, progressive=True)
    # corrupt the FIRST scan header (Se > 63 on a DC scan): before any
    # scan has landed there is nothing to render, so it must raise
    # (later-scan corruption degrades to a partial render instead --
    # covered by test_progressive_truncation_classes)
    at = full.index(b"\xff\xda")
    ln = int.from_bytes(full[at + 2 : at + 4], "big")
    hdr = bytearray(full[at : at + 2 + ln])
    hdr[-2] = 200  # Se
    with pytest.raises(JpegError):
        decode_jpeg(full[:at] + bytes(hdr) + full[at + 2 + ln :])
