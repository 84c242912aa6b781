"""Pure-stdlib FLAC codec (kernel/flac.py). FLAC is lossless, so the
contract is PNG-grade: byte-exact sample round-trip over every
predictor type, stereo mode, bit depth, and blocking shape; plus
malformed/hostile classes. No Spark involvement."""

from __future__ import annotations

import numpy as np
import pytest

from xhtml_parser_spark.kernel.flac import (
    FlacError,
    decode_flac,
    encode_flac,
    parse_streaminfo,
)


def _sine(n, ch=1, amp=12000):
    t = np.arange(n)
    base = (amp * np.sin(t / 30)).astype(np.int32)
    if ch == 1:
        return base
    return np.stack(
        [base] + [(base * (0.9 - 0.2 * i)).astype(np.int32) + 7 * i
                  for i in range(1, ch)],
        axis=1,
    )


def _rt(arr, **kw):
    out, meta = decode_flac(encode_flac(arr, **kw))
    a = np.asarray(arr)
    a = a[:, None] if a.ndim == 1 else a
    assert np.array_equal(out, a.astype(np.int32)), kw
    return meta


@pytest.mark.parametrize("mode", [
    "independent", "left_side", "right_side", "mid_side",
])
def test_stereo_modes_exact(mode):
    _rt(_sine(10000, 2), stereo_mode=mode)
    # noise: residuals as bad as they get, incl. the side channel's
    # bps+1 headroom
    rng = np.random.default_rng(hash(mode) % 2**32)
    _rt(rng.integers(-32768, 32768, (4097, 2)).astype(np.int32),
        stereo_mode=mode)


@pytest.mark.parametrize("lpc_order", [2, 4, 8, 16])
def test_lpc_subframes_exact(lpc_order):
    _rt(_sine(9000), lpc_order=lpc_order)
    _rt(_sine(9000, 2), stereo_mode="mid_side", lpc_order=lpc_order)


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_bit_depths(bits):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    arr = rng.integers(-lim, lim, 3001).astype(np.int32)
    meta = _rt(arr, bits=bits)
    assert meta["bits_per_sample"] == bits


def test_blocking_shapes_and_degenerates():
    _rt(_sine(10000), blocksize=192)       # many small frames
    _rt(np.full(5000, -7, np.int32))       # constant subframes
    _rt(np.zeros(1, np.int32))             # single sample
    _rt(_sine(4096))                       # exactly one block
    _rt(_sine(4097))                       # one-sample tail frame
    meta = _rt(_sine(2500, 3))             # >2 channels (independent)
    assert meta["channels"] == 3


def test_streaminfo_fields():
    b = encode_flac(_sine(1234, 2), sample_rate=44100)
    sr, ch, bits, total, off = parse_streaminfo(b)
    assert (sr, ch, bits, total) == (44100, 2, 16, 1234)
    assert b[off : off + 2] == b"\xff\xf8"  # first frame sync


def test_out_of_range_and_bad_args():
    with pytest.raises(FlacError):
        encode_flac(np.array([40000], np.int32), bits=16)
    with pytest.raises(FlacError):
        encode_flac(_sine(100, 1), stereo_mode="mid_side")
    with pytest.raises(FlacError):
        encode_flac(_sine(100), bits=13)


def test_hostile_inputs():
    good = encode_flac(_sine(5000, 2), stereo_mode="left_side")
    with pytest.raises(FlacError):
        decode_flac(b"fLaX" + good[4:])          # signature
    with pytest.raises(FlacError):
        decode_flac(good[:20])                   # truncated metadata
    with pytest.raises(FlacError):
        decode_flac(good[: len(good) // 2])      # truncated mid-frame
    # flip one bit inside the first frame's audio data: CRC-16 catches
    _, _, _, _, off = parse_streaminfo(good)
    bad = bytearray(good)
    bad[off + 20] ^= 0x10
    with pytest.raises(FlacError):
        decode_flac(bytes(bad))
    # corrupt the frame header: CRC-8 catches before any decode
    bad2 = bytearray(good)
    bad2[off + 2] ^= 0x04
    with pytest.raises(FlacError):
        decode_flac(bytes(bad2))


# ------------------------------------------------------------ property fuzz

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=10000)
@given(
    n=st.integers(1, 700),
    ch=st.integers(1, 2),
    bits=st.sampled_from([8, 16, 24]),
    mode=st.sampled_from(
        ["independent", "left_side", "right_side", "mid_side"]
    ),
    lpc=st.sampled_from([0, 3, 7]),
    bs=st.sampled_from([64, 192, 333]),
    seed=st.integers(0, 2**31),
)
def test_flac_roundtrip_property(n, ch, bits, mode, lpc, bs, seed):
    """Any PCM signal, any encoder configuration: decode(encode(x)) == x
    exactly (FLAC is lossless -- the whole contract in one property)."""
    if mode != "independent" and ch != 2:
        mode = "independent"
    rng = np.random.default_rng(seed)
    lim = 1 << (bits - 1)
    # mix smooth and impulsive content so predictors/escapes both fire
    t = np.arange(n)
    smooth = (0.4 * lim * np.sin(t / 11))[:, None]
    noise = rng.integers(-lim // 2, lim // 2, (n, ch))
    arr = np.clip(smooth + noise, -lim, lim - 1).astype(np.int32)
    out, meta = decode_flac(
        encode_flac(arr, bits=bits, blocksize=bs, stereo_mode=mode,
                    lpc_order=lpc)
    )
    assert np.array_equal(out, arr)
    assert meta["bits_per_sample"] == bits and meta["channels"] == ch
