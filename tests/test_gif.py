"""Pure-stdlib GIF codec (kernel/gif.py): LZW round-trips including
code-width growth and re-clears, interlace, transparency, and
malformed-input classes. No Spark involvement."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xhtml_parser_spark.kernel.gif import GifError, decode_gif, encode_gif


@pytest.mark.parametrize("interlaced", [False, True])
@pytest.mark.parametrize("hw", [(1, 1), (7, 9), (16, 5), (33, 2), (40, 40)])
def test_roundtrip(hw, interlaced):
    h, w = hw
    rng = np.random.RandomState(h * 41 + w)
    arr = (rng.randint(0, 6, size=(h, w, 3)) * 42).astype(np.uint8)
    out, meta = decode_gif(encode_gif(arr, interlaced=interlaced))
    assert np.array_equal(out, arr)
    assert meta["interlaced"] == interlaced
    assert (meta["height"], meta["width"]) == (h, w)


def test_code_width_growth_and_reclear():
    """A long stream forces the code width from min+1 up to 12 bits and
    through a re-clear -- the exact synchronization LZW gets wrong
    first."""
    rng = np.random.RandomState(0)
    arr = (rng.randint(0, 6, size=(80, 80, 3)) * 42).astype(np.uint8)
    out, _ = decode_gif(encode_gif(arr))
    assert np.array_equal(out, arr)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 10**6),
       interlaced=st.booleans())
def test_roundtrip_property(h, w, seed, interlaced):
    arr = (
        np.random.RandomState(seed).randint(0, 4, size=(h, w, 3)) * 63
    ).astype(np.uint8)
    out, _ = decode_gif(encode_gif(arr, interlaced=interlaced))
    assert np.array_equal(out, arr)


def test_transparency_yields_rgba():
    """A GCE with the transparency flag turns the marked palette index
    into alpha=0 (hand-built: encode_gif doesn't write GCEs)."""
    a = (np.arange(12, dtype=np.uint8).reshape(2, 2, 3) * 9)
    b = encode_gif(a)
    # splice a GCE (transparent index 0) right before the image
    # descriptor
    at = b.index(b"\x2c")
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    arr, meta = decode_gif(b[:at] + gce + b[at:])
    assert meta["channels"] == 4
    # index 0 is whatever palette slot pixel (0,0)'s color got; check
    # SOME pixel went transparent and the rest are opaque, and RGB
    # matches throughout
    assert np.array_equal(arr[:, :, :3], a)
    assert (arr[:, :, 3] == 0).sum() >= 1


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"JUNK" + b[4:],                  # signature
        lambda b: b[:20],                           # truncated GCT
        lambda b: b[: len(b) - 8],                  # truncated stream
        lambda b: b[: b.index(b"\x2c")] + b"\x3b",  # trailer, no image
    ],
)
def test_malformed_raises(mutate):
    good = encode_gif(np.zeros((3, 3, 3), dtype=np.uint8))
    with pytest.raises(GifError):
        decode_gif(mutate(good))
