"""Pure-stdlib PNG codec (kernel/png.py): exact-pixel round-trips over
every filter type / depth / channel combination, hand-crafted palette
and tRNS fixtures, and malformed-input classes. No Spark involvement --
this is the kernel under the decode_image / resize_image operators."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xhtml_parser_spark.kernel.png import PngError, decode_png, encode_png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


_SIG = b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("nch", [1, 2, 3, 4])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter_depth_channel(nch, dtype, ft):
    rng = np.random.RandomState(ft * 31 + nch * 7 + (dtype == np.uint16))
    hi = 65536 if dtype == np.uint16 else 256
    arr = rng.randint(0, hi, size=(13, 9, nch)).astype(dtype)
    out, meta = decode_png(encode_png(arr, filters=ft))
    assert np.array_equal(out, arr)
    assert meta["bit_depth"] == (16 if dtype == np.uint16 else 8)
    assert meta["channels"] == nch


def test_roundtrip_mixed_filters_per_row():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(10, 6, 3)).astype(np.uint8)
    out, _ = decode_png(encode_png(arr, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
    assert np.array_equal(out, arr)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    nch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    ft=st.integers(0, 4),
)
def test_roundtrip_property(h, w, nch, seed, ft):
    arr = (
        np.random.RandomState(seed).randint(0, 256, size=(h, w, nch))
    ).astype(np.uint8)
    out, _ = decode_png(encode_png(arr, filters=ft))
    assert np.array_equal(out, arr)


def _palette_png(depth: int, indices_rows: list[list[int]], plte: bytes,
                 trns: bytes | None = None) -> bytes:
    h = len(indices_rows)
    w = len(indices_rows[0])
    lines = []
    for row in indices_rows:
        bits = "".join(format(i, f"0{depth}b") for i in row)
        bits += "0" * (-len(bits) % 8)
        lines.append(
            b"\x00" + int(bits, 2).to_bytes(len(bits) // 8, "big")
        )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(b"".join(lines))) + _chunk(b"IEND", b"")


PLTE4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_depths(depth):
    nidx = min(1 << depth, 4)
    rows = [[i % nidx for i in range(5)], [(i + 1) % nidx for i in range(5)]]
    out, meta = decode_png(_palette_png(depth, rows, PLTE4))
    assert meta["channels"] == 3 and meta["bit_depth"] == depth
    expect = np.frombuffer(PLTE4, dtype=np.uint8).reshape(4, 3)[
        np.array(rows)
    ]
    assert np.array_equal(out, expect)


def test_palette_trns_expands_to_rgba():
    rows = [[0, 1, 2, 3]]
    out, meta = decode_png(_palette_png(2, rows, PLTE4, trns=bytes([10, 20])))
    assert meta["channels"] == 4
    assert out[0, :, 3].tolist() == [10, 20, 255, 255]


def test_sub_byte_grayscale():
    # depth-2 grayscale: samples come back as raw values 0..3
    ihdr = struct.pack(">IIBBBBB", 4, 1, 2, 0, 0, 0, 0)
    row = b"\x00" + bytes([0b00011011])
    png = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(row)) + _chunk(b"IEND", b"")
    )
    out, meta = decode_png(png)
    assert out[:, :, 0].tolist() == [[0, 1, 2, 3]]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "bad signature"),
        (lambda b: b[:-13], "IEND"),
        (lambda b: b[:20] + bytes([b[20] ^ 1]) + b[21:], "CRC"),
    ],
)
def test_malformed_inputs_raise(mutate, msg):
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(PngError):
        decode_png(mutate(good))


def test_interlaced_out_of_scope():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    png = (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="Adam7"):
        decode_png(png)


def test_idat_split_across_chunks():
    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    b = encode_png(arr, filters=2)
    # re-split the single IDAT into two chunks byte-by-byte
    p = 8
    parts = []
    idat = None
    while p < len(b):
        (ln,) = struct.unpack(">I", b[p : p + 4])
        ctype = b[p + 4 : p + 8]
        data = b[p + 8 : p + 8 + ln]
        if ctype == b"IDAT":
            idat = data
            parts.append(_chunk(b"IDAT", data[: len(data) // 2]))
            parts.append(_chunk(b"IDAT", data[len(data) // 2 :]))
        else:
            parts.append(b[p : p + 12 + ln])
        p += 12 + ln
    assert idat
    out, _ = decode_png(_SIG + b"".join(parts))
    assert np.array_equal(out, arr)
