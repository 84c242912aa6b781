"""Multimodal column plumbing: binary payloads + typed metadata through
Arrow batches. PNG decode is REAL (kernel/png.py, zlib + NumPy
unfilter); JPEG/GIF pixel paths stay stubbed (no media libs in this
container); header sniffing and the fake video container are fully
real."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from xhtml_parser_spark.kernel.png import encode_png
from xhtml_parser_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_audio_meta,
    decode_image,
    decode_image_meta,
    extract_features,
    frame_sample,
    make_rawvid,
)


def _png_arr(w: int, h: int) -> np.ndarray:
    """Deterministic RGB gradient."""
    y, x = np.mgrid[0:h, 0:w]
    return np.dstack([(x * 7) % 256, (y * 11) % 256, (x + y) % 256]).astype(
        np.uint8
    )


def _png(w: int, h: int) -> bytes:
    return encode_png(_png_arr(w, h), filters=4)


def _png_header_only(w: int, h: int) -> bytes:
    """A sniffable-but-undecodable PNG (real jobs meet truncated
    crawl payloads constantly)."""
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
        (6, "image", _png_header_only(32, 32), "image/png"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _wav(ch: int, sr: int, bits: int, n_samples: int) -> bytes:
    byte_rate = sr * ch * bits // 8
    block = ch * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, ch, sr, byte_rate, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ogg(ch: int, sr: int, total_samples: int) -> bytes:
    ident = b"\x01vorbis" + struct.pack("<IB I", 0, ch, sr) + b"\x00" * 9
    first = (
        b"OggS" + b"\x00\x02" + struct.pack("<q", 0)
        + b"\x00" * 12 + bytes([1, len(ident)]) + ident
    )
    last = (
        b"OggS" + b"\x00\x04" + struct.pack("<q", total_samples)
        + b"\x00" * 12 + bytes([1, 0])
    )
    return first + b"\x00" * 10 + last


def test_audio_meta(spark):
    rows = [
        (1, "audio", _wav(2, 44100, 16, 44100 * 3), "audio/wav"),   # 3 s stereo
        (2, "audio", _wav(1, 8000, 8, 4000), "audio/wav"),          # 0.5 s mono
        (3, "audio", _ogg(2, 48000, 96000), "audio/ogg"),           # 2 s
        (4, "audio", b"\xffnot audio at all", "application/octet-stream"),
        (5, "audio", b"RIFF\x00\x00\x00\x00WAVEjunk", "audio/wav"), # truncated
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_audio_meta(df).collect()}
    r1 = got[1]
    assert (r1["format"], r1["channels"], r1["sample_rate"],
            r1["bits_per_sample"], r1["duration_ms"], r1["valid"]) == (
        "wav", 2, 44100, 16, 3000, "ok")
    r2 = got[2]
    assert (r2["format"], r2["channels"], r2["sample_rate"],
            r2["duration_ms"], r2["valid"]) == ("wav", 1, 8000, 500, "ok")
    r3 = got[3]
    assert (r3["format"], r3["channels"], r3["sample_rate"],
            r3["duration_ms"], r3["valid"]) == ("ogg", 2, 48000, 2000, "ok")
    assert got[4]["valid"] == "unknown-format"
    assert got[5]["valid"] == "truncated"


def test_image_meta(spark, media_df):
    got = {r["media_id"]: r for r in decode_image_meta(media_df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("gif", 100, 50)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("jpeg", 1920, 1080)
    assert got[4]["valid"] == "unknown-format"


def test_resize_image(spark, media_df):
    from xhtml_parser_spark.operators.multimodal import resize_image

    got = {r["media_id"]: r for r in resize_image(media_df, 8, 4).collect()}
    png = got[1]
    assert (png["format"], png["width"], png["height"], png["valid"]) == (
        "png", 8, 4, "ok",
    )
    p = bytes(png["payload"])
    # REAL pixel path: RAWIMG02 carrying the nearest-neighbor resample
    # of the actual decoded gradient
    assert p.startswith(b"RAWIMG02")
    w, h, c = struct.unpack("<IIB", p[8:17])
    assert (w, h, c) == (8, 4, 3)
    src = _png_arr(640, 480)
    ys = (np.arange(4, dtype=np.int64) * 480) // 4
    xs = (np.arange(8, dtype=np.int64) * 640) // 8
    expect = src[ys][:, xs]
    assert p[17:] == expect.tobytes()
    # header-only JPEG: flagged by the real decoder, not crashed on
    jpg = got[3]
    assert jpg["valid"] == "decode-error" and jpg["payload"] is None
    # deterministic across runs
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_image(media_df, 8, 4).collect()
             if r["payload"] is not None}
    assert again[1] == p
    # non-image payloads pass through skipped with NULL payload
    assert got[4]["valid"] == "skipped" and got[4]["payload"] is None
    # sniffable-but-undecodable PNG is flagged, not crashed on
    assert got[6]["valid"] == "decode-error" and got[6]["payload"] is None


def test_decode_image_real_png_pixels(spark, media_df):
    got = {r["media_id"]: r for r in decode_image(media_df).collect()}
    png = got[1]
    assert (png["format"], png["width"], png["height"], png["channels"],
            png["bit_depth"], png["valid"]) == ("png", 640, 480, 3, 8, "ok")
    assert bytes(png["pixels"]) == _png_arr(640, 480).tobytes()
    # the fixture's gif/jpeg are header-only: the REAL decoders flag them
    assert got[2]["valid"] == "decode-error" and got[2]["pixels"] is None
    assert got[3]["valid"] == "decode-error" and got[3]["pixels"] is None
    assert got[4]["valid"] == "unknown-format"
    assert got[6]["valid"] == "decode-error" and got[6]["pixels"] is None


def test_decode_image_every_filter_and_palette(spark):
    """Operator-level (through Arrow batches): one PNG per filter type
    plus a 16-bit RGBA -- pixels must come back byte-exact."""
    rng = np.random.RandomState(3)
    arrs = {
        f: rng.randint(0, 256, size=(9, 5, 4)).astype(np.uint8)
        for f in range(5)
    }
    rows = [
        (f, "image", encode_png(arrs[f], filters=f), "image/png")
        for f in range(5)
    ]
    a16 = rng.randint(0, 65536, size=(4, 3, 2)).astype(np.uint16)
    rows.append((16, "image", encode_png(a16, filters=3), "image/png"))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_image(df).collect()}
    for f in range(5):
        assert got[f]["valid"] == "ok", f
        assert bytes(got[f]["pixels"]) == arrs[f].tobytes(), f
    r16 = got[16]
    assert (r16["bit_depth"], r16["channels"]) == (16, 2)
    assert bytes(r16["pixels"]) == a16.astype(">u2").tobytes()


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


def test_decode_image_real_gif_pixels(spark):
    """GIF is the second real codec: LZW decode through the Arrow
    operator must reproduce exact pixels, interlaced included; a
    truncated GIF flags decode-error."""
    from xhtml_parser_spark.kernel.gif import encode_gif

    rng = np.random.RandomState(9)
    a = (rng.randint(0, 6, size=(18, 7, 3)) * 42).astype(np.uint8)
    good, inter = encode_gif(a), encode_gif(a, interlaced=True)
    rows = [
        (1, "image", good, "image/gif"),
        (2, "image", inter, "image/gif"),
        (3, "image", good[: len(good) - 6], "image/gif"),  # truncated
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_image(df).collect()}
    for mid in (1, 2):
        r = got[mid]
        assert (r["format"], r["width"], r["height"], r["channels"],
                r["valid"]) == ("gif", 7, 18, 3, "ok"), mid
        assert bytes(r["pixels"]) == a.tobytes(), mid
    assert got[3]["valid"] == "decode-error" and got[3]["pixels"] is None


def test_gif_transparency_and_resize(spark):
    from xhtml_parser_spark.kernel.gif import decode_gif, encode_gif
    from xhtml_parser_spark.operators.multimodal import resize_image

    rng = np.random.RandomState(2)
    a = (rng.randint(0, 4, size=(12, 12, 3)) * 80).astype(np.uint8)
    b = encode_gif(a)
    arr, meta = decode_gif(b)
    assert np.array_equal(arr, a) and meta["channels"] == 3
    df = spark.createDataFrame([(1, "image", b, "image/gif")], MEDIA_SCHEMA)
    got = resize_image(df, 6, 6).collect()[0]
    assert got["valid"] == "ok"
    p = bytes(got["payload"])
    assert p.startswith(b"RAWIMG02")
    w, h, c = struct.unpack("<IIB", p[8:17])
    ys = (np.arange(6, dtype=np.int64) * 12) // 6
    assert (w, h, c) == (6, 6, 3)
    assert p[17:] == a[ys][:, ys].tobytes()


def test_decode_audio_real_wav_pcm(spark):
    """WAV PCM decode is real: samples round-trip exactly, peak is the
    exact integer max |sample|; Ogg stays a documented stub."""
    from xhtml_parser_spark.operators.multimodal import decode_audio

    n = 500
    t = np.arange(n)
    sig = (3000 * np.sin(t / 7)).astype("<i2")
    sig[123] = -9999  # known peak
    stereo = np.empty(n * 2, dtype="<i2")
    stereo[0::2] = sig
    stereo[1::2] = -sig
    data = stereo.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rows = [
        (1, "audio", wav, "audio/wav"),
        (2, "audio", _ogg(2, 48000, 96000), "audio/ogg"),
        (3, "audio", b"junk", "application/octet-stream"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    r = got[1]
    assert (r["format"], r["channels"], r["sample_rate"],
            r["bits_per_sample"], r["n_frames"], r["peak"], r["valid"]) == (
        "wav", 2, 8000, 16, n, 9999, "ok")
    assert bytes(r["pcm"]) == data
    assert got[2]["valid"] == "stub-codec" and got[2]["pcm"] is None
    assert got[3]["valid"] == "unknown-format"


def test_decode_image_real_jpeg_pixels(spark):
    """JPEG is the third real codec. Lossy by nature, so the operator
    test pins the cases where the math is exact (uniform blocks, q=1
    tables) and otherwise asserts the operator reproduces the kernel
    decoder bit-for-bit (both run the same reference math)."""
    from xhtml_parser_spark.kernel.jpeg import decode_jpeg, encode_jpeg

    ones = (np.ones((8, 8), dtype=int), np.ones((8, 8), dtype=int))
    uniform = np.full((16, 24, 3), 77, dtype=np.uint8)
    y, x = np.mgrid[0:24, 0:40]
    smooth = np.dstack([
        128 + 90 * np.sin(x / 9), 128 + 70 * np.cos(y / 7),
        128 + 50 * np.sin((x + y) / 11),
    ]).clip(0, 255).astype(np.uint8)
    rows = [
        (1, "image", encode_jpeg(uniform, quality_tables=ones), "image/jpeg"),
        (2, "image", encode_jpeg(smooth, subsample=True), "image/jpeg"),
        (3, "image", encode_jpeg(smooth, restart_interval=2), "image/jpeg"),
        (4, "image", encode_jpeg(smooth[:, :, 0], quality_tables=ones),
         "image/jpeg"),  # grayscale
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_image(df).collect()}
    r1 = got[1]
    assert (r1["format"], r1["width"], r1["height"], r1["channels"],
            r1["valid"]) == ("jpeg", 24, 16, 3, "ok")
    assert bytes(r1["pixels"]) == uniform.tobytes()  # DC-only: exact
    for mid in (2, 3, 4):
        r = got[mid]
        assert r["valid"] == "ok", mid
        ref, _ = decode_jpeg(bytes(rows[mid - 1][2]))
        assert bytes(r["pixels"]) == ref.tobytes(), mid
        err = np.abs(
            np.frombuffer(bytes(r["pixels"]), dtype=np.uint8)
            .reshape(ref.shape)
            .astype(int)
            - (smooth if mid != 4 else smooth[:, :, :1]).astype(int)
        ).max()
        assert err <= 25, (mid, err)


# ---------------------------------------------------------------- MP4 (real)


def test_mp4_kernel_roundtrip():
    """encode_mp4 -> parse_mp4/demux_samples must be the identity on
    the frame payloads for every chunking shape (even, ragged, single
    chunk, one-frame), and the parsed metadata must match the mux
    arguments exactly (mvhd duration, tkhd dims, stsd fourcc, stts)."""
    from xhtml_parser_spark.kernel.mp4 import (
        demux_samples,
        encode_mp4,
        parse_mp4,
        resolve_samples,
    )

    for n, spc in [(1, 2), (4, 2), (5, 2), (7, 3), (3, 10), (6, 1)]:
        frames = [
            bytes([(i * 31 + j) % 256 for j in range(5 + 3 * i)])
            for i in range(n)
        ]
        b = encode_mp4(frames, 64, 48, timescale=600, frame_duration=25,
                       samples_per_chunk=spc)
        info = parse_mp4(b)
        assert info.brand == "isom"
        assert (info.timescale, info.duration) == (600, 25 * n)
        (t,) = info.tracks
        assert (t.handler, t.codec, t.width, t.height) == (
            "vide", "raw ", 64, 48)
        assert t.sample_sizes == [len(f) for f in frames]
        assert demux_samples(b) == frames, (n, spc)
        # dts expansion from stts
        assert [dts for _, _, dts in resolve_samples(t)] == [
            25 * i for i in range(n)
        ]


def test_mp4_hostile_inputs():
    """Crawl payloads are hostile: truncated/absurd boxes must raise
    Mp4Error from the kernel, and decode_video_meta must degrade to a
    'truncated' row, never crash a job."""
    import pytest as _pytest

    from xhtml_parser_spark.kernel.mp4 import Mp4Error, encode_mp4, parse_mp4

    good = encode_mp4([b"xx"], 8, 8)
    for bad in [
        good[:20],                         # truncated mid-box
        good[:4] + b"ftyp",                # header only
        b"\x00\x00\x00\x99ftypisom",       # size beyond EOF
        good.replace(b"moov", b"m00v", 1), # no moov
    ]:
        with _pytest.raises(Mp4Error):
            parse_mp4(bad)


def test_decode_video_meta(spark):
    from xhtml_parser_spark.kernel.mp4 import encode_mp4
    from xhtml_parser_spark.operators.multimodal import decode_video_meta

    frames = [b"\x01" * 10, b"\x02" * 10, b"\x03" * 10]
    rows = [
        (1, "video", encode_mp4(frames, 320, 240, timescale=1000,
                                frame_duration=40), "video/mp4"),
        (2, "video", make_rawvid([b"a", b"b"]), "video/x-raw"),
        (3, "video", b"garbage", "video/mp4"),
        (4, "video", encode_mp4(frames, 8, 8)[:40], "video/mp4"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_video_meta(df).collect()}
    r1 = got[1]
    assert (r1["format"], r1["codec"], r1["width"], r1["height"],
            r1["duration_ms"], r1["n_frames"], r1["valid"]) == (
        "mp4", "raw ", 320, 240, 120, 3, "ok")
    assert (got[2]["format"], got[2]["n_frames"], got[2]["valid"]) == (
        "rawvid", 2, "ok")
    assert got[3]["valid"] == "unknown-format"
    assert got[4]["valid"] == "truncated"


def test_frame_sample_real_mp4(spark):
    """frame_sample now does REAL MP4 demux: the sampled frames must be
    the exact sample payloads at stride every_n, resolved through the
    multi-chunk stsc/stco walk."""
    from xhtml_parser_spark.kernel.mp4 import encode_mp4

    frames = [bytes([i]) * (4 + i) for i in range(7)]
    rows = [(9, "video", encode_mp4(frames, 16, 16, samples_per_chunk=3),
             "video/mp4")]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sorted(frame_sample(df, every_n=3).collect(),
                 key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], bytes(r["frame"])) for r in got] == [
        (0, frames[0]), (3, frames[3]), (6, frames[6])
    ]


def test_decode_audio_real_flac(spark):
    """FLAC decode is real and lossless through the Arrow operator:
    samples byte-identical to the source PCM, exact peak, STREAMINFO
    meta; hostile payloads degrade, never crash."""
    from xhtml_parser_spark.kernel.flac import encode_flac
    from xhtml_parser_spark.operators.multimodal import (
        decode_audio,
        decode_audio_meta,
    )

    n = 6000
    t = np.arange(n)
    left = (9000 * np.sin(t / 17)).astype(np.int32)
    right = -left // 2
    left[77] = -31111  # known peak
    st = np.stack([left, right], axis=1)
    flac = encode_flac(st, sample_rate=22050, stereo_mode="mid_side",
                       lpc_order=4)
    good = encode_flac(st, sample_rate=22050)
    rows = [
        (1, "audio", flac, "audio/flac"),
        (2, "audio", good[: len(good) // 3], "audio/flac"),  # truncated
        (3, "audio", b"fLaC" + b"\x00" * 3, "audio/flac"),   # bad meta
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    r = got[1]
    assert (r["format"], r["channels"], r["sample_rate"],
            r["bits_per_sample"], r["n_frames"], r["peak"], r["valid"]) == (
        "flac", 2, 22050, 16, n, 31111, "ok")
    assert bytes(r["pcm"]) == st.astype("<i2").tobytes()
    assert got[2]["valid"] == "decode-error"
    assert got[3]["valid"] == "truncated"
    meta = {r["media_id"]: r for r in decode_audio_meta(df).collect()}
    assert meta[1]["duration_ms"] == n * 1000 // 22050
    assert meta[1]["valid"] == "ok"
