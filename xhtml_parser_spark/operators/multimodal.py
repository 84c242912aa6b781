"""Multimodal (image/audio/video) column operators.

Media rides as opaque ``binary`` columns with typed metadata structs --
the same posture as the ``html: binary`` pages column. All Spark-side
plumbing (schemas, Arrow batch shapes, partition sizing) is real and
tested. ALL THREE image codecs decode for REAL (kernel/png.py:
zlib + NumPy unfilter; kernel/gif.py: pure-Python LZW; kernel/jpeg.py:
baseline AND progressive Huffman + NumPy IDCT), as do BOTH audio
paths -- WAV PCM (the samples are already little-endian PCM in the
data chunk) and FLAC (kernel/flac.py: a genuine lossless decoder --
Rice residuals, fixed + LPC predictors, stereo decorrelation, CRC
validation) -- and MP4 demux is a REAL ISO-BMFF box walk +
sample-table resolution (kernel/mp4.py); the remaining codec work
(Vorbis, compressed-video bitstream decode) is stubbed because no
media libraries exist in this container:

  * ``decode_image`` decodes real PNG, GIF, and JPEG payloads to
    pixel arrays (PNG: all 5 filters, depths 1-16, palette/tRNS,
    exact; GIF: variable-width LZW, interlace, GCE transparency,
    exact; JPEG: SOF0/1 baseline AND SOF2 progressive -- spectral
    selection + successive approximation per T.81 Annex G -- with
    4:2:0/4:2:2 upsampling; lossy by nature, tested exact on DC-only
    content, error-bounded elsewhere, and progressive pinned
    pixel-identical to baseline for the same coefficients).
  * ``decode_audio`` extracts real PCM samples from WAV payloads
    (int8/int16/int32, exact integer peak/RMS); compressed codecs
    (Ogg-Vorbis audio data) remain header-only.
  * ``decode_image_meta`` parses real magic bytes + container headers
    (PNG/JPEG/GIF dimensions) with pure byte arithmetic -- no library
    needed, genuinely functional.
  * ``decode_audio_meta`` likewise: RIFF/WAVE chunk walk (channels,
    rate, bits, duration from data size / byte rate) and Ogg-Vorbis
    identification header + last-page granule position.
  * ``extract_features`` produces a deterministic fake embedding
    (byte-histogram, documented as a stand-in) so downstream
    similarity/dedup plumbing is exercised end-to-end.
  * ``decode_video_meta`` walks real MP4 box trees (mvhd duration,
    tkhd dimensions, stsd codec, stsz frame count) -- pure byte
    arithmetic, genuinely functional.
  * ``frame_sample`` demuxes REAL MP4s via stsc/stsz/stco resolution
    into per-sample payloads (for fourcc 'raw ' tracks the samples ARE
    uncompressed pixels, end-to-end provable); compressed-bitstream
    DECODE and other containers (webm) raise a clearly-marked
    NotImplementedError.

Scale notes: media rows are large; the operators run through
mapInPandas with the session's bounded Arrow batch rows, and the
recommended layout is one media item per row, partitioned by content
hash (co-locates exact-dup detection).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("valid", StringType()),  # ok | unknown-format | truncated
    ]
)


def _sniff_image(b: bytes) -> tuple[str, int, int, str]:
    """Header-only dimension extraction: PNG IHDR, GIF logical screen,
    JPEG SOF scan. Pure byte arithmetic (no codec)."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h, "ok"
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h, "ok"
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h, "ok"
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", 0, 0, "truncated"
    return "unknown", 0, 0, "unknown-format"


def _image_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in IMAGE_META_SCHEMA.fields}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            fmt, w, h, valid = _sniff_image(b)
            out["media_id"].append(int(mid))
            out["format"].append(fmt)
            out["width"].append(w)
            out["height"].append(h)
            out["n_bytes"].append(len(b))
            out["valid"].append(valid)
        yield pd.DataFrame(out)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """media(media_id, payload, ...) -> typed image metadata. Map-side."""
    return media.select("media_id", "payload").mapInPandas(
        _image_meta_batches, IMAGE_META_SCHEMA
    )


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bit_depth", IntegerType()),
        # C-order array bytes: uint8 for depths <= 8, big-endian uint16
        # for depth 16 -- byte-deterministic across platforms
        StructField("pixels", BinaryType()),
        StructField("valid", StringType()),
    ]
)


def _decode_image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..kernel.gif import GifError, decode_gif
    from ..kernel.jpeg import JpegError, decode_jpeg
    from ..kernel.png import PngError, decode_png

    decoders = {
        "png": (decode_png, PngError),
        "gif": (decode_gif, GifError),
        "jpeg": (decode_jpeg, JpegError),
    }

    for pdf in batches:
        out = {k.name: [] for k in DECODED_IMAGE_SCHEMA.fields}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            fmt, w, h, valid = _sniff_image(b)
            ch = depth = 0
            pixels = None
            if fmt in decoders:
                decode, err = decoders[fmt]
                try:
                    arr, meta = decode(b)
                    w, h = meta["width"], meta["height"]
                    ch = meta["channels"]
                    depth = meta.get("bit_depth", 8)
                    pixels = (
                        arr.astype(">u2").tobytes()
                        if arr.dtype == np.uint16
                        else arr.tobytes()
                    )
                    valid = "ok"
                except err:
                    valid = "decode-error"
            out["media_id"].append(int(mid))
            out["format"].append(fmt)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            out["bit_depth"].append(depth)
            out["pixels"].append(pixels)
            out["valid"].append(valid)
        yield pd.DataFrame(out)


def decode_image(media: DataFrame) -> DataFrame:
    """media(media_id, payload, ...) -> decoded pixels. PNG and GIF are
    decoded for REAL (kernel/png.py: zlib inflate + NumPy unfilter, all
    5 filters, depths 1-16, palette/tRNS -> RGB(A); kernel/gif.py:
    variable-width LZW, interlace, transparency -> RGB(A)); JPEG stays
    a header-only stub (valid='stub-codec', NULL pixels) pending a
    codec lib. Map-side Arrow pass, one row per media item."""
    return media.select("media_id", "payload").mapInPandas(
        _decode_image_batches, DECODED_IMAGE_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("valid", StringType()),
    ]
)

_RAWIMG2_MAGIC = b"RAWIMG02"


def _resize_batches(width: int, height: int):
    import numpy as np

    from ..kernel.gif import GifError, decode_gif
    from ..kernel.jpeg import JpegError, decode_jpeg
    from ..kernel.png import PngError, decode_png

    decoders = {
        "png": (decode_png, PngError),
        "gif": (decode_gif, GifError),
        "jpeg": (decode_jpeg, JpegError),
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                fmt, w, h, valid = _sniff_image(b)
                out["media_id"].append(int(mid))
                out["format"].append(fmt)
                out["width"].append(width)
                out["height"].append(height)
                if fmt in decoders:
                    # REAL path: decode actual pixels (kernel png/gif/
                    # jpeg), nearest-neighbor resample, emit a RAWIMG02
                    # container (magic + w/h/channels + uint8 pixels;
                    # 16-bit samples take their high byte)
                    decode, err = decoders[fmt]
                    try:
                        arr, _meta = decode(b)
                    except err:
                        out["valid"].append("decode-error")
                        out["payload"].append(None)
                        continue
                    if arr.dtype == np.uint16:
                        arr = (arr >> 8).astype(np.uint8)
                    ys = (np.arange(height, dtype=np.int64) * arr.shape[0]) // height
                    xs = (np.arange(width, dtype=np.int64) * arr.shape[1]) // width
                    small = arr[ys][:, xs]
                    out["valid"].append("ok")
                    out["payload"].append(
                        _RAWIMG2_MAGIC
                        + struct.pack("<IIB", width, height, small.shape[2])
                        + small.tobytes()
                    )
                    continue
                # every sniffable image format now has a real decoder;
                # anything else passes through skipped
                out["valid"].append("skipped")
                out["payload"].append(None)
            yield pd.DataFrame(out)

    return run


def resize_image(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Per-item resize, map-side Arrow pass, on REAL decoded pixels for
    all three codecs (kernel png/gif/jpeg): decode + nearest-neighbor
    resample -> RAWIMG02(w, h, channels, uint8 pixels); undecodable
    payloads come back valid='decode-error'; non-image payloads pass
    through valid='skipped' with a NULL payload."""
    return media.select("media_id", "payload").mapInPandas(
        _resize_batches(width, height), RESIZED_SCHEMA
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
        StructField("valid", StringType()),  # ok | unknown-format | truncated
    ]
)


def _sniff_audio(b: bytes) -> tuple[str, int, int, int, int, str]:
    """Header-only audio metadata: RIFF/WAVE fmt+data chunk walk,
    FLAC STREAMINFO, and Ogg-Vorbis identification header + last-page
    granule position. Pure byte arithmetic, no codec (mirrors
    _sniff_image)."""
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        ch = sr = bits = byte_rate = 0
        data_size = -1
        p = 12
        while p + 8 <= len(b):
            cid = b[p : p + 4]
            (csz,) = struct.unpack("<I", b[p + 4 : p + 8])
            # the chunk's own declared size must cover the 16 fmt bytes,
            # or we'd read the NEXT chunk's header as format fields
            if cid == b"fmt " and csz >= 16 and p + 24 <= len(b):
                _fmt, ch, sr, byte_rate, _ba, bits = struct.unpack(
                    "<HHIIHH", b[p + 8 : p + 24]
                )
            elif cid == b"data":
                data_size = csz
            p += 8 + csz + (csz & 1)  # chunks are word-aligned
        if ch and sr and byte_rate and data_size >= 0:
            dur = data_size * 1000 // byte_rate
            return "wav", ch, sr, bits, dur, "ok"
        return "wav", ch, sr, bits, 0, "truncated"
    if len(b) >= 4 and b[:4] == b"fLaC":
        # REAL container math: STREAMINFO walk (kernel/flac.py)
        from ..kernel.flac import FlacError, parse_streaminfo

        try:
            sr, ch, bits, total, _off = parse_streaminfo(b)
        except FlacError:
            return "flac", 0, 0, 0, 0, "truncated"
        dur = total * 1000 // sr if sr else 0
        return "flac", ch, sr, bits, dur, "ok"
    if len(b) >= 58 and b[:4] == b"OggS":
        # first page: 27-byte header + segment table, then the Vorbis
        # identification packet \x01vorbis + version u32 + ch u8 + sr u32
        nseg = b[26]
        p = 27 + nseg
        if p + 16 <= len(b) and b[p : p + 7] == b"\x01vorbis":
            ch = b[p + 11]
            (sr,) = struct.unpack("<I", b[p + 12 : p + 16])
            # duration: granule position (total pcm samples) of the
            # LAST page. 'OggS' can false-sync inside packet bytes, so
            # scan back until a candidate parses as a real final page:
            # version byte 0 AND the page (27-byte header + segment
            # table + lacing sum) ends exactly at EOF
            dur = 0
            valid = "truncated"
            q = b.rfind(b"OggS")
            while q >= 0:
                if q + 27 <= len(b) and b[q + 4] == 0:
                    nseg2 = b[q + 26]
                    body = q + 27 + nseg2
                    if body <= len(b):
                        size = body + sum(b[q + 27 : q + 27 + nseg2])
                        (granule,) = struct.unpack("<q", b[q + 6 : q + 14])
                        if size == len(b) and granule >= 0 and sr:
                            dur = granule * 1000 // sr
                            valid = "ok"
                            break
                if q == 0:
                    break
                q = b.rfind(b"OggS", 0, q)
            return "ogg", ch, sr, 0, dur, valid
        return "ogg", 0, 0, 0, 0, "truncated"
    return "unknown", 0, 0, 0, 0, "unknown-format"


def _audio_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in AUDIO_META_SCHEMA.fields}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            fmt, ch, sr, bits, dur, valid = _sniff_audio(b)
            out["media_id"].append(int(mid))
            out["format"].append(fmt)
            out["channels"].append(ch)
            out["sample_rate"].append(sr)
            out["bits_per_sample"].append(bits)
            out["duration_ms"].append(dur)
            out["n_bytes"].append(len(b))
            out["valid"].append(valid)
        yield pd.DataFrame(out)


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """media(media_id, payload, ...) -> typed audio metadata (WAV/OGG
    header math -- genuinely functional, no codec needed). Map-side."""
    return media.select("media_id", "payload").mapInPandas(
        _audio_meta_batches, AUDIO_META_SCHEMA
    )


DECODED_AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("peak", LongType()),  # max |sample|, exact integer
        # interleaved little-endian PCM exactly as stored (u8 for 8-bit,
        # i16/i32 for 16/32-bit) -- byte-deterministic
        StructField("pcm", BinaryType()),
        StructField("valid", StringType()),
    ]
)


def _decode_audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    dtypes = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}

    for pdf in batches:
        out = {k.name: [] for k in DECODED_AUDIO_SCHEMA.fields}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            fmt, ch, sr, bits, _dur, valid = _sniff_audio(b)
            n_frames = 0
            peak = 0
            pcm = None
            if fmt == "wav" and valid == "ok":
                # REAL PCM decode: walk to the data chunk and take the
                # samples as stored (WAV PCM is little-endian; 8-bit is
                # unsigned with a 128 bias, 16/32-bit signed)
                data = None
                p = 12
                while p + 8 <= len(b):
                    cid = b[p : p + 4]
                    (csz,) = struct.unpack("<I", b[p + 4 : p + 8])
                    if cid == b"data":
                        data = b[p + 8 : p + 8 + csz]
                        break
                    p += 8 + csz + (csz & 1)
                if data is None or bits not in dtypes or ch == 0:
                    valid = "decode-error"
                else:
                    dt = dtypes[bits]
                    frame_bytes = ch * bits // 8
                    usable = len(data) - (len(data) % max(frame_bytes, 1))
                    samples = np.frombuffer(data[:usable], dtype=dt)
                    n_frames = usable // frame_bytes if frame_bytes else 0
                    if samples.size:
                        if bits == 8:
                            peak = int(
                                np.abs(
                                    samples.astype(np.int16) - 128
                                ).max()
                            )
                        else:
                            peak = int(np.abs(samples.astype(np.int64)).max())
                    pcm = data[:usable]
            elif fmt == "flac" and valid == "ok":
                # REAL lossless decode (kernel/flac.py): exact samples
                from ..kernel.flac import FlacError, decode_flac

                try:
                    samples, _meta = decode_flac(b)
                except FlacError:
                    valid = "decode-error"
                else:
                    n_frames = samples.shape[0]
                    if samples.size:
                        peak = int(np.abs(samples.astype(np.int64)).max())
                    # same wire convention as the WAV lane: u8 biased
                    # for 8-bit, little-endian i16/i32 otherwise
                    # (24-bit widens to i32)
                    if bits <= 8:
                        pcm = (
                            samples.astype(np.int16) + 128
                        ).astype(np.uint8).tobytes()
                    elif bits <= 16:
                        pcm = samples.astype("<i2").tobytes()
                    else:
                        pcm = samples.astype("<i4").tobytes()
            elif fmt == "ogg":
                # compressed codec: header math only (documented stub)
                valid = "stub-codec"
            out["media_id"].append(int(mid))
            out["format"].append(fmt)
            out["channels"].append(ch)
            out["sample_rate"].append(sr)
            out["bits_per_sample"].append(bits)
            out["n_frames"].append(n_frames)
            out["peak"].append(peak)
            out["pcm"].append(pcm)
            out["valid"].append(valid)
        yield pd.DataFrame(out)


def decode_audio(media: DataFrame) -> DataFrame:
    """media(media_id, payload, ...) -> REAL PCM samples for WAV
    payloads (u8/i16/i32, exact integer peak, trailing partial frame
    dropped) AND for FLAC payloads (genuine lossless decode via
    kernel/flac.py -- exact integer samples re-emitted in the same
    wire convention, 24-bit widening to i32); Ogg stays a header-only
    stub (valid='stub-codec') -- Vorbis needs a codec lib. Map-side
    Arrow pass."""
    return media.select("media_id", "payload").mapInPandas(
        _decode_audio_batches, DECODED_AUDIO_SCHEMA
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        ids, embs = [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            # STUB FEATURE EXTRACTOR: deterministic 64-bin byte histogram,
            # L2-normalized. A real extractor (CLIP/ResNet/NeMo) slots in
            # here unchanged -- same signature, same Arrow batch shape.
            hist = np.bincount(
                np.frombuffer(b, dtype=np.uint8) >> 2, minlength=64
            ).astype(np.float64)
            n = np.linalg.norm(hist)
            embs.append((hist / n if n else hist).astype(np.float32).tolist())
            ids.append(int(mid))
        yield pd.DataFrame({"media_id": ids, "embedding": embs})


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic stand-in embedding per media item (see stub note)."""
    return media.select("media_id", "payload").mapInPandas(
        _feature_batches, FEATURE_SCHEMA
    )


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),     # mp4 | rawvid
        StructField("codec", StringType()),      # stsd fourcc
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("valid", StringType()),      # ok | unknown-format | truncated
    ]
)


def _video_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from xhtml_parser_spark.kernel.mp4 import Mp4Error, parse_mp4

    for pdf in batches:
        out = {k.name: [] for k in VIDEO_META_SCHEMA.fields}

        def emit(mid, fmt, codec, w, h, dur, n, valid):
            out["media_id"].append(int(mid))
            out["format"].append(fmt)
            out["codec"].append(codec)
            out["width"].append(w)
            out["height"].append(h)
            out["duration_ms"].append(dur)
            out["n_frames"].append(n)
            out["valid"].append(valid)

        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            if len(b) >= 12 and b[4:8] == b"ftyp":
                try:
                    info = parse_mp4(b)
                    vid = next(
                        (t for t in info.tracks if t.handler == "vide"),
                        info.tracks[0] if info.tracks else None,
                    )
                    if vid is None:
                        emit(mid, "mp4", "", 0, 0, 0, 0, "truncated")
                        continue
                    dur_ms = (
                        info.duration * 1000 // info.timescale
                        if info.timescale
                        else 0
                    )
                    emit(mid, "mp4", vid.codec, vid.width, vid.height,
                         dur_ms, len(vid.sample_sizes), "ok")
                except Mp4Error:
                    emit(mid, "mp4", "", 0, 0, 0, 0, "truncated")
            elif b.startswith(_RAWVID_MAGIC):
                (n,) = struct.unpack("<I", b[8:12])
                emit(mid, "rawvid", "raw ", 0, 0, 0, n, "ok")
            else:
                emit(mid, "", "", 0, 0, 0, 0, "unknown-format")
        yield pd.DataFrame(out)


def decode_video_meta(media: DataFrame) -> DataFrame:
    """media(media_id, payload, ...) -> REAL container metadata for MP4
    payloads: full ISO-BMFF box walk (kernel/mp4.py) -- brand, mvhd
    duration normalized to ms, tkhd dimensions, stsd codec fourcc,
    stsz sample count. Genuinely functional pure byte arithmetic, no
    media library; hostile/truncated payloads degrade to a 'truncated'
    row, never an exception (crawl-facing posture, same as
    decode_image_meta). Map-side Arrow pass, no shuffle."""
    return media.select("media_id", "payload").mapInPandas(
        _video_meta_batches, VIDEO_META_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

_RAWVID_MAGIC = b"RAWVID01"


def make_rawvid(frames: list[bytes]) -> bytes:
    """Deterministic fake video container for testing the sampling
    plumbing: magic + u32 frame count + (u32 length + payload)*."""
    out = [_RAWVID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def _iter_frames(b: bytes):
    """Yield per-frame payload bytes from a video container: REAL MP4
    demux (stsc/stsz/stco sample-table resolution, kernel/mp4.py) or
    the rawvid test container. The yielded bytes are the codec
    bitstream samples -- for MP4 fourcc 'raw ' they ARE the pixels;
    DECODING compressed codecs (avc1/hev1) stays stubbed (no ffmpeg
    in this container), but the demux itself is genuine."""
    if len(b) >= 12 and b[4:8] == b"ftyp":
        from xhtml_parser_spark.kernel.mp4 import demux_samples

        yield from demux_samples(b)
        return
    if b.startswith(_RAWVID_MAGIC):
        (n,) = struct.unpack("<I", b[8:12])
        p = 12
        for _ in range(n):
            (ln,) = struct.unpack("<I", b[p : p + 4])
            yield b[p + 4 : p + 4 + ln]
            p += 4 + ln
        return
    # STUB: other containers (webm/mkv) need av/ffmpeg, absent here
    raise NotImplementedError(
        "frame_sample demuxes MP4 (ISO-BMFF) and the rawvid test "
        "container here; plug ffmpeg/PyAV for webm/mkv"
    )


def _frame_sample_batches(every_n: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for i, frame in enumerate(_iter_frames(b)):
                    if i % every_n == 0:
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(i)
                        out["frame"].append(frame)
            yield pd.DataFrame(out)

    return run


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """1-in-N frame sampling over REAL MP4 demux (or the rawvid test
    container): one input row fans out to many frame rows (mapInPandas
    is a flatMap, so the fan-out is streaming-friendly)."""
    return media.select("media_id", "payload").mapInPandas(
        _frame_sample_batches(every_n), FRAME_SCHEMA
    )
