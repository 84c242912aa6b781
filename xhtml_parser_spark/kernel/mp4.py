"""Pure-stdlib MP4 / ISO-BMFF demuxer + minimal test muxer.

The video leg of the multimodal surface (the sandbox has no av/ffmpeg):
``parse_mp4`` walks the real box tree (ftyp/moov/trak/mdia/stbl) and
returns container metadata -- movie duration/timescale from ``mvhd``,
per-track dimensions from ``tkhd`` (16.16 fixed point), codec fourcc
and sample-entry dimensions from ``stsd``, handler type from ``hdlr``
-- and ``demux_samples`` resolves the full sample tables
(``stsc`` sample-to-chunk runs, ``stsz`` sizes, ``stco``/``co64``
chunk offsets, ``stts`` timestamps) into per-sample (offset, size,
dts) triples, i.e. the actual demux algorithm every MP4 reader runs.
Extracted samples are the codec bitstream payloads; DECODING a
compressed codec (avc1/hev1) to pixels stays stubbed at the operator
layer, but for raw-codec tracks (fourcc ``raw ``, uncompressed RGB --
a regime QuickTime defines) the sample bytes ARE the frame pixels, so
the plumbing is provable end-to-end without any media library.

``encode_mp4`` is the test-fixture muxer: a spec-valid progressive
layout (ftyp, mdat, moov) with real sample tables -- including
multi-chunk interleaving so the stsc run-length resolution is
genuinely exercised -- which is what makes the demux round-trip a
real proof.

Spec: ISO/IEC 14496-12 (public). No reference-repo counterpart --
Part-D pipeline surface, not parity.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


class Mp4Error(ValueError):
    pass


_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


def _box(fourcc: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return _U32.pack(8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, *payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")),
                *payload)


def encode_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    *,
    timescale: int = 1000,
    frame_duration: int = 40,
    codec: bytes = b"raw ",
    samples_per_chunk: int = 2,
) -> bytes:
    """Mux frames into a minimal but valid MP4 with one video track.

    Samples are grouped ``samples_per_chunk`` per chunk (last chunk
    ragged) so stsc has a real run + tail entry and stco has multiple
    offsets -- the parser cannot shortcut the sample-to-chunk walk.
    """
    if not frames:
        raise Mp4Error("encode_mp4 needs at least one frame")
    n = len(frames)
    dur = n * frame_duration

    ftyp = _box(b"ftyp", b"isom", _U32.pack(0x200), b"isommp41")

    # mdat: chunks are contiguous runs of samples; offsets are absolute
    # file offsets, so lay out ftyp + mdat header first.
    mdat_body = b"".join(frames)
    mdat = _box(b"mdat", mdat_body)
    data_start = len(ftyp) + 8  # first sample byte

    chunk_offsets = []
    sizes = [len(f) for f in frames]
    pos = data_start
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(sizes[i : i + samples_per_chunk])

    mvhd = _full(
        b"mvhd", 0, 0,
        _U32.pack(0), _U32.pack(0),            # creation/modification
        _U32.pack(timescale), _U32.pack(dur),
        _U32.pack(0x00010000), struct.pack(">H", 0x0100), b"\x00" * 10,
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        b"\x00" * 24, _U32.pack(2),            # predefined, next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        _U32.pack(0), _U32.pack(0), _U32.pack(1), _U32.pack(0),
        _U32.pack(dur), b"\x00" * 8,
        struct.pack(">hhhh", 0, 0, 0, 0),
        struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        _U32.pack(width << 16), _U32.pack(height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        _U32.pack(0), _U32.pack(0), _U32.pack(timescale), _U32.pack(dur),
        struct.pack(">HH", 0x55C4, 0),         # language 'und'
    )
    hdlr = _full(b"hdlr", 0, 0, _U32.pack(0), b"vide", b"\x00" * 12,
                 b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _full(b"dref", 0, 0, _U32.pack(1), _full(b"url ", 0, 1))
    dinf = _box(b"dinf", dref)

    # visual sample entry (14496-12 §12.1.3)
    sample_entry = _box(
        codec,
        b"\x00" * 6, struct.pack(">H", 1),     # reserved, data_ref_index
        b"\x00" * 16,                          # predefined/reserved
        struct.pack(">HH", width, height),
        _U32.pack(0x00480000), _U32.pack(0x00480000),  # 72 dpi
        _U32.pack(0), struct.pack(">H", 1),    # reserved, frame_count
        b"\x00" * 32,                          # compressorname
        struct.pack(">Hh", 24, -1),            # depth, predefined
    )
    stsd = _full(b"stsd", 0, 0, _U32.pack(1), sample_entry)
    stts = _full(b"stts", 0, 0, _U32.pack(1),
                 _U32.pack(n), _U32.pack(frame_duration))
    # stsc: one run entry if n divides evenly, else run + ragged tail
    stsc_entries = [(1, samples_per_chunk, 1)]
    tail = n % samples_per_chunk
    if tail and n > samples_per_chunk:
        stsc_entries.append((len(chunk_offsets), tail, 1))
    elif tail:  # single ragged chunk
        stsc_entries = [(1, tail, 1)]
    stsc = _full(b"stsc", 0, 0, _U32.pack(len(stsc_entries)),
                 *(struct.pack(">III", a, b, c) for a, b, c in stsc_entries))
    stsz = _full(b"stsz", 0, 0, _U32.pack(0), _U32.pack(n),
                 *(_U32.pack(s) for s in sizes))
    stco = _full(b"stco", 0, 0, _U32.pack(len(chunk_offsets)),
                 *(_U32.pack(o) for o in chunk_offsets))

    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)
    minf = _box(b"minf", vmhd, dinf, stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    trak = _box(b"trak", tkhd, mdia)
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov


@dataclass
class Mp4Track:
    track_id: int = 0
    handler: str = ""
    codec: str = ""
    width: int = 0
    height: int = 0
    timescale: int = 0
    duration: int = 0
    sample_sizes: list = field(default_factory=list)
    chunk_offsets: list = field(default_factory=list)
    stsc: list = field(default_factory=list)       # (first_chunk, spc, desc)
    stts: list = field(default_factory=list)       # (count, delta)


@dataclass
class Mp4Info:
    brand: str = ""
    timescale: int = 0
    duration: int = 0
    tracks: list = field(default_factory=list)


def _walk(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for sibling boxes in
    [start, end). Raises Mp4Error on malformed sizes (truncation,
    zero-size loops) -- crawl payloads are hostile."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise Mp4Error(f"truncated box header at {pos}")
        (size,) = _U32.unpack_from(b, pos)
        fourcc = b[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise Mp4Error(f"truncated largesize at {pos}")
            (size,) = _U64.unpack_from(b, body)
            body += 8
        elif size == 0:          # box extends to EOF
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4Error(f"bad box size {size} at {pos}")
        yield fourcc, body, pos + size
        pos += size


def _child(b: bytes, start: int, end: int, fourcc: bytes):
    for fc, s, e in _walk(b, start, end):
        if fc == fourcc:
            return s, e
    return None


def _full_body(b: bytes, s: int) -> tuple[int, int]:
    """(version, body_start_after_fullbox_header)."""
    return b[s], s + 4


def parse_mp4(b: bytes) -> Mp4Info:
    """Walk the box tree; returns brand, movie timescale/duration, and
    per-track metadata + raw sample tables. Video-track oriented but
    handler-agnostic (audio tracks parse too, minus dimensions)."""
    info = Mp4Info()
    moov = None
    for fc, s, e in _walk(b, 0, len(b)):
        if fc == b"ftyp" and e - s >= 4:
            info.brand = b[s : s + 4].decode("latin-1")
        elif fc == b"moov":
            moov = (s, e)
    if moov is None:
        raise Mp4Error("no moov box")
    ms, me = moov
    for fc, s, e in _walk(b, ms, me):
        if fc == b"mvhd":
            ver, p = _full_body(b, s)
            if ver == 1:
                info.timescale = _U32.unpack_from(b, p + 16)[0]
                info.duration = _U64.unpack_from(b, p + 20)[0]
            else:
                info.timescale = _U32.unpack_from(b, p + 8)[0]
                info.duration = _U32.unpack_from(b, p + 12)[0]
        elif fc == b"trak":
            info.tracks.append(_parse_trak(b, s, e))
    return info


def _parse_trak(b: bytes, ts: int, te: int) -> Mp4Track:
    t = Mp4Track()
    tkhd = _child(b, ts, te, b"tkhd")
    if tkhd:
        ver, p = _full_body(b, tkhd[0])
        # v0: creation(4) mod(4) id; v1: creation(8) mod(8) id
        t.track_id = _U32.unpack_from(b, p + (8 if ver == 0 else 16))[0]
        # width/height are the LAST 8 bytes of tkhd, 16.16 fixed
        t.width = _U32.unpack_from(b, tkhd[1] - 8)[0] >> 16
        t.height = _U32.unpack_from(b, tkhd[1] - 4)[0] >> 16
    mdia = _child(b, ts, te, b"mdia")
    if not mdia:
        return t
    mdhd = _child(b, mdia[0], mdia[1], b"mdhd")
    if mdhd:
        ver, p = _full_body(b, mdhd[0])
        if ver == 1:
            t.timescale = _U32.unpack_from(b, p + 16)[0]
            t.duration = _U64.unpack_from(b, p + 20)[0]
        else:
            t.timescale = _U32.unpack_from(b, p + 8)[0]
            t.duration = _U32.unpack_from(b, p + 12)[0]
    hdlr = _child(b, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        t.handler = b[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
    minf = _child(b, mdia[0], mdia[1], b"minf")
    if not minf:
        return t
    stbl = _child(b, minf[0], minf[1], b"stbl")
    if not stbl:
        return t
    ss, se = stbl
    for fc, s, e in _walk(b, ss, se):
        body = _full_body(b, s)[1]
        if fc == b"stsd" and e - body >= 12:
            # first sample entry: size(4) fourcc(4)
            t.codec = b[body + 8 : body + 12].decode("latin-1")
        elif fc == b"stsz":
            fixed = _U32.unpack_from(b, body)[0]
            n = _U32.unpack_from(b, body + 4)[0]
            if fixed:
                t.sample_sizes = [fixed] * n
            else:
                if body + 8 + 4 * n > e:
                    raise Mp4Error("truncated stsz")
                t.sample_sizes = list(
                    struct.unpack_from(f">{n}I", b, body + 8)
                )
        elif fc in (b"stco", b"co64"):
            n = _U32.unpack_from(b, body)[0]
            w, fmt = (8, "Q") if fc == b"co64" else (4, "I")
            if body + 4 + w * n > e:
                raise Mp4Error(f"truncated {fc.decode('latin-1')}")
            t.chunk_offsets = list(struct.unpack_from(f">{n}{fmt}", b, body + 4))
        elif fc == b"stsc":
            n = _U32.unpack_from(b, body)[0]
            if body + 4 + 12 * n > e:
                raise Mp4Error("truncated stsc")
            flat = struct.unpack_from(f">{3 * n}I", b, body + 4)
            t.stsc = [tuple(flat[i : i + 3]) for i in range(0, 3 * n, 3)]
        elif fc == b"stts":
            n = _U32.unpack_from(b, body)[0]
            if body + 4 + 8 * n > e:
                raise Mp4Error("truncated stts")
            flat = struct.unpack_from(f">{2 * n}I", b, body + 4)
            t.stts = [tuple(flat[i : i + 2]) for i in range(0, 2 * n, 2)]
    return t


def resolve_samples(t: Mp4Track) -> list[tuple[int, int, int]]:
    """The demux core: expand stsc runs against stco/stsz/stts into
    per-sample (file_offset, size, dts). This is the exact algorithm
    of 14496-12 §8.7.4 -- stsc entry i applies from its first_chunk
    until the next entry's first_chunk."""
    n = len(t.sample_sizes)
    if not t.stsc or not t.chunk_offsets:
        if n:
            raise Mp4Error("sample sizes without chunk tables")
        return []
    out = []
    # expand dts from stts runs
    dts, ts_iter = 0, []
    for count, delta in t.stts:
        for _ in range(count):
            ts_iter.append(dts)
            dts += delta
    si = 0
    n_chunks = len(t.chunk_offsets)
    for i, (first, spc, _desc) in enumerate(t.stsc):
        last = (t.stsc[i + 1][0] - 1) if i + 1 < len(t.stsc) else n_chunks
        if first < 1 or first > last:
            raise Mp4Error("non-monotonic stsc")
        for chunk in range(first, last + 1):
            off = t.chunk_offsets[chunk - 1]
            for _ in range(spc):
                if si >= n:
                    return out
                sz = t.sample_sizes[si]
                out.append((off, sz, ts_iter[si] if si < len(ts_iter) else 0))
                off += sz
                si += 1
    if si < n:
        raise Mp4Error(f"stsc covers {si} of {n} samples")
    return out


def demux_samples(b: bytes, track_index: int = 0) -> list[bytes]:
    """Extract the raw sample payloads of one track (codec bitstream
    bytes; for fourcc 'raw ' these are the uncompressed pixels)."""
    info = parse_mp4(b)
    if track_index >= len(info.tracks):
        raise Mp4Error(f"no track {track_index}")
    t = info.tracks[track_index]
    out = []
    for off, sz, _dts in resolve_samples(t):
        if off + sz > len(b):
            raise Mp4Error(f"sample at {off}+{sz} beyond EOF")
        out.append(b[off : off + sz])
    return out
