"""Pure-stdlib GIF decoder (LZW) + minimal test encoder.

Second real image codec after kernel/png.py (the sandbox has no image
libraries): ``decode_gif`` turns real GIF87a/89a bytes into exact pixel
arrays -- variable-width LZW with clear/EOI and dynamic code growth,
global and local color tables, Adam-style 4-pass interlace, and GCE
transparency (-> RGBA). First frame only (animation = repeated image
descriptors; a frame iterator is a trivial extension of the same block
walk, and training pipelines fingerprint stills).

``encode_gif`` is the test-fixture writer: pixel-per-code LZW with
spec-correct width growth and re-clears at the 12-bit ceiling --
deliberately simple, but every byte is a valid GIF stream, which is
what makes the decode round-trip a real proof.

Spec: GIF89a (CompuServe, public). No reference-repo counterpart --
Part-D pipeline surface, not parity.

Performance note: the LZW inner loop is per-code Python -- fine for
thumbnails/fixtures; the mapInPandas plumbing around it is what a
libvips-backed decoder would use at scale (same posture as png.py's
Average/Paeth rows).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW: code stream little-endian bit-packed, dynamic
    code width, clear/EOI codes. Returns index bytes (palette refs)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as list of bytes
    def fresh():
        d = [bytes([i]) for i in range(clear)] + [b"", b""]
        return d
    dict_ = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while pos < n or nbits >= width:
        while nbits < width and pos < n:
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(dict_):
                raise GifError("bad first code")
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
            dict_.append(prev + entry[:1])
        elif code == len(dict_):
            entry = prev + prev[:1]
            dict_.append(entry)
        else:
            raise GifError("code out of range")
        out += entry
        prev = entry
        if len(dict_) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    return out


def decode_gif(b: bytes):
    """First frame of a GIF87a/89a -> ((h, w, 3|4) uint8, meta).
    Interlaced frames are de-interlaced; GCT/LCT; transparency via the
    GCE transparent index (-> RGBA)."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad signature")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(b):
            raise GifError("truncated GCT")
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    transparent = None
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            raise GifError("no image data")
        if block == 0x21:  # extension
            if pos + 2 > len(b):
                raise GifError("truncated extension")
            label = b[pos + 1]
            pos += 2
            # GCE: pull the transparent index
            if label == 0xF9 and pos + 1 < len(b) and b[pos] >= 4:
                sz = b[pos]
                gce = b[pos + 1 : pos + 1 + sz]
                if len(gce) >= 4 and gce[0] & 1:
                    transparent = gce[3]
            while pos < len(b) and b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                raise GifError("truncated descriptor")
            ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                if pos + 3 * n > len(b):
                    raise GifError("truncated LCT")
                pal = np.frombuffer(
                    b[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                raise GifError("no palette")
            if pos >= len(b):
                raise GifError("truncated image")
            min_code = b[pos]
            pos += 1
            sub = []
            while pos < len(b) and b[pos]:
                ln = b[pos]
                sub.append(b[pos + 1 : pos + 1 + ln])
                if len(sub[-1]) != ln:
                    raise GifError("truncated sub-block")
                pos += 1 + ln
            if pos >= len(b):
                raise GifError("missing block terminator")
            pos += 1
            idx = _lzw_decode(min_code, b"".join(sub), iw * ih)
            if len(idx) < iw * ih:
                raise GifError("LZW underrun")
            arr_idx = np.frombuffer(bytes(idx[: iw * ih]), dtype=np.uint8).reshape(
                ih, iw
            )
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                de = np.empty_like(arr_idx)
                rows = list(range(0, ih, 8)) + list(range(4, ih, 8)) + \
                       list(range(2, ih, 4)) + list(range(1, ih, 2))
                de[np.array(rows)] = arr_idx
                arr_idx = de
            if int(arr_idx.max(initial=0)) >= len(pal):
                raise GifError("palette index out of range")
            rgb = pal[arr_idx]
            if transparent is not None and transparent < len(pal):
                alpha = np.where(arr_idx == transparent, 0, 255).astype(np.uint8)
                out = np.dstack([rgb, alpha])
            else:
                out = rgb
            meta = {
                "width": iw, "height": ih, "screen_width": sw,
                "screen_height": sh, "channels": out.shape[2],
                "interlaced": bool(iflags & 0x40),
            }
            return out, meta
        raise GifError(f"unknown block 0x{block:02x}")
    raise GifError("no image data")


# encoder for tests: uncompressed-style LZW (emit clear codes often)
def encode_gif(arr: np.ndarray, interlaced: bool = False) -> bytes:
    """Minimal GIF89a writer for (h, w, 3) uint8 with <=256 distinct
    colors (test fixture generator; real encoders do better LZW)."""
    h, w, c = arr.shape
    if c != 3:
        raise GifError("encode_gif writes RGB")
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError("too many colors")
    nbits = max(2, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal_n = 1 << nbits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    out = [b"GIF89a", struct.pack("<HHBBB", w, h, 0x80 | (nbits - 1), 0, 0),
           pal.tobytes()]
    out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0))
    min_code = nbits
    clear = 1 << min_code
    eoi = clear + 1
    idx = inverse.reshape(h, w).astype(np.uint8)
    if interlaced:
        rows = list(range(0, h, 8)) + list(range(4, h, 8)) + \
               list(range(2, h, 4)) + list(range(1, h, 2))
        idx = idx[np.array(rows)]
    # emit: clear, then each pixel as its own code, re-clearing before
    # the width would have to grow -- valid LZW, trivially decodable
    # The decoder adds ONE dict entry per code starting with the SECOND
    # code after a clear, and widens when the dict size reaches 1<<width
    # -- the encoder must mirror that exactly.
    codes = [clear]
    width = min_code + 1
    count = eoi + 1
    first = True
    for v in idx.reshape(-1):
        if not first and count + 1 == (1 << 12):
            codes.append(clear)
            count = eoi + 1
            first = True
        codes.append(int(v))
        if first:
            first = False
        else:
            count += 1
            if count == (1 << width) and width < 12:
                width += 1
    codes.append(eoi)
    # bit-pack little-endian with dynamic width tracking the decoder's
    acc = nb = 0
    packed = bytearray()
    width = min_code + 1
    count = eoi + 1
    first = True
    for code in codes:
        acc |= code << nb
        nb += width
        while nb >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
        if code == clear:
            width = min_code + 1
            count = eoi + 1
            first = True
        elif code != eoi:
            if first:
                first = False
            else:
                count += 1
                if count == (1 << width) and width < 12:
                    width += 1
    if nb:
        packed.append(acc & 0xFF)
    out.append(bytes([min_code]))
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out.append(bytes([len(chunk)]) + bytes(chunk))
    out.append(b"\x00\x3b")
    return b"".join(out)


