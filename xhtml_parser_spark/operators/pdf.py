"""Minimal PDF text/layout extraction (north_rule: "PDF/layout parse").

A genuinely functional subset-PDF parser in pure Python + stdlib zlib
-- no codec libraries needed:

  * object scan: ``N 0 obj ... endobj`` byte ranges in document order
  * stream payloads: ``stream``/``endstream`` slices, FlateDecode
    (zlib) when the object dict says so, raw otherwise
  * content-stream tokenizer: text objects (``BT``..``ET``), position
    operators (``Td``, ``TD``, ``Tm``), show-text operators (``Tj``,
    ``'``, ``"``, and ``TJ`` arrays), PDF string escapes
    (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal ``\\ddd``, and
    line continuations)

Two DataFrame operators, both shuffle-free map-side Arrow passes:

  pdf_text_runs  -> exploded layout table (doc_id, page, run_idx, x, y,
                    text) -- one row per shown string with its device-
                    space position, the "layout parse" deliverable
  pdf_text       -> (doc_id, text, n_pages, n_runs, parse_ok) -- runs
                    concatenated in stream order, newline between
                    separate text lines (runs at distinct y or separate
                    BT blocks)

Scope (documented): enough of ISO 32000 for machine-generated
text-first PDFs -- FlateDecode + uncompressed streams, literal strings.
Hex strings are decoded as raw bytes; multi-byte font CMaps, encrypted
files, object streams (XRef streams), and image XObjects are out of
scope and degrade to parse_ok=false or skipped objects, never an
exception (error-as-data like the XHTML kernel).

``make_simple_pdf`` builds a deterministic single-xref PDF (one content
stream per page, one run per text line) -- the synthesis side of the
``pdf_roundtrip`` oracle query and the unit tests.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("page", IntegerType()),
        StructField("run_idx", IntegerType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("text", StringType()),
    ]
)

TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("n_runs", IntegerType()),
        StructField("parse_ok", BooleanType()),
    ]
)


# ---------------------------------------------------------------------------
# synthesis (deterministic; the roundtrip oracle's input side)
# ---------------------------------------------------------------------------


def _esc_pdf_string(s: bytes) -> bytes:
    return (
        s.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
        .replace(b"\n", b"\\n")
        .replace(b"\t", b"\\t")
    )


def make_simple_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Deterministic minimal PDF: one content stream per page, one text
    run per line (12 pt left margin, top-down line layout). Fixed
    object numbering and zlib level => byte-reproducible."""
    objs: list[bytes] = []  # 1-indexed object bodies

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, page_text in enumerate(pages):
        content_ref = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_ref} 0 R /Resources << /Font "
                f"<< /F1 << /Type /Font /Subtype /Type1 "
                f"/BaseFont /Helvetica >> >> >> >>"
            ).encode()
        )
        parts = [b"BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(page_text.split("\n")):
            if k > 0:
                parts.append(b"0 -14 Td")
            parts.append(b"(" + _esc_pdf_string(line.encode("utf-8")) + b") Tj")
        parts.append(b"ET")
        stream = b" ".join(parts)
        if compress:
            stream = zlib.compress(stream, 6)
            head = b"<< /Filter /FlateDecode /Length %d >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        objs.append(head + b"\nstream\n" + stream + b"\nendstream")

    out = [b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"]
    offsets = [0]
    pos = sum(len(x) for x in out)
    for n, body in enumerate(objs, start=1):
        offsets.append(pos)
        chunk = b"%d 0 obj\n" % n + body + b"\nendobj\n"
        out.append(chunk)
        pos += len(chunk)
    xref_pos = pos
    xref = [b"xref\n", b"0 %d\n" % (len(objs) + 1), b"0000000000 65535 f \n"]
    for off in offsets[1:]:
        xref.append(b"%010d 00000 n \n" % off)
    out.extend(xref)
    out.append(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return b"".join(out)


# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
# ISO 32000 reals include trailing-dot forms ('3.') and leading-dot
# ('.5'); rejecting '3.' would drop a Td operand and shift every
# subsequent run's position
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)$")


def _read_pdf_string(b: bytes, i: int) -> tuple[bytes, int]:
    """Literal string starting at '(' -> (unescaped bytes, index past ')')."""
    assert b[i : i + 1] == b"("
    i += 1
    depth = 1
    out = bytearray()
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray([e])
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= b[i] <= 0x37:
                    oct_digits.append(b[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
            else:  # unknown escape: PDF says drop the backslash
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i  # unterminated: best effort


def _tokenize_content(b: bytes):
    """Yield ('str', bytes) / ('num', float) / ('op', bytes) /
    ('arr', list-of-(kind,val)) tokens of a content stream."""
    i, n = 0, len(b)
    while i < n:
        c = b[i : i + 1]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == b"(":
            s, i = _read_pdf_string(b, i)
            yield ("str", s)
        elif c == b"<" and b[i + 1 : i + 2] == b"<":
            # dict in content stream (inline image params etc.): skip token
            i += 2
        elif c == b"<":
            j = b.find(b">", i + 1)
            if j < 0:
                break
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", b[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode()))
            i = j + 1
        elif c == b"[":
            # collect a flat array of strings/numbers until ]
            arr = []
            i += 1
            while i < n and b[i : i + 1] != b"]":
                cc = b[i : i + 1]
                if cc == b"(":
                    s, i = _read_pdf_string(b, i)
                    arr.append(("str", s))
                elif cc == b"<":
                    # hex strings appear in TJ kerning arrays too
                    j = b.find(b">", i + 1)
                    if j < 0:
                        i = n
                        break
                    hx = re.sub(rb"[^0-9A-Fa-f]", b"", b[i + 1 : j])
                    if len(hx) % 2:
                        hx += b"0"
                    arr.append(("str", bytes.fromhex(hx.decode())))
                    i = j + 1
                elif cc in b" \t\r\n":
                    i += 1
                else:
                    j = i
                    while j < n and b[j : j + 1] not in b" \t\r\n]()<":
                        j += 1
                    tok = b[i:j]
                    if _NUM_RE.match(tok):
                        arr.append(("num", float(tok)))
                    i = j if j > i else i + 1
            i += 1
            yield ("arr", arr)
        elif c == b"]":
            i += 1
        else:
            j = i
            while j < n and b[j : j + 1] not in b" \t\r\n\x00\x0c()<>[]/%":
                j += 1
            if j == i:  # '/name' or '%comment'
                if c == b"/":
                    j = i + 1
                    while j < n and b[j : j + 1] not in b" \t\r\n\x00()<>[]/%":
                        j += 1
                    i = j
                    continue
                if c == b"%":
                    j = b.find(b"\n", i)
                    i = n if j < 0 else j + 1
                    continue
                i += 1
                continue
            tok = b[i:j]
            if _NUM_RE.match(tok):
                yield ("num", float(tok))
            else:
                yield ("op", tok)
            i = j


# (?!\d) pins the full digit run first: without it, '/Length 44 0 R'
# backtracks to capture '4' (the lookahead then sees '4 0 R', not
# ' 0 R') and an indirect multi-digit reference is misread as a tiny
# direct length
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")


def _extract_streams(b: bytes) -> list[bytes]:
    """Decoded stream payloads in object order (document order for
    generator-style PDFs). Sequential scan -- compressed stream BYTES
    can coincidentally contain ``N 0 obj`` / ``endobj`` / ``endstream``
    patterns, so object boundaries are advanced past each stream using
    its dict's /Length when present (falling back to an endstream scan
    for dicts with an indirect /Length). Objects naming an unsupported
    filter are skipped."""
    streams = []
    pos = 0
    n = len(b)
    while True:
        m = _OBJ_RE.search(b, pos)
        if m is None:
            break
        start = m.end()
        eo = b.find(b"endobj", start)
        sp = b.find(b"stream", start)
        if sp < 0 or (0 <= eo < sp):
            # no stream in this object
            pos = (eo + len(b"endobj")) if eo >= 0 else start
            continue
        head = b[start:sp]
        p = sp + len(b"stream")
        if b[p : p + 2] == b"\r\n":
            p += 2
        elif b[p : p + 1] == b"\n":
            p += 1
        lm = _LENGTH_RE.search(head)
        if lm is not None:
            ln = int(lm.group(1))
            raw = b[p : p + ln]
            ep = b.find(b"endstream", p + ln)
        else:
            ep = b.find(b"endstream", p)
            raw = b[p:ep].rstrip(b"\r\n") if ep >= 0 else b""
        if ep < 0:
            ep = n
        pos = ep + len(b"endstream")
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in head:
            continue  # unsupported filter (DCT, LZW, ...): not text
        streams.append(raw)
    return streams


def extract_pdf_runs(b: bytes) -> tuple[list[tuple[int, float, float, str]], bool]:
    """All text runs of a PDF as (page, x, y, text) in stream order,
    plus an ok flag. Page index = index of the content stream that
    contains BT..ET blocks (generator-faithful; foreign PDFs:
    best-effort)."""
    if not b.startswith(b"%PDF-"):
        return [], False
    try:
        streams = _extract_streams(b)
    except Exception:
        return [], False
    runs: list[tuple[int, float, float, str]] = []
    page = -1
    for s in streams:
        if b"BT" not in s:
            continue
        page += 1
        in_text = False
        x = y = 0.0
        lx = ly = 0.0  # line start (Td/TD are relative to it)
        stack: list[float] = []
        try:
            for kind, val in _tokenize_content(s):
                if kind == "num":
                    stack.append(val)
                elif kind == "str":
                    stack.append(val)  # type: ignore[arg-type]
                elif kind == "arr":
                    # push; a run is emitted only when a TJ operator
                    # consumes it -- arrays inside BT..ET are also legal
                    # as graphics-state operands ('[2 4] 0 d' dash
                    # patterns), which must not produce phantom runs
                    stack.append(val)  # type: ignore[arg-type]
                else:  # operator
                    op = val
                    if op == b"BT":
                        in_text = True
                        x = y = lx = ly = 0.0
                    elif op == b"ET":
                        in_text = False
                    elif op in (b"Td", b"TD") and len(stack) >= 2:
                        lx += float(stack[-2])
                        ly += float(stack[-1])
                        x, y = lx, ly
                    elif op == b"Tm" and len(stack) >= 6:
                        lx, ly = float(stack[-2]), float(stack[-1])
                        x, y = lx, ly
                    elif op == b"T*":
                        ly -= 14.0  # default leading stand-in
                        x, y = lx, ly
                    elif op == b"TJ" and in_text:
                        arr = next(
                            (v for v in reversed(stack) if isinstance(v, list)),
                            None,
                        )
                        if arr is not None:
                            txt = b"".join(v for k2, v in arr if k2 == "str")
                            if txt:  # kerning-only arrays show nothing
                                runs.append(
                                    (page, x, y,
                                     txt.decode("utf-8", errors="replace"))
                                )
                    elif op in (b"Tj", b"'", b'"') and in_text:
                        sv = next(
                            (v for v in reversed(stack) if isinstance(v, bytes)),
                            None,
                        )
                        if sv is not None:
                            if op != b"Tj":  # ' and " imply next line
                                ly -= 14.0
                                x, y = lx, ly
                            runs.append(
                                (page, x, y,
                                 sv.decode("utf-8", errors="replace"))
                            )
                    stack.clear()
        except Exception:
            return runs, False
    return runs, True


PDF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def synthesize_pdfs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic one-page PDF per document (make_simple_pdf over the
    text column) -- the input side of the pdf_roundtrip oracle and a
    stand-in for a crawl's PDF payload column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": [int(v) for v in pdf["doc_id"]],
                    "payload": [
                        make_simple_pdf([t if t is not None else ""])
                        for t in pdf["text"]
                    ],
                }
            )

    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(batches, PDF_SCHEMA)


def _runs_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in RUNS_SCHEMA.fields}
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            runs, _ok = extract_pdf_runs(b)
            for idx, (page, x, y, text) in enumerate(runs):
                out["doc_id"].append(int(did))
                out["page"].append(page)
                out["run_idx"].append(idx)
                out["x"].append(x)
                out["y"].append(y)
                out["text"].append(text)
        yield pd.DataFrame(out)


def pdf_text_runs(
    docs: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Exploded layout table: one row per shown string with its device-
    space position. Map-side only."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return src.mapInPandas(_runs_batches, RUNS_SCHEMA)


def _text_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in TEXT_SCHEMA.fields}
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            runs, ok = extract_pdf_runs(b)
            parts: list[str] = []
            prev: tuple[int, float] | None = None
            for page, _x, y, text in runs:
                if prev is not None and (page, y) != prev:
                    parts.append("\n")
                parts.append(text)
                prev = (page, y)
            out["doc_id"].append(int(did))
            out["text"].append("".join(parts))
            out["n_pages"].append(1 + max((r[0] for r in runs), default=-1))
            out["n_runs"].append(len(runs))
            out["parse_ok"].append(ok)
        yield pd.DataFrame(out)


def pdf_text(
    docs: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Concatenated document text: runs in stream order, newline when
    the (page, baseline-y) changes -- the PDF analogue of the XHTML
    extracted_text deliverable. Map-side only."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return src.mapInPandas(_text_batches, TEXT_SCHEMA)
