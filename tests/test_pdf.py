"""PDF text/layout extraction tests (north_rule: "PDF/layout parse").

The extractor is a genuine subset-PDF parser (stdlib zlib only); these
tests cover the string-escape grammar, multi-page layout, stream-byte
adversarial cases (compressed payloads containing PDF keywords), and
the Spark operators end-to-end.
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings, strategies as st

from xhtml_parser_spark.operators.pdf import (
    extract_pdf_runs,
    make_simple_pdf,
    pdf_text,
    pdf_text_runs,
    synthesize_pdfs,
)


def _reassemble(runs) -> str:
    parts, prev = [], None
    for page, _x, y, t in runs:
        if prev is not None and (page, y) != prev:
            parts.append("\n")
        parts.append(t)
        prev = (page, y)
    return "".join(parts)


def _roundtrip(pages: list[str], compress: bool = True) -> str:
    runs, ok = extract_pdf_runs(make_simple_pdf(pages, compress=compress))
    assert ok
    return _reassemble(runs)


CASES = [
    "hello world",
    "",
    "line one\nline two\nline three",
    "escape ( ) \\ chars \\( literal",
    "tab\there and (nested (parens))",
    "unicode héllo ünïcode ※ €",
    "trailing newline\n",
    "\nleading newline",
    "a" * 5000,
]


@pytest.mark.parametrize("compress", [True, False], ids=["flate", "raw"])
@pytest.mark.parametrize("text", CASES, ids=range(len(CASES)))
def test_single_page_roundtrip(text: str, compress: bool):
    assert _roundtrip([text], compress=compress) == text


def test_multi_page_layout():
    pages = ["page one\nsecond line", "page two", "p3\na\nb"]
    runs, ok = extract_pdf_runs(make_simple_pdf(pages))
    assert ok
    assert _reassemble(runs) == "\n".join(pages)
    assert {r[0] for r in runs} == {0, 1, 2}
    # generator geometry: line k at (72, 720 - 14k)
    for page, x, y, _t in runs:
        assert x == 72.0
        assert (720.0 - y) % 14.0 == 0.0


def test_not_a_pdf_is_error_not_exception():
    assert extract_pdf_runs(b"") == ([], False)
    assert extract_pdf_runs(b"<html>nope</html>") == ([], False)
    assert extract_pdf_runs(b"%PDF-1.4\ngarbage") == ([], True)  # no text


def test_compressed_bytes_containing_pdf_keywords():
    """zlib output can contain 'N 0 obj'/'endobj'/'endstream' byte
    patterns; the sequential /Length-driven scan must not resync on
    them (regression: 3/500 driver docs failed with the regex scan)."""
    # craft a stream whose COMPRESSED bytes embed scary keywords by
    # appending them raw inside an uncompressed-stored zlib block:
    # simplest reliable adversary -- a one-page pdf whose text IS pdf
    # keywords, stored uncompressed, then reparsed
    t = "7 0 obj endobj endstream stream xref trailer"
    assert _roundtrip([t], compress=False) == t
    assert _roundtrip([t], compress=True) == t


def test_hex_string_and_tj_array():
    """Foreign-PDF constructs the generator never emits: hex strings
    and TJ arrays with kerning numbers."""
    content = b"BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj 0 -14 Td [(a) -120 (b)] TJ ET"
    body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
        b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n"
    )
    runs, ok = extract_pdf_runs(pdf)
    assert ok
    assert [r[3] for r in runs] == ["Hello", "ab"]
    assert runs[1][2] == 706.0


def _wrap_stream(content: bytes, length_field: bytes | None = None) -> bytes:
    if length_field is None:
        length_field = b"/Length %d" % len(content)
    body = b"<< %s >>\nstream\n%s\nendstream" % (length_field, content)
    return (
        b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
        b"trailer\n<< /Size 2 /Root 1 0 R >>\n%%EOF\n"
    )


def test_dash_pattern_array_is_not_a_phantom_run():
    """Arrays inside BT..ET are also legal graphics operands ('[2 4] 0 d'
    dash patterns) and kerning-only TJ arrays show nothing -- neither
    may emit a run."""
    content = (
        b"BT /F1 12 Tf [2 4] 0 d 72 720 Td (real) Tj [ -250 ] TJ "
        b"[(x) -120 (y)] TJ ET"
    )
    runs, ok = extract_pdf_runs(_wrap_stream(content))
    assert ok
    assert [r[3] for r in runs] == ["real", "xy"]


def test_trailing_dot_real_positions():
    """ISO 32000 reals like '710.' must parse as numbers, not drop the
    Td operand (which would shift every subsequent run)."""
    content = b"BT /F1 12 Tf 72. 710. Td (t) Tj ET"
    runs, ok = extract_pdf_runs(_wrap_stream(content))
    assert ok
    assert runs == [(0, 72.0, 710.0, "t")]


def test_indirect_multidigit_length_falls_back_to_endstream_scan():
    """'/Length 44 0 R' must NOT backtrack-match as direct length 4:
    the extractor falls back to the endstream scan and still reads the
    full stream."""
    content = b"BT /F1 12 Tf 72 720 Td (indirect) Tj ET"
    runs, ok = extract_pdf_runs(
        _wrap_stream(content, length_field=b"/Length 44 0 R")
    )
    assert ok
    assert [r[3] for r in runs] == ["indirect"]


@settings(max_examples=150, deadline=3000)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=300))
def test_fuzz_roundtrip(text: str):
    """Any text (incl. control chars, CR, parens, backslashes) survives
    the PDF write/parse roundtrip -- the generator escapes CR/LF/tab so
    the spec's raw-newline normalization never applies."""
    assert _roundtrip([text]) == text


def test_spark_operators(spark):
    rows = [
        (0, "doc zero text\nwith two lines"),
        (1, ""),
        (2, "third (doc)"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdfs = synthesize_pdfs(docs)
    got = {r["doc_id"]: r for r in pdf_text(pdfs).collect()}
    for did, t in rows:
        assert got[did]["parse_ok"]
        assert got[did]["text"] == t
    assert got[0]["n_runs"] == 2 and got[0]["n_pages"] == 1
    runs = pdf_text_runs(pdfs).collect()
    assert {(r["doc_id"], r["run_idx"]) for r in runs} == {
        (0, 0), (0, 1), (1, 0), (2, 0),
    }
    y0 = [r["y"] for r in runs if r["doc_id"] == 0]
    assert sorted(y0, reverse=True) == [720.0, 706.0]
