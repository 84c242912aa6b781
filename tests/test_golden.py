"""Golden-file end-to-end parity tests (no Spark needed).

Mirrors the reference's test strategy (reference tests/tests_xml.rs:19-50):
parse each fixture under tests/fixtures/<suite>/test_case/, serialize via
the reimplemented Debug formatter, and require EXACT string equality with
tests/fixtures/<suite>/expected_result/<file>.result.

The fixtures are the reference's own MIT-licensed test corpus, vendored
verbatim (see FIXTURES.md §2).
"""

from __future__ import annotations

import pathlib

import pytest

from xhtml_parser_spark.kernel import debug_format, parse_document

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _cases(suite: str) -> list[pathlib.Path]:
    return sorted((FIXTURES / suite / "test_case").glob("*.xhtml"))


def _golden(suite: str, case: pathlib.Path) -> str:
    return (
        FIXTURES / suite / "expected_result" / (case.name + ".result")
    ).read_text(encoding="utf-8")


ALL_CASES = [
    (suite, case)
    for suite in ("simple_test", "namespace_removal", "parse_escapes", "speed_test")
    for case in _cases(suite)
]


@pytest.mark.parametrize(
    "suite,case", ALL_CASES, ids=[f"{s}/{c.name}" for s, c in ALL_CASES]
)
def test_golden_tree(suite: str, case: pathlib.Path) -> None:
    doc = parse_document(case.read_bytes())
    assert doc.ok, f"parse failed: {doc.error_msg}"
    got = debug_format(doc)
    want = _golden(suite, case)
    if got != want:
        # first differing line, for a readable failure
        for i, (g, w) in enumerate(zip(got.splitlines(), want.splitlines())):
            if g != w:
                raise AssertionError(
                    f"{case.name}: first diff at line {i + 1}:\n got: {g!r}\nwant: {w!r}"
                )
        raise AssertionError(
            f"{case.name}: length mismatch got={len(got)} want={len(want)}"
        )


@pytest.mark.parametrize(
    "suite,case", ALL_CASES, ids=[f"{s}/{c.name}" for s, c in ALL_CASES]
)
def test_golden_extracted_text(suite: str, case: pathlib.Path) -> None:
    """The pipeline deliverable: extracted text bytes == concatenation of
    the Text{...} bodies of the golden tree, in document order."""
    doc = parse_document(case.read_bytes())
    assert doc.ok
    got = doc.extracted_text()
    want = _golden_text_bytes(_golden(suite, case))
    assert got == want


def _golden_text_bytes(golden: str) -> bytes:
    """Recover the expected extracted text from a golden .result file.

    Text blocks are serialized raw (Display) as:
        <indent>Text {
        <indent>    "<body...possibly multiline...>"
        <indent>}
    """
    out: list[bytes] = []
    lines = golden.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.lstrip() == "Text {" and line.startswith(" "):
            indent = len(line) - len(line.lstrip())
            # body starts on next line after indent+4 spaces and a quote
            body_prefix = " " * (indent + 4) + '"'
            assert lines[i + 1].startswith(body_prefix), lines[i + 1]
            body_lines = [lines[i + 1][len(body_prefix):]]
            j = i + 1
            closer = " " * indent + "}"
            while lines[j + 1] != closer:
                j += 1
                body_lines.append(lines[j])
            # re-join raw newlines; strip the trailing quote
            body = "\n".join(body_lines)
            assert body.endswith('"'), body
            out.append(body[:-1].encode("utf-8"))
            i = j + 2
        else:
            i += 1
    return b"".join(out)


# -- non-default feature profiles (reference cargo features) --

PROFILE_SUITES = {
    "trim_pcdata": dict(trim_pcdata=True),
    "keep_ws_only_pcdata": dict(keep_ws_only_pcdata=True),
    "no_feature": dict(
        parse_escapes=False,
        namespace_removal=False,
        trim_pcdata=False,
        keep_ws_only_pcdata=False,
    ),
}


@pytest.mark.parametrize("suite", sorted(PROFILE_SUITES))
def test_golden_feature_profiles(suite: str) -> None:
    from xhtml_parser_spark.kernel.parser import parse_document_pure

    for case in _cases(suite):
        doc = parse_document_pure(case.read_bytes(), **PROFILE_SUITES[suite])
        assert doc.ok, f"{suite}/{case.name}: {doc.error_msg}"
        got = debug_format(doc)
        want = _golden(suite, case)
        assert got == want, f"{suite}/{case.name} mismatch"


def test_profile_semantics_units() -> None:
    from xhtml_parser_spark.kernel.parser import parse_document_pure

    # trim_pcdata: leading AND trailing ws trimmed from text
    d = parse_document_pure(b"<a>  x  </a>", trim_pcdata=True)
    assert d.extracted_text() == b"x"
    # keep_ws_only_pcdata: ws-only segments become raw text nodes
    d = parse_document_pure(b"<a>  <b/> </a>", keep_ws_only_pcdata=True)
    assert d.extracted_text() == b"   "
    # parse_escapes off: entities verbatim, CR/CRLF -> LF
    d = parse_document_pure(b"<a>x&amp;y</a>", parse_escapes=False)
    assert d.extracted_text() == b"x&amp;y"
    d = parse_document_pure(b"<a>x\r\ny\rz</a>", parse_escapes=False)
    assert d.extracted_text() == b"x\ny\nz"
    # namespace_removal off: prefixes kept
    d = parse_document_pure(b"<ns:a xml:lang='en'>t</ns:a>", namespace_removal=False)
    from xhtml_parser_spark.kernel.document import root

    r = root(d)
    assert r.tag_name() == "ns:a"
    assert r.get_attribute("xml:lang") == "en"
