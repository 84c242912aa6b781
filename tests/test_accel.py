"""Differential tests: the optional C kernel must agree with the
pure-Python kernel (the semantic source of truth) on EVERYTHING --
tree arrays, mutated buffer, extracted/main text, stats, error class,
error position, and the full formatted error message."""

from __future__ import annotations

import os
import string

import pytest
from hypothesis import given, settings, strategies as st

from xhtml_parser_spark.kernel.extract import (
    compute_depth_and_last_descendant,
    extract_main_text,
)
from xhtml_parser_spark.kernel.parser import (
    _get_cparser,
    parse_document,
    parse_document_pure,
    parse_texts,
)

if _get_cparser() is None:
    # The production fast path must never go silently untested (round-2
    # verdict item #2: a full CI run once skipped all 39 differential
    # tests on a transient build race and went green). Skipping is only
    # legitimate when the ENVIRONMENT cannot build the kernel -- no gcc,
    # or explicitly disabled. On a machine with a working compiler an
    # unavailable kernel is a defect: FAIL with the recorded build error.
    # XPS_REQUIRE_ACCEL=1 (set in the verify recipe) forbids skipping
    # unconditionally.
    import shutil

    from xhtml_parser_spark.kernel import accel

    reason = f"C accel unavailable: {accel.LAST_BUILD_ERROR}"
    require = os.environ.get("XPS_REQUIRE_ACCEL") == "1"
    buildable = (
        shutil.which("gcc") is not None
        and os.environ.get("XPS_ACCEL", "1") != "0"
    )
    if require or buildable:
        pytest.fail(reason)
    pytest.skip(reason, allow_module_level=True)


def _assert_texts_same(xml: bytes, b) -> None:
    """The texts-only C entry (cp.parse_texts, its own marshalling and
    error branch) must agree with the pure-Python parse_texts tuple --
    the full-API differential above never exercises that code path."""
    ct = parse_texts(xml)  # routes through cp.parse_texts
    if b.ok:
        assert ct == (
            True,
            b.extracted_text(),
            extract_main_text(b),
            b.n_nodes - 1,
            b.n_attrs,
            b.n_text_nodes,
            b.max_depth,
            None,
            None,
            None,
        ), xml
    else:
        assert ct == (
            False, b"", b"", 0, 0, 0, 0,
            b.error_class, b.error_pos, b.error_msg,
        ), xml


def _assert_same(xml: bytes) -> None:
    a = parse_document(xml)  # C path
    b = parse_document_pure(xml)
    _assert_texts_same(xml, b)
    assert a.ok == b.ok, xml
    if a.ok:
        assert a.buf == b.buf
        assert a.parent == b.parent
        assert a.prev_sib == b.prev_sib
        assert a.next_sib == b.next_sib
        assert a.first_child == b.first_child
        assert a.kind == b.kind
        assert a.loc_start == b.loc_start
        assert a.loc_end == b.loc_end
        assert a.attr_start == b.attr_start
        assert a.attr_end == b.attr_end
        assert a.a_name_start == b.a_name_start
        assert a.a_name_end == b.a_name_end
        assert a.a_val_start == b.a_val_start
        assert a.a_val_end == b.a_val_end
        assert a.n_text_nodes == b.n_text_nodes
        assert a.max_depth == b.max_depth
        assert a.extracted_text() == b.extracted_text()
        assert extract_main_text(a) == extract_main_text(b)
        # C-side packed depth/last_descendant vs the Python derivation
        depth, last_desc = compute_depth_and_last_descendant(b)
        assert memoryview(a.c_depth_b).cast("i").tolist() == depth
        assert memoryview(a.c_last_desc_b).cast("i").tolist() == last_desc
    else:
        assert a.error_class == b.error_class, (a.error_msg, b.error_msg)
        assert a.error_pos == b.error_pos, (a.error_msg, b.error_msg)
        assert a.error_msg == b.error_msg


CASES = [
    b"",
    b"<a/>",
    b"<a>x</a>",
    b"<r><a b='1'><c/></a><d/></r>",
    b"<a>x&amp;y&#65;&#x42;&nbsp;&euro;&foo;&;&#xD800;</a>",
    b"<ns:a xml:lang='en'>t</ns:a>",
    b"<a b='  hello   world  ' c='x&#32;&#32;y'>t</a>",
    b"<a x='1' x='2'>t</a>",
    b"<!DOCTYPE note [ <!x> ]>\n<a>t</a>",
    b"<a><!-- c --><![CDATA[zap]]><?pi?>x</a>",
    b"<a>x</a><b>y</b>",
    b"<a/><b>ignored</b>",
    b"\xef\xbb\xbf<a>x</a>",
    b"<root><child>Content",
    b"<root><child>x</different></root>",
    b"<123bad/>",
    b"<root attr=value>x</root>",
    b"<root 1a='v'>x</root>",
    b'<root a"v">x</root>',
    b"<root><c/junk</root>",
    b"<root>x</root></extra>",
    b"<>x</>",
    b"<a>x\ry</a>",
    # entity-dense long span + ';'-free '&' runs: exercises the memoized
    # '&'/CR/';' scan frontiers (the 0.9 MB/s quadratic regression)
    b"<a>" + b"x &amp; y &lt;z&gt; " * 800 + b"</a>",
    b"<a>" + b"& no semis here " * 400 + b"&#65;</a>",
    b"<a b='" + b"&amp;" * 200 + b"'>t</a>",
    b"<A A='' A='00000000&'></A>",
    b"<a b='x&foo x'>t</a>",
    b"<a>" + b"c" * 60 + b"</a>",  # error-context window edges
    b"<a><!--" + b"c" * 6000 + b"--></a>",
    b"<a>x</a junk>",
    b"<a b='&lt;&gt;&quot;&apos;'>t</a>",
    b"<a>tail",
    b"   \n\t  ",
    b"<a><b>deep</b>",
    # ';'-free '&'-bearing attr values across many tags: the attr fast
    # path's document-global ';' scan is frontier-memoized across
    # attrs (one EOF scan per document, not one per entity)
    b"<r>" + b"<a b='& x'/>" * 3000 + b"</r>",
    # cross-quote ';' targets: the doc-global scan crosses the closing
    # quote, so the quirk's split (live value scan + pristine frontier
    # tail) must agree with a full live scan byte-for-byte
    b"<a b='&amp x'>t;</a>",
    b"<a b='x & y'>t;u</a>",
    b"<a b='&#59 q'>;</a>",
    b"<a b='&' c='&amp;ok'>x;</a>",
    b"<a b='&lt'>y</a><c d='&gt;'>;</c>",
]


def _simd_boundary_cases() -> list[bytes]:
    """Adversarial positions for the C kernel's 16-byte-block SIMD
    paths (scan_text: fused '<'/'&'/CR discovery; copy_count_lt: fused
    input copy + capacity count): matches at every offset around block
    edges, '&'/CR after the '<' in the SAME block (must not leak into
    the preceding text node), sub-16-byte scalar tails, and a
    '<'-dense run longer than the 255-block accumulator flush."""
    cases = []
    for pad in (0, 1, 7, 14, 15, 16, 17, 30, 31, 32, 33):
        p = b"t" * pad
        cases.append(b"<a>" + p + b"&amp;x</a>")          # '&' at varying offset
        cases.append(b"<a>" + p + b"\rx</a>")             # CR -> UnsupportedCR
        cases.append(b"<a>" + p + b"</a>")                 # '<' at varying offset
        cases.append(b"<a>" + p + b"&amp;</a><b>&#65;</b>")  # '&' then '<' then '&'
    # '&' and CR in the same 16B block but AFTER the node's '<'
    cases.append(b"<a>0123456789</a><b c='&amp;'>\r</b>")
    # entity exactly spanning a block edge
    cases.append(b"<a>" + b"x" * 13 + b"&amp;&lt;ok</a>")
    # ws-only node with CR inside (dropped, never flagged)
    cases.append(b"<a><b/> \r\n <c/></a>")
    # leading-ws CR ahead of real text (flagged under default profile)
    cases.append(b"<a> \rtext</a>")
    # >255 SIMD blocks of tag-dense input: exercises the sad_epu8 flush
    cases.append(b"<r>" + b"<a>x</a>" * 1200 + b"</r>")
    return cases


@pytest.mark.parametrize(
    "xml", _simd_boundary_cases(), ids=lambda x: f"b{len(x)}-{hash(x) & 0xffff:04x}"
)
def test_simd_boundary_cases_agree(xml: bytes) -> None:
    _assert_same(xml)


@pytest.mark.parametrize("xml", CASES, ids=range(len(CASES)))
def test_known_cases_agree(xml: bytes) -> None:
    _assert_same(xml)


@settings(max_examples=400, deadline=3000)
@given(st.binary(max_size=300))
def test_fuzz_binary_agrees(b: bytes) -> None:
    _assert_same(b)


_alpha = string.ascii_letters + string.digits + " \t\n&;#<>/='\"_:.-é※"


@settings(max_examples=400, deadline=3000)
@given(st.text(alphabet=_alpha, max_size=200))
def test_fuzz_markupish_agrees(s: str) -> None:
    _assert_same(s.encode())


def test_golden_fixtures_agree() -> None:
    import pathlib

    fx = pathlib.Path(__file__).parent / "fixtures"
    for f in fx.rglob("*.xhtml"):
        _assert_same(f.read_bytes())


def test_parse_only_probe_stats_match_parse_texts() -> None:
    """The parse_only bench probe (no extraction, no marshal — the
    apples-to-apples twin of the reference's Document::new speed test)
    must report identical ok/error/stats to parse_texts on every
    fixture and on negatives: same run_parse by construction, pinned
    here so the probe can never drift from the shipped path."""
    import pathlib

    cp = _get_cparser()
    cases = [
        f.read_bytes()
        for f in (pathlib.Path(__file__).parent / "fixtures").rglob("*.xhtml")
    ]
    cases += [b"", b"<r>a&amp;b</r>", b"<r><unclosed>", b"junk", b"<a x='1' x='2'/>"]
    checked = 0
    for xml in cases:
        po = cp.parse_only(xml)
        pt = cp.parse_texts(xml)
        # parse_texts: (ok, code, pos, aux, buf, text, mtext,
        #               n_nodes, n_attrs, n_text, max_d)
        ok, code, pos = pt[0], pt[1], pt[2]
        stats = pt[7:11]
        assert po[0] == ok and po[1] == code and po[2] == pos, xml[:40]
        assert tuple(po[3:7]) == tuple(stats), xml[:40]
        checked += 1
    assert checked > 20  # the fixture corpus actually enumerated


def test_accel_builds_from_zipimport(tmp_path):
    """Workers that import the package from an addPyFile zip must still
    get the C kernel: the accel loader reads _cparser.c via pkgutil
    (which works through zipimport) and compiles into a fresh cache.
    Run in a subprocess with sys.path = [zip] and a private TMPDIR so
    the host's warm .so cache cannot mask a broken zip path."""
    import os
    import subprocess
    import sys
    import zipfile

    import xhtml_parser_spark

    pkg_root = os.path.dirname(os.path.abspath(xhtml_parser_spark.__file__))
    base = os.path.dirname(pkg_root)
    zpath = str(tmp_path / "pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_root):
            for f in files:
                if f.endswith((".py", ".c")):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, base))
    cache = tmp_path / "tmpcache"
    cache.mkdir()
    env = dict(os.environ, TMPDIR=str(cache), XPS_ACCEL="1")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from xhtml_parser_spark.kernel.parser import _get_cparser, parse_texts\n"
        "assert _get_cparser() is not None, 'accel unavailable from zip'\n"
        "r = parse_texts(b'<r><p>zip &amp; go</p></r>')\n"
        "assert r[0] and r[1] == b'zip & go', r\n"
        "print('ZIP_ACCEL_OK')\n" % zpath
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, cwd=str(tmp_path), env=env,
    )
    assert "ZIP_ACCEL_OK" in out.stdout, (out.stdout, out.stderr)
    # and the compile really happened inside the private cache
    assert any(p.name.startswith("xps_accel_") for p in cache.iterdir())
