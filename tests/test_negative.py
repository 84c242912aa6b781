"""Negative/robustness corpus, transcribed from the reference's
tests/negative_tests.rs (75 tests) plus the verified-behavior edge
cases recorded in FIXTURES.md §3 / SURVEY.md §2.

Malformed documents become error ROWS (parse_ok=False + error message
matching the reference's Display format), never exceptions.
"""

from __future__ import annotations

import pytest

from xhtml_parser_spark.kernel import parse_document, root
from xhtml_parser_spark.kernel.document import all_nodes

# (name, xml bytes, expected substring of error_msg)
MALFORMED = [
    ("empty", b"", "Unexpected end of XML document"),
    ("no_closing_tag", b"<root><child>Content", "Unexpected end of XML document"),
    (
        "mismatched_tags",
        b"<root><child>Content</different></root>",
        "does not match opening tag",
    ),
    (
        "invalid_tag_name",
        b"<123invalid>Content</123invalid>",
        "Tag name must start with a letter or underscore",
    ),
    ("unclosed_tag", b"<root><child>Content</child", "Unexpected end of XML document"),
    (
        "unquoted_attr",
        b"<root attr=value>Content</root>",
        "Attribute value must be enclosed in quotes",
    ),
    (
        "bad_attr_name",
        b'<root 123attr="value">Content</root>',
        "Attribute name must start with a letter or underscore",
    ),
    (
        "missing_equals",
        b'<root attr"value">Content</root>',
        "Attribute must have an '=' sign",
    ),
    (
        "bad_self_close",
        b"<root><child/Content</root>",
        "Expected '>' after '/' in self-closing tag",
    ),
    (
        "extra_closing_tag",
        b"<root>Content</root></extra>",
        "No opening tag for closing tag",
    ),
    ("empty_tag_name", b"<>Content</>", "Tag name must start with a letter or underscore"),
    (
        "invalid_closing_name",
        b"<root>Content</123root>",
        "Closing tag '123root' does not match opening tag 'root'",
    ),
    ("ws_only", b"   \n\t  \r\n  ", "Unexpected end of XML document"),
    ("unclosed_attr_value", b'<root attr="value>Content</root>', "Invalid XML"),
    (
        "nested_quotes",
        b'<root attr="value"with"quotes">Content</root>',
        "Invalid XML",
    ),
    ("escape_at_eof", b"<root>Content &amp", "Unexpected end of XML document"),
    ("text_after_root", b"<a>x</a>tail", "Unexpected end of XML document"),
    (
        "comment_beyond_window",
        b"<a><!--" + b"c" * 6000 + b"--></a>",
        "Unexpected end of XML document",
    ),
]


@pytest.mark.parametrize("name,xml,want", MALFORMED, ids=[m[0] for m in MALFORMED])
def test_malformed(name: str, xml: bytes, want: str) -> None:
    doc = parse_document(xml)
    assert not doc.ok
    assert want in doc.error_msg, doc.error_msg


def _text(xml: bytes) -> bytes:
    doc = parse_document(xml)
    assert doc.ok, doc.error_msg
    return doc.extracted_text()


# Graceful cases: parse_ok=True with exact extracted-text bytes
# (FIXTURES.md §3, each verified against the executing reference).
GRACEFUL = [
    ("bad_entity", b"<a>x&foo;y</a>", b"x&foo;y"),
    ("bare_amp", b"<a>x & y</a>", b"x & y"),
    ("surrogate_ref", b"<a>&#xD800;x</a>", b"&#xD800;x"),
    ("upper_hex_rejected", b"<a>&#X41;</a>", b"&#X41;"),
    ("numeric_refs", b"<a>&#65;&#x42;</a>", b"AB"),
    ("nbsp", b"<a>x&nbsp;y</a>", b"x\xc2\xa0y"),
    ("euro_quirk", b"<a>&euro;</a>", b"\xe2\x80\xac"),  # U+202C, not U+20AC
    ("cdata_bypass", b"<a>pre<![CDATA[zap]]>post</a>", b"prepost"),
    ("multi_root", b"<a>x</a><b>y</b>", b"xy"),
    ("selfclose_root_stops", b"<a/><b>ignored</b>", b""),
    ("bom", b"\xef\xbb\xbf<a>x</a>", b"x"),
    ("double_escape_not_rescanned", b"<a>&#38;amp;</a>", b"&amp;"),
    ("entity_cr_kept", b"<a>x&#13;y</a>", b"x\ry"),
    ("nul_ref", b"<a>x&#0;y</a>", b"x\x00y"),
    ("incomplete_entity", b"<a>x&amp y</a>", b"x&amp y"),
    ("empty_entity", b"<a>x&;y</a>", b"x&;y"),
    ("invalid_numeric", b"<a>x&#invalid;y</a>", b"x&#invalid;y"),
    ("malformed_hex", b"<a>Content &#xGGG;</a>", b"Content &#xGGG;"),
    ("nulls_kept", b"<a>Content\x00with\x00nulls</a>", b"Content\x00with\x00nulls"),
    ("control_chars", b"<a>Content\x01\x02\x03</a>", b"Content\x01\x02\x03"),
    ("leading_trailing_ws_kept", b"<a>  x  </a>", b"  x  "),
    ("comment_bypass", b"<a><!-- c --></a>", b""),
    ("pi_bypass", b'<?xml version="1.0"?><a>Content</a>', b"Content"),
    ("doctype_bypass", b"<!DOCTYPE html><a>Content</a>", b"Content"),
]


@pytest.mark.parametrize("name,xml,want", GRACEFUL, ids=[g[0] for g in GRACEFUL])
def test_graceful(name: str, xml: bytes, want: bytes) -> None:
    assert _text(xml) == want


def test_raw_cr_flagged_not_hung() -> None:
    """Raw CR in PCData is reference UB (hang/corruption); we flag it
    (SURVEY §7.4 policy)."""
    doc = parse_document(b"<a>x\ry</a>")
    assert not doc.ok
    assert doc.error_class == "UnsupportedCR"


# -- attribute semantics (verified behaviors) --


def test_attr_ws_normalization() -> None:
    doc = parse_document(b"<a b='  hello   world  '>t</a>")
    assert doc.ok
    r = root(doc)
    assert r.get_attribute("b") == "hello world"


def test_attr_entity_spaces_not_collapsed() -> None:
    doc = parse_document(b"<a b='x&#32;&#32;y'>t</a>")
    assert doc.ok
    assert root(doc).get_attribute("b") == "x  y"


def test_attr_trailing_entity_space_trimmed_once() -> None:
    # the final single-0x20 trim applies to whatever byte sits at the end
    doc = parse_document(b"<a b='x&#32;'>t</a>")
    assert doc.ok
    assert root(doc).get_attribute("b") == "x"


def test_attr_value_may_contain_lt() -> None:
    doc = parse_document(b"<a b='1 < 2'>t</a>")
    assert doc.ok
    assert root(doc).get_attribute("b") == "1 < 2"


def test_duplicate_attrs_kept_first_wins() -> None:
    doc = parse_document(b"<a x='1' x='2'>t</a>")
    assert doc.ok
    r = root(doc)
    attrs = r.attributes()
    assert [(a.name(), a.value()) for a in attrs] == [("x", "1"), ("x", "2")]
    assert r.get_attribute("x") == "1"


def test_attr_case_sensitivity() -> None:
    doc = parse_document(b'<root Attr="value">Content</root>')
    r = root(doc)
    assert r.get_attribute("Attr") == "value"
    assert r.get_attribute("attr") is None
    assert r.get_attribute("ATTR") is None


def test_empty_attr_value_and_quote_styles() -> None:
    doc = parse_document(b"<root a=\"\" b='v2' c=\"v3\">Content</root>")
    r = root(doc)
    assert r.get_attribute("a") == ""
    assert r.get_attribute("b") == "v2"
    assert r.get_attribute("c") == "v3"


def test_many_attributes() -> None:
    xml = b"<root" + b"".join(
        f' attr{i}="value{i}"'.encode() for i in range(100)
    ) + b">Content</root>"
    doc = parse_document(xml)
    assert doc.ok
    assert len(root(doc).attributes()) == 100


# -- namespace removal (first-colon semantics) --


def test_namespace_strip() -> None:
    doc = parse_document(b"<ns:a xml:lang='en'>t</ns:a>")
    assert doc.ok
    r = root(doc)
    assert r.tag_name() == "a"
    assert r.get_attribute("lang") == "en"


def test_namespace_empty_prefix() -> None:
    doc = parse_document(b"<:root>Content</:root>")
    assert doc.ok
    assert root(doc).tag_name() == "root"


def test_namespace_multi_colon_keeps_remainder() -> None:
    doc = parse_document(b"<a:b:c>t</a:b:c>")
    assert doc.ok
    assert root(doc).tag_name() == "b:c"


# -- navigation API parity --


def test_navigation_api() -> None:
    doc = parse_document(b"<root><c1>T1</c1><c2>T2</c2></root>")
    r = root(doc)
    assert r.is_root() and r.is_("root") and not r.is_("Root")
    c1 = r.first_child()
    c2 = c1.next_sibling()
    assert c1.is_("c1") and c2.is_("c2")
    assert c2.next_sibling() is None
    assert c1.prev_sibling() is None
    assert c2.prev_sibling().idx == c1.idx
    assert r.last_child().idx == c2.idx
    assert r.parent() is None
    assert c1.parent().idx == r.idx
    assert r.get_child("c2").idx == c2.idx
    assert r.get_child("nope") is None
    assert c1.get_sibling("c2").idx == c2.idx
    assert c1.first_child().text() == "T1"
    assert c1.first_child().tag_name() == ""  # tag_name on text node
    assert c1.text() is None  # text on element node
    assert c1.first_child().get_attribute("any") is None
    assert list(c1.first_child().children()) == []


def test_descendants_and_all_nodes() -> None:
    doc = parse_document(b"<root><child>Text</child>boo<last/></root>")
    nodes = list(all_nodes(doc))
    assert len(nodes) == 5
    r = root(doc)
    desc = list(r.descendants())
    assert len(desc) == 4
    text_node = r.first_child().first_child()
    assert list(text_node.descendants()) == []


def test_deep_and_wide() -> None:
    depth = 100
    xml = (
        "".join(f"<level{i}>" for i in range(depth))
        + "content"
        + "".join(f"</level{i}>" for i in reversed(range(depth)))
    ).encode()
    doc = parse_document(xml)
    assert doc.ok

    width = 100
    xml = (
        "<root>"
        + "".join(f"<child{i}>content{i}</child{i}>" for i in range(width))
        + "</root>"
    ).encode()
    doc = parse_document(xml)
    assert doc.ok
    assert len(list(root(doc).children())) == width


def test_long_values() -> None:
    doc = parse_document(
        ('<root attr="' + "x" * 10000 + '">Content</root>').encode()
    )
    assert len(root(doc).get_attribute("attr")) == 10000
    long_name = "x" * 1000
    doc = parse_document(f"<{long_name}>Content</{long_name}>".encode())
    assert len(root(doc).tag_name()) == 1000
    doc = parse_document(("<root>" + "x" * 50000 + "</root>").encode())
    assert len(root(doc).first_child().text()) == 50000


def test_closing_tag_junk_skipped() -> None:
    doc = parse_document(b"<a>x</a junk>")
    assert doc.ok
    assert doc.extracted_text() == b"x"


def test_doctype_with_internal_subset() -> None:
    doc = parse_document(b"<!DOCTYPE note [ <!ENTITY x 'y'> ]>\n<a>t</a>")
    assert doc.ok
    assert doc.extracted_text() == b"t"


def test_invalid_utf8_does_not_crash() -> None:
    doc = parse_document(bytes([0xFF, 0xFE, 0xFD]))
    assert not doc.ok  # no '<' found -> Unexpected end
