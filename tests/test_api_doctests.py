"""API parity with the reference's own doc-test examples, transcribed
from the rustdoc examples in src/document.rs and src/node.rs."""

from __future__ import annotations

import pytest

from xhtml_parser_spark.kernel import parse_document
from xhtml_parser_spark.kernel.document import (
    all_nodes,
    all_nodes_reversed,
    get_node,
    is_empty,
    last_descendant,
    last_node_idx,
    next_seq_node,
    previous_seq_node,
    root,
)


def test_reverse_iteration_matches_forward():
    """DoubleEnded parity (reference src/document.rs:813-830,
    src/node.rs:795-811, src/attribute.rs:201-293): reversed iteration
    yields exactly the forward sequence backwards."""
    doc = parse_document(
        b"<root a='1' b='2'><c>T</c><d><e/>tail</d><f/>x</root>"
    )
    fwd = [n.idx for n in all_nodes(doc)]
    assert [n.idx for n in all_nodes_reversed(doc)] == fwd[::-1]
    r = root(doc)
    assert [n.idx for n in r.children_reversed()] == [
        n.idx for n in r.children()
    ][::-1]
    assert [n.idx for n in r.descendants_reversed()] == [
        n.idx for n in r.descendants()
    ][::-1]
    assert [a.name() for a in r.attributes_reversed()] == ["b", "a"]
    # leaf / empty edges
    leaf = r.first_child()  # <c>
    assert list(leaf.first_child().children_reversed()) == []
    d2 = parse_document(b"<only/>")
    assert [n.idx for n in all_nodes_reversed(d2)] == [1]
    assert list(root(d2).children_reversed()) == []


def test_document_new_doctest():
    # src/document.rs:52-69
    doc = parse_document(b"<root><child>Text</child></root>")
    r = root(doc)
    assert r.tag_name() == "root"
    child = r.first_child()
    assert child.tag_name() == "child"
    assert child.first_child().text() == "Text"


def test_all_nodes_doctest():
    # src/document.rs:712-732
    doc = parse_document(b"<root><child>Text</child><totototo/></root>")
    nodes = list(all_nodes(doc))
    assert len(nodes) == 4
    assert nodes[0].is_("root")
    assert nodes[1].is_("child")
    assert nodes[2].text() == "Text"
    assert nodes[3].is_("totototo")
    assert nodes[3].is_element()
    assert nodes[2].is_text()
    assert nodes[0].is_root()
    assert nodes[0].has_children() and nodes[1].has_children()
    assert not nodes[2].has_children() and not nodes[3].has_children()


def test_descendants_doctest():
    # src/document.rs:485-498
    doc = parse_document(b"<root><child>Text</child><last/></root>")
    r = root(doc)
    desc = list(r.descendants())
    assert len(desc) == 3
    assert desc[0].is_("child")
    assert desc[1].text() == "Text"
    assert desc[2].is_("last")


def test_last_descendant_doctest():
    # src/document.rs:516-530
    doc = parse_document(b"<root><child>Text</child>boo<last/></root>")
    r = root(doc)
    last = last_descendant(doc, r.idx)
    assert last is not None
    assert get_node(doc, last).is_("last")
    assert last_descendant(doc, last) is None


def test_get_node_and_bounds():
    doc = parse_document(b"<root><child>Content</child></root>")
    assert get_node(doc, 0).node_type() == 0  # head is accessible
    with pytest.raises(ValueError, match="Invalid node index"):
        get_node(doc, 9999)


def test_is_empty_and_last_node_idx():
    doc = parse_document(b"<root/>")
    assert not is_empty(doc)
    assert last_node_idx(doc) == 1


def test_rust_str_debug_escaping_matches_reference_binary():
    """_rust_str_debug's escape set was measured against the stub-built
    reference binary's own {:?} formatter across every codepoint
    (jobs/fuzz_vs_reference.py sweep, BENCH.md round 5). Pin the
    representatives of each rule here so the tables cannot drift:
    grapheme-extended escaped (Mn, and the Other_Grapheme_Extend
    spacing marks the category check misses), format chars and NBSP
    escaped, newer-UCD codepoints Python calls unassigned NOT escaped,
    ordinary printable non-ASCII raw."""
    from xhtml_parser_spark.kernel.document import _rust_str_debug

    cases = {
        "á": '"a\\u{301}"',     # combining acute (Mn)
        "া": '"\\u{9be}"',       # Bengali AA (Mc, Other_Graph_Ext)
        "‬": '"\\u{202c}"',      # pop-directional (Cf) — euro quirk
        " ": '"\\u{a0}"',        # NBSP (Zs, non-space separator)
        "࢏": '"࢏"',         # assigned in newer UCD: raw
        "é※☃": '"é※☃"',               # printable non-ASCII: raw
        'q"\\\n\t\r\0': '"q\\"\\\\\\n\\t\\r\\0"',
    }
    for s, want in cases.items():
        assert _rust_str_debug(s) == want, (s, _rust_str_debug(s))


def test_get_xml_content_post_mutation():
    """get_xml_content (src/document.rs:238-242) returns the parse-
    mutated buffer: same length as the input, with entity bytes
    decoded in place so text spans slice to the decoded text."""
    from xhtml_parser_spark.kernel.document import get_xml_content

    raw = b"<root>a&amp;b</root>"
    doc = parse_document(raw)
    buf = get_xml_content(doc)
    assert isinstance(buf, bytes) and len(buf) == len(raw)
    text_node = get_node(doc, 2)
    assert text_node.is_text()
    s, e = doc.loc_start[2], doc.loc_end[2]
    assert buf[s:e] == b"a&b"  # decoded IN the buffer, not a copy
    assert buf != raw  # mutation actually happened


def test_seq_navigation():
    doc = parse_document(b"<a><b/>t</a>")
    assert next_seq_node(doc, 1).idx == 2
    assert next_seq_node(doc, 3) is None
    assert previous_seq_node(doc, 2).idx == 1
    assert previous_seq_node(doc, 1) is None


def test_children_siblings_doctests():
    # src/node.rs children/first_child/last_child/next/prev examples
    doc = parse_document(b"<root><child1/><child2/></root>")
    r = root(doc)
    kids = list(r.children())
    assert len(kids) == 2
    assert kids[0].is_("child1") and kids[1].is_("child2")
    assert r.first_child().next_sibling().is_("child2")
    assert r.last_child().prev_sibling().is_("child1")


def test_get_child_get_sibling_get_attribute():
    doc = parse_document(
        b"<parent><child1 name='<go>'/>text<child2 name='rust'/></parent>"
    )
    r = root(doc)
    c1 = r.get_child("child1")
    assert c1 is not None and c1.get_attribute("name") == "<go>"
    c2 = c1.get_sibling("child2")
    assert c2 is not None and c2.get_attribute("name") == "rust"
    assert r.get_child("child2").idx == c2.idx
