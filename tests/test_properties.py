"""Property-based tests (hypothesis): parser robustness and structural
invariants the packed-array DOM must uphold on ANY input.

The reference has no property tests (SURVEY §5); these go beyond its
suite because a web-scale corpus WILL contain every byte sequence.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from xhtml_parser_spark.kernel import ELEMENT, HEAD, TEXT, parse_document
from xhtml_parser_spark.kernel.document import all_nodes, debug_format, last_descendant, root
from xhtml_parser_spark.kernel.extract import (
    compute_depth_and_last_descendant,
    extract_main_text,
)

# -- generators --

_name = st.text(alphabet=string.ascii_letters + "_", min_size=1, max_size=8)
_text = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n&;#'\"<>éü※",
    max_size=40,
)


@st.composite
def xml_doc(draw, depth=0):
    """Well-formed-ish XML generator (may still contain parse errors via
    text with '<' etc. -- that is the point)."""
    tag = draw(_name)
    attrs = ""
    for _ in range(draw(st.integers(0, 2))):
        aname = draw(_name)
        aval = draw(_text).replace("'", "")
        attrs += f" {aname}='{aval}'"
    if depth >= 3 or draw(st.booleans()):
        if draw(st.booleans()):
            return f"<{tag}{attrs}/>"
        body = draw(_text).replace("<", "&lt;")
        return f"<{tag}{attrs}>{body}</{tag}>"
    children = draw(st.lists(xml_doc(depth=depth + 1), min_size=0, max_size=3))
    return f"<{tag}{attrs}>{''.join(children)}</{tag}>"


# -- no-crash / no-hang on arbitrary bytes --


@settings(max_examples=300, deadline=2000)
@given(st.binary(max_size=400))
def test_arbitrary_bytes_never_raise(b: bytes) -> None:
    doc = parse_document(b)
    assert doc.ok in (True, False)
    if doc.ok:
        doc.extracted_text()
        extract_main_text(doc)
        debug_format(doc)


@settings(max_examples=150, deadline=2000)
@given(st.text(max_size=300))
def test_arbitrary_text_never_raises(s: str) -> None:
    doc = parse_document(s.encode("utf-8", errors="surrogateescape" if False else "ignore"))
    assert doc.ok in (True, False)


# -- structural invariants on successfully parsed documents --


@settings(max_examples=200, deadline=2000)
@given(xml_doc())
def test_tree_invariants(xml: str) -> None:
    doc = parse_document(xml.encode())
    if not doc.ok:
        return
    n = doc.n_nodes
    for i in range(1, n):
        p = doc.parent[i]
        assert 0 <= p < i, "node indices are document order: parent precedes child"
        assert doc.kind[i] in (ELEMENT, TEXT)
        # attribute ranges contiguous and sane
        assert 0 <= doc.attr_start[i] <= doc.attr_end[i] <= doc.n_attrs
        # loc range sane within buffer
        assert 0 <= doc.loc_start[i] <= doc.loc_end[i] <= len(doc.buf)
    # first_child/next_sibling walk visits each child exactly once, in
    # index order, and parent pointers agree
    for i in range(0, n):
        c = doc.first_child[i]
        prev = 0
        while c:
            assert doc.parent[c] == i
            assert c > prev, "children are in document order"
            prev = c
            c = doc.next_sib[c]


@settings(max_examples=200, deadline=2000)
@given(xml_doc())
def test_descendant_contiguity(xml: str) -> None:
    """descendants(k) == contiguous index range k+1..last_descendant(k)
    (the invariant the reference exploits, src/document.rs:539-583)."""
    doc = parse_document(xml.encode())
    if not doc.ok:
        return
    _, last = compute_depth_and_last_descendant(doc)

    def walk(k: int) -> list[int]:
        out = []
        c = doc.first_child[k]
        while c:
            out.append(c)
            out.extend(walk(c))
            c = doc.next_sib[c]
        return out

    for k in range(1, doc.n_nodes):
        desc = sorted(walk(k))
        if desc:
            assert desc == list(range(k + 1, last[k] + 1))
            assert last_descendant(doc, k) == last[k]
        else:
            assert last[k] == k  # leaf: stack-pass default
            assert last_descendant(doc, k) is None


@settings(max_examples=200, deadline=2000)
@given(xml_doc())
def test_extracted_text_equals_node_walk(xml: str) -> None:
    doc = parse_document(xml.encode())
    if not doc.ok:
        return
    via_walk = b"".join(
        n.text_bytes() for n in all_nodes(doc) if n.is_text()
    )
    assert doc.extracted_text() == via_walk


@settings(max_examples=100, deadline=2000)
@given(xml_doc())
def test_last_child_trick(xml: str) -> None:
    """prev_sibling of a first child must point at the LAST child
    (the reference's O(1) last-child trick, src/document.rs:335-350)."""
    doc = parse_document(xml.encode())
    if not doc.ok:
        return
    r = root(doc)
    if r is None:
        return
    stack = [r]
    while stack:
        node = stack.pop()
        kids = list(node.children())
        if kids:
            assert node.last_child().idx == kids[-1].idx
            assert kids[0].prev_sibling() is None
            for a, b in zip(kids, kids[1:]):
                assert b.prev_sibling().idx == a.idx
            stack.extend(k for k in kids if k.is_element())
