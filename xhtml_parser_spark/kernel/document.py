"""Read-side navigation API + golden-output serializer.

Mirrors the reference's Document/Node/Attribute query surface
(reference: src/document.rs, src/node.rs, src/attribute.rs) over the
packed arrays produced by :mod:`.parser`. Used by the parity test
suite and the extraction kernels; the Spark pipeline itself works on
the flat arrays directly.

``debug_format`` reimplements the reference's ``Debug`` formatter
(src/document.rs:610-703) verbatim -- it is the format of every golden
``.result`` file under the reference's tests/test_data/.
"""

from __future__ import annotations

from typing import Iterator, Optional

from .parser import ELEMENT, HEAD, TEXT, ParsedDoc, _str_or_fallback


class Attribute:
    """Reference: src/attribute.rs:49-181."""

    __slots__ = ("doc", "idx")

    def __init__(self, doc: ParsedDoc, idx: int):
        self.doc = doc
        self.idx = idx

    def name_bytes(self) -> bytes:
        d = self.doc
        return bytes(d.buf[d.a_name_start[self.idx] : d.a_name_end[self.idx]])

    def value_bytes(self) -> bytes:
        d = self.doc
        return bytes(d.buf[d.a_val_start[self.idx] : d.a_val_end[self.idx]])

    def name(self) -> str:
        d = self.doc
        return _str_or_fallback(d.buf, d.a_name_start[self.idx], d.a_name_end[self.idx])

    def value(self) -> str:
        d = self.doc
        return _str_or_fallback(d.buf, d.a_val_start[self.idx], d.a_val_end[self.idx])

    def is_named(self, name: str) -> bool:
        return self.name_bytes() == name.encode()

    def __repr__(self) -> str:
        # Display (raw, unescaped) interpolation -- reference
        # src/attribute.rs:184-194 uses "{}" not "{:?}".
        return f'Attribute {{ name: "{self.name()}", value: "{self.value()}" }}'


class Node:
    """Reference: src/node.rs. Integer-index hops over the packed arrays."""

    __slots__ = ("doc", "idx")

    def __init__(self, doc: ParsedDoc, idx: int):
        self.doc = doc
        self.idx = idx

    # -- predicates (src/node.rs:514-555) --
    def is_root(self) -> bool:
        return self.idx == 1

    def is_element(self) -> bool:
        return self.doc.kind[self.idx] == ELEMENT

    def is_text(self) -> bool:
        return self.doc.kind[self.idx] == TEXT

    def has_children(self) -> bool:
        return self.doc.first_child[self.idx] != 0

    def node_type(self) -> int:
        return self.doc.kind[self.idx]

    # -- names / text (src/node.rs:127-271) --
    def tag_name_bytes(self) -> bytes:
        d = self.doc
        if d.kind[self.idx] != ELEMENT:
            return b""
        return bytes(d.buf[d.loc_start[self.idx] : d.loc_end[self.idx]])

    def tag_name(self) -> str:
        d = self.doc
        if d.kind[self.idx] != ELEMENT:
            return ""
        return _str_or_fallback(d.buf, d.loc_start[self.idx], d.loc_end[self.idx])

    def is_(self, tag_name: str) -> bool:
        # exact, case-sensitive byte equality (src/node.rs:177-194)
        return self.is_element() and self.tag_name_bytes() == tag_name.encode()

    def text_bytes(self) -> Optional[bytes]:
        d = self.doc
        if d.kind[self.idx] != TEXT:
            return None
        return bytes(d.buf[d.loc_start[self.idx] : d.loc_end[self.idx]])

    def text(self) -> Optional[str]:
        d = self.doc
        if d.kind[self.idx] != TEXT:
            return None
        return _str_or_fallback(d.buf, d.loc_start[self.idx], d.loc_end[self.idx])

    def position(self) -> int:
        """Byte offset of name/text start in the post-mutation buffer
        (src/node.rs:736-738)."""
        return self.doc.loc_start[self.idx]

    # -- attributes (src/node.rs:292-294, 688-695) --
    def attributes(self) -> list[Attribute]:
        d = self.doc
        return [
            Attribute(d, a)
            for a in range(d.attr_start[self.idx], d.attr_end[self.idx])
        ]

    def get_attribute(self, name: str) -> Optional[str]:
        nb = name.encode()
        d = self.doc
        for a in range(d.attr_start[self.idx], d.attr_end[self.idx]):
            if bytes(d.buf[d.a_name_start[a] : d.a_name_end[a]]) == nb:
                return _str_or_fallback(d.buf, d.a_val_start[a], d.a_val_end[a])
        return None  # first-wins among duplicates

    # -- structure hops (src/node.rs:314-478, 717-731) --
    def parent(self) -> Optional["Node"]:
        if self.idx <= 1:
            return None
        return Node(self.doc, self.doc.parent[self.idx])

    def first_child(self) -> Optional["Node"]:
        fc = self.doc.first_child[self.idx]
        return Node(self.doc, fc) if fc else None

    def last_child(self) -> Optional["Node"]:
        # prev_sibling of first child tracks the last child (O(1) trick,
        # src/document.rs:335-350 / src/node.rs:364-376)
        fc = self.doc.first_child[self.idx]
        if not fc:
            return None
        return Node(self.doc, self.doc.prev_sib[fc])

    def next_sibling(self) -> Optional["Node"]:
        ns = self.doc.next_sib[self.idx]
        return Node(self.doc, ns) if ns else None

    def prev_sibling(self) -> Optional["Node"]:
        # sentinel: a first child's prev_sibling points at the LAST child,
        # whose next_sibling is 0 (src/node.rs:423-436)
        ps = self.doc.prev_sib[self.idx]
        if self.doc.next_sib[ps] == 0:
            return None
        return Node(self.doc, ps)

    def children(self) -> Iterator["Node"]:
        c = self.doc.first_child[self.idx]
        while c:
            yield Node(self.doc, c)
            c = self.doc.next_sib[c]

    def get_child(self, tag_name: str) -> Optional["Node"]:
        nb = tag_name.encode()
        d = self.doc
        c = d.first_child[self.idx]
        while c:
            if d.kind[c] == ELEMENT and bytes(d.buf[d.loc_start[c] : d.loc_end[c]]) == nb:
                return Node(d, c)
            c = d.next_sib[c]
        return None

    def get_sibling(self, tag_name: str) -> Optional["Node"]:
        nb = tag_name.encode()
        d = self.doc
        c = d.next_sib[self.idx]
        while c:
            if d.kind[c] == ELEMENT and bytes(d.buf[d.loc_start[c] : d.loc_end[c]]) == nb:
                return Node(d, c)
            c = d.next_sib[c]
        return None

    def descendants(self) -> Iterator["Node"]:
        last = last_descendant(self.doc, self.idx)
        if last is None:
            return
        for i in range(self.idx + 1, last + 1):
            yield Node(self.doc, i)

    def children_reversed(self) -> Iterator["Node"]:
        """Back-to-front child iteration (the reference's NodeChildren
        DoubleEndedIterator next_back, src/node.rs:769-811): start at
        the O(1) last child, walk prev_sibling until the first child."""
        lc = self.last_child()
        fc = self.doc.first_child[self.idx]
        while lc is not None:
            yield lc
            if lc.idx == fc:
                return
            lc = lc.prev_sibling()

    def descendants_reversed(self) -> Iterator["Node"]:
        """Back-to-front descendant iteration (Nodes::descendants as a
        DoubleEndedIterator consumed via rev(), src/document.rs:733-830):
        document order is the index order, so this is last..idx+1."""
        last = last_descendant(self.doc, self.idx)
        if last is None:
            return
        for i in range(last, self.idx, -1):
            yield Node(self.doc, i)

    def attributes_reversed(self) -> list[Attribute]:
        """Back-to-front attribute iteration (Attributes as a
        DoubleEndedIterator, src/attribute.rs:201-293)."""
        return list(reversed(self.attributes()))


def root(doc: ParsedDoc) -> Optional[Node]:
    """Reference: src/document.rs:145-159."""
    return Node(doc, 1) if doc.n_nodes > 1 else None


def is_empty(doc: ParsedDoc) -> bool:
    """Only the head node exists (src/document.rs:166-170)."""
    return doc.n_nodes <= 1


def last_node_idx(doc: ParsedDoc) -> int:
    """Reference: src/document.rs:177-185."""
    return 0 if is_empty(doc) else doc.n_nodes - 1


def get_xml_content(doc: ParsedDoc) -> bytes:
    """The document's XML byte buffer AS MUTATED BY THE PARSE
    (src/document.rs:238-242 get_xml_content): entity decoding and
    attribute normalization compact bytes in place, so node/attribute
    value spans index into THIS buffer, not the original input. Length
    equals the input length (mutation never grows the buffer)."""
    return bytes(doc.buf)


def get_node(doc: ParsedDoc, node_idx: int) -> Node:
    """Bounds-checked access (src/document.rs:200-234); raises ValueError
    with the reference's message on an invalid index."""
    if node_idx < 0 or node_idx >= doc.n_nodes:
        raise ValueError(f"Invalid node index: {node_idx}")
    return Node(doc, node_idx)


def next_seq_node(doc: ParsedDoc, current: int) -> Optional[Node]:
    """Document-order +1 (src/document.rs:586-595)."""
    nxt = current + 1
    return Node(doc, nxt) if nxt < doc.n_nodes else None


def previous_seq_node(doc: ParsedDoc, current: int) -> Optional[Node]:
    """Document-order -1 (src/document.rs:597-607)."""
    prev = current - 1
    return Node(doc, prev) if prev > 0 else None


def _path_segments(
    path: str,
) -> list[tuple[str, str, int | None, tuple[str, str | None] | None]]:
    """Parse an XPath-lite path into (axis, name, index, attr) segments.

    Grammar: segments joined by '/'; a segment is ``name``, ``*``,
    ``name[k]`` (k = 1-based position among the axis' same-name
    matches), ``name[@key]`` (attribute existence), or
    ``name[@key='value']`` / ``name[@key="value"]`` (first-wins
    attribute equality, matching Node.get_attribute on duplicate
    names); an EMPTY segment (i.e. '//') switches the next segment to
    the descendant axis. Leading '/' is optional (paths are rooted at
    the context node either way). One predicate per segment.

    Segment splitting is BRACKET-AWARE: a '/' inside a [...] predicate
    is literal, so ``script[@type='application/ld+json']`` is ONE
    segment (a naive ``path.split('/')`` silently shredded the quoted
    value into dead segments that matched nothing).
    """
    segs: list[tuple[str, str, int | None, tuple[str, str | None] | None]] = []
    axis = "child"
    parts: list[str] = []
    seg_start, depth = 0, 0
    for i, ch in enumerate(path):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth = max(depth - 1, 0)
        elif ch == "/" and depth == 0:
            parts.append(path[seg_start:i])
            seg_start = i + 1
    parts.append(path[seg_start:])
    if parts and parts[0] == "":
        parts = parts[1:]  # tolerate a leading '/'
    for raw in parts:
        if raw == "":
            axis = "descendant"
            continue
        name, idx, attr = raw, None, None
        if raw.endswith("]") and "[" in raw:
            name, _, tail = raw.partition("[")
            pred = tail[:-1]
            if "[" in pred or "]" in pred:
                # compound predicates ('a[@href][2]') would otherwise
                # silently parse as attribute name 'href][2' and match
                # nothing -- one predicate per segment, loudly
                raise ValueError(
                    f"unsupported path predicate {tail!r} in segment "
                    f"{raw!r}: one [k] or [@key(='value')] per segment"
                )
            if pred.startswith("@"):
                pred = pred[1:]
                if "=" in pred:
                    k, _, v = pred.partition("=")
                    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
                        v = v[1:-1]
                    attr = (k, v)
                else:
                    attr = (pred, None)
            else:
                try:
                    idx = int(pred)
                except ValueError:
                    raise ValueError(
                        f"invalid path predicate {pred!r} in segment "
                        f"{raw!r}: expected a 1-based position or "
                        "@key(='value')"
                    ) from None
        segs.append((axis, name, idx, attr))
        axis = "child"
    return segs


def _true_last_descendants(doc: ParsedDoc) -> list[int]:
    """TRUE largest-descendant index per node (contiguity invariant),
    via the depth-based derivation the exploded nodes table uses --
    immune to both the reference's root special case AND the multi-root
    sibling quirk (a second root's prev/next links land on the head, so
    sibling climbing cannot see the subtree boundary)."""
    from .extract import compute_depth_and_last_descendant

    return compute_depth_and_last_descendant(doc)[1]


def select_path(start: "ParsedDoc | Node", path: str) -> list[Node]:
    """XPath-lite node location (north_star): ALL nodes matching a
    ``a/b//c[2]``-style path, document order, duplicates removed.

    Generalizes the reference's get_child/get_sibling ``child::name[1]``
    scans (src/node.rs:575-668) to full result sets, '*' wildcards,
    1-based positional predicates, and '//' descendant steps (which
    exploit the contiguous descendant-range invariant,
    src/document.rs:539-583). Elements only -- text nodes have no name.

    Descendant steps use the TRUE contiguous subtree range (the same
    one the exploded nodes table carries), NOT Node.descendants() --
    that API keeps the reference's root special-case (root's
    last_descendant = n-1 even beside multi-root siblings,
    src/document.rs:545-547), which would pull a sibling root's
    subtree into ``html//p`` on multi-root documents and diverge from
    the relational operator.
    """
    if isinstance(start, ParsedDoc):
        r = root(start)
        ctx: list[Node] = [Node(start, 0)] if r is not None else []
    else:
        ctx = [start]
    true_last: list[int] | None = None
    for axis, name, idx, attr in _path_segments(path):
        nxt: list[Node] = []
        seen: set[int] = set()
        for node in ctx:
            if axis == "child":
                if node.idx == 0:
                    # root-level children via the parent array: the
                    # multi-root quirk parks the second root's sibling
                    # links on the HEAD, so the sibling-chain walk
                    # stops after the first root (the relational
                    # operator joins on parent_id and sees them all)
                    d = node.doc
                    cands = [
                        Node(d, i)
                        for i in range(1, d.n_nodes)
                        if d.parent[i] == 0
                    ]
                else:
                    cands = list(node.children())
            elif node.idx == 0:
                # descendant axis from the document: every node (the
                # synthetic head has no last_descendant of its own)
                cands = list(all_nodes(node.doc))
            else:
                if true_last is None:
                    true_last = _true_last_descendants(node.doc)
                last = true_last[node.idx]
                cands = [Node(node.doc, i) for i in range(node.idx + 1, last + 1)]
            matched = [
                c
                for c in cands
                if c.is_element() and (name == "*" or c.tag_name() == name)
            ]
            if attr is not None:
                k, v = attr
                matched = [
                    c
                    for c in matched
                    if (c.get_attribute(k) is not None
                        if v is None
                        else c.get_attribute(k) == v)
                ]
            if idx is not None:
                matched = matched[idx - 1 : idx] if idx >= 1 else []
            for m in matched:
                if m.idx not in seen:
                    seen.add(m.idx)
                    nxt.append(m)
        nxt.sort(key=lambda n: n.idx)
        ctx = nxt
    # an empty path leaves the synthetic head/context in ctx; a path
    # can only ever select real nodes
    return [n for n in ctx if n.idx != 0]


def all_nodes(doc: ParsedDoc) -> Iterator[Node]:
    """Document-order iteration (src/document.rs:733-811): node indices
    ARE document order, so this is just 1..=last."""
    for i in range(1, doc.n_nodes):
        yield Node(doc, i)


def all_nodes_reversed(doc: ParsedDoc) -> Iterator[Node]:
    """Reverse document-order iteration (the reference's Nodes
    DoubleEndedIterator next_back, src/document.rs:813-830; gated off
    only under its forward_only memory feature)."""
    for i in range(doc.n_nodes - 1, 0, -1):
        yield Node(doc, i)


def last_descendant(doc: ParsedDoc, node_idx: int) -> Optional[int]:
    """Last descendant of node_idx (documented reference semantics:
    climb until an ancestor-or-self has a next sibling; that minus one,
    src/document.rs:505-583).

    Documented deviation: the reference's implementation starts the
    climb at the node's PARENT (src/document.rs:551-552), so for a node
    with a following sibling it overshoots into the node's own siblings
    -- a latent defect its test suite never reaches (it only exercises
    root, which is special-cased, and leaves, which return None). This
    engine implements the documented intent: descendants(k) is exactly
    the contiguous index range k+1..=last_descendant(k).
    """
    n = doc.n_nodes
    if node_idx == 0 or doc.first_child[node_idx] == 0 or node_idx >= n - 1:
        return None
    if node_idx == 1:
        return n - 1  # reference-parity special case (src/document.rs:545-547)
    cur = node_idx
    while True:
        ns = doc.next_sib[cur]
        if ns:
            return ns - 1
        cur = doc.parent[cur]
        if cur <= 1:
            return n - 1


# ---------------------------------------------------------------------------
# Golden-output serializer (reference Debug impl, src/document.rs:610-703)
# ---------------------------------------------------------------------------


# Rust's str Debug escapes a char when it is NOT printable per the
# stdlib's unicode-printable table OR when it is Grapheme_Extend (the
# escape_grapheme_extended=true arm of escape_debug_ext). Python's
# str.isprintable() + category in (Mn, Me) approximates that pair; the
# two exception tables below are the EXACT measured delta vs the
# reference binary itself -- every codepoint >= 0x80 was swept through
# the stub-built reference's {:?} formatter (jobs/rust_baseline.sh
# --pipe; 1.11 M probes, zero parse failures) and diffed against the
# approximation. _DEBUG_ESC_EXTRA (41 ranges) = Rust escapes but the
# approximation would not: Other_Grapheme_Extend spacing marks
# (U+09BE Bengali AA, U+09D7 AU-length-mark, ...). _DEBUG_ESC_NOT
# (115 ranges) = the approximation escapes but Rust does not:
# codepoints assigned in the reference toolchain's newer UCD that this
# Python's unicodedata still reports unassigned (U+088F, new CJK
# extensions, ...).
_DEBUG_ESC_EXTRA = (
    (0x9BE, 0x9BE), (0x9D7, 0x9D7), (0xB3E, 0xB3E), (0xB57, 0xB57),
    (0xBBE, 0xBBE), (0xBD7, 0xBD7), (0xCC0, 0xCC0), (0xCC2, 0xCC2),
    (0xCC7, 0xCC8), (0xCCA, 0xCCB), (0xCD5, 0xCD6), (0xD3E, 0xD3E),
    (0xD57, 0xD57), (0xDCF, 0xDCF), (0xDDF, 0xDDF), (0x1715, 0x1715),
    (0x1734, 0x1734), (0x1B35, 0x1B35), (0x1B3B, 0x1B3B), (0x1B3D, 0x1B3D),
    (0x1B43, 0x1B44), (0x1BAA, 0x1BAA), (0x1BF2, 0x1BF3), (0x302E, 0x302F),
    (0xA953, 0xA953), (0xA9C0, 0xA9C0), (0xFF9E, 0xFF9F),
    (0x111C0, 0x111C0), (0x11235, 0x11235), (0x1133E, 0x1133E),
    (0x1134D, 0x1134D), (0x11357, 0x11357), (0x114B0, 0x114B0),
    (0x114BD, 0x114BD), (0x115AF, 0x115AF), (0x116B6, 0x116B6),
    (0x11930, 0x11930), (0x1193D, 0x1193D), (0x16FF0, 0x16FF1),
    (0x1D165, 0x1D166), (0x1D16D, 0x1D172),
)
_DEBUG_ESC_NOT = (
    (0x88F, 0x88F), (0xC5C, 0xC5C), (0xCDC, 0xCDC), (0xCF3, 0xCF3),
    (0x1B4E, 0x1B4F), (0x1B7F, 0x1B7F), (0x1C89, 0x1C8A), (0x20C1, 0x20C1),
    (0x2427, 0x2429), (0x2B96, 0x2B96), (0x2FFC, 0x2FFF), (0x31E4, 0x31E5),
    (0x31EF, 0x31EF), (0xA7CB, 0xA7CF), (0xA7D2, 0xA7D2), (0xA7D4, 0xA7D4),
    (0xA7DA, 0xA7DC), (0xA7F1, 0xA7F1), (0xFBC3, 0xFBD2), (0xFD90, 0xFD91),
    (0xFDC8, 0xFDCE), (0x105C0, 0x105F3), (0x10940, 0x10959),
    (0x10D40, 0x10D65), (0x10D6E, 0x10D85), (0x10D8E, 0x10D8F),
    (0x10EC2, 0x10EC7), (0x10ED0, 0x10ED8), (0x1123F, 0x11240),
    (0x11380, 0x11389), (0x1138B, 0x1138B), (0x1138E, 0x1138E),
    (0x11390, 0x113B5), (0x113B7, 0x113B7), (0x113B9, 0x113BA),
    (0x113CA, 0x113CA), (0x113CC, 0x113CD), (0x113D1, 0x113D1),
    (0x113D3, 0x113D5), (0x113D7, 0x113D8), (0x116D0, 0x116E3),
    (0x1171E, 0x1171E), (0x11B00, 0x11B09), (0x11B61, 0x11B61),
    (0x11B65, 0x11B65), (0x11B67, 0x11B67), (0x11BC0, 0x11BE1),
    (0x11BF0, 0x11BF9), (0x11DB0, 0x11DDB), (0x11DE0, 0x11DE9),
    (0x11F02, 0x11F10), (0x11F12, 0x11F35), (0x11F3E, 0x11F3F),
    (0x11F43, 0x11F59), (0x1342F, 0x1342F), (0x13441, 0x13446),
    (0x13460, 0x143FA), (0x16100, 0x1611D), (0x1612A, 0x1612C),
    (0x16130, 0x16139), (0x16D40, 0x16D79), (0x16EA0, 0x16EB8),
    (0x16EBB, 0x16ED3), (0x16FF2, 0x16FF6), (0x187F8, 0x187FF),
    (0x18CFF, 0x18CFF), (0x18D09, 0x18D1E), (0x18D80, 0x18DF2),
    (0x1B132, 0x1B132), (0x1B155, 0x1B155), (0x1CC00, 0x1CCFC),
    (0x1CD00, 0x1CEB3), (0x1CEBA, 0x1CED0), (0x1CEE0, 0x1CEF0),
    (0x1D2C0, 0x1D2D3), (0x1DF25, 0x1DF2A), (0x1E030, 0x1E06D),
    (0x1E4D0, 0x1E4EB), (0x1E4F0, 0x1E4F9), (0x1E5D0, 0x1E5ED),
    (0x1E5F0, 0x1E5FA), (0x1E5FF, 0x1E5FF), (0x1E6C0, 0x1E6DE),
    (0x1E6E0, 0x1E6E2), (0x1E6E4, 0x1E6E5), (0x1E6E7, 0x1E6ED),
    (0x1E6F0, 0x1E6F4), (0x1E6FE, 0x1E6FF), (0x1F6D8, 0x1F6D8),
    (0x1F6DC, 0x1F6DC), (0x1F774, 0x1F77F), (0x1F7D9, 0x1F7D9),
    (0x1F8B2, 0x1F8BB), (0x1F8C0, 0x1F8C1), (0x1F8D0, 0x1F8D8),
    (0x1FA54, 0x1FA57), (0x1FA75, 0x1FA77), (0x1FA87, 0x1FA8A),
    (0x1FA8E, 0x1FA8F), (0x1FAAD, 0x1FAAF), (0x1FABB, 0x1FABF),
    (0x1FAC6, 0x1FAC6), (0x1FAC8, 0x1FAC8), (0x1FACD, 0x1FACF),
    (0x1FADA, 0x1FADC), (0x1FADF, 0x1FADF), (0x1FAE8, 0x1FAEA),
    (0x1FAEF, 0x1FAEF), (0x1FAF7, 0x1FAF8), (0x1FBCB, 0x1FBEF),
    (0x1FBFA, 0x1FBFA), (0x2B739, 0x2B73F), (0x2CEA2, 0x2CEAD),
    (0x2EBF0, 0x2EE5D), (0x31350, 0x33479),
)


def _in_ranges(o: int, table) -> bool:
    import bisect

    i = bisect.bisect_right(table, (o, 0x110000)) - 1
    return i >= 0 and table[i][0] <= o <= table[i][1]


def _rust_str_debug(s: str) -> str:
    """Rust ``{:?}`` formatting of a str: escape_debug per char inside
    double quotes (src/document.rs Debug impl renders tag_name this
    way). Byte-exact vs the reference binary across the full codepoint
    space (measured sweep; see the exception tables above)."""
    import unicodedata

    out = ['"']
    for ch in s:
        o = ord(ch)
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\0":
            out.append("\\0")
        elif o < 0x80:
            out.append(ch if ch.isprintable() else f"\\u{{{o:x}}}")
        elif _in_ranges(o, _DEBUG_ESC_EXTRA):
            out.append(f"\\u{{{o:x}}}")
        elif _in_ranges(o, _DEBUG_ESC_NOT):
            out.append(ch)
        elif not ch.isprintable() or unicodedata.category(ch) in ("Mn", "Me"):
            out.append(f"\\u{{{o:x}}}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def debug_format(doc: ParsedDoc) -> str:
    """Exact reimplementation of the reference's golden serializer.

    Layout details that matter for byte-equality with the ``.result``
    files (src/document.rs:610-703): 4-space indents; ``tag_name`` via
    Rust ``{:?}`` (escaped); attribute name/value and text bodies via
    ``{}`` (raw Display, newlines literal); an ``attributes:`` block
    only when non-empty; a ``children:`` block only when non-empty.
    """
    r = root(doc)
    if r is None:
        return "Document [No root node]"

    lines: list[str] = []

    def w(indent: int, s: str) -> None:
        lines.append("    " * indent + s)

    def print_node(node: Node, indent: int) -> None:
        if node.is_element():
            w(indent, "Element {")
            w(indent, f"    tag_name: {_rust_str_debug(node.tag_name())}")
            attrs = node.attributes()
            if attrs:
                w(indent + 1, "attributes: [")
                for a in attrs:
                    w(indent + 2, repr(a))
                w(indent + 1, "]")
            if node.has_children():
                w(indent, "    children: [")
                for child in node.children():
                    print_node(child, indent + 2)
                w(indent, "    ]")
            w(indent, "}")
        elif node.is_text():
            t = node.text()
            w(indent, "Text {")
            w(indent, f'    "{t if t is not None else "No text"}"')
            w(indent, "}")
        else:
            w(indent, "Unknown Node!")

    lines.append("Document [")
    print_node(r, 1)
    lines.append("]")
    return "\n".join(lines) + "\n"
