"""Main-content extraction: DOM-heuristic boilerplate stripping over the
packed arrays (north_star B10).

Everything here is array algebra over the ParsedDoc structure-of-arrays:
a single forward pass propagates ancestor state (valid because node
indices are document order, so parent[i] < i -- the same invariant the
reference exploits for contiguous descendant ranges,
reference src/document.rs:539-583). No per-node object graph is built.

Outputs per document:
  text_raw   -- all Text bytes in document order (the byte-identity
                deliverable, parity-checked against the reference)
  text_main  -- boilerplate-stripped text: blacklisted subtrees removed,
                link-dominated blocks removed (text-density scoring)
"""

from __future__ import annotations

from .parser import ELEMENT, TEXT, ParsedDoc

# Subtrees that never contribute main content. A blacklisted element
# wipes its whole contiguous descendant range.
BLACKLIST = frozenset(
    t.encode()
    for t in (
        "script",
        "style",
        "head",
        "nav",
        "aside",
        "footer",
        "header",
        "form",
        "noscript",
        "iframe",
        "svg",
        "template",
        "button",
        "select",
        "option",
        "object",
        "embed",
    )
)

# Block-level elements at which text-density / link-density is scored.
BLOCK_TAGS = frozenset(
    t.encode()
    for t in (
        "p",
        "div",
        "article",
        "section",
        "main",
        "li",
        "ul",
        "ol",
        "td",
        "th",
        "table",
        "blockquote",
        "pre",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "body",
        "html",
    )
)

_ANCHOR = b"a"

# A block whose text is mostly link text is navigation/boilerplate.
LINK_DENSITY_MAX = 0.66


def extract_main_text(doc: ParsedDoc) -> bytes:
    """Boilerplate-stripped main text.

    Single forward pass computing, per node: blacklist-ancestor flag,
    nearest-block ancestor, in-anchor flag. A reverse accumulation sums
    text/link text per block; blocks with link_density > LINK_DENSITY_MAX
    are dropped in the final assembly.
    """
    if doc.c_main is not None:  # pre-assembled by the C kernel
        return doc.c_main
    n = doc.n_nodes
    if n <= 1:
        return b""
    buf = doc.buf
    kind = doc.kind
    parent = doc.parent
    ls = doc.loc_start
    le = doc.loc_end

    bad = bytearray(n)  # under a blacklisted element
    in_anchor = bytearray(n)  # under an <a>
    block_of = [0] * n  # nearest enclosing block element (0 = none)

    # per-block accumulators, indexed by node id of the block
    text_len = [0] * n
    link_len = [0] * n

    text_ids: list[int] = []
    for i in range(1, n):
        p = parent[i]
        if kind[i] == ELEMENT:
            tag = buf[ls[i] : le[i]]  # buf frozen to bytes post-parse
            bad[i] = bad[p] or (tag in BLACKLIST)
            in_anchor[i] = in_anchor[p] or (tag == _ANCHOR)
            block_of[i] = i if tag in BLOCK_TAGS else block_of[p]
        else:  # TEXT
            if bad[p]:
                bad[i] = 1
                continue
            in_anchor[i] = in_anchor[p]
            blk = block_of[p]
            block_of[i] = blk
            text_ids.append(i)
            tl = le[i] - ls[i]
            text_len[blk] += tl
            if in_anchor[i]:
                link_len[blk] += tl

    out: list[bytes] = []
    for i in text_ids:
        blk = block_of[i]
        tl = text_len[blk]
        if tl > 0 and link_len[blk] / tl > LINK_DENSITY_MAX:
            continue  # link-dominated block: navigation/boilerplate
        seg = buf[ls[i] : le[i]]
        if seg.strip():
            out.append(seg)
    return b"".join(out)


def doc_stats(doc: ParsedDoc) -> tuple[int, int, int, int]:
    """(n_nodes excl. head, n_attrs, n_text_nodes, max_depth)."""
    n = doc.n_nodes
    parent = doc.parent
    kind = doc.kind
    depth = [0] * n
    max_depth = 0
    n_text = 0
    for i in range(1, n):
        d = depth[parent[i]] + 1
        depth[i] = d
        if d > max_depth:
            max_depth = d
        if kind[i] == TEXT:
            n_text += 1
    return n - 1, doc.n_attrs, n_text, max_depth


def compute_depth_and_last_descendant(doc: ParsedDoc) -> tuple[list[int], list[int]]:
    """Derived arrays for the exploded nodes table.

    last_descendant[k] = largest j such that j is a descendant of k
    (contiguous-range invariant); computed in one O(n) stack-free pass:
    the last descendant of k is the node before the next node whose
    depth <= depth[k] (reference algorithm equivalent,
    src/document.rs:539-583).
    """
    n = doc.n_nodes
    parent = doc.parent
    depth = [0] * n
    for i in range(1, n):
        depth[i] = depth[parent[i]] + 1
    last_desc = list(range(n))  # leaf default: itself
    stack: list[int] = []
    for i in range(1, n):
        d = depth[i]
        while stack and depth[stack[-1]] >= d:
            last_desc[stack.pop()] = i - 1
        stack.append(i)
    while stack:
        last_desc[stack.pop()] = n - 1
    return depth, last_desc
