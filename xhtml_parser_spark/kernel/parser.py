"""Single-document XHTML parser producing a packed-array DOM.

This is a from-scratch Python implementation of the parsing semantics
of the reference engine (turgu1/xhtml_parser, /root/reference). It is
NOT a line-by-line port: the reference's per-byte scan loops
(src/parser.rs:283-409) are replaced by C-speed ``bytes.find`` /
``bytes.translate`` passes, and the tree lands in flat Python lists
(structure-of-arrays, mirroring the reference's packed
``Vec<NodeInfo>`` layout, src/document.rs:30-34) that convert
zero-copy-ish into Arrow/NumPy columns at the batch layer.

Observable behaviors intentionally reproduced (each cited to the
reference source; see SURVEY.md §2/§7.4 for the evidence trail):

* in-place entity expansion and compaction of the byte buffer; all
  strings are ranges into the mutated buffer (src/parser.rs:664-732)
* entity ';' scan is document-global, not segment-bounded
  (src/parser.rs:612)
* invalid escapes kept verbatim ('&' retained, scan resumes after it)
  (src/parser.rs:706-714)
* numeric refs: lowercase 'x' only for hex, wrapping u32 arithmetic,
  surrogates/out-of-range rejected (src/parser.rs:539-590, 611-647)
* attribute values: leading ws dropped, internal ws runs -> single
  space, ONE trailing 0x20 trimmed; entity-produced spaces opaque
  (src/parser.rs:751-809)
* namespace prefixes stripped through the FIRST ':' in tag and
  attribute names (src/parser.rs:865-879)
* comments/CDATA bounded-window skips (5000 bytes) and PI (500 bytes);
  a miss is a hard parse error (src/parser.rs:942,980,996)
* DOCTYPE internal-subset path consumes one extra byte after '>'
  (src/parser.rs:957-977)
* self-closing ROOT terminates the parse (trailing siblings ignored,
  src/parser.rs:1203-1214); a CLOSED root does not (second root
  becomes a sibling, level==0 guard commented out src/parser.rs:1180-1182)
* whitespace-only text produces no node; non-empty text keeps leading
  and trailing whitespace (src/parser.rs:1298-1391)
* duplicate attribute names are all kept (src/parser.rs:1282-1291)
* error messages formatted exactly like the reference:
  "Invalid XML: {msg}. at position {pos}: ...{30B}[*]{30B}..."
  (src/parser.rs:423-460, src/defs.rs:112-123)

One deliberate deviation (SURVEY.md §7.4): a raw CR inside PCData is
undefined behavior in the reference (infinite loop / buffer
corruption, src/parser.rs:701-728 has no CR branch under the default
``parse_escapes`` profile). Such documents get
``error_class='UnsupportedCR'`` instead of hanging.
"""

from __future__ import annotations

from .chartype import (
    CHARTYPE,
    START_SYMBOL,
    T_SCAN_ATRNORM,
    T_SKIP_SPACE,
    T_SKIP_SYMBOL,
)
from .entities import ENTITIES

# Node kinds (reference: src/node_type.rs:18-25)
HEAD = 0
ELEMENT = 1
TEXT = 2

_U32_MASK = 0xFFFFFFFF
_MAX_XML_LEN = 0xFFFFFFFF  # XmlIdx = u32 under default features (Cargo.toml:24)

_AMP = 0x26
_SEMI = 0x3B
_HASH = 0x23
_LOWER_X = 0x78
_SPACE = 0x20
_LT = 0x3C
_GT = 0x3E
_SLASH = 0x2F
_EQ = 0x3D
_EXCL = 0x21
_QUEST = 0x3F
_LBRACKET = 0x5B
_RBRACKET = 0x5D
_COLON = 0x3A
_SQUOTE = 0x27
_DQUOTE = 0x22

_HEXDIGITS = frozenset(b"0123456789abcdefABCDEF")
_DIGITS = frozenset(b"0123456789")


class ParseError(Exception):
    """Carries the fully-formatted reference-compatible message."""

    def __init__(self, message: str, pos: int | None, error_class: str = "InvalidXml"):
        super().__init__(message)
        self.message = message
        self.pos = pos
        self.error_class = error_class


class ParsedDoc:
    """Packed-array DOM: index-linked tree over the mutated byte buffer.

    Mirrors the reference's three-vector layout (src/document.rs:30-34):
    node index 0 is the synthetic Head, index 1 the root element; node
    indices are document order, so descendants of node k are the
    contiguous range k+1..=last_descendant(k).

    Sibling linking reproduces the reference's O(1) last-child trick
    (src/document.rs:335-350): a first child's prev_sibling points at
    the parent's CURRENT LAST child (initially itself).
    """

    __slots__ = (
        "buf",
        "n_text_nodes",
        "max_depth",
        "c_text",
        "c_main",
        "c_depth_b",
        "c_last_desc_b",
        "parent",
        "prev_sib",
        "next_sib",
        "first_child",
        "kind",
        "loc_start",
        "loc_end",
        "attr_start",
        "attr_end",
        "a_name_start",
        "a_name_end",
        "a_val_start",
        "a_val_end",
        "ok",
        "error_class",
        "error_pos",
        "error_msg",
    )

    def __init__(self) -> None:
        self.buf = bytearray()
        # node columns; index 0 = Head
        self.parent = [0]
        self.prev_sib = [0]
        self.next_sib = [0]
        self.first_child = [0]
        self.kind = [HEAD]
        self.loc_start = [0]  # element: tag-name range; text: text range
        self.loc_end = [0]
        self.attr_start = [0]
        self.attr_end = [0]
        # attribute columns
        self.a_name_start: list[int] = []
        self.a_name_end: list[int] = []
        self.a_val_start: list[int] = []
        self.a_val_end: list[int] = []
        # outcome
        self.ok = True
        self.error_class: str | None = None
        self.error_pos: int | None = None
        self.error_msg: str | None = None
        # stats tracked during the parse (free: level == depth)
        self.n_text_nodes = 0
        self.max_depth = 0
        # pre-assembled outputs from the C kernel (None on the pure path)
        self.c_text: bytes | None = None
        self.c_main: bytes | None = None
        # packed int32 depth / last_descendant arrays from the C kernel
        # (None on the pure path; extract.py recomputes them in Python)
        self.c_depth_b: bytes | None = None
        self.c_last_desc_b: bytes | None = None

    @property
    def n_nodes(self) -> int:
        return len(self.kind)

    @property
    def n_attrs(self) -> int:
        return len(self.a_name_start)

    def extracted_text(self) -> bytes:
        """Per-url deliverable: Text-node bytes concatenated in document
        order (reference read path: all_nodes(), src/document.rs:733-811).
        ``buf`` is frozen to bytes after parsing, so slices are cheap."""
        if self.c_text is not None:
            return self.c_text
        buf = self.buf
        ls, le, kd = self.loc_start, self.loc_end, self.kind
        return b"".join(
            buf[ls[i] : le[i]] for i in range(1, len(kd)) if kd[i] == TEXT
        )


def _show_around(buf: bytearray, pos: int) -> str:
    """Reference: src/parser.rs:423-438 (30-byte window each side)."""
    start = max(0, pos - 30)
    end = min(pos + 30, len(buf))
    try:
        before = bytes(buf[start:pos]).decode("utf-8")
    except UnicodeDecodeError:
        before = "non valid utf-8"
    try:
        after = bytes(buf[pos:end]).decode("utf-8")
    except UnicodeDecodeError:
        after = "non valid utf-8"
    return f"...{before}[*]{after}..."


def _invalid(buf: bytearray, msg: str, pos: int) -> ParseError:
    """Reference: src/parser.rs:452-460 + Display prefix src/defs.rs:115-117."""
    return ParseError(
        f"Invalid XML: {msg}. at position {pos}: {_show_around(buf, pos)}", pos
    )


def _unexpected_end() -> ParseError:
    """Reference: src/parser.rs:1398-1400."""
    return ParseError("Invalid XML: Unexpected end of XML document.", None)


def _char_from_u32(v: int) -> bytes | None:
    """char::from_u32 + UTF-8 encode: rejects surrogates and > U+10FFFF."""
    if v > 0x10FFFF or 0xD800 <= v <= 0xDFFF:
        return None
    return chr(v).encode("utf-8")


def _decimal(s: bytes) -> int | None:
    """Strict digit fold with wrapping u32 arithmetic (src/parser.rs:539-547;
    release-mode Rust wraps silently on overflow)."""
    acc = 0
    for c in s:
        if c not in _DIGITS:
            return None
        acc = (acc * 10 + (c - 0x30)) & _U32_MASK
    return acc


def _hexadecimal(s: bytes) -> int | None:
    """Reference: src/parser.rs:560-590 (wrapping, strict hex charset)."""
    acc = 0
    for c in s:
        if c not in _HEXDIGITS:
            return None
        if c >= 0x61:
            v = c - 0x61 + 10
        elif c >= 0x41:
            v = c - 0x41 + 10
        else:
            v = c - 0x30
        acc = (acc * 16 + v) & _U32_MASK
    return acc


def _translate_sequence(
    buf: bytearray, frm: int, to: int, semi: int | None = None
) -> tuple[int, int] | None:
    """Decode one '&...;' escape, writing UTF-8 bytes at ``to``.

    Reference: src/parser.rs:611-647. The ';' scan is document-global
    (not bounded by the enclosing text/attribute range). Returns
    (position after ';', position after written bytes) or None when
    the sequence is invalid (caller keeps the '&' verbatim).

    ``semi``: caller-memoized position of the next ';' at/after ``frm``
    (-1 = none) -- identical result, linear instead of quadratic when a
    long ';'-free stretch follows many '&'s (the scan otherwise re-runs
    to document end per '&').
    """
    if frm >= len(buf):
        return None
    end = buf.find(_SEMI, frm) if semi is None else semi
    if end < 0:
        return None
    number = buf[frm] == _HASH
    if number:
        frm += 1
    hex_number = buf[frm] == _LOWER_X  # lowercase 'x' only (verified behavior)
    if hex_number:
        frm += 1
    if frm == end:
        return None
    s = bytes(buf[frm:end])
    if number:
        v = _hexadecimal(s) if hex_number else _decimal(s)
        if v is None:
            return None
        bts = _char_from_u32(v)
        if bts is None:
            return None
    else:
        bts = ENTITIES.get(s)
        if bts is None:
            return None
    n = min(len(bts), len(buf) - to)
    buf[to : to + n] = bts[:n]
    return (end + 1, to + n)


def _next_semi(buf: bytearray, fr: list[int], q: int) -> int:
    """Anchored document-global ';' frontier: ``fr`` = [f, a] with f the
    first ';' at/after anchor a (-1 = none through EOF). Forward
    consults (q >= a) refetch only when the cached match is behind q;
    REWOUND consults (q < a -- the attribute quirk replay restarts at
    its value start) scan just the short [q, a) window and splice with
    the cached tail. Sound because every consulted region is pristine:
    all successful-parse rewrites land strictly behind the consulting
    cursor (the quirk's within-value duplication writes are handled by
    its caller live-scanning the value range itself and consulting
    this frontier only from the value END, which overflow-aborts
    before any write could cross)."""
    f, a = fr[0], fr[1]
    if q >= a:
        if f == -1 or f >= q:
            fr[1] = q
            return f
        f = buf.find(_SEMI, q)
        fr[0] = f
        fr[1] = q
        return f
    local = buf.find(_SEMI, q, a)
    if local >= 0:
        fr[0] = local
        fr[1] = q
        return local
    fr[1] = q
    return f


def _parse_pcdata(buf: bytearray, start: int, end: int, fr: list[int],
                  seed_amp: int = -2, seed_cr: int = -2) -> int:
    """In-place entity expansion + compaction of a text range; returns the
    new end. Decoded bytes are never re-scanned (so '&#38;amp;' yields a
    literal '&amp;'). Reference: src/parser.rs:664-732.

    The PARSE_PCDATA class is exactly {'&', '\\r'}, so the scan is two
    live ``find`` calls (scans read at/after ``frm``, which in-situ
    rewriting never touches -- writes land strictly below the read
    cursor, mirroring the reference's forward-only rewrite).

    The '&' and '\\r' scan results are memoized across iterations
    (positions are monotone and the buffer ahead of the read cursor is
    immutable within this call), turning the worst-case quadratic
    rescans -- measured 0.9 MB/s on entity-dense megabyte text spans --
    into one linear pass; the caller seeds them with the positions its
    own fast-path scan already found, so the bytes up to the first
    match are never re-scanned. ``fr`` is the two-element PARSE-GLOBAL
    anchored frontier ``[first_semi, anchor]`` for the document-global
    ';' scan (see ``_next_semi``): ``first_semi`` is the first ';' at
    or after ``anchor`` (-1 = none to EOF), sound because rewrites
    only land strictly below the read cursor, so the region at/after
    ``anchor`` is pristine; the frontier advances (re-anchors) whenever
    a consult point passes it. A semicolon-free entity-dense document
    thus pays ONE ';' scan total instead of one per text node -- the
    per-call memo alone left that cross-node case quadratic.
    Byte-identical output.

    Raw CR (the other PARSE_PCDATA byte) is reference UB -> UnsupportedCR.
    """
    to = start
    frm = start
    na = seed_amp
    nr = seed_cr
    while True:
        if na != -1 and na < frm:
            na = buf.find(_AMP, frm, end)
        if nr != -1 and nr < frm:
            nr = buf.find(13, frm, end)
        if na < 0:
            np_ = nr
        elif nr < 0:
            np_ = na
        else:
            np_ = na if na < nr else nr
        if np_ < 0:
            np_ = end
        if np_ >= end:
            if frm != to:
                buf[to : to + (end - frm)] = buf[frm:end]
            to += end - frm
            break
        if np_ > frm:
            if frm != to:
                buf[to : to + (np_ - frm)] = buf[frm:np_]
            to += np_ - frm
        if buf[np_] == _AMP:
            semi = _next_semi(buf, fr, np_ + 1)  # document-global, like ref
            r = _translate_sequence(buf, np_ + 1, to, semi)
            if r is not None:
                frm, to = r
            else:
                if frm != to:
                    buf[to] = _AMP  # keep the '&' verbatim
                frm = np_ + 1
                to += 1
        else:
            # Raw CR in PCData: reference has no handling branch under the
            # default profile (hang/corruption). Flag instead (SURVEY §7.4).
            raise ParseError(
                "Unsupported raw carriage return in PCData "
                f"at position {np_} (reference UB)",
                np_,
                error_class="UnsupportedCR",
            )
    return to


def _normalize_attr_fast(buf: bytearray, start: int, end: int,
                         fr: list[int] | None = None) -> int:
    """Attribute-value normalization, fast path (valid/no escapes).

    Reference: src/parser.rs:751-809. Leading ws dropped, each internal
    ws run -> one 0x20, ONE trailing 0x20 trimmed, entities decoded
    inline (decoded bytes opaque to collapsing). Returns new end.

    A local classification map over just the value range drives the
    scan (values are tiny relative to the document; classifying the
    whole buffer for this was measurable memory traffic). The map is
    pristine-value state; sound because scans read at/after ``frm``
    and rewrites land strictly below it.

    Raises _AttrQuirk when an invalid escape is hit: the reference's
    invalid-escape branch leaves ``from`` stale (src/parser.rs:790-794),
    re-reading bytes its own copy_within already moved -- behavior a
    stale map cannot reproduce. The caller restores the pristine value
    bytes and replays with the live-buffer slow path.

    ``fr`` is the parse-global ';' frontier (see _parse_pcdata): sound
    here because attribute values are processed in document order and
    this fast path's escape positions are monotone; the quirk replay
    (which REWINDS its read cursor) deliberately keeps per-call scans.
    """
    lm = bytes(buf[start:end]).translate(T_SCAN_ATRNORM)
    to = start
    frm = start
    space_added = False
    while True:
        rel = lm.find(1, frm - start)
        np_ = start + rel if rel >= 0 else end
        if np_ >= end:
            if frm != to:
                buf[to : to + (end - frm)] = buf[frm:end]
            to += end - frm
            if to > start and buf[to - 1] == _SPACE:
                to -= 1  # trim ONE trailing space
            break
        if np_ > frm:
            buf[to : to + (np_ - frm)] = buf[frm:np_]
            to += np_ - frm
            space_added = False
        if buf[np_] == _AMP:
            semi = None if fr is None else _next_semi(buf, fr, np_ + 1)
            r = _translate_sequence(buf, np_ + 1, to, semi)
            if r is None:
                raise _AttrQuirk()
            frm, to = r
            space_added = False
        else:
            if not space_added and to != start:
                buf[to] = _SPACE
                to += 1
                space_added = True
            frm = np_ + 1
    return to


class _AttrQuirk(Exception):
    pass


_ATRNORM_SET = frozenset(
    b for b in range(256) if CHARTYPE[b] & 4  # PARSE_ATRNORM
)


def _normalize_attr_quirk(buf: bytearray, start: int, end: int,
                          fr: list[int] | None = None) -> int:
    """Slow live-buffer replay of normalize_attribute_value, reproducing
    the reference's stale-``from`` invalid-escape quirk byte-for-byte
    (src/parser.rs:751-809: on invalid escape, ``from`` advances from its
    PRE-COPY value, so already-moved bytes are re-read and duplicated).

    When the duplication pushes the write cursor past the value range,
    the reference clobbers the closing quote / following attributes and
    ultimately panics on an out-of-bounds copy_within -- undefined
    behavior we flag as an error row instead (SURVEY §7.4 policy),
    error_class='AttrNormCorruption'.
    """
    def _overflow(pos: int) -> ParseError:
        return ParseError(
            "Attribute normalization overran the value range "
            f"at position {pos} (reference UB: buffer corruption)",
            pos,
            error_class="AttrNormCorruption",
        )

    to = start
    frm = start
    space_added = False
    while True:
        np_ = end
        for p in range(frm, end):
            if buf[p] in _ATRNORM_SET:
                np_ = p
                break
        if np_ >= end:
            if to + (end - frm) > end:
                raise _overflow(to)
            buf[to : to + (end - frm)] = buf[frm:end]
            to += end - frm
            if to > start and buf[to - 1] == _SPACE:
                to -= 1
            break
        if np_ > frm:
            if to + (np_ - frm) > end:
                raise _overflow(to)
            buf[to : to + (np_ - frm)] = buf[frm:np_]
            to += np_ - frm
            space_added = False
        if to > end:
            raise _overflow(to)
        if buf[np_] == _AMP:
            # the ';' scan must stay LIVE within the value range (the
            # duplication quirk can rewrite bytes ahead of np_ inside
            # it); beyond the value the buffer is pristine in any
            # successful parse, so the anchored frontier supplies the
            # tail instead of an EOF re-scan per '&'
            semi = buf.find(_SEMI, np_ + 1, end)
            if semi < 0:
                semi = (
                    _next_semi(buf, fr, end)
                    if fr is not None
                    else buf.find(_SEMI, end)
                )
            r = _translate_sequence(buf, np_ + 1, to, semi)
            if r is not None:
                frm, to = r
            else:
                frm += 1  # the stale-from quirk: NOT np_ + 1
            space_added = False
        else:
            if not space_added and to != start:
                if to >= end:
                    raise _overflow(to)
                buf[to] = _SPACE
                to += 1
                space_added = True
            frm = np_ + 1
    return to


_CPARSER = None
_CPARSER_TRIED = False


def _get_cparser():
    """Lazy accel import (the accel build reads kernel/extract.py, which
    imports this module -- resolving it at first parse avoids the cycle)."""
    global _CPARSER, _CPARSER_TRIED
    if not _CPARSER_TRIED:
        _CPARSER_TRIED = True
        try:
            from .accel import cparser

            _CPARSER = cparser
        except Exception:
            _CPARSER = None
    return _CPARSER


# messages for C-kernel error codes (must mirror the literals used in
# _parse below -- single formatting path via _invalid/_unexpected_end)
_C_MSG = {
    2: "Tag name must start with a letter or underscore",
    3: "Attribute name must start with a letter or underscore",
    4: "Attribute must have an '=' sign",
    5: "Attribute value must be enclosed in quotes",
    6: "Expected '>' after '/' in self-closing tag",
    7: "No opening tag for closing tag",
    8: "Expected tag name after '</'",
    10: "Expected '>' after DOCTYPE declaration",
}


def _i32list(b: bytes) -> list[int]:
    return memoryview(b).cast("i").tolist()


def _from_c(res: tuple) -> ParsedDoc:
    (
        ok, code, pos, aux, buf,
        parent_b, prev_b, next_b, fc_b, kind_b, ls_b, le_b, as_b, ae_b,
        ans_b, ane_b, avs_b, ave_b, text, mtext, n_text, max_d,
        depth_b, last_desc_b,
    ) = res
    doc = ParsedDoc()
    doc.buf = buf
    doc.parent = _i32list(parent_b)
    doc.prev_sib = _i32list(prev_b)
    doc.next_sib = _i32list(next_b)
    doc.first_child = _i32list(fc_b)
    doc.kind = _i32list(kind_b)
    doc.loc_start = _i32list(ls_b)
    doc.loc_end = _i32list(le_b)
    doc.attr_start = _i32list(as_b)
    doc.attr_end = _i32list(ae_b)
    doc.a_name_start = _i32list(ans_b)
    doc.a_name_end = _i32list(ane_b)
    doc.a_val_start = _i32list(avs_b)
    doc.a_val_end = _i32list(ave_b)
    if ok:
        doc.c_text = text
        doc.c_main = mtext
        doc.c_depth_b = depth_b
        doc.c_last_desc_b = last_desc_b
        doc.n_text_nodes = n_text
        doc.max_depth = max_d
        return doc
    doc.ok = False
    e = _decode_c_error(code, pos, aux, buf)
    doc.error_class = e.error_class
    doc.error_pos = e.pos
    doc.error_msg = e.message
    return doc


def _decode_c_error(code: int, pos: int, aux: tuple, buf: bytes) -> ParseError:
    if code == 1:
        return _unexpected_end()
    if code == 9:
        closing = _str_or_fallback(buf, aux[0], aux[1])
        opening = _str_or_fallback(buf, aux[2], aux[3])
        return _invalid(
            buf,
            f"Closing tag '{closing}' does not match opening tag '{opening}'",
            pos,
        )
    if code == 12:
        return ParseError(
            "Unsupported raw carriage return in PCData "
            f"at position {pos} (reference UB)",
            pos,
            error_class="UnsupportedCR",
        )
    if code == 13:
        return ParseError(
            "Attribute normalization overran the value range "
            f"at position {pos} (reference UB: buffer corruption)",
            pos,
            error_class="AttrNormCorruption",
        )
    return _invalid(buf, _C_MSG[code], pos)


def parse_texts(
    xml: bytes,
) -> tuple[bool, bytes, bytes, int, int, int, int, str | None, int | None, str | None]:
    """Lightweight parse for the extraction hot path: returns
    (ok, text, text_main, n_nodes, n_attrs, n_text_nodes, max_depth,
    error_class, error_pos, error_msg) WITHOUT materializing the node
    arrays as Python lists -- on the C kernel that conversion costs as
    much as the parse itself, and parse_pages never reads the tree."""
    cp = _get_cparser()
    if cp is not None:
        # texts-only C entry: same parse, but the 14 node/attr arrays
        # and the rewritten buffer stay C-side (marshalling them costs
        # as much as the parse on tag-dense input and this path never
        # reads the tree); the buffer comes back only on error, for the
        # reference-format 30-byte-context message
        res = cp.parse_texts(xml)  # accepts any buffer (memoryview slices OK)
        if res is not None:
            ok, code, pos, aux, buf, text, mtext, n_nodes, n_attrs, n_text, max_d = res
            if ok:
                return (
                    True, text, mtext, n_nodes, n_attrs, n_text, max_d,
                    None, None, None,
                )
            e = _decode_c_error(code, pos, aux, buf)
            return (False, b"", b"", 0, 0, 0, 0, e.error_class, e.pos, e.message)
    doc = parse_document(bytes(xml))  # pure path needs real bytes
    if doc.ok:
        from .extract import extract_main_text  # local: avoids import cycle

        return (
            True,
            doc.extracted_text(),
            extract_main_text(doc),
            doc.n_nodes - 1,
            doc.n_attrs,
            doc.n_text_nodes,
            doc.max_depth,
            None,
            None,
            None,
        )
    return (False, b"", b"", 0, 0, 0, 0, doc.error_class, doc.error_pos, doc.error_msg)


_DEFAULT_PROFILE = (True, True, False, False)


def parse_document(
    xml: bytes,
    *,
    parse_escapes: bool = True,
    namespace_removal: bool = True,
    trim_pcdata: bool = False,
    keep_ws_only_pcdata: bool = False,
) -> ParsedDoc:
    """Parse one document; malformed input becomes a row-level error,
    never an exception (error-as-data for the Spark pipeline).

    The keyword flags mirror the reference's cargo feature profiles
    (Cargo.toml:19-25; default = parse_escapes + namespace_removal).
    The C kernel implements the default profile; other profiles run on
    the pure-Python path (they exist for parity completeness, not the
    extraction hot path).
    """
    profile = (parse_escapes, namespace_removal, trim_pcdata, keep_ws_only_pcdata)
    if profile == _DEFAULT_PROFILE:
        cp = _get_cparser()
        if cp is not None:
            res = cp.parse(bytes(xml))
            if res is not None:  # None = doc too large for the i32 kernel
                return _from_c(res)
    doc = ParsedDoc()
    try:
        _parse(doc, xml, *profile)
    except ParseError as e:
        doc.ok = False
        doc.error_class = e.error_class
        doc.error_pos = e.pos
        doc.error_msg = e.message
    # freeze: nothing mutates after the parse; bytes slices are cheaper
    # than bytearray slices for every downstream read
    doc.buf = bytes(doc.buf)
    return doc


def parse_document_pure(xml: bytes, **profile: bool) -> ParsedDoc:
    """Pure-Python parse, bypassing the C kernel (differential tests)."""
    flags = dict(
        parse_escapes=True,
        namespace_removal=True,
        trim_pcdata=False,
        keep_ws_only_pcdata=False,
    )
    flags.update(profile)
    doc = ParsedDoc()
    try:
        _parse(
            doc,
            xml,
            flags["parse_escapes"],
            flags["namespace_removal"],
            flags["trim_pcdata"],
            flags["keep_ws_only_pcdata"],
        )
    except ParseError as e:
        doc.ok = False
        doc.error_class = e.error_class
        doc.error_pos = e.pos
        doc.error_msg = e.message
    doc.buf = bytes(doc.buf)
    return doc


def _parse_pcdata_noescape(buf: bytearray, start: int, end: int) -> int:
    """PCData under the non-default ``parse_escapes``-off profile:
    entities left verbatim; CR -> LF, CRLF -> LF (reference:
    src/parser.rs:676-728, cfg(not(parse_escapes)) branches)."""
    to = start
    frm = start
    while True:
        np_ = buf.find(13, frm, end)
        if np_ < 0:
            np_ = end
        if np_ >= end:
            if frm != to:
                buf[to : to + (end - frm)] = buf[frm:end]
            to += end - frm
            break
        if np_ > frm:
            if frm != to:
                buf[to : to + (np_ - frm)] = buf[frm:np_]
            to += np_ - frm
        buf[to] = 10  # CR (or CRLF) becomes a single LF
        to += 1
        frm = np_ + (2 if np_ + 1 < end and buf[np_ + 1] == 10 else 1)
    return to


def _remove_ns_prefix(buf: bytearray, start: int, end: int) -> int:
    """Strip through the FIRST ':' by in-place shift; returns new end.
    Reference: src/parser.rs:865-879 ('a:b:c' -> 'b:c', '<:a>' -> 'a')."""
    colon = buf.find(_COLON, start, end)
    if colon < 0:
        return end
    n = end - colon - 1
    buf[start : start + n] = buf[colon + 1 : end]
    return start + n


def _parse(
    doc: ParsedDoc,
    xml: bytes,
    parse_escapes: bool = True,
    namespace_removal: bool = True,
    trim_pcdata: bool = False,
    keep_ws_only_pcdata: bool = False,
) -> None:
    size = len(xml)
    if size > _MAX_XML_LEN:
        raise ParseError("Invalid XML: XML document is too large!", None)
    # Admission/pre-sizing (src/document.rs:74-107). Python lists grow by
    # doubling; the u16/u32 node-count caps are RAM features, not
    # semantics, and are deliberately not reproduced (SURVEY §7.4).

    buf = bytearray(xml)
    doc.buf = buf

    # Two O(n) classification passes, C-speed, on the pristine bytes
    # (whitespace runs and symbol runs are the only scans frequent
    # enough to earn a whole-buffer pass; every other scan is a live
    # bounded find). Sound because every scan reads at/after the read
    # cursor, and in-situ rewrites land strictly below it.
    sp_skip = xml.translate(T_SKIP_SPACE)   # find(1,p) = first non-ws
    sym_skip = xml.translate(T_SKIP_SYMBOL)  # find(1,p) = first non-symbol

    # bound methods: attribute lookups are measurable at ~1M calls/doc-batch
    bfind = buf.find
    sp_find = sp_skip.find
    sym_find = sym_skip.find

    parent = doc.parent
    prev_sib = doc.prev_sib
    next_sib = doc.next_sib
    first_child = doc.first_child
    kind = doc.kind
    loc_start = doc.loc_start
    loc_end = doc.loc_end
    attr_start = doc.attr_start
    attr_end = doc.attr_end
    a_name_start = doc.a_name_start
    a_name_end = doc.a_name_end
    a_val_start = doc.a_val_start
    a_val_end = doc.a_val_end

    chartype = CHARTYPE

    # node-append + O(1) sibling link (reference: src/document.rs:313-369;
    # a first child's prev_sibling tracks the parent's current LAST child)
    # is inlined at the three add sites below -- this loop is the single
    # hot path of the engine, and the call overhead is measurable.

    # parent stack: (node_idx, last_child_idx) pairs (src/parser.rs:229-241)
    stack_idx: list[int] = []
    stack_last: list[int] = []
    level = 0
    n_text = 0
    max_d = 0

    # parse-global anchored ';' frontier [f, anchor] (see _next_semi):
    # initialized to the vacuous "no ';' at/after EOF" so the first
    # consult scans once and every later one is incremental
    fr = [-1, len(buf)]

    # states
    S_START, S_TAGSTART, S_TAGOPEN, S_TAGCLOSE, S_ATTR, S_PCDATA, S_END = range(7)
    state = S_START
    i = 0

    while True:
        if state == S_PCDATA:
            space_start = i  # default profile keeps leading ws (src/parser.rs:1315-1319)
            i = sp_find(1, i)
            if i < 0:
                state = S_END
                continue
            start = i
            i = bfind(_LT, i)
            if i < 0:
                break  # text not followed by '<' -> Unexpected end
            if i > start:
                the_end = i
                if trim_pcdata:
                    # A13: right-trim (start stays past the leading ws)
                    while the_end > start and chartype[buf[the_end - 1]] & 8:
                        the_end -= 1
                else:
                    start = space_start
                if parse_escapes:
                    # fast path: no '&' and no CR -> the range is the text;
                    # the two scans double as _parse_pcdata's seeds (the
                    # C twin fuses them with the '<' scan into one SSE2
                    # pass, kernel/accel/_cparser.c:scan_text)
                    seed_amp = bfind(_AMP, start, the_end)
                    seed_cr = bfind(13, start, the_end)
                    if seed_amp < 0 and seed_cr < 0:
                        new_end = the_end
                    else:
                        new_end = _parse_pcdata(
                            buf, start, the_end, fr, seed_amp, seed_cr
                        )
                else:
                    new_end = _parse_pcdata_noescape(buf, start, the_end)
                if level > 0:
                    # inlined add_node (text)
                    lv = level - 1
                    parent_idx = stack_idx[lv]
                    idx = len(kind)
                    if first_child[parent_idx] == 0:
                        first_child[parent_idx] = idx
                        prev_sib.append(idx)
                    else:
                        last_child_idx = stack_last[lv]
                        next_sib[last_child_idx] = idx
                        prev_sib[first_child[parent_idx]] = idx
                        prev_sib.append(last_child_idx)
                    parent.append(parent_idx)
                    next_sib.append(0)
                    first_child.append(0)
                    kind.append(TEXT)
                    loc_start.append(start)
                    loc_end.append(new_end)
                    na = len(a_name_start)
                    attr_start.append(na)
                    attr_end.append(na)
                    stack_last[lv] = idx
                    n_text += 1
                    if level >= max_d:
                        max_d = level + 1
                else:
                    break  # text at level 0 -> Unexpected end
            elif keep_ws_only_pcdata and i > space_start and level != 0:
                # non-default profile: ws-only segments become raw text
                # nodes, unprocessed (src/parser.rs:1350-1379)
                lv = level - 1
                parent_idx = stack_idx[lv]
                idx = len(kind)
                if first_child[parent_idx] == 0:
                    first_child[parent_idx] = idx
                    prev_sib.append(idx)
                else:
                    last_child_idx = stack_last[lv]
                    next_sib[last_child_idx] = idx
                    prev_sib[first_child[parent_idx]] = idx
                    prev_sib.append(last_child_idx)
                parent.append(parent_idx)
                next_sib.append(0)
                first_child.append(0)
                kind.append(TEXT)
                loc_start.append(space_start)
                loc_end.append(i)
                na = len(a_name_start)
                attr_start.append(na)
                attr_end.append(na)
                stack_last[lv] = idx
                n_text += 1
                if level >= max_d:
                    max_d = level + 1
            # (default profile: ws-only segments produce NO node)
            i += 1
            if i >= size:
                break
            state = S_TAGSTART
            continue

        if state == S_TAGSTART:
            c = buf[i]
            if c == _SLASH:
                i += 1
                state = S_TAGCLOSE
                continue
            if c == _EXCL:
                i += 1
                if i < size:
                    if buf[i : i + 2] == b"--":
                        i += 2
                        # bounded 5000-byte window (src/parser.rs:942)
                        p = bfind(b"-->", i, i + 5000)
                        if p < 0:
                            break
                        i = p + 3
                    elif buf[i : i + 7] == b"DOCTYPE":
                        i += 7
                        # scan for '>' or '[' (src/parser.rs:948-955)
                        pg = bfind(_GT, i)
                        pb = bfind(_LBRACKET, i)
                        if pg < 0 and pb < 0:
                            break
                        if pg < 0:
                            i = pb
                        elif pb < 0:
                            i = pg
                        else:
                            i = min(pg, pb)
                        if buf[i] == _LBRACKET:
                            i = bfind(_RBRACKET, i)
                            if i < 0:
                                break
                            i += 1  # skip ']'
                            i = sp_find(1, i)
                            if i < 0:
                                break
                            if buf[i] == _GT:
                                i += 1  # skip '>'
                            else:
                                raise _invalid(
                                    buf, "Expected '>' after DOCTYPE declaration", i
                                )
                        i += 1  # reference skips one more byte here
                        # (src/parser.rs:977: non-subset path consumes the
                        # '>', subset path swallows the byte AFTER it)
                    elif buf[i : i + 7] == b"[CDATA[":
                        i += 7
                        p = bfind(b"]]>", i, i + 5000)
                        if p < 0:
                            break
                        i = p + 3
                    else:
                        break  # unknown '<!...' construct
                if i >= size:
                    state = S_END
                else:
                    state = S_PCDATA
                continue
            if c == _QUEST:
                i += 1
                p = bfind(b"?>", i, i + 500)
                if p < 0:
                    break
                i = p + 2
                state = S_END if i >= size else S_PCDATA
                continue
            state = S_TAGOPEN
            continue

        if state == S_TAGOPEN:
            start = i
            if not (chartype[buf[i]] & START_SYMBOL):
                raise _invalid(buf, "Tag name must start with a letter or underscore", i)
            i += 1
            i = sym_find(1, i)
            if i < 0:
                break
            # inlined first-colon namespace strip (src/parser.rs:865-879)
            colon = bfind(_COLON, start, i) if namespace_removal else -1
            if colon < 0:
                name_end = i
            else:
                n = i - colon - 1
                buf[start : start + n] = buf[colon + 1 : i]
                name_end = start + n
            # inlined add_node (element)
            parent_idx = stack_idx[level - 1] if level else 0
            idx = len(kind)
            if first_child[parent_idx] == 0:
                first_child[parent_idx] = idx
                prev_sib.append(idx)
            else:
                last_child_idx = stack_last[level - 1] if level else 0
                next_sib[last_child_idx] = idx
                prev_sib[first_child[parent_idx]] = idx
                prev_sib.append(last_child_idx)
            parent.append(parent_idx)
            next_sib.append(0)
            first_child.append(0)
            kind.append(ELEMENT)
            loc_start.append(start)
            loc_end.append(name_end)
            na = len(a_name_start)
            attr_start.append(na)
            attr_end.append(na)
            if level:
                stack_last[level - 1] = idx
            stack_idx.append(idx)
            stack_last.append(0)
            level += 1
            if level > max_d:
                max_d = level
            # fast path for the dominant '<tag>' shape: skip the
            # attribute state's whitespace scan entirely (semantically
            # identical: ReadAttribute would skip zero ws and hit '>')
            if buf[i] == _GT:
                i += 1
                if i >= size:
                    break
                state = S_PCDATA
            else:
                state = S_ATTR
            continue

        if state == S_ATTR:
            i = sp_find(1, i)
            if i < 0:
                break
            c = buf[i]
            if c == _SLASH:
                i += 1
                if i >= size:
                    break
                if buf[i] != _GT:
                    raise _invalid(buf, "Expected '>' after '/' in self-closing tag", i)
                stack_idx.pop()
                stack_last.pop()
                level -= 1
                if level == 0:
                    # self-closed root STOPS the parse (src/parser.rs:1206-1208)
                    state = S_END
                else:
                    i += 1
                    if i >= size:
                        break
                    state = S_PCDATA
                continue
            if c == _GT:
                i += 1
                if i >= size:
                    break
                state = S_PCDATA
                continue
            start = i
            if not (chartype[c] & START_SYMBOL):
                raise _invalid(
                    buf, "Attribute name must start with a letter or underscore", i
                )
            i += 1
            i = sym_find(1, i)
            if i < 0:
                break
            if buf[i] != _EQ:
                raise _invalid(buf, "Attribute must have an '=' sign", i)
            name_end_raw = i
            i += 1
            if i >= size:
                break
            quote = buf[i]
            if quote != _SQUOTE and quote != _DQUOTE:
                raise _invalid(buf, "Attribute value must be enclosed in quotes", i)
            i += 1
            value_start = i
            i = bfind(quote, i)
            if i < 0:
                break
            # normalize value; on invalid escape, restore and replay with
            # the quirk-exact live path (see _normalize_attr_quirk).
            if bfind(_AMP, value_start, i) >= 0:
                saved = bytes(buf[value_start:i])
                try:
                    value_end = _normalize_attr_fast(buf, value_start, i, fr)
                except _AttrQuirk:
                    buf[value_start:i] = saved
                    value_end = _normalize_attr_quirk(buf, value_start, i, fr)
            else:
                value_end = _normalize_attr_fast(buf, value_start, i, fr)
            # inlined first-colon namespace strip for the attribute name
            colon = bfind(_COLON, start, name_end_raw) if namespace_removal else -1
            if colon < 0:
                a_name_end_ = name_end_raw
            else:
                n = name_end_raw - colon - 1
                buf[start : start + n] = buf[colon + 1 : name_end_raw]
                a_name_end_ = start + n
            if level > 0:
                owner = stack_idx[level - 1]
                a_name_start.append(start)
                a_name_end.append(a_name_end_)
                a_val_start.append(value_start)
                a_val_end.append(value_end)
                attr_end[owner] += 1  # attrs of one element stay contiguous
            else:
                break
            i += 1
            state = S_ATTR
            continue

        if state == S_TAGCLOSE:
            start = i
            # scan_until_chartype(ParseCloseTag): closing names are
            # symbol runs, and PARSE_CLOSE bytes are never symbols, so
            # jump the symbol run and walk the (almost always empty)
            # remainder per byte
            i = sym_find(1, i)
            if i >= 0:
                while i < size and not (chartype[buf[i]] & 16):  # PARSE_CLOSE
                    i += 1
                if i >= size:
                    i = -1
            if i < 0:
                break
            if i == start:
                raise _invalid(buf, "Expected tag name after '</'", i)
            name_end = _remove_ns_prefix(buf, start, i) if namespace_removal else i
            is_gt = buf[i] == _GT
            if level > 0:
                open_idx = stack_idx[level - 1]
                if kind[open_idx] == ELEMENT:
                    if (
                        buf[loc_start[open_idx] : loc_end[open_idx]]
                        != buf[start:name_end]
                    ):
                        closing = _str_or_fallback(buf, start, name_end)
                        opening = _str_or_fallback(
                            buf, loc_start[open_idx], loc_end[open_idx]
                        )
                        raise _invalid(
                            buf,
                            f"Closing tag '{closing}' does not match opening tag "
                            f"'{opening}'",
                            start,
                        )
                else:
                    raise _invalid(buf, "Expected an element node for closing tag", start)
            else:
                raise _invalid(buf, "No opening tag for closing tag", i)
            stack_idx.pop()
            stack_last.pop()
            level -= 1
            if not is_gt:
                i = bfind(_GT, i + 1)
                if i < 0:
                    break
            i += 1
            # parsing continues after the root closes (src/parser.rs:1180-1182)
            state = S_END if i >= size else S_PCDATA
            continue

        if state == S_START:
            i = bfind(_LT, i)
            if i < 0:
                break  # bytes before first '<' ignored; none found -> error
            i += 1
            if i >= size:
                break
            state = S_TAGSTART
            continue

        if state == S_END:
            doc.n_text_nodes = n_text
            doc.max_depth = max_d
            return

    raise _unexpected_end()


def _str_or_fallback(buf: bytearray, start: int, end: int) -> str:
    """get_str_from_location semantics (src/document.rs:421-434)."""
    try:
        return bytes(buf[start:end]).decode("utf-8")
    except UnicodeDecodeError:
        return "non valid utf-8"
