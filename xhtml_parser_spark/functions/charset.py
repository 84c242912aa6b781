"""HTML5 encoding prescan (charset sniffing) for binary web pages.

Common-Crawl-style corpora store ``html`` as raw bytes: real crawls
are a mix of UTF-8, windows-1252, shift_jis, ... and a pipeline that
assumes UTF-8 silently mangles the long tail. This implements the
WHATWG "prescan a byte stream to determine its encoding" subset that
crawl pipelines actually rely on, as pure JVM built-ins (binary
substring + one ISO-8859-1 decode + one RE2-safe regexp) so it runs
inside whole-stage codegen with no Python in the path:

  1. byte-order mark: EF BB BF -> utf-8, FE FF -> utf-16be,
     FF FE -> utf-16le (BOM beats any in-document declaration);
  2. else the FIRST ``<meta ... charset=label`` inside the first
     ``prescan`` bytes (default 1024, the spec's window), covering
     both the HTML5 ``<meta charset="...">`` form and the legacy
     ``<meta http-equiv="content-type" content="...; charset=...">``
     form (both spell ``charset=``); the label is normalized through
     the WHATWG label table subset below, and a ``utf-16*`` label is
     treated as utf-8 exactly as the spec's prescan step 5 demands;
  3. else windows-1252 (the spec's default for unlabeled content).

Subset notes (documented, deliberate):
  * comments are skipped exactly like the spec's prescan ("<!--" jumps
    past the next "-->"; an unterminated one hides the rest of the
    window) -- a commented-out meta cannot set the encoding;
  * ``charset`` must be a REAL attribute of a ``<meta``-shaped tag
    (quoted attribute values are consumed atomically, so a prose
    mention inside name=description content="... charset=big5 ..."
    cannot match), except the legacy pragma form where ``charset=``
    inside the content value counts only when the same tag carries
    ``http-equiv`` with the value ``content-type`` (the spec's
    got-pragma rule; an http-equiv=refresh redirect URL mentioning
    charset= cannot hijack the sniff). One order limitation: in the
    pragma form ``charset=`` must FOLLOW the ``http-equiv`` attribute
    within the tag -- the spec is attribute-order independent, but
    real-world content-type metas overwhelmingly write http-equiv
    first, and one forward regexp keeps the sniff codegen-only;
  * the value must be COMPLETE inside the window (closing quote, or a
    terminator after an unquoted label) -- a tag the 1024-byte cut
    truncates mid-value is ignored, like the spec's incomplete-tag
    bail-out, never half-read into a different (shorter) label;
  * an unknown label falls through to the default with src='default'
    (the spec keeps scanning for another meta; real-world second metas
    are ~nonexistent) -- the raw label is still surfaced for corpus
    analytics, so nothing is lost;
  * the label table covers the labels with measurable crawl share;
    an unlisted-but-valid label (e.g. iso-8859-7) is treated as
    unknown -- downstream transcoding only ever sees names it has a
    decoder for.

The decode window uses ISO-8859-1, a bijective byte<->char map, so the
prescan itself is encoding-safe on arbitrary bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# WHATWG label table subset: label -> canonical encoding name.
# https://encoding.spec.whatwg.org/#names-and-labels (public spec).
_LABELS: dict[str, str] = {
    # utf-8
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "unicode11utf8": "utf-8",
    "unicode20utf8": "utf-8",
    "x-unicode20utf8": "utf-8",
    # windows-1252 (the latin1/ascii label family all mean cp1252 on
    # the web per the spec)
    "windows-1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "cp1252": "windows-1252",
    "cp819": "windows-1252",
    "ibm819": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "iso88591": "windows-1252",
    "iso_8859-1": "windows-1252",
    "iso_8859-1:1987": "windows-1252",
    "iso-ir-100": "windows-1252",
    "csisolatin1": "windows-1252",
    "l1": "windows-1252",
    "latin1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "ansi_x3.4-1968": "windows-1252",
    # other single-byte families common in crawls
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "x-cp1251": "windows-1251",
    "koi8-r": "koi8-r",
    "koi8_r": "koi8-r",
    "koi8": "koi8-r",
    "cskoi8r": "koi8-r",
    "windows-1250": "windows-1250",
    "cp1250": "windows-1250",
    "x-cp1250": "windows-1250",
    "windows-1254": "windows-1254",
    "cp1254": "windows-1254",
    "iso-8859-9": "windows-1254",
    "latin5": "windows-1254",
    "windows-1256": "windows-1256",
    "cp1256": "windows-1256",
    "iso-8859-2": "iso-8859-2",
    "iso8859-2": "iso-8859-2",
    "latin2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15",
    "iso8859-15": "iso-8859-15",
    "latin9": "iso-8859-15",
    # CJK
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "ms932": "shift_jis",
    "windows-31j": "shift_jis",
    "euc-jp": "euc-jp",
    "x-euc-jp": "euc-jp",
    "cseucpkdfmtjapanese": "euc-jp",
    "gbk": "gbk",
    "gb2312": "gbk",
    "gb_2312": "gbk",
    "gb_2312-80": "gbk",
    "chinese": "gbk",
    "csgb2312": "gbk",
    "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "big5-hkscs": "big5",
    "x-x-big5": "big5",
    "cn-big5": "big5",
    "csbig5": "big5",
    "euc-kr": "euc-kr",
    "korean": "euc-kr",
    "ks_c_5601-1987": "euc-kr",
    "ks_c_5601-1989": "euc-kr",
    "ksc5601": "euc-kr",
    "ksc_5601": "euc-kr",
    "cseuckr": "euc-kr",
    "windows-949": "euc-kr",
}

# All regexes below are RE2-compatible (no lookaround/backrefs) like
# the rest of the engine's oracle-replayable regex surface.
#
# The prescan skips comments (spec: "<!--" jumps to the next "-->"),
# so comments are blanked out of the window first; replacing with a
# space (not '') so stripping can never splice two fragments into a
# tag that was never there. An unterminated "<!--" hides the rest of
# the window, matching the spec's skip-to--->-or-EOF.
_COMMENT_RE = "<!--[\\s\\S]*?-->"
_COMMENT_OPEN_RE = "<!--[\\s\\S]*$"

_WS = "\\t\\n\\x0c\\r "
# A quoted attribute value consumed as one unit -- charset= inside
# someone else's value (content="... charset=big5 ...") cannot match.
_ATTRS = "(?:\"[^\"]*\"|'[^']*'|[^>\"'])"
# The VALUE must be complete inside the window: a quoted value needs
# its closing quote, an unquoted one a terminator character -- a tag
# the 1024-byte cut truncates mid-value is ignored (the spec's
# incomplete-tag bail-out). The single capture group keeps the
# quotes/terminator; _clean_label strips them and validates.
_VALUE = "(\"[^\"]*\"|'[^']*'|[a-z0-9._:-]+[" + _WS + ";>/\"'])"
_EQ = "charset[" + _WS + "]*=[" + _WS + "]*"

# charset as a REAL attribute of a meta tag: right after the tag-name
# separator or after whole attributes ending in a separator.
_META_ATTR_RE = (
    "<meta[" + _WS + "/](?:" + _ATTRS + "*?[" + _WS + "/])?" + _EQ + _VALUE
)
# the legacy pragma form: charset may sit INSIDE the content value,
# but only a meta whose http-equiv VALUE is content-type qualifies
# (the spec's got-pragma rule requires http-equiv='content-type'; a
# name=description meta mentioning charset= in prose, or an
# http-equiv=refresh whose redirect URL contains a charset= query
# parameter, must not hijack the sniff). Order limitation documented
# in the module subset notes: charset= must FOLLOW http-equiv within
# the tag (the spec is attribute-order independent).
_META_PRAGMA_RE = (
    "<meta["
    + _WS
    + "/]"
    + _ATTRS
    + "*?http-equiv["
    + _WS
    + "]*=["
    + _WS
    + "]*[\"']?content-type[^>]*?"
    + _EQ
    + _VALUE
)

_EMPTY = bytes()


def _clean_label(raw: Column) -> Column:
    """Strip the captured value's quotes/terminator + surrounding
    whitespace, then validate: anything that is not a pure label
    token (spec: invalid label => that candidate fails) becomes ''."""
    stripped = F.regexp_replace(
        raw, "(^[\"'" + _WS + "]+)|([\"'" + _WS + ";>/]+$)", ""
    )
    return F.when(
        stripped.rlike("^[a-z0-9._:-]+$"), stripped
    ).otherwise(F.lit(""))


def meta_charset_label(html: Column, prescan: int = 1024) -> Column:
    """Raw (lowercased) label of the first in-window ``charset`` meta
    declaration; '' when none. Surfaced separately from the decision so
    corpus analytics can count declared-vs-effective encodings.

    Precedence subset: the charset-ATTRIBUTE form wins over the
    http-equiv pragma form when both appear in the window (the spec
    orders by tag position; two conflicting forms in one document are
    vanishingly rare and a fixed precedence keeps this one regexp per
    form)."""
    head = F.decode(
        F.substring(F.coalesce(html, F.lit(_EMPTY)), 1, prescan), "ISO-8859-1"
    )
    head = F.lower(head)
    head = F.regexp_replace(head, _COMMENT_RE, " ")
    head = F.regexp_replace(head, _COMMENT_OPEN_RE, " ")
    attr = _clean_label(F.regexp_extract(head, _META_ATTR_RE, 1))
    pragma = _clean_label(F.regexp_extract(head, _META_PRAGMA_RE, 1))
    return F.when(attr != "", attr).otherwise(pragma)


def _normalize_label(label: Column) -> Column:
    """WHATWG label -> canonical name as ONE map lookup (null when
    unknown). utf-16 labels become utf-8 (the prescan's step-5 quirk:
    content declared utf-16 inside an 8-bit byte stream obviously
    isn't, and the spec says assume utf-8)."""
    table = F.create_map(
        *[F.lit(x) for k in sorted(_LABELS) for x in (k, _LABELS[k])]
    )
    return F.when(
        label.startswith("utf-16") | label.startswith("utf16"), F.lit("utf-8")
    ).otherwise(F.element_at(table, label))


def sniff_charset(html: Column, prescan: int = 1024) -> Column:
    """Effective encoding per the prescan: struct(charset, src, label).

    ``src`` is 'bom' | 'meta' | 'default'; ``charset`` is the decision
    (canonical name); ``label`` is the raw declared label ('' if none).
    Unknown declared labels that normalize to nothing usable fall back
    to the windows-1252 default but keep src='meta' ONLY when the label
    was known -- an unrecognized label is reported as src='default' so
    downstream transcoding never trusts it.
    """
    b = F.coalesce(html, F.lit(_EMPTY))
    b3 = F.substring(b, 1, 3)
    b2 = F.substring(b, 1, 2)
    label = meta_charset_label(html, prescan)
    norm = _normalize_label(label)
    meta_ok = norm.isNotNull()
    charset = (
        F.when(b3 == F.lit(b"\xef\xbb\xbf"), F.lit("utf-8"))
        .when(b2 == F.lit(b"\xfe\xff"), F.lit("utf-16be"))
        .when(b2 == F.lit(b"\xff\xfe"), F.lit("utf-16le"))
        .when(meta_ok, norm)
        .otherwise(F.lit("windows-1252"))
    )
    src = (
        F.when(
            (b3 == F.lit(b"\xef\xbb\xbf"))
            | (b2 == F.lit(b"\xfe\xff"))
            | (b2 == F.lit(b"\xff\xfe")),
            F.lit("bom"),
        )
        .when(meta_ok, F.lit("meta"))
        .otherwise(F.lit("default"))
    )
    return F.struct(
        charset.alias("charset"), src.alias("src"), label.alias("label")
    )
