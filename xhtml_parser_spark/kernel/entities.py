"""The 129-entry named-entity table.

Matches the reference's perfect-hash entity map byte-for-byte
(reference: src/parser.rs:90-220): the 5 XML specials plus the XHTML
Latin-1/special set. Built programmatically from codepoints to avoid
transcription typos; tests/test_entities.py asserts the exact count
and spot-checks the UTF-8 byte values.

Deliberate quirk preserved: the reference maps ``&euro;`` to U+202C
(POP DIRECTIONAL FORMATTING, bytes E2 80 AC) instead of U+20AC -- the
byte sequence is reproduced verbatim because extracted text must be
byte-identical (reference: src/parser.rs:219).
"""

from __future__ import annotations

# Latin-1 names for U+00A0..U+00FF, in codepoint order
# (reference: src/parser.rs:91-186).
_LATIN1_NAMES = (
    "nbsp iexcl cent pound curren yen brvbar sect uml copy ordf laquo "
    "not shy reg macr deg plusmn sup2 sup3 acute micro para middot "
    "cedil sup1 ordm raquo frac14 frac12 frac34 iquest "
    "Agrave Aacute Acirc Atilde Auml Aring AElig Ccedil "
    "Egrave Eacute Ecirc Euml Igrave Iacute Icirc Iuml "
    "ETH Ntilde Ograve Oacute Ocirc Otilde Ouml times "
    "Oslash Ugrave Uacute Ucirc Uuml Yacute THORN szlig "
    "agrave aacute acirc atilde auml aring aelig ccedil "
    "egrave eacute ecirc euml igrave iacute icirc iuml "
    "eth ntilde ograve oacute ocirc otilde ouml divide "
    "oslash ugrave uacute ucirc uuml yacute thorn yuml"
).split()

# XML specials + ISOlat2/ISOpub/ISOdia/RFC2070 extras
# (reference: src/parser.rs:187-219).
_EXTRA = {
    "quot": 0x22,
    "amp": 0x26,
    "lt": 0x3C,
    "gt": 0x3E,
    "apos": 0x27,
    "OElig": 0x152,
    "oelig": 0x153,
    "Scaron": 0x160,
    "scaron": 0x161,
    "Yuml": 0x178,
    "circ": 0x2C6,
    "tilde": 0x2DC,
    "ensp": 0x2002,
    "emsp": 0x2003,
    "thinsp": 0x2009,
    "zwnj": 0x200C,
    "zwj": 0x200D,
    "lrm": 0x200E,
    "rlm": 0x200F,
    "ndash": 0x2013,
    "mdash": 0x2014,
    "lsquo": 0x2018,
    "rsquo": 0x2019,
    "sbquo": 0x201A,
    "ldquo": 0x201C,
    "rdquo": 0x201D,
    "bdquo": 0x201E,
    "dagger": 0x2020,
    "Dagger": 0x2021,
    "permil": 0x2030,
    "lsaquo": 0x2039,
    "rsaquo": 0x203A,
    # Reference quirk: euro -> U+202C, NOT U+20AC (src/parser.rs:219).
    "euro": 0x202C,
}

ENTITIES: dict[bytes, bytes] = {}
for _i, _name in enumerate(_LATIN1_NAMES):
    ENTITIES[_name.encode()] = chr(0xA0 + _i).encode("utf-8")
for _name, _cp in _EXTRA.items():
    ENTITIES[_name.encode()] = chr(_cp).encode("utf-8")

assert len(ENTITIES) == 129, len(ENTITIES)
