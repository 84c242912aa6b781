"""Byte-classification tables for the XHTML tokenizer.

Semantics match the reference 256-entry chartype table
(reference: src/parser.rs:60-87): a single table lookup classifies every
byte into bitmask classes. The table here is built from the semantic
rules stated in the reference comments and verified entry-by-entry
against the reference literal in tests/test_chartype.py.

Classes (reference: src/parser.rs:60-67):
  PARSE_PCDATA  =   1   -> '&', '\\r'
  PARSE_ATRNORM =   4   -> '&', '\\r', '\\n', space, tab
  SPACE         =   8   -> '\\r', '\\n', space, tab
  PARSE_CLOSE   =  16   -> '\\r', '\\n', space, tab, '>'
  SYMBOL        =  64   -> bytes > 127, a-z, A-Z, 0-9, '_', ':', '-', '.'
  START_SYMBOL  = 128   -> bytes > 127, a-z, A-Z, '_', ':'

For vectorized scanning we pre-build one ``bytes.translate`` table per
scan operation: each maps a byte to 0x01 if it terminates/starts the
scan, else 0x00, so "find next byte matching class C from p" becomes a
single C-speed ``translated.find(1, p)`` -- the Python equivalent of
the reference's memchr-style scan loops (src/parser.rs:283-385).
"""

from __future__ import annotations

PARSE_PCDATA = 1
PARSE_ATRNORM = 4
SPACE = 8
PARSE_CLOSE = 16
SYMBOL = 64
START_SYMBOL = 128

CHARTYPE = [0] * 256
for _b in (9, 10, 32):  # tab, LF, space
    CHARTYPE[_b] = PARSE_ATRNORM | SPACE | PARSE_CLOSE  # 28
CHARTYPE[13] = PARSE_PCDATA | PARSE_ATRNORM | SPACE | PARSE_CLOSE  # CR = 29
CHARTYPE[0x26] = PARSE_PCDATA | PARSE_ATRNORM  # '&' = 5
for _b in (0x2D, 0x2E):  # '-', '.'
    CHARTYPE[_b] = SYMBOL
for _b in range(0x30, 0x3A):  # '0'-'9'
    CHARTYPE[_b] = SYMBOL
CHARTYPE[0x3A] = SYMBOL | START_SYMBOL  # ':' = 192
CHARTYPE[0x3E] = PARSE_CLOSE  # '>' = 16
for _b in range(0x41, 0x5B):  # 'A'-'Z'
    CHARTYPE[_b] = SYMBOL | START_SYMBOL
CHARTYPE[0x5F] = SYMBOL | START_SYMBOL  # '_'
for _b in range(0x61, 0x7B):  # 'a'-'z'
    CHARTYPE[_b] = SYMBOL | START_SYMBOL
for _b in range(0x80, 0x100):  # all bytes > 127
    CHARTYPE[_b] = SYMBOL | START_SYMBOL

CHARTYPE = tuple(CHARTYPE)


def _mask_table(mask: int, *, invert: bool = False) -> bytes:
    """256-byte translate table: byte -> 1 where (class & mask) matches."""
    if invert:
        return bytes(0 if (CHARTYPE[b] & mask) else 1 for b in range(256))
    return bytes(1 if (CHARTYPE[b] & mask) else 0 for b in range(256))


# "skip bytes of class C" == find first byte NOT of class C -> inverted maps
T_SKIP_SPACE = _mask_table(SPACE, invert=True)
T_SKIP_SYMBOL = _mask_table(SYMBOL, invert=True)
# "scan until byte of class C" -> direct maps
T_SCAN_CLOSE = _mask_table(PARSE_CLOSE)
T_SCAN_ATRNORM = _mask_table(PARSE_ATRNORM)
T_SCAN_PCDATA = _mask_table(PARSE_PCDATA)


def is_of_type(byte: int, mask: int) -> bool:
    """Reference: src/parser.rs:823-825."""
    return (CHARTYPE[byte] & mask) != 0
