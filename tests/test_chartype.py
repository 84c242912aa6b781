"""Verify the byte-class table and entity map against the reference's
literal values (reference: src/parser.rs:70-87 and src/parser.rs:90-220)."""

from xhtml_parser_spark.kernel.chartype import CHARTYPE
from xhtml_parser_spark.kernel.entities import ENTITIES

# The reference's 256-entry literal, transcribed row-by-row
# (src/parser.rs:70-87).
_REFERENCE_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 28, 28, 0, 0, 29, 0, 0]
    + [0] * 16
    + [28, 0, 0, 0, 0, 0, 5, 0, 0, 0, 0, 0, 0, 64, 64, 0]
    + [64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 192, 0, 0, 0, 16, 0]
    + [0] + [192] * 15
    + [192] * 11 + [0, 0, 0, 0, 192]
    + [0] + [192] * 15
    + [192] * 11 + [0] * 5
    + [192] * 128
)


def test_chartype_matches_reference_literal() -> None:
    assert list(CHARTYPE) == _REFERENCE_TABLE


def test_entity_count_and_spot_values() -> None:
    assert len(ENTITIES) == 129
    assert ENTITIES[b"amp"] == b"&"
    assert ENTITIES[b"lt"] == b"<"
    assert ENTITIES[b"gt"] == b">"
    assert ENTITIES[b"quot"] == b'"'
    assert ENTITIES[b"apos"] == b"'"
    assert ENTITIES[b"nbsp"] == b"\xc2\xa0"
    assert ENTITIES[b"yuml"] == b"\xc3\xbf"
    assert ENTITIES[b"eacute"] == b"\xc3\xa9"
    assert ENTITIES[b"Dagger"] == b"\xe2\x80\xa1"
    assert ENTITIES[b"permil"] == b"\xe2\x80\xb0"
    # the deliberate reference quirk: euro -> U+202C (src/parser.rs:219)
    assert ENTITIES[b"euro"] == b"\xe2\x80\xac"
    assert ENTITIES[b"OElig"] == b"\xc5\x92"
    assert ENTITIES[b"thinsp"] == b"\xe2\x80\x89"
