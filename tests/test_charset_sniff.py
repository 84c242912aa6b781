"""HTML5 encoding prescan + transcode operator tests.

The sniff must behave like the WHATWG prescan subset documented in
functions/charset.py; the transcode must round real legacy bytes into
the exact UTF-8 the Python codec machinery defines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xhtml_parser_spark.operators.charset import (
    decode_bytes,
    sniff_charset_pages,
    transcode_utf8,
)


def _sniff(spark, pages: list[bytes | None]) -> list[tuple[str, str, str]]:
    df = spark.createDataFrame(
        [(bytearray(p) if p is not None else None,) for p in pages], "html binary"
    )
    out = sniff_charset_pages(df).collect()
    return [(r["charset"], r["charset_src"], r["charset_label"]) for r in out]


def test_bom_beats_meta(spark):
    got = _sniff(spark, [
        b'\xef\xbb\xbf<meta charset="iso-8859-1">',
        b"\xfe\xff\x00<",
        b"\xff\xfe<\x00",
    ])
    assert got == [
        ("utf-8", "bom", "iso-8859-1"),  # label still surfaced
        ("utf-16be", "bom", ""),
        ("utf-16le", "bom", ""),
    ]


def test_meta_forms(spark):
    got = _sniff(spark, [
        b'<html><head><meta charset="UTF-8"></head>',
        b"<meta charset='Shift_JIS'>",
        b"<meta charset = latin1 >",
        b'<meta http-equiv="Content-Type" content="text/html; charset=KOI8-R">',
        b"<meta/charset=gb2312>",          # slash counts as separator
        b'<meta charset="utf-16le">',      # spec quirk: utf-16 label -> utf-8
        b'<meta charset="iso-8859-7">',    # valid but unlisted -> default
        b'<meta charset="no-such-thing">',
        b"<p>the word charset=utf-8 in prose</p>",   # not tag-shaped
        b'<metadata charset="utf-8">',     # tag name is not meta
        b"",
        None,
    ])
    assert got == [
        ("utf-8", "meta", "utf-8"),
        ("shift_jis", "meta", "shift_jis"),
        ("windows-1252", "meta", "latin1"),
        ("koi8-r", "meta", "koi8-r"),
        ("gbk", "meta", "gb2312"),
        ("utf-8", "meta", "utf-16le"),
        ("windows-1252", "default", "iso-8859-7"),
        ("windows-1252", "default", "no-such-thing"),
        ("windows-1252", "default", ""),
        ("windows-1252", "default", ""),
        ("windows-1252", "default", ""),
        ("windows-1252", "default", ""),
    ]


def test_prescan_window_clips(spark):
    inside = b"<!--" + b"x" * 900 + b'--><meta charset="utf-8">'
    outside = b"<!--" + b"x" * 1100 + b'--><meta charset="utf-8">'
    straddle = b"<!--" + b"x" * 1014 + b'--><meta charset="utf-8">'  # tag cut mid-attr
    got = _sniff(spark, [inside, outside, straddle])
    assert got == [
        ("utf-8", "meta", "utf-8"),
        ("windows-1252", "default", ""),
        ("windows-1252", "default", ""),
    ]


def test_first_meta_wins(spark):
    got = _sniff(spark, [b'<meta charset="koi8-r"><meta charset="utf-8">'])
    assert got == [("koi8-r", "meta", "koi8-r")]


def test_commented_meta_skipped(spark):
    got = _sniff(spark, [
        # spec prescan jumps past <!-- ... -->: the commented-out
        # template leftover must not set the encoding
        b'<!-- <meta charset="shift_jis"> --><meta charset="utf-8">',
        b'<!--\n<meta charset="shift_jis">\n-->',          # only a comment
        b'<!-- unterminated <meta charset="shift_jis">',   # hides the rest
        b'<meta charset="koi8-r"><!-- <meta charset="utf-8"> -->',
    ])
    assert got == [
        ("utf-8", "meta", "utf-8"),
        ("windows-1252", "default", ""),
        ("windows-1252", "default", ""),
        ("koi8-r", "meta", "koi8-r"),
    ]


def test_charset_in_other_attribute_value_ignored(spark):
    got = _sniff(spark, [
        # prose mention inside a description meta: only http-equiv
        # metas may carry charset inside an attribute VALUE (got-pragma)
        b'<meta name="description" content="how to use charset=big5 in html">',
        b'<meta name="description" content="see charset=big5">'
        b'<meta charset="utf-8">',
        # unquoted junk value followed by a REAL charset attribute
        b"<meta name=desc content=x charset=koi8-r>",
        # charset glued into another token is not an attribute
        b"<meta xcharset=big5>",
    ])
    assert got == [
        ("windows-1252", "default", ""),
        ("utf-8", "meta", "utf-8"),
        ("koi8-r", "meta", "koi8-r"),
        ("windows-1252", "default", ""),
    ]


def test_window_cut_never_truncates_label(spark):
    """A tag the 1024-byte cut truncates mid-value must be ignored
    (spec bail-out), never half-read: 'koi8-r' -> 'koi8' or
    'utf-16le' -> 'utf-16' (which would flip the utf-16 quirk on)."""
    tags = [
        (b'<meta charset="koi8-r">', "koi8-r"),
        (b'<meta charset="utf-16le">', "utf-8"),   # quirk when fully read
        (b"<meta charset=koi8-r>", "koi8-r"),      # unquoted: needs terminator
    ]
    pages, expect_full = [], {}
    for t, (tag, full_cs) in enumerate(tags):
        for pad in range(1024 - len(tag) - 2, 1026):
            pages.append(b" " * pad + tag)
            expect_full[len(pages) - 1] = full_cs
    got = _sniff(spark, pages)
    for i, (cs, src, label) in enumerate(got):
        assert (cs, src) in ((expect_full[i], "meta"), ("windows-1252", "default")), (
            i, cs, src, label
        )


def test_transcode_legacy_bytes(spark):
    rows = [
        (0, b"\x80 caf\xe9", "windows-1252"),          # cp1252 euro + e-acute
        (1, "日本語".encode("shift_jis"), "shift_jis"),
        (2, b"\xef\xbb\xbfhi", "utf-8"),               # BOM stripped
        (3, b"\xff\xfe" + "ab".encode("utf-16-le"), "utf-16le"),  # BOM stripped
        (4, b"abc", "martian-9"),                      # unknown -> cp1252
        (5, None, "utf-8"),
        (6, b"\xc0\xe1\xe2", "windows-1251"),
        # header-cased names must normalize, not silently fall to cp1252
        (7, "日本語".encode("shift_jis"), "Shift_JIS"),
        (8, "é".encode(), "UTF-8"),
        (9, b"x", " WINDOWS-1252 "),
        # malformed utf-8 with cs=utf-8: python-lane replacement decode
        (10, b"ok \xff end", "utf-8"),
        # valid utf-8 + BOM: JVM fast lane, BOM stripped
        (11, b"\xef\xbb\xbfcaf\xc3\xa9", "utf-8"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None, c) for i, b, c in rows],
        "doc_id long, html binary, cs string",
    )
    out = {
        r["doc_id"]: r["text_utf8"]
        for r in transcode_utf8(df, charset_col="cs").collect()
    }
    assert out[0] == "€ café"
    assert out[1] == "日本語"
    assert out[2] == "hi"
    assert out[3] == "ab"
    assert out[4] == "abc"
    assert out[5] is None
    assert out[6] == "Абв"
    assert out[7] == "日本語"
    assert out[8] == "é"
    assert out[9] == "x"
    assert out[10] == "ok � end"
    assert out[11] == "café"
    # both lanes agree with decode_bytes per value (valid utf-8 decodes
    # identically in the JVM lane; everything else IS decode_bytes)
    for i, b, c in rows:
        assert out[i] == decode_bytes(b, c)


def test_transcode_derives_sniff_columns(spark):
    df = spark.createDataFrame(
        [(bytearray(b'<meta charset="utf-8">ok \xe2\x82\xac'),)], "html binary"
    )
    r = transcode_utf8(df).collect()[0]
    assert (r["charset"], r["charset_src"]) == ("utf-8", "meta")
    assert r["text_utf8"] == '<meta charset="utf-8">ok €'


def test_sniff_replica_differential(spark):
    """Spark prescan vs a from-scratch pure-Python replica over crafted
    byte soups (incl. high bytes, quote styles, whitespace zoo)."""
    import re

    from xhtml_parser_spark.functions.charset import (
        _LABELS,
        _META_ATTR_RE,
        _META_PRAGMA_RE,
    )

    def clean(raw_val: str) -> str:
        s = re.sub("(^[\"'\\t\\n\\x0c\\r ]+)|([\"'\\t\\n\\x0c\\r ;>/]+$)", "", raw_val)
        return s if re.fullmatch("[a-z0-9._:-]+", s) else ""

    def replica(b: bytes | None) -> tuple[str, str, str]:
        raw = b or b""
        head = raw[:1024].decode("ISO-8859-1").lower()
        head = re.sub("<!--[\\s\\S]*?-->", " ", head)
        head = re.sub("<!--[\\s\\S]*$", " ", head)
        attr = re.search(_META_ATTR_RE, head)
        pragma = re.search(_META_PRAGMA_RE, head)
        label = clean(attr.group(1)) if attr else ""
        if not label and pragma:
            label = clean(pragma.group(1))
        if label.startswith(("utf-16", "utf16")):
            norm = "utf-8"
        else:
            norm = _LABELS.get(label)
        if raw[:3] == b"\xef\xbb\xbf":
            return ("utf-8", "bom", label)
        if raw[:2] == b"\xfe\xff":
            return ("utf-16be", "bom", label)
        if raw[:2] == b"\xff\xfe":
            return ("utf-16le", "bom", label)
        if norm:
            return (norm, "meta", label)
        return ("windows-1252", "default", label)

    cases: list[bytes] = []
    labels = ["utf-8", "SJIS", "GB18030", "bogus", "latin2", "utf16be"]
    for i, lab in enumerate(labels):
        q = ["", '"', "'"][i % 3]
        ws = ["", " ", "\t\n"][i % 3]
        cases.append(
            b"\xfe\xff"[: i % 3]  # sometimes a partial/real BOM prefix
            + b"<div>\x99\xff</div>"
            + f"<meta {'http-equiv=x ' if i % 2 else ''}charset{ws}={ws}{q}{lab}{q}>".encode()
        )
    cases += [
        b"\xff\xfe", b"\xef\xbb", b"<meta charset=>", b"<meta charset>",
        b'x<!--<meta charset="sjis">-->  <meta charset=big5>',
        b'<meta name="d" content="charset=big5">ok',
        b'<meta http-equiv=content-type content="text/html; charset=euc-kr">',
        b"<meta '  charset=gbk>",               # unterminated quote soup
        b'<meta a="b>c" charset=big5>',         # '>' inside a quoted value
        b'<!--' + b'z' * 40 + b'<meta charset="gbk">',  # comment hides meta
        b'<meta charset=" utf-8 ">',            # quoted label with padding
        b'<meta charset="utf 8">',              # invalid label chars
    ]
    assert _sniff(spark, cases) == [replica(c) for c in cases]


def test_pragma_requires_content_type_http_equiv(spark):
    """got-pragma: charset= inside a meta VALUE counts only when the
    tag's http-equiv is content-type -- an http-equiv=refresh redirect
    URL mentioning charset= must not hijack the sniff."""
    got = _sniff(spark, [
        b'<meta http-equiv=refresh content="0;url=/p?charset=big5">',
        b'<meta http-equiv="content-type" content="text/html; charset=big5">',
        b"<meta http-equiv=content-type content='text/html; charset=koi8-r'>",
        # refresh hijack attempt followed by a real charset meta
        b'<meta http-equiv=refresh content="0;url=?charset=big5">'
        b'<meta charset=utf-8>',
    ])
    assert got == [
        ("windows-1252", "default", ""),
        ("big5", "meta", "big5"),
        ("koi8-r", "meta", "koi8-r"),
        ("utf-8", "meta", "utf-8"),
    ]
