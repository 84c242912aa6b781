"""jsonld_records / meta_kv extraction semantics."""

from __future__ import annotations

import datetime as dt

from xhtml_parser_spark.sources import PAGES_SCHEMA

JSONLD_DOC = (
    b"<html><head>"
    b'<script type="application/ld+json">'
    b'{"@type":"Article","name":"story one","wordCount":12}'
    b"</script>"
    b'<script type="text/javascript">var x = 1;</script>'
    b"</head><body>"
    b'<script type="application/ld+json">{"@type":"BreadcrumbList"}'
    b"</script>"
    b'<script type="application/ld+json">not json at all</script>'
    b"</body></html>"
)

META_DOC = (
    b"<html><head>"
    b'<meta name="description" content="d &amp; e"/>'
    b'<meta property="og:title" content="OG"/>'
    b'<meta http-equiv="refresh" content="30"/>'
    b'<meta name="dup" name="SECOND" content="first" content="c2"/>'
    b'<meta charset="utf-8"/>'
    b'<meta name="keyonly"/>'
    b"</head><body></body></html>"
)


def _pages(spark, docs):
    rows = [
        (f"u{i}", dt.datetime(2025, 8, 8), h, None, "en")
        for i, h in enumerate(docs)
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_jsonld_records(spark):
    from xhtml_parser_spark.operators.metadata import jsonld_records

    out = sorted(
        jsonld_records(_pages(spark, [JSONLD_DOC])).collect(),
        key=lambda r: r.node_id,
    )
    # three ld+json blocks (the text/javascript one is excluded)
    assert len(out) == 3
    assert [r.sd_type for r in out] == ["Article", "BreadcrumbList", None]
    assert out[0].name == "story one"
    assert out[1].name is None
    # malformed JSON yields NULL fields but keeps the raw block
    assert out[2].jsonld == "not json at all"
    # custom field map
    out2 = jsonld_records(
        _pages(spark, [JSONLD_DOC]), fields={"wc": "wordCount"}
    ).collect()
    assert sorted(r.wc for r in out2 if r.wc is not None) == ["12"]


def test_meta_kv(spark):
    from xhtml_parser_spark.operators.metadata import meta_kv

    out = sorted(
        meta_kv(_pages(spark, [META_DOC])).collect(),
        key=lambda r: r.node_id,
    )
    got = [(r.key_kind, r.key, r.content) for r in out]
    assert got == [
        ("name", "description", "d & e"),
        ("property", "og:title", "OG"),
        ("http-equiv", "refresh", "30"),
        ("name", "dup", "first"),  # first-wins on BOTH key and content
        ("name", "keyonly", None),  # charset-only meta dropped, keyless kept
    ]
