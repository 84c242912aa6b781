"""RSS/Atom feed parsing: fused selector extraction semantics."""

from __future__ import annotations

import datetime as dt

from xhtml_parser_spark.sources import PAGES_SCHEMA

RSS = (
    b"<rss><channel><title>chan</title>"
    b"<item><title>first &amp; best</title>"
    b"<link>https://r.example/1</link>"
    b"<guid>g1</guid><pubDate>Mon, 01 Jan 2024</pubDate></item>"
    b"<item><title>dup</title><title>SECOND-WINS-NOT</title>"
    b"<link>https://r.example/2</link></item>"
    b"</channel></rss>"
)

ATOM = (
    b'<feed><title>feedtitle</title>'
    b"<entry><title>a1</title><id>urn:1</id>"
    b'<link rel="alternate" href="https://a.example/1?x=1&amp;y=2"/>'
    b'<link rel="self" href="https://a.example/self"/>'
    b"<updated>2024-01-01</updated></entry>"
    b"<entry><title>a2</title></entry>"
    b"</feed>"
)

NS_ATOM = (
    b"<atom:feed><atom:entry><atom:title>ns</atom:title>"
    b'<atom:link href="https://a.example/ns"/></atom:entry></atom:feed>'
)

NOT_A_FEED = b"<html><body><p>hi</p></body></html>"


def _pages(spark, docs):
    rows = [
        (f"u{i}", dt.datetime(2025, 8, 8), h, None, "en")
        for i, h in enumerate(docs)
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_parse_feeds_rss_atom_unified(spark):
    from xhtml_parser_spark.operators.feeds import parse_feeds

    out = parse_feeds(_pages(spark, [RSS, ATOM, NS_ATOM, NOT_A_FEED]))
    rows = sorted(out.collect(), key=lambda r: (r.url, r.entry_id))
    by_url: dict = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)

    r1, r2 = by_url["u0"]
    assert (r1.kind, r1.title, r1.link, r1.guid, r1.updated) == (
        "item", "first & best", "https://r.example/1", "g1",
        "Mon, 01 Jan 2024",
    )
    # first-wins on the repeated <title>; absent fields are NULL
    assert (r2.kind, r2.title, r2.link, r2.guid, r2.updated) == (
        "item", "dup", "https://r.example/2", None, None,
    )

    a1, a2 = by_url["u1"]
    # Atom link = FIRST <link>'s href attribute (document order),
    # entity-decoded; channel/feed-level title never leaks into entries
    assert (a1.kind, a1.title, a1.link, a1.guid, a1.updated) == (
        "entry", "a1", "https://a.example/1?x=1&y=2", "urn:1",
        "2024-01-01",
    )
    assert (a2.kind, a2.title, a2.link, a2.guid, a2.updated) == (
        "entry", "a2", None, None, None,
    )

    # namespace prefixes strip (A14): <atom:feed> == <feed>
    (n1,) = by_url["u2"]
    assert (n1.kind, n1.title, n1.link) == (
        "entry", "ns", "https://a.example/ns",
    )

    # non-feed documents contribute no rows
    assert "u3" not in by_url
