"""parse_sitemaps: sitemap/sitemap-index field extraction."""

from __future__ import annotations


def _rows(spark, pages):
    from xhtml_parser_spark.operators.parse import parse_nodes
    from xhtml_parser_spark.operators.sitemap import parse_sitemaps

    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in pages], "url string, html binary"
    )
    nodes = parse_nodes(df).persist()
    try:
        return sorted(
            parse_sitemaps(nodes).collect(),
            key=lambda r: (r["url"], r["entry_id"]),
        )
    finally:
        nodes.unpersist()


def test_sitemap_urlset_fields(spark):
    rows = _rows(
        spark,
        [
            (
                "s1",
                b"<urlset "
                b'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                b"<url><loc>https://e.example/a?x=1&amp;y=2</loc>"
                b"<lastmod>2025-01-02</lastmod>"
                b"<changefreq>daily</changefreq>"
                b"<priority>0.8</priority></url>"
                # comment splits the loc into two text nodes: concat
                b"<url><loc>https://e.example/b<!--c-->2</loc></url>"
                # duplicate field: first-wins
                b"<url><loc>first</loc><loc>second</loc></url>"
                b"</urlset>",
            ),
            ("empty", b"<urlset></urlset>"),
        ],
    )
    assert [r["url"] for r in rows] == ["s1", "s1", "s1"]
    full, split, dup = rows
    assert full["kind"] == "url"
    assert full["loc"] == "https://e.example/a?x=1&y=2"  # entity decoded
    assert (full["lastmod"], full["changefreq"], full["priority"]) == (
        "2025-01-02",
        "daily",
        "0.8",
    )
    assert split["loc"] == "https://e.example/b2"
    assert split["lastmod"] is None
    assert dup["loc"] == "first"


def test_sitemap_index_and_hostile(spark):
    rows = _rows(
        spark,
        [
            (
                "i1",
                b"<sitemapindex><sitemap>"
                b"<loc>https://e.example/s1.xml</loc>"
                b"<lastmod>2024-12-31</lastmod>"
                b"</sitemap></sitemapindex>",
            ),
            # invalid UTF-8 loc bytes -> NULL, not an ANSI decode crash
            ("h1", b"<urlset><url><loc>\xff\xfe</loc></url></urlset>"),
            # entry with no fields at all still yields a row
            ("h2", b"<urlset><url></url></urlset>"),
            # malformed page contributes nothing (parse_nodes drops it)
            ("bad", b"<urlset><url>"),
        ],
    )
    by_url = {r["url"]: r for r in rows}
    assert by_url["i1"]["kind"] == "sitemap"
    assert by_url["i1"]["loc"] == "https://e.example/s1.xml"
    assert by_url["i1"]["priority"] is None
    assert by_url["h1"]["loc"] is None
    assert by_url["h2"]["loc"] is None and by_url["h2"]["kind"] == "url"
    assert "bad" not in by_url


def test_sitemap_fused_matches_relational(spark):
    """parse_sitemaps_fused (one Arrow pass + slim pivot) must equal
    the relational form row-for-row on every corpus above -- incl. the
    comment-split loc (descendant-text == child-text on protocol-shaped
    fields), first-wins duplicates, invalid-UTF-8 NULLs, fieldless
    entries, and malformed-page drops."""
    from xhtml_parser_spark.caching import released_after
    from xhtml_parser_spark.operators.parse import parse_nodes
    from xhtml_parser_spark.operators.sitemap import (
        parse_sitemaps,
        parse_sitemaps_fused,
    )

    pages = [
        (
            "s1",
            b"<urlset "
            b'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<url><loc>https://e.example/a?x=1&amp;y=2</loc>"
            b"<lastmod>2025-01-02</lastmod>"
            b"<changefreq>daily</changefreq>"
            b"<priority>0.8</priority></url>"
            b"<url><loc>https://e.example/b<!--c-->2</loc></url>"
            b"<url><loc>first</loc><loc>second</loc></url>"
            b"</urlset>",
        ),
        ("empty", b"<urlset></urlset>"),
        (
            "i1",
            b"<sitemapindex><sitemap>"
            b"<loc>https://e.example/s1.xml</loc>"
            b"<lastmod>2024-12-31</lastmod>"
            b"</sitemap></sitemapindex>",
        ),
        ("h1", b"<urlset><url><loc>\xff\xfe</loc></url></urlset>"),
        ("h2", b"<urlset><url></url></urlset>"),
        ("bad", b"<urlset><url>"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in pages], "url string, html binary"
    )
    key = lambda r: (r["url"], r["entry_id"])  # noqa: E731
    nodes = parse_nodes(df).persist()
    try:
        want = sorted(parse_sitemaps(nodes).collect(), key=key)
    finally:
        nodes.unpersist()
    with released_after(parse_sitemaps_fused(df)) as fused:
        got = sorted(fused.collect(), key=key)
    assert got == want
    assert len(got) == 6
