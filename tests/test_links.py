"""Link extraction, URL resolution, host graph, and PageRank tests.

resolve_url is differentially checked against urllib.parse.urljoin
(the Python stdlib reference resolver); the extraction kernel against
hand-built DOMs covering first-wins duplicate hrefs, href-less
anchors, non-anchor tags, failed parses, and entity-decoded values;
pagerank against an independent plain-Python fixed-point replica.
"""

from __future__ import annotations

from urllib.parse import urljoin

import pytest
from pyspark.sql import functions as F


RESOLVE_CASES = [
    ("https://h.com/a/b/x.html", "../t/p.html"),
    ("https://h.com/a/b/x.html", "t/p.html"),
    ("https://h.com/a/b/x.html", "/css/m.css"),
    ("https://h.com/a/b/x.html", "//other.com/q"),
    ("https://h.com/a/b/x.html", "http://abs.com/z?a=1"),
    ("https://h.com/a/b/x.html", ""),
    ("https://h.com/a/b/x.html", "#frag"),
    ("https://h.com/a/b/x.html", "?q=2"),
    ("https://h.com/a/b/x.html", ".."),
    ("https://h.com/a/b/x.html", "../"),
    ("https://h.com/a/b/x.html", "."),
    ("https://h.com/a/b/x.html", "./p"),
    ("https://h.com/a/b/", "p.html"),
    ("https://h.com", "x"),
    ("https://h.com", "../../x"),
    ("https://h.com/a/b/x.html", "../../../../z"),
    ("https://h.com/a/b/x.html", "p/./q/../r.html"),
    ("https://h.com/a/b/x.html?old=1", "n.html?new=2"),
    ("https://h.com/a/b/x.html", "mailto:a@b.c"),
    ("http://h.com:8080/a/x", "y"),
]


def test_resolve_url_matches_urljoin(spark):
    from xhtml_parser_spark.functions.urls import resolve_url

    df = spark.createDataFrame(RESOLVE_CASES, "base string, href string")
    got = df.select(
        "base", "href", resolve_url(F.col("base"), F.col("href")).alias("r")
    ).collect()
    for row in got:
        # fragments are stripped by design (crawl links never keep them)
        expected = urljoin(row["base"], row["href"]).split("#")[0]
        assert row["r"] == expected, (row["base"], row["href"])


@pytest.fixture(scope="module")
def link_pages(spark):
    rows = [
        (
            "https://a.com/d/x.html",
            b'<html><body><a href="../p.html">t</a>'
            b'<a href="https://B.com:443/q?utm_source=1&amp;z=2">u</a>'
            b'<a class="noref">v</a>'
            b'<link rel="css" href="/m.css"/>'
            b'<area href="//c.com/ar" alt="z"/>'
            b'<a href="first.html" href="second.html">dup</a>'
            b'<a href="mailto:x@y.z">m</a></body></html>',
        ),
        (
            "https://b.com/",
            b'<html><body><a href="https://a.com/back">b</a>'
            b"<p>text</p></body></html>",
        ),
        ("https://none.com/", b"<html><body><p>no links</p></body></html>"),
        ("https://bad.com/", b"<root><dangling"),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_links_kernel(spark, link_pages):
    from xhtml_parser_spark.operators.links import extract_links

    rows = extract_links(link_pages).collect()
    got = {
        (r["url"], r["node_id"]): (r["tag"], r["href"], r["link_url"], r["link_host"])
        for r in rows
    }
    texts = {(r["url"], r["node_id"]): r["anchor_text"] for r in rows}
    a = "https://a.com/d/x.html"
    assert got[(a, 3)] == ("a", "../p.html", "https://a.com/p.html", "a.com")
    # entity-decoded &amp;, lowercased host, :443 stripped, tracker
    # dropped -- the href column keeps the DECODED raw value
    assert got[(a, 5)] == (
        "a",
        "https://B.com:443/q?utm_source=1&z=2",
        "https://b.com/q?z=2",
        "b.com",
    )
    assert got[(a, 9)] == ("link", "/m.css", "https://a.com/m.css", "a.com")
    assert got[(a, 10)] == ("area", "//c.com/ar", "https://c.com/ar", "c.com")
    # duplicate href: first wins (reference get_attribute scan order)
    assert got[(a, 11)][1] == "first.html"
    assert got[(a, 11)][2] == "https://a.com/d/first.html"
    # mailto passes through extraction (graph builders filter it)
    assert got[(a, 13)][1] == "mailto:x@y.z"
    assert got[("https://b.com/", 3)][2] == "https://a.com/back"
    # href-less anchor contributes nothing; link-free and failed-parse
    # documents contribute nothing
    assert (a, 7) not in got
    assert len(got) == 7
    # anchor text: descendant text nodes; void elements are empty
    assert texts[(a, 3)] == "t" and texts[(a, 5)] == "u"
    assert texts[(a, 9)] == "" and texts[(a, 10)] == ""
    assert texts[(a, 11)] == "dup" and texts[(a, 13)] == "m"
    assert texts[("https://b.com/", 3)] == "b"


def test_extract_links_anchor_text_nested_and_entities(spark):
    from xhtml_parser_spark.operators.links import extract_links

    pages = spark.createDataFrame(
        [
            (
                "https://n.com/",
                b'<html><body><a href="/1"><b>bold</b> tail &amp; more</a>'
                b'<a href="/2"></a>'
                b'<a href="/3">pre<i>mid<u>deep</u></i>post</a>'
                b"</body></html>",
            )
        ],
        "url string, html binary",
    )
    texts = {
        r["node_id"]: r["anchor_text"] for r in extract_links(pages).collect()
    }
    # concatenated descendant text in document order, entities decoded
    assert texts == {3: "bold tail & more", 7: "", 8: "premiddeeppost"}


def test_host_link_graph_filters_and_weights(spark, link_pages):
    from xhtml_parser_spark.operators.links import extract_links, host_link_graph

    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_link_graph(extract_links(link_pages)).collect()
    }
    # mailto: dropped by the ^https?:// gate; 3 a.com self-links
    assert got == {
        ("a.com", "a.com"): 3,
        ("a.com", "b.com"): 1,
        ("a.com", "c.com"): 1,
        ("b.com", "a.com"): 1,
    }
    no_self = {
        (r["src_host"], r["dst_host"])
        for r in host_link_graph(
            extract_links(link_pages), drop_self=True
        ).collect()
    }
    assert ("a.com", "a.com") not in no_self and ("b.com", "a.com") in no_self


def test_pagerank_matches_integer_replica(spark):
    from xhtml_parser_spark.operators.links import pagerank

    edges = [
        ("a", "b", 2),
        ("a", "c", 1),
        ("b", "a", 1),
        ("c", "c", 5),
        ("d", "a", 3),  # d is a source-only node (rank = teleport)
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, weight long")
    n_iter, scale = 4, 10**9
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, n_iter=n_iter, scale=scale).collect()
    }

    ew = {(s, d): w for s, d, w in edges}
    outw: dict = {}
    for (s, _d), w in ew.items():
        outw[s] = outw.get(s, 0) + w
    nodes = sorted({x for p in ew for x in p})
    tel = (scale * 15) // 100
    r = {n: scale for n in nodes}
    for _ in range(n_iter):
        c = {n: 0 for n in nodes}
        for (s, d), w in ew.items():
            c[d] += (r[s] * w) // outw[s]
        r = {n: tel + (85 * c[n]) // 100 for n in nodes}
    assert got == r
    assert got["d"] == tel  # no inbound links -> teleport mass only


def test_extract_links_survives_non_utf8_bytes(spark):
    """A legacy-encoded page (shift_jis anchor text, valid-ASCII href)
    must yield NULL anchor_text -- not abort the job (Spark 4 ANSI
    decode raises on malformed bytes); a non-UTF-8 href nulls the href
    AND its derived link columns."""
    import datetime

    from xhtml_parser_spark.operators.links import extract_links
    from xhtml_parser_spark.sources import PAGES_SCHEMA

    sj = "日本語".encode("shift_jis")
    ts = datetime.datetime(2025, 8, 8)
    rows = [
        ("http://l.test/sj", ts,
         b'<html><body><a href="/next">' + sj + b"</a></body></html>",
         None, "ja"),
        ("http://l.test/badhref", ts,
         b'<html><body><a href="/x' + sj + b'">ok text</a></body></html>',
         None, "ja"),
        ("http://l.test/clean", ts,
         b'<html><body><a href="/ok">fine</a></body></html>', None, "en"),
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    got = {r["url"]: r for r in extract_links(df).collect()}
    r1 = got["http://l.test/sj"]
    assert r1["href"] == "/next" and r1["anchor_text"] is None
    assert r1["link_url"] == "http://l.test/next"
    r2 = got["http://l.test/badhref"]
    assert r2["href"] is None and r2["anchor_text"] == "ok text"
    assert r2["link_url"] is None and r2["link_host"] is None
    r3 = got["http://l.test/clean"]
    assert r3["href"] == "/ok" and r3["anchor_text"] == "fine"


def test_anchor_text_index(spark):
    """Top-k inbound anchor texts per target: counting, deterministic
    tie-breaks, k cap, and the drop rules (null/empty anchors,
    non-http targets); the salted two-phase must equal the naive
    single-window ranking."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from xhtml_parser_spark.operators.links import anchor_text_index

    rows = []
    # t1: 'a' x3, 'b' x3 (tie -> alphabetical), 'c' x2, 'd'..'f' x1
    rows += [("t", "https://t.example/1", x) for x in
             ["a", "a", "a", "b", "b", "b", "c", "c", "d", "e", "f"]]
    # t2: single anchor, plus whitespace-trim merge (' x ' == 'x')
    rows += [("t", "https://t.example/2", " x "),
             ("t", "https://t.example/2", "x")]
    # dropped: empty/whitespace/null anchors, non-http target
    rows += [("t", "https://t.example/1", "  "),
             ("t", "https://t.example/1", None),
             ("t", "mailto:a@b.c", "mail me"),
             ("t", None, "dangling")]
    links = spark.createDataFrame(
        rows, "url string, link_url string, anchor_text string"
    )
    out = anchor_text_index(links, k=5, n_salts=4).collect()
    by_t = {}
    for r in out:
        by_t.setdefault(r["target"], []).append(r)
    t1 = sorted(by_t["https://t.example/1"], key=lambda r: r["rnk"])
    assert [(r["anchor"], r["cnt"], r["rnk"]) for r in t1] == [
        ("a", 3, 1), ("b", 3, 2), ("c", 2, 3), ("d", 1, 4), ("e", 1, 5),
    ]  # 'f' cut by k=5; tie a/b broken alphabetically
    t2 = by_t["https://t.example/2"]
    assert [(t2[0]["anchor"], t2[0]["cnt"])] == [("x", 2)]
    assert set(by_t) == {"https://t.example/1", "https://t.example/2"}

    # differential: two-phase == naive single window on random data
    import random

    rng = random.Random(7)
    big = [
        ("u", f"https://s.example/{rng.randrange(5)}",
         f"anchor-{rng.randrange(9)}")
        for _ in range(500)
    ]
    bl = spark.createDataFrame(
        big, "url string, link_url string, anchor_text string"
    )
    got = {
        (r["target"], r["anchor"], r["cnt"], r["rnk"])
        for r in anchor_text_index(bl, k=3, n_salts=4).collect()
    }
    naive = (
        bl.groupBy(
            F.col("link_url").alias("target"),
            F.col("anchor_text").alias("anchor"),
        )
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("target").orderBy(
                    F.desc("cnt"), F.asc("anchor")
                )
            ).cast("int"),
        )
        .where(F.col("rnk") <= 3)
    )
    want = {
        (r["target"], r["anchor"], r["cnt"], r["rnk"])
        for r in naive.collect()
    }
    assert got == want


# Adversarial (base url, href) corpus for the host-graph derivation
# differential: every resolution shape, scheme case, default/explicit
# ports, userinfo, IPv6, non-http schemes, degenerate hrefs, and
# missing/unschemed bases.
HOST_GRAPH_CASES = [
    ("https://h.com/a/b/x.html", "../t/p.html"),
    ("https://h.com/a/b/x.html", "/css/m.css"),
    ("https://h.com/a/b/x.html", "//other.com/q"),
    ("https://h.com/a/b/x.html", "//CDN.com:443/lib.js"),
    ("http://h.com/a/b/x.html", "//CDN.com:443/lib.js"),
    ("https://h.com/a/b/x.html", "http://abs.com/z?a=1"),
    ("https://h.com/a/b/x.html", "HTTPS://UP.COM:443/p"),
    ("https://h.com/a/b/x.html", "http://up.com:80/p"),
    ("https://h.com/a/b/x.html", "https://up.com:80/p"),
    ("https://h.com/a/b/x.html", "http://[::1]:80/x"),
    ("https://user@h.com/x", "p.html"),
    ("https://h.com:8080/a", "b.html"),
    ("HTTPS://H.com/x", "p.html"),
    ("https://h.com/a/b/x.html", ""),
    ("https://h.com/a/b/x.html", "#frag"),
    ("https://h.com/a/b/x.html", "?q=2"),
    ("https://h.com/a/b/x.html", "mailto:a@b.c"),
    ("https://h.com/a/b/x.html", "javascript:void(0)"),
    ("https://h.com/a/b/x.html", "http:relpath"),
    ("https://h.com/a/b/x.html", "weird+scheme.x:thing"),
    ("https://h.com/a/b/x.html", "a#b:c"),
    ("https://h.com/a/b/x.html", "//"),
    ("https://h.com/a/b/x.html", "///wat"),
    ("https://h.com/a/b/x.html", None),
    ("ftp://f.com/a", "x.html"),
    ("ftp://f.com/a", "https://h.com/ok"),
    ("h.com/noscheme", "a.html"),
    ("", "http://x.com/"),
    (None, "http://x.com/"),
]


def test_host_link_graph_matches_definitional_derivation(spark):
    """host_link_graph derives hosts from the RAW (url, href) columns
    (authority-only, per its docstring) so the plan never evaluates
    the staged resolve/normalize aliases. This differential pins that
    derivation to the definitional
    url_host(normalize_url(resolve_url(url, href))) + '^https?://'
    gate over the adversarial corpus, weights included."""
    from xhtml_parser_spark.functions.urls import (
        normalize_url,
        resolve_url,
        url_host,
    )
    from xhtml_parser_spark.operators.links import host_link_graph

    df = spark.createDataFrame(HOST_GRAPH_CASES, "url string, href string")
    link_url = F.when(
        F.col("href").isNotNull(),
        normalize_url(resolve_url(F.col("url"), F.col("href"))),
    )
    definitional = (
        df.select(
            url_host(F.col("url")).alias("src_host"),
            url_host(link_url).alias("dst_host"),
            link_url.alias("link_url"),
        )
        .where(F.col("link_url").rlike("^https?://"))
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("bigint").alias("weight"))
    )
    want = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in definitional.collect()
    }
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_link_graph(df).collect()
    }
    assert got == want
    # sanity: the corpus actually exercises keeps AND drops
    assert len(want) >= 8
    assert ("h.com", "other.com") in want
    assert ("h.com", "cdn.com") in want          # //-relative, :443 stripped
    assert ("h.com", "up.com") in want            # absolute, case-folded
    assert ("h.com:8080", "h.com:8080") in want   # src keeps its port


def test_anchor_index_raw_gate_matches_definitional(spark):
    """anchor_text_index gates on the raw (url, href) columns when the
    input carries them (the extract_links contract) and on link_url
    otherwise. Both gates must select the same rows: run the index
    over the same frame WITH and WITHOUT the raw columns, link_url
    computed definitionally, across the adversarial corpus."""
    from xhtml_parser_spark.functions.urls import normalize_url, resolve_url
    from xhtml_parser_spark.operators.links import anchor_text_index

    rows = [
        (u, h, f"anchor {i % 3}")
        for i, (u, h) in enumerate(HOST_GRAPH_CASES)
    ]
    # plus anchor-side drop cases on a kept link
    rows += [
        ("https://h.com/x", "kept.html", None),
        ("https://h.com/x", "kept.html", "   "),
        ("https://h.com/x", "kept.html", " padded "),
    ]
    df = spark.createDataFrame(
        rows, "url string, href string, anchor_text string"
    ).withColumn(
        "link_url",
        F.when(
            F.col("href").isNotNull(),
            normalize_url(resolve_url(F.col("url"), F.col("href"))),
        ),
    )
    key = lambda r: (r["target"], r["anchor"], r["cnt"], r["rnk"])  # noqa: E731
    with_raw = sorted(
        map(key, anchor_text_index(df, k=3, n_salts=2).collect())
    )
    without_raw = sorted(
        map(
            key,
            anchor_text_index(
                df.drop("url", "href"), k=3, n_salts=2
            ).collect(),
        )
    )
    assert with_raw == without_raw
    assert len(with_raw) >= 5  # the corpus actually keeps rows
