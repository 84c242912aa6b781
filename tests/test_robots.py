"""robots.txt parsing + politeness filtering (operators/robots.py)."""

from __future__ import annotations

from xhtml_parser_spark.operators.robots import parse_robots, robots_filter


def _rules(spark, bodies, agent="trainbot"):
    df = spark.createDataFrame(bodies, "host string, body string")
    return parse_robots(df, agent)


def test_parse_robots_groups_and_precedence(spark):
    bodies = [
        # exact-agent group beats '*'; consecutive UA lines share rules
        ("a.com",
         "User-agent: other\nUser-agent: trainbot\nDisallow: /priv\n"
         "Allow: /priv/ok\n\nUser-agent: *\nDisallow: /\n"),
        # only '*' group applies; comments + unknown directives ignored
        ("b.com",
         "# banner\nUser-agent: *  # all\nCrawl-delay: 5\n"
         "Disallow: /x  # no x\nAllow:\n"),
        # no applicable group at all
        ("c.com", "User-agent: otherbot\nDisallow: /\n"),
        # empty body
        ("d.com", ""),
    ]
    got = {(r["host"], r["allow"], r["path"])
           for r in _rules(spark, bodies).collect()}
    assert got == {
        ("a.com", 0, "/priv"),
        ("a.com", 1, "/priv/ok"),
        ("b.com", 0, "/x"),
    }


def test_robots_filter_longest_match_and_defaults(spark):
    bodies = [
        ("a.com",
         "User-agent: trainbot\nDisallow: /p\nAllow: /p/pub\nDisallow: /p/pub/no\n"),
        # tie on length: Allow wins
        ("t.com", "User-agent: *\nDisallow: /zz\nAllow: /zz\n"),
    ]
    rules = _rules(spark, bodies)
    urls = [
        "https://a.com/p/secret",        # /p disallow
        "https://a.com/p/pub/page",      # /p/pub allow (longer)
        "https://a.com/p/pub/no/deep",   # /p/pub/no disallow (longest)
        "https://a.com/other",           # no matching rule -> allowed
        "https://a.com",                 # authority-only -> path '/'
        "https://t.com/zz/x",            # tie -> allow
        "https://norules.com/anything",  # host without robots -> allowed
    ]
    udf = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["allowed"] for r in robots_filter(udf, rules).collect()}
    assert got == {
        "https://a.com/p/secret": 0,
        "https://a.com/p/pub/page": 1,
        "https://a.com/p/pub/no/deep": 0,
        "https://a.com/other": 1,
        "https://a.com": 1,
        "https://t.com/zz/x": 1,
        "https://norules.com/anything": 1,
    }


def test_robots_matches_python_replica(spark):
    """Differential vs a direct per-host Python replica on generated
    rule/url combinations."""
    hosts = [f"h{i}.com" for i in range(12)]
    bodies = []
    for i, h in enumerate(hosts):
        parts = ["User-agent: trainbot" if i % 3 else "User-agent: *"]
        if i % 2:
            parts.append("Disallow: /a")
        if i % 4 < 2:
            parts.append("Allow: /a/b")
        if i % 5 == 0:
            parts.append("Disallow: /a/b/c")
        bodies.append((h, "\n".join(parts) + "\n"))
    paths = ["/", "/a", "/a/x", "/a/b", "/a/b/q", "/a/b/c", "/a/b/c/d", "/z"]
    urls = [f"https://{h}{p}" for h in hosts for p in paths]

    def replica(host, path):
        i = hosts.index(host)
        rules = []
        if i % 2:
            rules.append((0, "/a"))
        if i % 4 < 2:
            rules.append((1, "/a/b"))
        if i % 5 == 0:
            rules.append((0, "/a/b/c"))
        best = None
        for allow, rp in rules:
            if path.startswith(rp):
                key = (len(rp), allow)
                if best is None or key > best[0]:
                    best = (key, allow)
        return 1 if best is None else best[1]

    rules = _rules(spark, bodies)
    udf = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["allowed"] for r in robots_filter(udf, rules).collect()}
    for h in hosts:
        for p in paths:
            assert got[f"https://{h}{p}"] == replica(h, p), (h, p)


def test_robots_tabs_and_nonsplitting_unknown_directives(spark):
    bodies = [
        # RFC 9309 WS includes tabs; Crawl-delay between UA lines must
        # not split the group (Google parser behavior)
        ("tab.com",
         "User-agent:\ttrainbot\nCrawl-delay: 5\nUser-agent: alias\n"
         "Disallow:\t/private\t\nAllow: /private/ok # inline\n"),
    ]
    rules = _rules(spark, bodies)
    got = {(r["allow"], r["path"]) for r in rules.collect()}
    assert got == {(0, "/private"), (1, "/private/ok")}
    urls = spark.createDataFrame(
        [("https://tab.com/private/x",), ("https://tab.com/private/ok/y",)],
        "url string",
    )
    dec = {r["url"]: r["allowed"]
           for r in robots_filter(urls, rules).collect()}
    assert dec == {
        "https://tab.com/private/x": 0,
        "https://tab.com/private/ok/y": 1,
    }


def test_robots_filter_query_only_and_scheme_edge_urls(spark):
    bodies = [("a.com", "User-agent: *\nDisallow: /\n")]
    rules = _rules(spark, bodies)
    urls = spark.createDataFrame(
        [
            ("https://a.com?q=1",),       # query-only: path falls back to '/'
            ("HTTP2+x://a.com/p",),       # exotic scheme still parses host
            ("https://A.COM/p",),         # host lowercased like url_host
        ],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
    assert got == {
        "https://a.com?q=1": 0,
        "HTTP2+x://a.com/p": 0,
        "https://A.COM/p": 0,
    }


def test_robots_rules_match_path_plus_query(spark):
    """RFC 9309 matches path+query: 'Disallow: /search?' must block
    query-carrying search urls and leave plain /search alone."""
    bodies = [("q.com", "User-agent: *\nDisallow: /search?\nDisallow: /p\n")]
    rules = _rules(spark, bodies)
    urls = spark.createDataFrame(
        [
            ("https://q.com/search?q=x",),    # blocked by /search?
            ("https://q.com/search",),        # NOT blocked (prefix needs '?')
            ("https://q.com/p?id=1#frag",),   # query kept, fragment stripped
            ("https://q.com/other",),
        ],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
    assert got == {
        "https://q.com/search?q=x": 0,
        "https://q.com/search": 1,
        "https://q.com/p?id=1#frag": 0,
        "https://q.com/other": 1,
    }


def test_robots_sitemaps_directive(spark):
    """Sitemap: is group-independent, case-insensitive in name,
    case-preserving in value; comments/tabs strip; empty values drop."""
    from xhtml_parser_spark.operators.robots import robots_sitemaps

    body = (
        "# header\n"
        "User-agent: bot\nDisallow: /x\n"
        "SITEMAP:\thttps://A.example/One.xml  # trailing\n"
        "User-agent: other\n"
        "  sitemap: https://a.example/two.xml\n"
        "Sitemap:\n"          # empty -> dropped
        "sitemapX: nope\n"    # unknown directive -> ignored
    )
    df = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\nAllow: /\n")],
        "host string, body string",
    )
    rows = sorted(
        robots_sitemaps(df).collect(), key=lambda r: (r["host"], r["idx"])
    )
    assert [(r["host"], r["idx"], r["sitemap"]) for r in rows] == [
        ("a.example", 0, "https://A.example/One.xml"),
        ("a.example", 1, "https://a.example/two.xml"),
    ]
