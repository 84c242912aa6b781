"""page_metadata: head-metadata extraction over one parse_full pass."""

from __future__ import annotations


def _rows(spark, pages):
    from xhtml_parser_spark.operators.metadata import page_metadata

    df = spark.createDataFrame(
        [(u, bytearray(h)) for u, h in pages], "url string, html binary"
    )
    return {r["url"]: r for r in page_metadata(df).collect()}


def test_page_metadata_full_head(spark):
    out = _rows(
        spark,
        [
            (
                "u1",
                b'<html lang="fr"><head><title>He<b>llo</b> wor</title>'
                b'<base href="https://b.example/d/"/>'
                b'<link rel="canonical" href="https://c.example/1"/>'
                b'<link rel="canonical" href="https://dup.example/"/>'
                b'<meta name="description" content="  a   b  "/>'
                b'<meta property="og:title" content="OG"/>'
                b'<meta name="generator" content="x"/>'
                b"</head><body><p>t</p></body></html>",
            )
        ],
    )
    r = out["u1"]
    assert r["parse_ok"] is True
    # descendant text across the nested <b>, document order
    assert r["title"] == "Hello wor"
    assert r["lang"] == "fr"
    assert r["base_href"] == "https://b.example/d/"
    # FIRST rel=canonical wins (document order)
    assert r["canonical"] == "https://c.example/1"
    # attribute values arrive ws-normalized from the kernel (A12)
    assert r["meta_description"] == "a b"
    assert r["og_title"] == "OG"
    assert r["n_meta"] == 3


def test_page_metadata_absent_and_malformed(spark):
    out = _rows(
        spark,
        [
            ("bad", b"<root><child>Content"),  # parse failure
            ("bare", b"<d><p>no head</p></d>"),  # nothing to extract
            # empty title element: '' (present), not NULL (absent)
            ("empty", b"<d><title></title></d>"),
        ],
    )
    bad = out["bad"]
    assert bad["parse_ok"] is False
    assert all(
        bad[c] is None
        for c in (
            "title",
            "lang",
            "base_href",
            "canonical",
            "meta_description",
            "og_title",
            "n_meta",
        )
    )
    bare = out["bare"]
    assert bare["parse_ok"] is True
    assert bare["title"] is None and bare["canonical"] is None
    assert bare["n_meta"] == 0
    assert out["empty"]["title"] == ""


def test_page_metadata_hostile_bytes_and_quirks(spark):
    out = _rows(
        spark,
        [
            # invalid UTF-8 attr value -> NULL, never an ANSI decode crash
            (
                "h1",
                b'<d><meta name="description" content="\xff\xfe"/>'
                b"<title>T</title></d>",
            ),
            # rel=canonical on a NON-link element must not count;
            # duplicate attr names are first-wins per node
            (
                "h2",
                b'<d><p rel="canonical" href="https://no.example/"/>'
                b'<link rel="canonical" href="https://yes.example/"'
                b' href="https://second.example/"/></d>',
            ),
            # entity-decoded title + multi-root doc: lang off the FIRST root
            (
                "h3",
                b'<a lang="de"><title>x &amp; y</title></a><b lang="en"/>',
            ),
        ],
    )
    assert out["h1"]["meta_description"] is None
    assert out["h1"]["title"] == "T"
    assert out["h2"]["canonical"] == "https://yes.example/"
    assert out["h3"]["title"] == "x & y"
    assert out["h3"]["lang"] == "de"


def test_page_metadata_plan_is_map_side(spark):
    """One parse, no shuffle: the plan must contain zero Exchange
    operators and exactly one Python stage (the parse_full pass)."""
    from xhtml_parser_spark.operators.metadata import page_metadata

    df = spark.createDataFrame(
        [("u", bytearray(b"<d/>"))], "url string, html binary"
    )
    plan = (
        page_metadata(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("MapInArrow") == 1


def test_web_record_superpass(spark):
    """One parse -> text + main + metadata + links; fields agree with
    the dedicated operators and the plan stays a single map-side pass."""
    from xhtml_parser_spark.operators.metadata import page_metadata, web_record

    pages = spark.createDataFrame(
        [
            (
                "u1",
                bytearray(
                    b'<html lang="de"><head><title>Ti</title>'
                    b'<link rel="canonical" href="https://c.example/1"/>'
                    b"</head><body>"
                    b'<nav><a href="/m">menu</a></nav>'
                    b"<p>real body</p>"
                    b'<a href="/x?a=1&amp;2">z</a><a href="\xff\xfe">b</a>'
                    b"</body></html>"
                ),
            ),
            ("u2", bytearray(b"<root><child>Content")),
        ],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in web_record(pages).collect()}
    r = rows["u1"]
    assert (r["title"], r["lang"], r["canonical"]) == (
        "Ti", "de", "https://c.example/1")
    assert r["text_main"] == "real body"
    assert r["text"] == "Timenureal bodyzb"  # all text nodes, doc order
    # hrefs in document order; the invalid-UTF-8 href is dropped
    assert r["links"] == "https://c.example/1\n/m\n/x?a=1&2"
    assert r["n_links"] == 3
    bad = rows["u2"]
    assert bad["parse_ok"] is False and bad["title"] is None
    # metadata fields equal the dedicated operator's
    meta = {m["url"]: m for m in page_metadata(pages).collect()}
    for f in ("title", "lang", "canonical", "meta_description", "n_meta"):
        assert r[f] == meta["u1"][f], f
    # plan: ONE parse, zero shuffle
    plan = (
        web_record(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("MapInArrow") == 1
