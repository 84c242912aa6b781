"""XPath-lite node location: kernel selector semantics + the
relational operator differentially against it on real fixture docs."""

from __future__ import annotations

import datetime
import pathlib

import pytest

from xhtml_parser_spark.kernel import parse_document
from xhtml_parser_spark.kernel.document import select_path
from xhtml_parser_spark.operators.parse import parse_attrs, parse_nodes
from xhtml_parser_spark.operators.xpath import xpath_nodes
from xhtml_parser_spark.sources import PAGES_SCHEMA

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

DOC = (
    b"<html><body>"
    b"<div class='a'><p>one</p><p>two</p></div>"
    b"<div class='b'><p>three</p><span><p>deep</p></span></div>"
    b"<p>stray</p>"
    b"</body></html>"
)


def _ids(doc, path):
    return [n.idx for n in select_path(doc, path)]


def test_select_path_child_steps():
    doc = parse_document(DOC)
    assert len(_ids(doc, "html")) == 1
    assert len(_ids(doc, "html/body/div")) == 2
    assert len(_ids(doc, "html/body/div/p")) == 3  # deep p not a child
    assert len(_ids(doc, "/html/body/p")) == 1     # leading slash ok
    assert _ids(doc, "nosuch") == []


def test_select_path_descendant_and_wildcard():
    doc = parse_document(DOC)
    assert len(_ids(doc, "//p")) == 5
    assert len(_ids(doc, "html//p")) == 5
    assert len(_ids(doc, "html/body/div//p")) == 4
    assert len(_ids(doc, "html/body/*")) == 3      # div, div, p
    assert len(_ids(doc, "//div/*")) == 4          # p p p span
    # dedup across overlapping contexts: //div//p where divs nest
    nested = parse_document(b"<r><div><div><p>x</p></div></div></r>")
    assert len(_ids(nested, "//div//p")) == 1


def test_select_path_multiroot_true_subtree():
    """'html//p' on a multi-root document must not leak the sibling
    root's subtree: descendant steps use the TRUE contiguous range,
    not Node API's reference-parity root special case."""
    doc = parse_document(b"<html><p>a</p></html><extra><p>b</p></extra>")
    assert _ids(doc, "html//p") == [2]
    assert _ids(doc, "//p") == [2, 5]
    assert _ids(doc, "extra//p") == [5]


def test_select_path_positional():
    doc = parse_document(DOC)
    two = select_path(doc, "html/body/div[1]/p[2]")
    assert len(two) == 1
    assert two[0].first_child().text() == "two"
    assert _ids(doc, "html/body/div[2]/p") != []
    assert _ids(doc, "html/body/div[3]") == []
    # positional on descendant axis: first p under EACH div
    firsts = select_path(doc, "//div/p[1]")
    assert [n.first_child().text() for n in firsts] == ["one", "three"]


def test_select_path_attribute_predicates():
    doc = parse_document(DOC)
    a_ps = select_path(doc, "html/body/div[@class='a']/p")
    assert [n.first_child().text() for n in a_ps] == ["one", "two"]
    assert len(_ids(doc, "//div[@class]")) == 2
    assert len(_ids(doc, "//div[@class='b']//p")) == 2
    assert _ids(doc, "//div[@class='z']") == []
    assert len(_ids(doc, '//div[@class="b"]')) == 1  # double quotes too
    # duplicate attribute names: equality matches the FIRST-WINS value,
    # exactly get_attribute (duplicates are real here -- the
    # reference's stale-from quirk produces them)
    dup = parse_document(b"<r><p id='1' id='2'>x</p></r>")
    assert len(_ids(dup, "//p[@id='1']")) == 1
    assert _ids(dup, "//p[@id='2']") == []
    assert len(_ids(dup, "//p[@id]")) == 1
    # '/' inside a quoted predicate value is literal, not a segment
    # break (bracket-aware splitting)
    mime = parse_document(
        b'<r><script type="application/ld+json">x</script></r>'
    )
    assert len(_ids(mime, "//script[@type='application/ld+json']")) == 1
    assert len(_ids(mime, "r/script[@type='application/ld+json']")) == 1
    assert _ids(mime, "//script[@type='application/json']") == []


PATHS = [
    "html", "html/body", "html/body/*", "//p", "//a", "html//div",
    "//div/p[1]", "html/body/div[2]//p", "*/*", "//span", "//p[1]",
    "//div[@class='a']/p", "html/body/div[@class]", "//*[@class='b']//p",
    "//p[@id='1']", "//div[@nosuch]",
]


def test_relational_xpath_matches_kernel(spark):
    """xpath_nodes over parse_nodes == kernel select_path, per path,
    per fixture document."""
    rows = []
    ts = datetime.datetime(2025, 8, 8)
    for f in sorted((FIXTURES / "simple_test" / "test_case").glob("*.xhtml")):
        if f.stat().st_size > 100_000:
            continue  # keep the differential fast; big docs add no new shapes
        rows.append((f.name, ts, f.read_bytes(), None, "en"))
    rows.append(("synthetic", ts, DOC, None, "en"))
    # multi-root quirk doc: html's TRUE subtree ends before the sibling
    # root; both selectors must keep html//p out of <extra>'s subtree
    rows.append(
        ("multiroot", ts, b"<html><p>a</p></html><extra><p>b</p></extra>",
         None, "en")
    )
    # duplicate-attribute doc: relational first-wins must equal
    # get_attribute
    rows.append(("dupattr", ts, b"<r><p id='1' id='2'>x</p></r>", None, "en"))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    nodes = parse_nodes(df)
    attrs = parse_attrs(df)
    nodes.persist()
    attrs.persist()
    try:
        docs = {u: parse_document(h) for u, _, h, _, _ in rows}
        for path in PATHS:
            got = {}
            for r in (
                xpath_nodes(nodes, path, attrs)
                .select("url", "node_id")
                .collect()
            ):
                got.setdefault(r["url"], set()).add(r["node_id"])
            for u, doc in docs.items():
                want = set(n.idx for n in select_path(doc, path)) if doc.ok else set()
                assert got.get(u, set()) == want, (path, u)
    finally:
        nodes.unpersist()
        attrs.unpersist()


def test_xpath_nodes_multi_equals_per_path_runs(spark):
    """The rule-pack operator must return exactly the per-path
    xpath_nodes rows, tagged with the path, and release its shared
    caches on released_after."""
    import datetime as dt

    from xhtml_parser_spark.caching import live_persists, released_after
    from xhtml_parser_spark.operators.xpath import xpath_nodes_multi

    ts = dt.datetime(2025, 8, 8)
    rows = [
        ("synthetic", ts, DOC, None, "en"),
        ("dupattr", ts, b"<r><p id='1' id='2'>x</p></r>", None, "en"),
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    nodes, attrs = parse_nodes(df), parse_attrs(df)
    paths = ["html//p", "html/body/div[2]/p", "//div[@class='a']/p", "//a"]
    with released_after(
        xpath_nodes_multi(nodes, paths, attrs), blocking=True
    ) as multi:
        handles = live_persists(multi)
        assert handles, "shared caches must be attached"
        got = {
            (r["path"], r["url"], r["node_id"])
            for r in multi.select("path", "url", "node_id").collect()
        }
    want = set()
    for p in paths:
        for r in xpath_nodes(nodes, p, attrs).select("url", "node_id").collect():
            want.add((p, r["url"], r["node_id"]))
    assert got == want
    # handle-level check (global storage counts are unstable: the
    # ContextCleaner may GC another test's orphaned cache mid-run)
    for h in handles:
        lvl = h.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), "caches must be released"


def test_xpath_nodes_multi_empty_paths(spark):
    import datetime as dt

    from xhtml_parser_spark.operators.xpath import xpath_nodes_multi

    df = spark.createDataFrame(
        [("u", dt.datetime(2025, 8, 8), DOC, None, "en")], PAGES_SCHEMA
    )
    out = xpath_nodes_multi(parse_nodes(df), [])
    assert out.count() == 0
    assert out.columns[0] == "path"


def test_xpath_select_matches_kernel_and_nodes_table(spark):
    """The fused map-side operator == kernel select_path on (url,
    node_id) for every path in the adversarial corpus, evaluated in
    ONE pass for the whole pack; its identity columns must equal the
    exploded nodes table's rows and its ``text`` must equal the
    concatenated descendant text-node bytes of the nodes table."""
    from xhtml_parser_spark.operators.xpath import xpath_select

    rows = []
    ts = datetime.datetime(2025, 8, 8)
    for f in sorted((FIXTURES / "simple_test" / "test_case").glob("*.xhtml")):
        if f.stat().st_size > 100_000:
            continue
        rows.append((f.name, ts, f.read_bytes(), None, "en"))
    rows.append(("synthetic", ts, DOC, None, "en"))
    rows.append(
        ("multiroot", ts, b"<html><p>a</p></html><extra><p>b</p></extra>",
         None, "en")
    )
    rows.append(("dupattr", ts, b"<r><p id='1' id='2'>x</p></r>", None, "en"))
    # failed parse contributes no rows, like parse_nodes
    rows.append(("bad", ts, b"<a><b></a>", None, "en"))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    got_rows = xpath_select(df, PATHS).collect()
    docs = {u: parse_document(h) for u, _, h, _, _ in rows}

    got = {}
    for r in got_rows:
        got.setdefault(r["path"], {}).setdefault(r["url"], set()).add(
            r["node_id"]
        )
    for path in PATHS:
        for u, doc in docs.items():
            want = (
                set(n.idx for n in select_path(doc, path)) if doc.ok else set()
            )
            assert got.get(path, {}).get(u, set()) == want, (path, u)
    assert not any(r["url"] == "bad" for r in got_rows)

    # identity columns + subtree text vs the exploded nodes table
    tbl = {}
    for r in parse_nodes(df).collect():
        tbl[(r["url"], r["node_id"])] = r
    for r in got_rows:
        n = tbl[(r["url"], r["node_id"])]
        assert r["parent_id"] == n["parent_id"]
        assert r["tag"] == n["tag"]
        assert r["depth"] == n["depth"]
        assert r["last_descendant"] == n["last_descendant"]
        assert r["span_start"] == n["span_start"]
        want_text = b"".join(
            bytes(tbl[(r["url"], j)]["text"] or b"")
            for j in range(r["node_id"] + 1, r["last_descendant"] + 1)
            if tbl[(r["url"], j)]["kind"] == 2
        )
        assert bytes(r["text"]) == want_text, (r["path"], r["url"], r["node_id"])


def test_xpath_select_empty_and_unmatched(spark):
    import datetime as dt

    from xhtml_parser_spark.operators.xpath import xpath_select

    df = spark.createDataFrame(
        [("u", dt.datetime(2025, 8, 8), DOC, None, "en")], PAGES_SCHEMA
    )
    assert xpath_select(df, []).count() == 0
    assert xpath_select(df, ["nosuch/zz"]).count() == 0
    with pytest.raises(ValueError):
        xpath_select(df, ["a[@href][2]"])


def test_xpath_select_randomized_nested_differential(spark):
    """Seeded randomized differential for the fused selector's
    hairiest semantics: deep random trees with HEAVILY repeated tag
    names (so '//' positional predicates hit nested same-name
    contexts and the laminar ancestor-walk must disambiguate), random
    multi-root docs, random attribute duplication -- all paths
    evaluated in ONE pass and compared node-for-node against the
    kernel selector."""
    import random

    from xhtml_parser_spark.operators.xpath import xpath_select

    rng = random.Random(0xC0FFEE)
    tags = ["a", "b", "c"]

    def gen(depth):
        if depth == 0 or rng.random() < 0.3:
            return f"t{rng.randrange(4)}"
        return gen_elem(depth)

    def gen_elem(depth):
        t = rng.choice(tags)
        attr = ""
        if rng.random() < 0.4:
            attr = f" k='{rng.randrange(3)}'"
            if rng.random() < 0.3:
                attr += f" k='{rng.randrange(3)}'"  # duplicate name
        inner = "".join(gen(depth - 1) for _ in range(rng.randrange(1, 4)))
        return f"<{t}{attr}>{inner}</{t}>"

    docs_rows = []
    for i in range(30):
        # roots are always elements (bare top-level text is a parse
        # error; failed docs contribute no rows by contract and are
        # covered by the fixture-corpus test)
        body = gen_elem(4)
        if rng.random() < 0.25:  # multi-root sibling
            body += gen_elem(2)
        docs_rows.append((f"d{i}", datetime.datetime(2025, 8, 8),
                          body.encode(), None, "en"))
    paths = [
        "//a", "//a[1]", "//a[2]", "//b[3]", "//a//a", "//a//a[1]",
        "//a/a[2]", "a//b[2]", "//*[2]", "//a[@k]", "//a[@k='1']",
        "//b[@k='0']", "*/*[1]", "//c//a[2]", "//a//b//c",
    ]
    df = spark.createDataFrame(docs_rows, PAGES_SCHEMA)
    got = {}
    for r in xpath_select(df, paths).collect():
        got.setdefault(r["path"], {}).setdefault(r["url"], set()).add(
            r["node_id"]
        )
    docs = {u: parse_document(h) for u, _, h, _, _ in docs_rows}
    n_nonempty = 0
    for p in paths:
        for u, doc in docs.items():
            want = (
                set(n.idx for n in select_path(doc, p)) if doc.ok else set()
            )
            have = got.get(p, {}).get(u, set())
            assert have == want, (p, u)
            n_nonempty += bool(want)
    assert n_nonempty > 100  # the corpus genuinely exercises the paths


def test_xpath_select_attr_of_payload(spark):
    import datetime as dt

    from xhtml_parser_spark.operators.xpath import xpath_select

    html = (
        b"<html><body>"
        b'<a href="https://x/1" href="DUP">one</a>'
        b"<a>no-href</a>"
        b'<a href="a&amp;b">ent</a>'
        b'<link rel="alternate" href="https://feed/"/>'
        b"</body></html>"
    )
    df = spark.createDataFrame(
        [("u", dt.datetime(2025, 8, 8), html, None, "en")], PAGES_SCHEMA
    )
    out = xpath_select(
        df,
        ["//a", "//link[@rel='alternate']", "//body"],
        attr_of={"//a": "href", "//link[@rel='alternate']": "href"},
    ).collect()
    by_path = {}
    for r in out:
        by_path.setdefault(r.path, []).append(r)
    a_rows = sorted(by_path["//a"], key=lambda r: r.node_id)
    # first-wins on the duplicated href; absent -> NULL; entities decode
    assert [r.attr_value for r in a_rows] == [
        b"https://x/1",
        None,
        b"a&b",
    ]
    assert [r.text for r in a_rows] == [b"one", b"no-href", b"ent"]
    assert by_path["//link[@rel='alternate']"][0].attr_value == b"https://feed/"
    # path without a requested attribute -> NULL payload
    assert by_path["//body"][0].attr_value is None
    # attr_of key must be one of the paths
    with pytest.raises(ValueError):
        xpath_select(df, ["//a"], attr_of={"//b": "href"})
