"""html_tables: fused <table> extraction over the packed-DOM kernel."""

from __future__ import annotations

import pytest

from xhtml_parser_spark.operators.tables import html_tables


@pytest.fixture(scope="module")
def table_pages(spark):
    html1 = (
        b"<html><body>"
        b'<table><thead><tr><th colspan="2">A</th><th>B</th></tr></thead>'
        b"<tbody><tr><td>c<b>1</b></td><td>c2</td><td></td></tr>"
        b'<tr><td rowspan="3">d1</td><td>d2</td></tr></tbody></table>'
        b"<p>no table here</p>"
        b"<table><tr><td>t2</td></tr></table>"
        b"</body></html>"
    )
    html2 = (
        b"<html><body><table><tr><td>outer1"
        b"<table><tr><td>inner1</td></tr></table>"
        b"</td><td>outer2</td></tr></table></body></html>"
    )
    html3 = b"<html><body><p>none</p></body></html>"
    html4 = b"<html><body><table><tr><td>broken"  # parse error
    return spark.createDataFrame(
        [("u1", html1), ("u2", html2), ("u3", html3), ("u4", html4)],
        "url string, html binary",
    )


@pytest.fixture(scope="module")
def cells(table_pages):
    rows = html_tables(table_pages).collect()
    return {
        (r["url"], r["table_id"], r["row_id"], r["col_id"]): r for r in rows
    }


def test_ordinals_and_wrappers_transparent(cells):
    u1 = sorted(k for k in cells if k[0] == "u1")
    # table 0: header row (2 cells) + 3-cell row + 2-cell row; table 1: 1 cell
    assert u1 == [
        ("u1", 0, 0, 0), ("u1", 0, 0, 1),
        ("u1", 0, 1, 0), ("u1", 0, 1, 1), ("u1", 0, 1, 2),
        ("u1", 0, 2, 0), ("u1", 0, 2, 1),
        ("u1", 1, 0, 0),
    ]


def test_header_flag_and_spans(cells):
    h0 = cells[("u1", 0, 0, 0)]
    assert h0["header"] and bytes(h0["colspan_raw"]) == b"2"
    assert h0["rowspan_raw"] is None
    d1 = cells[("u1", 0, 2, 0)]
    assert not d1["header"] and bytes(d1["rowspan_raw"]) == b"3"


def test_subtree_text_and_empty_cell(cells):
    assert bytes(cells[("u1", 0, 1, 0)]["cell_text"]) == b"c1"  # nested <b>
    assert bytes(cells[("u1", 0, 1, 2)]["cell_text"]) == b""
    assert bytes(cells[("u1", 1, 0, 0)]["cell_text"]) == b"t2"


def test_nested_table_binds_innermost(cells):
    assert bytes(cells[("u2", 1, 0, 0)]["cell_text"]) == b"inner1"
    # outer cell's descendant text includes the nested table's text
    assert bytes(cells[("u2", 0, 0, 0)]["cell_text"]) == b"outer1inner1"
    assert bytes(cells[("u2", 0, 0, 1)]["cell_text"]) == b"outer2"


def test_no_table_and_parse_error_yield_nothing(cells):
    assert not any(k[0] in ("u3", "u4") for k in cells)


def _ref_tables(html: bytes):
    """Naive reference extraction via the pure-Python Node API: walk
    the DOM the obvious way and emit the same tuples html_tables
    promises. Slow and simple on purpose -- the differential anchor."""
    from xhtml_parser_spark.kernel.document import root as doc_root
    from xhtml_parser_spark.kernel.parser import ELEMENT, TEXT, parse_document_pure

    doc = parse_document_pure(html)
    if not doc.ok:
        return []
    root = doc_root(doc)
    if root is None:
        return []

    def elems(it):
        return (n for n in it if doc.kind[n.idx] == ELEMENT)

    def nearest_table(n):
        p = n.parent()
        while p is not None and p.idx != 0:
            if doc.kind[p.idx] == ELEMENT and p.tag_name() == "table":
                return p.idx
            p = p.parent()
        return None

    all_nodes = [root] + list(root.descendants())
    tables = [n.idx for n in elems(all_nodes) if n.tag_name() == "table"]
    tid = {t: i for i, t in enumerate(tables)}
    out = []
    row_counter: dict = {}
    for tr in elems(all_nodes):
        if tr.tag_name() != "tr":
            continue
        tb = nearest_table(tr)
        if tb is None:
            continue
        r = row_counter.get(tb, 0)
        row_counter[tb] = r + 1
        ci = 0
        for c in elems(tr.children()):
            tag = c.tag_name()
            if tag not in ("td", "th"):
                continue
            text = b"".join(
                d.text_bytes()
                for d in c.descendants()
                if doc.kind[d.idx] == TEXT
            )
            out.append(
                (
                    tid[tb], r, ci, tag == "th",
                    c.get_attribute("colspan"), c.get_attribute("rowspan"),
                    text,
                )
            )
            ci += 1
    return out


def _gen_table_doc(rng, max_depth=2) -> bytes:
    WORDS = ["alpha", "beta", "x1", "q"]

    def table(depth):
        wrap = rng.choice(["", "thead", "tbody", "tfoot"])
        trs = []
        for _ in range(rng.randint(0, 3)):
            cells = []
            for _ in range(rng.randint(0, 4)):
                tag = rng.choice(["td", "th"])
                attrs = ""
                if rng.random() < 0.3:
                    attrs += f' colspan="{rng.randint(1, 3)}"'
                if rng.random() < 0.2:
                    attrs += f' rowspan="{rng.randint(1, 3)}"'
                cells.append(
                    f"<{tag}{attrs}>{content(depth + 1)}</{tag}>"
                )
            trs.append("<tr>" + "".join(cells) + "</tr>")
        inner = "".join(trs)
        if wrap:
            inner = f"<{wrap}>{inner}</{wrap}>"
        return f"<table>{inner}</table>"

    def content(depth):
        parts = []
        for _ in range(rng.randint(0, 3)):
            roll = rng.random()
            if roll < 0.4:
                parts.append(rng.choice(WORDS))
            elif roll < 0.55:
                parts.append(f"<b>{rng.choice(WORDS)}</b>")
            elif roll < 0.75 and depth < max_depth:
                parts.append(table(depth))
            else:
                parts.append(f"<span>{rng.choice(WORDS)}</span>")
        return "".join(parts)

    body = content(0) + table(0) + content(0)
    return f"<html><body>{body}</body></html>".encode()


def test_randomized_differential_vs_node_api(spark):
    """html_tables' batch-global NumPy index algebra must agree with
    the obvious Node-API walk on randomized nested-table documents
    (wrappers, nested tables, header cells, span attributes), plus
    fixed adversarial cases: a tr outside any table and a td that is
    not a DIRECT child of its tr (both contribute nothing)."""
    import random

    rng = random.Random(404)
    docs = [(f"d{i}", _gen_table_doc(rng)) for i in range(40)]
    docs.append(("stray_tr", b"<html><body><tr><td>x</td></tr></body></html>"))
    docs.append(
        ("indirect_td",
         b"<html><body><table><tr><div><td>x</td></div>"
         b"<td>y</td></tr></table></body></html>")
    )
    pages = spark.createDataFrame(docs, "url string, html binary")
    got: dict = {}
    for r in html_tables(pages).collect():
        got.setdefault(r["url"], []).append(
            (
                r["table_id"], r["row_id"], r["col_id"], r["header"],
                None if r["colspan_raw"] is None else bytes(r["colspan_raw"]).decode(),
                None if r["rowspan_raw"] is None else bytes(r["rowspan_raw"]).decode(),
                bytes(r["cell_text"]),
            )
        )
    for url, html in docs:
        want = _ref_tables(html)
        assert sorted(got.get(url, [])) == sorted(want), url


def test_zero_shuffle_plan(table_pages):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        html_tables(table_pages).explain("formatted")
    assert "Exchange" not in buf.getvalue()
