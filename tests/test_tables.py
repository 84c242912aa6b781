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


def test_zero_shuffle_plan(table_pages):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        html_tables(table_pages).explain("formatted")
    assert "Exchange" not in buf.getvalue()
