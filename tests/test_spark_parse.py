"""Spark end-to-end tests: pages DataFrame -> parse operators.

The byte-identity gate rides through Spark here: fixture documents go
in as (url, html) rows, and the extracted text coming back from the
mapInPandas kernel must equal the kernel's local output (which the
golden suite already proved byte-identical to the reference).
"""

from __future__ import annotations

import datetime
import pathlib

import pytest

from xhtml_parser_spark.kernel import parse_document
from xhtml_parser_spark.operators import parse_attrs, parse_nodes, parse_pages
from xhtml_parser_spark.sources import PAGES_SCHEMA, gen_page, synthesize_pages

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _fixture_pages(spark):
    rows = []
    ts = datetime.datetime(2025, 8, 8)
    for i, f in enumerate(sorted((FIXTURES / "simple_test" / "test_case").glob("*.xhtml"))):
        rows.append((f"https://fixture.test/simple_test/{f.name}", ts, f.read_bytes(), None, "en"))
    return spark.createDataFrame(rows, PAGES_SCHEMA), rows


def test_parse_pages_byte_identity(spark):
    df, rows = _fixture_pages(spark)
    got = {r["url"]: r for r in parse_pages(df).collect()}
    assert len(got) == len(rows)
    for url, _, html, _, _ in rows:
        local = parse_document(html)
        r = got[url]
        assert r["parse_ok"] is True
        assert bytes(r["text"]) == local.extracted_text()
        assert r["n_nodes"] == local.n_nodes - 1
        assert r["n_attrs"] == local.n_attrs


def test_parse_pages_error_rows(spark):
    rows = [
        ("u1", datetime.datetime(2025, 8, 8), b"<a>ok</a>", None, "en"),
        ("u2", datetime.datetime(2025, 8, 8), b"<root><child>bad", None, "en"),
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    got = {r["url"]: r for r in parse_pages(df).collect()}
    assert got["u1"]["parse_ok"] and bytes(got["u1"]["text"]) == b"ok"
    assert not got["u2"]["parse_ok"]
    assert "Unexpected end" in got["u2"]["error_msg"]


def test_parse_nodes_and_attrs(spark):
    rows = [
        (
            "u1",
            datetime.datetime(2025, 8, 8),
            b"<root a='1' b='2'><c>T</c><d/></root>",
            None,
            "en",
        )
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    nodes = sorted(parse_nodes(df).collect(), key=lambda r: r["node_id"])
    assert [(n["node_id"], n["parent_id"], n["kind"], n["tag"]) for n in nodes] == [
        (1, 0, 1, "root"),
        (2, 1, 1, "c"),
        (3, 2, 2, None),
        (4, 1, 1, "d"),
    ]
    assert bytes(nodes[2]["text"]) == b"T"
    # descendants of root (node 1) are the contiguous range 2..last_descendant
    assert nodes[0]["last_descendant"] == 4

    attrs = sorted(parse_attrs(df).collect(), key=lambda r: r["attr_idx"])
    assert [(a["node_id"], a["name"], bytes(a["value"])) for a in attrs] == [
        (1, "a", b"1"),
        (1, "b", b"2"),
    ]


def test_columnar_nodes_attrs_match_row_reference(spark):
    """The Arrow columnar kernels (packed C arrays -> vectorized span
    gathers) must match a per-node row-built reference on EVERY column,
    over the fixture corpus plus edge docs: malformed rows interleaved
    (skipped), unicode tag names, attr-free docs, multi-root siblings."""
    import datetime as dt

    from xhtml_parser_spark.kernel.extract import (
        compute_depth_and_last_descendant,
    )

    docs = [(f"f{i}", f.read_bytes()) for i, f in enumerate(
        sorted((FIXTURES / "simple_test" / "test_case").glob("*.xhtml"))
    )]
    docs += [
        ("e1", b"<root><child>dangling"),          # skipped (parse error)
        ("e2", "<résumé a='v'>t</résumé>".encode()),
        ("e3", b"<a>x</a><b>y</b>"),               # multi-root siblings
        ("e4", b"<solo/>"),                        # no attrs, no text
        ("e5", b"<a b='x &amp; y' b='dup'><c/>tail</a>"),
        # invalid-UTF-8 tag tails that CONCATENATE into a valid sequence
        # across the batch gather: the fast-path whole-buffer decode
        # passes but value boundaries split a multibyte char -- must
        # fall back to per-value errors='replace'
        ("e6", b"<a\xc3>x</a\xc3>"),
        ("e7", b"<\xa9b c\xc3='v\xff'>y</\xa9b>"),
    ]
    ts = dt.datetime(2025, 8, 8)
    df = spark.createDataFrame(
        [(u, ts, h, None, "en") for u, h in docs], PAGES_SCHEMA
    )

    want_nodes = []
    want_attrs = []
    for u, h in docs:
        doc = parse_document(h)
        if not doc.ok:
            continue
        depth, last_desc = compute_depth_and_last_descendant(doc)
        buf = doc.buf
        for i in range(1, doc.n_nodes):
            k = doc.kind[i]
            s, e = doc.loc_start[i], doc.loc_end[i]
            want_nodes.append((
                u, i, doc.parent[i], k,
                bytes(buf[s:e]).decode("utf-8", errors="replace") if k == 1 else None,
                depth[i],
                bytes(buf[s:e]) if k != 1 else None,
                s, last_desc[i], doc.attr_start[i], doc.attr_end[i],
            ))
            for a in range(doc.attr_start[i], doc.attr_end[i]):
                want_attrs.append((
                    u, i, a,
                    bytes(buf[doc.a_name_start[a]:doc.a_name_end[a]]).decode(
                        "utf-8", errors="replace"),
                    bytes(buf[doc.a_val_start[a]:doc.a_val_end[a]]),
                ))

    got_nodes = sorted(
        (r["url"], r["node_id"], r["parent_id"], r["kind"], r["tag"],
         r["depth"], None if r["text"] is None else bytes(r["text"]),
         r["span_start"], r["last_descendant"], r["attr_start"], r["attr_end"])
        for r in parse_nodes(df).collect()
    )
    assert got_nodes == sorted(want_nodes)
    got_attrs = sorted(
        (r["url"], r["node_id"], r["attr_idx"], r["name"], bytes(r["value"]))
        for r in parse_attrs(df).collect()
    )
    assert got_attrs == sorted(want_attrs)


def test_columnar_kernel_pure_fallback_matches_c(monkeypatch):
    """With the C kernel disabled, the columnar batch kernels must fall
    back to the pure-Python parser and emit identical Arrow batches
    (exercised directly -- worker processes cache the accel module, so
    an env flip through Spark would not reliably hit the fallback)."""
    import pyarrow as pa

    from xhtml_parser_spark.kernel import parser as kparser
    from xhtml_parser_spark.operators.parse import (
        _attrs_arrow_batches,
        _nodes_arrow_batches,
    )

    htmls = [
        b"<root a='1' b='2'><c>T</c><d/></root>",
        b"<bad<",
        "<u v='€'>é</u>".encode(),
    ]
    rb = pa.RecordBatch.from_arrays(
        [pa.array([f"u{i}" for i in range(len(htmls))]),
         pa.array(htmls, type=pa.binary())],
        names=["url", "html"],
    )

    def run_all(gen):
        return [b.to_pydict() for b in gen(iter([rb]))]

    with_c = (run_all(_nodes_arrow_batches), run_all(_attrs_arrow_batches))
    monkeypatch.setattr(kparser, "_get_cparser", lambda: None)
    without_c = (run_all(_nodes_arrow_batches), run_all(_attrs_arrow_batches))
    assert with_c == without_c
    assert with_c[0][0]["tag"].count(None) == 2  # one text node per doc


def test_synth_corpus_deterministic_and_parses(spark):
    df = synthesize_pages(spark, 200, max_b=8192)
    parsed = parse_pages(df)
    agg = parsed.groupBy("parse_ok").count().collect()
    counts = {r["parse_ok"]: r["count"] for r in agg}
    assert counts.get(True, 0) == 198  # 1% malformed -> 2 of 200
    assert counts.get(False, 0) == 2
    # pure function of doc_id: regeneration is identical
    a = gen_page(123, max_b=8192)
    b = gen_page(123, max_b=8192)
    assert a == b
    # host skew present: top host should hold a visible share
    hosts = (
        df.selectExpr("regexp_extract(url, 'host-([0-9]+)', 1) AS host")
        .groupBy("host")
        .count()
        .orderBy("count", ascending=False)
        .limit(1)
        .collect()
    )
    assert hosts[0]["count"] >= 10  # ~10% of 200 on the hottest host


def test_large_documents_through_pipeline(spark):
    """1 MB documents must flow through Arrow batches without blowing
    worker memory (bounded maxRecordsPerBatch) and parse correctly."""
    df = synthesize_pages(spark, 12, min_b=1 << 19, max_b=1 << 20)
    got = parse_pages(df).collect()
    ok = [r for r in got if r["parse_ok"]]
    assert len(ok) >= 10
    for r in ok:
        assert r["html_bytes"] >= (1 << 19) or r["n_nodes"] > 0
        assert len(bytes(r["text"])) > 1000


def test_python_datasource_scan_parse(spark, tmp_path):
    """The fused scan+parse Python data source must agree with the
    standard scan -> parse_pages pipeline."""
    from pyspark.sql import functions as F

    from xhtml_parser_spark.sources.parse_datasource import read_parsed

    p = str(tmp_path / "pages_ds")
    synthesize_pages(spark, 80, max_b=8192).write.parquet(p)

    via_ds = read_parsed(spark, p)
    via_op = parse_pages(spark.read.parquet(p))
    a = {r["url"]: (bytes(r["text"]), r["parse_ok"], r["n_nodes"]) for r in via_ds.collect()}
    b = {r["url"]: (bytes(r["text"]), r["parse_ok"], r["n_nodes"]) for r in via_op.collect()}
    assert a == b
    assert via_ds.count() == 80
    # projection still works through the datasource
    errs = via_ds.where(~F.col("parse_ok")).count()
    assert errs == sum(1 for v in a.values() if not v[1])


def test_python_datasource_grouped_partitions(spark, tmp_path):
    """num_partitions groups many files into few partitions without
    changing results (per-task launch overhead amortization)."""
    from xhtml_parser_spark.sources.parse_datasource import read_parsed

    p = str(tmp_path / "pages_ds_grouped")
    synthesize_pages(spark, 60, max_b=4096, partitions=12).write.parquet(p)

    grouped = read_parsed(spark, p, num_partitions=3)
    assert grouped.rdd.getNumPartitions() == 3
    a = {r["url"]: bytes(r["text"]) for r in grouped.collect()}
    b = {r["url"]: bytes(r["text"]) for r in read_parsed(spark, p).collect()}
    assert a == b and len(a) == 60
