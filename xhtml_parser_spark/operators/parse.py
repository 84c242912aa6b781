"""DataFrame-level parse/extract operators (north_star B5).

The entire reference parser (SURVEY.md §2 Part A) runs inside
``mapInPandas`` over Arrow batches: Spark moves (url, html) columns to
the Python worker as Arrow buffers, the kernel parses each document
against C-speed byte scans, and the results return as Arrow columns.
No per-row Python objects cross the boundary; no driver-side loops.

Three operators, all shuffle-free map-side work:

  parse_pages  -> extracted(url, text, text_main, stats, error columns)
  parse_nodes  -> exploded nodes(url, node_id, parent_id, kind, tag,
                  depth, text, span_start, last_descendant, ...) --
                  the relational form of the packed-node DOM
  parse_attrs  -> exploded attrs(url, node_id, attr_idx, name, value)

Catalyst prunes the scan to exactly (url, html) because the operators
select before mapInPandas -- check .explain() for ReadSchema.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.extract import compute_depth_and_last_descendant, extract_main_text
from ..kernel.parser import parse_document, parse_texts

PARSED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", BinaryType()),
        StructField("text_main", BinaryType()),
        StructField("n_nodes", IntegerType()),
        StructField("n_attrs", IntegerType()),
        StructField("n_text_nodes", IntegerType()),
        StructField("max_depth", IntegerType()),
        StructField("html_bytes", LongType()),
        StructField("parse_ok", BooleanType()),
        StructField("error_class", StringType()),
        StructField("error_pos", LongType()),
        StructField("error_msg", StringType()),
        StructField("kernel_ns", LongType()),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("node_id", IntegerType()),
        StructField("parent_id", IntegerType()),
        StructField("kind", ByteType()),
        StructField("tag", StringType()),
        StructField("depth", IntegerType()),
        StructField("text", BinaryType()),
        StructField("span_start", LongType()),
        StructField("last_descendant", IntegerType()),
        StructField("attr_start", IntegerType()),
        StructField("attr_end", IntegerType()),
    ]
)

ATTRS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("node_id", IntegerType()),
        StructField("attr_idx", IntegerType()),
        StructField("name", StringType()),
        StructField("value", BinaryType()),
    ]
)


def _as_bytes(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return bytes(v)  # arrow may hand back memoryview


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        n = len(urls)
        cols: dict[str, list] = {k.name: [] for k in PARSED_SCHEMA.fields}
        for j in range(n):
            html = _as_bytes(htmls[j])
            t0 = time.perf_counter_ns()
            (
                ok, text, text_main, n_nodes, n_attrs, n_text, max_depth,
                err_class, err_pos, err_msg,
            ) = parse_texts(html)
            dt = time.perf_counter_ns() - t0
            cols["url"].append(urls[j])
            cols["text"].append(text)
            cols["text_main"].append(text_main)
            cols["n_nodes"].append(n_nodes)
            cols["n_attrs"].append(n_attrs)
            cols["n_text_nodes"].append(n_text)
            cols["max_depth"].append(max_depth)
            cols["html_bytes"].append(len(html))
            cols["parse_ok"].append(ok)
            cols["error_class"].append(err_class)
            cols["error_pos"].append(err_pos)
            cols["error_msg"].append(err_msg)
            cols["kernel_ns"].append(dt)
        yield pd.DataFrame(cols)


def _parse_arrow_batches(batches):
    """mapInArrow kernel driver: zero-copy memoryview slices into the
    binary column's data buffer feed the C kernel directly -- no pandas
    Series, no per-row bytes objects on the input side. The output
    builds Arrow arrays once (one copy, unavoidable)."""
    import pyarrow as pa

    for rb in batches:
        urls = rb.column(0)
        htmls = rb.column(1)
        n = rb.num_rows
        texts: list = [None] * n
        mains: list = [None] * n
        n_nodes = [0] * n
        n_attrs = [0] * n
        n_text = [0] * n
        max_depth = [0] * n
        html_bytes = [0] * n
        ok_l = [False] * n
        err_c: list = [None] * n
        err_p: list = [None] * n
        err_m: list = [None] * n
        kns = [0] * n
        # zero-copy access to the variable-length binary payloads:
        # buffers() = [validity, int32 offsets, data]; respect the
        # array's slice offset
        bufs = htmls.buffers()
        offs = memoryview(bufs[1]).cast("i")
        databuf = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
        o0 = htmls.offset
        nulls = htmls.is_null().to_pylist() if htmls.null_count else None
        for j in range(n):
            if nulls is not None and nulls[j]:
                h: bytes | memoryview = b""
            else:
                h = databuf[offs[o0 + j] : offs[o0 + j + 1]]
            t0 = time.perf_counter_ns()
            (
                ok, text, text_main, nn, na, nt, md, ec, ep, em
            ) = parse_texts(h)
            kns[j] = time.perf_counter_ns() - t0
            texts[j] = text
            mains[j] = text_main
            n_nodes[j] = nn
            n_attrs[j] = na
            n_text[j] = nt
            max_depth[j] = md
            html_bytes[j] = len(h)
            ok_l[j] = ok
            err_c[j] = ec
            err_p[j] = ep
            err_m[j] = em
        yield pa.RecordBatch.from_arrays(
            [
                urls,
                pa.array(texts, type=pa.binary()),
                pa.array(mains, type=pa.binary()),
                pa.array(n_nodes, type=pa.int32()),
                pa.array(n_attrs, type=pa.int32()),
                pa.array(n_text, type=pa.int32()),
                pa.array(max_depth, type=pa.int32()),
                pa.array(html_bytes, type=pa.int64()),
                pa.array(ok_l, type=pa.bool_()),
                pa.array(err_c, type=pa.string()),
                pa.array(err_p, type=pa.int64()),
                pa.array(err_m, type=pa.string()),
                pa.array(kns, type=pa.int64()),
            ],
            names=[f.name for f in PARSED_SCHEMA.fields],
        )


def parse_pages(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> extracted rows. Map-side only: no shuffle.

    Equivalent of running Document::new + all_nodes() text concatenation
    per document (reference src/document.rs:74-140, 733-811), plus the
    B10 boilerplate strip, as one vectorized pass. Uses mapInArrow so
    document payloads reach the kernel as zero-copy buffer slices.
    """
    return pages.select("url", "html").mapInArrow(_parse_arrow_batches, PARSED_SCHEMA)


def _node_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        out: dict[str, list] = {k.name: [] for k in NODES_SCHEMA.fields}
        for j in range(len(urls)):
            doc = parse_document(_as_bytes(htmls[j]))
            if not doc.ok:
                continue
            depth, last_desc = compute_depth_and_last_descendant(doc)
            buf = doc.buf
            url = urls[j]
            for i in range(1, doc.n_nodes):
                k = doc.kind[i]
                s, e = doc.loc_start[i], doc.loc_end[i]
                out["url"].append(url)
                out["node_id"].append(i)
                out["parent_id"].append(doc.parent[i])
                out["kind"].append(k)
                if k == 1:  # ELEMENT
                    out["tag"].append(
                        bytes(buf[s:e]).decode("utf-8", errors="replace")
                    )
                    out["text"].append(None)
                else:
                    out["tag"].append(None)
                    out["text"].append(bytes(buf[s:e]))
                out["depth"].append(depth[i])
                out["span_start"].append(s)
                out["last_descendant"].append(last_desc[i])
                out["attr_start"].append(doc.attr_start[i])
                out["attr_end"].append(doc.attr_end[i])
        yield pd.DataFrame(out)


def parse_nodes(pages: DataFrame) -> DataFrame:
    """Exploded document-order node table: the relational form of the
    packed DOM (descendants of k = node_id BETWEEN k+1 AND
    last_descendant; children of k = parent_id = k)."""
    return pages.select("url", "html").mapInPandas(_node_batches, NODES_SCHEMA)


def _attr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        out: dict[str, list] = {k.name: [] for k in ATTRS_SCHEMA.fields}
        for j in range(len(urls)):
            doc = parse_document(_as_bytes(htmls[j]))
            if not doc.ok:
                continue
            buf = doc.buf
            url = urls[j]
            for i in range(1, doc.n_nodes):
                for a in range(doc.attr_start[i], doc.attr_end[i]):
                    out["url"].append(url)
                    out["node_id"].append(i)
                    out["attr_idx"].append(a)
                    out["name"].append(
                        bytes(buf[doc.a_name_start[a] : doc.a_name_end[a]]).decode(
                            "utf-8", errors="replace"
                        )
                    )
                    out["value"].append(
                        bytes(buf[doc.a_val_start[a] : doc.a_val_end[a]])
                    )
        yield pd.DataFrame(out)


def parse_attrs(pages: DataFrame) -> DataFrame:
    """Exploded attribute table (duplicate names kept; first-wins
    semantics are a MIN(attr_idx) aggregation on the read side)."""
    return pages.select("url", "html").mapInPandas(_attr_batches, ATTRS_SCHEMA)


FULL_SCHEMA = StructType(
    list(PARSED_SCHEMA.fields)
    + [
        StructField(
            "nodes",
            ArrayType(
                StructType(
                    [
                        StructField("node_id", IntegerType()),
                        StructField("parent_id", IntegerType()),
                        StructField("kind", ByteType()),
                        StructField("tag", StringType()),
                        StructField("text", BinaryType()),
                        StructField("depth", IntegerType()),
                        StructField("span_start", LongType()),
                        StructField("last_descendant", IntegerType()),
                    ]
                )
            ),
        ),
        StructField(
            "attrs",
            ArrayType(
                StructType(
                    [
                        StructField("node_id", IntegerType()),
                        StructField("name", StringType()),
                        StructField("value", BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def _full_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        cols: dict[str, list] = {f.name: [] for f in FULL_SCHEMA.fields}
        for j in range(len(urls)):
            html = _as_bytes(htmls[j])
            t0 = time.perf_counter_ns()
            doc = parse_document(html)
            nodes_out = []
            attrs_out = []
            if doc.ok:
                text = doc.extracted_text()
                text_main = extract_main_text(doc)
                depth, last_desc = compute_depth_and_last_descendant(doc)
                buf = doc.buf
                for i in range(1, doc.n_nodes):
                    k = doc.kind[i]
                    s, e = doc.loc_start[i], doc.loc_end[i]
                    nodes_out.append(
                        (
                            i,
                            doc.parent[i],
                            k,
                            buf[s:e].decode("utf-8", errors="replace")
                            if k == 1
                            else None,
                            bytes(buf[s:e]) if k == 2 else None,
                            depth[i],
                            s,
                            last_desc[i],
                        )
                    )
                    for a in range(doc.attr_start[i], doc.attr_end[i]):
                        attrs_out.append(
                            (
                                i,
                                buf[doc.a_name_start[a] : doc.a_name_end[a]].decode(
                                    "utf-8", errors="replace"
                                ),
                                bytes(buf[doc.a_val_start[a] : doc.a_val_end[a]]),
                            )
                        )
                stats = (doc.n_nodes - 1, doc.n_attrs, doc.n_text_nodes, doc.max_depth)
            else:
                text = b""
                text_main = b""
                stats = (0, 0, 0, 0)
            dt = time.perf_counter_ns() - t0
            cols["url"].append(urls[j])
            cols["text"].append(text)
            cols["text_main"].append(text_main)
            cols["n_nodes"].append(stats[0])
            cols["n_attrs"].append(stats[1])
            cols["n_text_nodes"].append(stats[2])
            cols["max_depth"].append(stats[3])
            cols["html_bytes"].append(len(html))
            cols["parse_ok"].append(doc.ok)
            cols["error_class"].append(doc.error_class)
            cols["error_pos"].append(doc.error_pos)
            cols["error_msg"].append(doc.error_msg)
            cols["kernel_ns"].append(dt)
            cols["nodes"].append(nodes_out)
            cols["attrs"].append(attrs_out)
        yield pd.DataFrame(cols)


def parse_full(pages: DataFrame) -> DataFrame:
    """Parse ONCE, emit everything: extracted text + stats + the whole
    DOM as nested arrays. At 100 TB this is the operator to run when
    consumers want both text and structure -- re-parsing per output
    (parse_pages + parse_nodes + parse_attrs) triples the kernel cost.
    Explode downstream: ``select(url, explode(nodes))``."""
    return pages.select("url", "html").mapInPandas(_full_batches, FULL_SCHEMA)
