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

from ..kernel.extract import compute_depth_and_last_descendant
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


def _parse_arrow_batches(batches):
    """mapInArrow kernel driver: zero-copy memoryview slices into the
    binary column's data buffer feed the C kernel directly -- no pandas
    Series, no per-row bytes objects on the input side. The output
    builds Arrow arrays once (one copy, unavoidable)."""
    import pyarrow as pa

    for rb in batches:
        urls = rb.column(0)
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
        html_at = _html_views(rb)
        for j in range(n):
            h = html_at(j)
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


def _html_views(rb):
    """Zero-copy per-row memoryview slices of the batch's html column
    (buffers() = [validity, int32 offsets, data]; respects the array's
    slice offset). Returns a callable j -> memoryview|bytes."""
    htmls = rb.column(1)
    bufs = htmls.buffers()
    offs = memoryview(bufs[1]).cast("i")
    databuf = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    o0 = htmls.offset
    nulls = htmls.is_null().to_pylist() if htmls.null_count else None

    def get(j):
        if nulls is not None and nulls[j]:
            return b""
        return databuf[offs[o0 + j] : offs[o0 + j + 1]]

    return get


# index map of the C kernel's result tuple (kernel/accel/_cparser.c
# py_parse Py_BuildValue order) -- the SINGLE place these positions are
# written down; _doc_packed and _full_arrow_batches both read from it
_R_OK, _R_BUF = 0, 4
_R_PARENT, _R_KIND, _R_LS, _R_LE, _R_ATS, _R_ATE = 5, 9, 10, 11, 12, 13
_R_ANS, _R_ANE, _R_AVS, _R_AVE = 14, 15, 16, 17
_R_TEXT, _R_MTEXT, _R_NTEXT, _R_MAXD = 18, 19, 20, 21
_R_DEPTH, _R_LASTD = 22, 23


def _doc_packed(cp, html, res=None):
    """One document's packed DOM as (buf, int32 arrays incl. head):
    (buf_u8, parent, kind, ls, le, depth, last_desc, at_s, at_e,
    a_ns, a_ne, a_vs, a_ve) or None when the parse failed.

    C path: ten np.frombuffer views over the kernel's packed byte
    arrays -- no per-node Python. Pure path (accel unavailable or doc
    over the i32 cap): list->ndarray conversions, still no per-node
    loop in the operator itself. ``res`` = an already-obtained
    cp.parse() tuple, so callers that need the scalar fields too parse
    exactly once."""
    import numpy as np

    if res is None:
        res = cp.parse(html) if cp is not None else None
    if res is not None:
        if not res[_R_OK]:
            return None
        i32 = np.int32
        return (
            np.frombuffer(res[_R_BUF], np.uint8),
            np.frombuffer(res[_R_PARENT], i32),
            np.frombuffer(res[_R_KIND], i32),
            np.frombuffer(res[_R_LS], i32),
            np.frombuffer(res[_R_LE], i32),
            np.frombuffer(res[_R_DEPTH], i32),
            np.frombuffer(res[_R_LASTD], i32),
            np.frombuffer(res[_R_ATS], i32),
            np.frombuffer(res[_R_ATE], i32),
            np.frombuffer(res[_R_ANS], i32),
            np.frombuffer(res[_R_ANE], i32),
            np.frombuffer(res[_R_AVS], i32),
            np.frombuffer(res[_R_AVE], i32),
        )
    doc = parse_document(bytes(html))
    if not doc.ok:
        return None
    depth, last_desc = compute_depth_and_last_descendant(doc)

    def a(v):
        return np.array(v, dtype=np.int32)

    return (
        np.frombuffer(doc.buf, np.uint8),
        a(doc.parent), a(doc.kind), a(doc.loc_start), a(doc.loc_end),
        a(depth), a(last_desc), a(doc.attr_start), a(doc.attr_end),
        a(doc.a_name_start), a(doc.a_name_end),
        a(doc.a_val_start), a(doc.a_val_end),
    )


def _gather_spans(bigbuf, starts, ends):
    """Vectorized variable-length gather: bytes of bigbuf[s:e] for each
    span, concatenated, plus int64 value offsets (len n+1)."""
    import numpy as np

    lens = (ends - starts).astype(np.int64)
    off = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    if total == 0:
        return np.empty(0, np.uint8), off
    idx = np.repeat(starts.astype(np.int64) - off[:-1], lens) + np.arange(total)
    return bigbuf[idx], off


def _binary_from_spans(pa, bigbuf, starts, ends, mask=None):
    """Arrow binary array over gathered span bytes; ``mask`` marks the
    VALID slots (None slots get zero length)."""
    import numpy as np

    if mask is not None:
        starts = np.where(mask, starts, 0)
        ends = np.where(mask, ends, 0)
    data, off = _gather_spans(bigbuf, starts, ends)
    if off[-1] > np.iinfo(np.int32).max:
        raise ValueError("batch span payload exceeds 2 GiB; lower batch size")
    buffers = [
        None if mask is None else pa.py_buffer(np.packbits(mask, bitorder="little")),
        pa.py_buffer(off.astype(np.int32)),
        pa.py_buffer(data),
    ]
    return pa.Array.from_buffers(pa.binary(), len(starts), buffers)


def _string_from_spans(pa, bigbuf, starts, ends, mask=None):
    """Arrow utf8 array over gathered span bytes. Fast path assumes the
    gathered bytes are valid UTF-8 (one strict decode proves it);
    malformed names fall back to per-value decode with errors=replace,
    matching the row-at-a-time semantics exactly."""
    import numpy as np

    if mask is not None:
        starts = np.where(mask, starts, 0)
        ends = np.where(mask, ends, 0)
    data, off = _gather_spans(bigbuf, starts, ends)
    if off[-1] > np.iinfo(np.int32).max:
        raise ValueError("batch span payload exceeds 2 GiB; lower batch size")
    raw = data.tobytes()
    # the fast path needs every VALUE to be valid UTF-8, which the
    # whole-buffer decode alone does not prove: an invalid tail of one
    # value can concatenate with the next value's head into a valid
    # sequence. Whole-buffer validity + no value boundary landing on a
    # continuation byte == every piece is individually valid.
    ok = True
    try:
        raw.decode("utf-8")
    except UnicodeDecodeError:
        ok = False
    if ok and len(data):
        inner = off[1:-1]
        b = inner[inner < off[-1]]
        if len(b) and bool(((data[b] & 0xC0) == 0x80).any()):
            ok = False
    if not ok:
        vals = [
            raw[off[i] : off[i + 1]].decode("utf-8", errors="replace")
            if (mask is None or mask[i])
            else None
            for i in range(len(starts))
        ]
        return pa.array(vals, type=pa.string())
    buffers = [
        None if mask is None else pa.py_buffer(np.packbits(mask, bitorder="little")),
        pa.py_buffer(off.astype(np.int32)),
        pa.py_buffer(data),
    ]
    return pa.Array.from_buffers(pa.utf8(), len(starts), buffers)


def _utf8_or_null_from_packed(pa, data, off):
    """Arrow utf8 array over packed span bytes (``data`` uint8,
    ``off`` int64 value offsets, len n+1) where a span that is not
    well-formed UTF-8 becomes NULL -- the ``is_valid_utf8`` +
    ``decode`` gate moved map-side, so the Spark plan never carries a
    CASE+decode expression tree per consumer (the extract_links
    round-3 regression: the guarded decode macro-expands once per
    reference through resolve_url/normalize_url). Python's strict
    decoder and Spark's UTF8String validation agree exactly (RFC 3629:
    no overlongs, no surrogates, max U+10FFFF).

    Fast paths: spans with no high byte are ASCII and valid by
    construction (one cumsum finds the suspects); only suspect spans
    pay a per-value strict decode, and the data buffer is rebuilt
    (invalid spans dropped) only when at least one span fails, keeping
    the emitted buffer wholly valid UTF-8 for downstream Arrow/JVM
    consumers."""
    import numpy as np

    n = len(off) - 1
    if off[-1] > np.iinfo(np.int32).max:
        raise ValueError("batch span payload exceeds 2 GiB; lower batch size")
    hb = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(data >= 0x80, out=hb[1:])
    suspects = np.flatnonzero(hb[off[1:]] != hb[off[:-1]])
    valid = None
    if len(suspects):
        raw = data.tobytes()
        bad = [
            i
            for i in suspects
            if not _decodes_utf8(raw[off[i] : off[i + 1]])
        ]
        if bad:
            valid = np.ones(n, dtype=bool)
            valid[bad] = False
    if valid is None:
        return pa.Array.from_buffers(
            pa.utf8(),
            n,
            [None, pa.py_buffer(off.astype(np.int32)), pa.py_buffer(data)],
        )
    lens = np.diff(off)
    data2 = data[np.repeat(valid, lens)]
    off2 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.where(valid, lens, 0), out=off2[1:])
    return pa.Array.from_buffers(
        pa.utf8(),
        n,
        [
            pa.py_buffer(np.packbits(valid, bitorder="little")),
            pa.py_buffer(off2.astype(np.int32)),
            pa.py_buffer(data2),
        ],
        null_count=int(n - int(valid.sum())),
    )


def _decodes_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def _nodes_arrow_batches(batches):
    """Columnar exploded-DOM kernel: per document, ten frombuffer views
    over the C kernel's packed arrays; per batch, one concatenate + two
    vectorized span gathers build the Arrow columns. No per-node Python
    loop anywhere (the r01 hot-path flaw for node-level analytics)."""
    import numpy as np
    import pyarrow as pa

    from ..kernel.parser import _get_cparser

    cp = _get_cparser()
    for rb in batches:
        urls = rb.column(0)
        get_html = _html_views(rb)
        doc_idx: list = []
        cols = {k: [] for k in (
            "node_id", "parent", "kind", "ls", "le", "depth", "ld",
            "at_s", "at_e", "gls", "gle",
        )}
        chunks: list = []
        base = 0
        for j in range(rb.num_rows):
            packed = _doc_packed(cp, get_html(j))
            if packed is None:
                continue
            buf, parent, kind, ls, le, depth, ld, at_s, at_e = packed[:9]
            n = len(kind)
            if n <= 1:
                continue
            doc_idx.append(np.full(n - 1, j, dtype=np.int64))
            cols["node_id"].append(np.arange(1, n, dtype=np.int32))
            cols["parent"].append(parent[1:])
            cols["kind"].append(kind[1:])
            cols["ls"].append(ls[1:])
            cols["le"].append(le[1:])
            cols["depth"].append(depth[1:])
            cols["ld"].append(ld[1:])
            cols["at_s"].append(at_s[1:])
            cols["at_e"].append(at_e[1:])
            cols["gls"].append(ls[1:].astype(np.int64) + base)
            cols["gle"].append(le[1:].astype(np.int64) + base)
            chunks.append(buf)
            base += len(buf)
        if not doc_idx:
            continue
        cat = {k: np.concatenate(v) for k, v in cols.items()}
        bigbuf = np.concatenate(chunks)
        elem = cat["kind"] == 1
        yield pa.RecordBatch.from_arrays(
            [
                urls.take(pa.array(np.concatenate(doc_idx))),
                pa.array(cat["node_id"], type=pa.int32()),
                pa.array(cat["parent"], type=pa.int32()),
                pa.array(cat["kind"].astype(np.int8), type=pa.int8()),
                _string_from_spans(pa, bigbuf, cat["gls"], cat["gle"], elem),
                pa.array(cat["depth"], type=pa.int32()),
                _binary_from_spans(pa, bigbuf, cat["gls"], cat["gle"], ~elem),
                pa.array(cat["ls"].astype(np.int64), type=pa.int64()),
                pa.array(cat["ld"], type=pa.int32()),
                pa.array(cat["at_s"], type=pa.int32()),
                pa.array(cat["at_e"], type=pa.int32()),
            ],
            names=[f.name for f in NODES_SCHEMA.fields],
        )


def parse_nodes(pages: DataFrame) -> DataFrame:
    """Exploded document-order node table: the relational form of the
    packed DOM (descendants of k = node_id BETWEEN k+1 AND
    last_descendant; children of k = parent_id = k). Map-side only;
    emitted as Arrow columns straight from the C kernel's packed
    arrays (mirrors reference all_nodes iteration,
    src/document.rs:733-811, as a columnar scan).

    Documents that fail to parse contribute NO rows here (a failed
    parse has no tree); join against parse_pages on url for the error
    class/message of the omitted documents."""
    return pages.select("url", "html").mapInArrow(_nodes_arrow_batches, NODES_SCHEMA)


def _attrs_arrow_batches(batches):
    """Columnar exploded-attribute kernel (mirrors reference attribute
    iteration, src/attribute.rs:201-293): per document the node
    ownership is one np.repeat over the packed attr-range arrays; names
    and values are vectorized span gathers."""
    import numpy as np
    import pyarrow as pa

    from ..kernel.parser import _get_cparser

    cp = _get_cparser()
    for rb in batches:
        urls = rb.column(0)
        get_html = _html_views(rb)
        doc_idx: list = []
        node_ids: list = []
        attr_idx: list = []
        spans = {k: [] for k in ("ns", "ne", "vs", "ve")}
        chunks: list = []
        base = 0
        for j in range(rb.num_rows):
            packed = _doc_packed(cp, get_html(j))
            if packed is None:
                continue
            buf, _parent, kind, _ls, _le, _d, _ld, at_s, at_e = packed[:9]
            a_ns, a_ne, a_vs, a_ve = packed[9:]
            na = len(a_ns)
            if na == 0:
                continue
            n = len(kind)
            counts = (at_e[1:] - at_s[1:]).astype(np.int64)
            node_ids.append(
                np.repeat(np.arange(1, n, dtype=np.int32), counts)
            )
            attr_idx.append(np.arange(na, dtype=np.int32))
            doc_idx.append(np.full(na, j, dtype=np.int64))
            spans["ns"].append(a_ns.astype(np.int64) + base)
            spans["ne"].append(a_ne.astype(np.int64) + base)
            spans["vs"].append(a_vs.astype(np.int64) + base)
            spans["ve"].append(a_ve.astype(np.int64) + base)
            chunks.append(buf)
            base += len(buf)
        if not doc_idx:
            continue
        bigbuf = np.concatenate(chunks)
        cat = {k: np.concatenate(v) for k, v in spans.items()}
        yield pa.RecordBatch.from_arrays(
            [
                urls.take(pa.array(np.concatenate(doc_idx))),
                pa.array(np.concatenate(node_ids), type=pa.int32()),
                pa.array(np.concatenate(attr_idx), type=pa.int32()),
                _string_from_spans(pa, bigbuf, cat["ns"], cat["ne"]),
                _binary_from_spans(pa, bigbuf, cat["vs"], cat["ve"]),
            ],
            names=[f.name for f in ATTRS_SCHEMA.fields],
        )


def parse_attrs(pages: DataFrame) -> DataFrame:
    """Exploded attribute table (duplicate names kept; first-wins
    semantics are a MIN(attr_idx) aggregation on the read side).
    Map-side only, columnar straight from the packed attr arrays.
    Failed-parse documents contribute no rows (see parse_nodes)."""
    return pages.select("url", "html").mapInArrow(_attrs_arrow_batches, ATTRS_SCHEMA)


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


def _full_arrow_batches(batches):
    """Columnar parse-once-emit-everything kernel: scalar extract
    columns exactly as _parse_arrow_batches, plus the whole DOM as
    list<struct> columns assembled from the packed arrays with the same
    vectorized span gathers as the exploded kernels -- per-doc work is
    a handful of frombuffer views, never a per-node loop."""
    import numpy as np
    import pyarrow as pa

    from ..kernel.extract import extract_main_text as _emt
    from ..kernel.parser import _decode_c_error, _get_cparser

    cp = _get_cparser()
    for rb in batches:
        urls = rb.column(0)
        get_html = _html_views(rb)
        n_rows = rb.num_rows
        texts: list = [None] * n_rows
        mains: list = [None] * n_rows
        n_nodes_c = [0] * n_rows
        n_attrs_c = [0] * n_rows
        n_text_c = [0] * n_rows
        max_d_c = [0] * n_rows
        html_bytes = [0] * n_rows
        ok_l = [False] * n_rows
        err_c: list = [None] * n_rows
        err_p: list = [None] * n_rows
        err_m: list = [None] * n_rows
        kns = [0] * n_rows

        node_counts = np.zeros(n_rows, dtype=np.int32)
        attr_counts = np.zeros(n_rows, dtype=np.int32)
        ncols = {k: [] for k in ("node_id", "parent", "kind", "ls", "le",
                                 "depth", "ld", "gls", "gle")}
        acols = {k: [] for k in ("node_id", "ns", "ne", "vs", "ve")}
        chunks: list = []
        base = 0
        for j in range(n_rows):
            h = get_html(j)
            html_bytes[j] = len(h)
            t0 = time.perf_counter_ns()
            res = cp.parse(h) if cp is not None else None
            if res is not None and not res[_R_OK]:
                kns[j] = time.perf_counter_ns() - t0
                e = _decode_c_error(res[1], res[2], res[3], res[_R_BUF])
                texts[j] = b""
                mains[j] = b""
                err_c[j], err_p[j], err_m[j] = e.error_class, e.pos, e.message
                continue
            if res is not None:
                (buf, parent, kind, ls, le, depth, ld, at_s, at_e,
                 a_ns, a_ne, a_vs, a_ve) = _doc_packed(cp, h, res)
                texts[j] = res[_R_TEXT]
                mains[j] = res[_R_MTEXT]
                n_text_c[j] = res[_R_NTEXT]
                max_d_c[j] = res[_R_MAXD]
            else:
                doc = parse_document(bytes(h))
                if not doc.ok:
                    kns[j] = time.perf_counter_ns() - t0
                    texts[j] = b""
                    mains[j] = b""
                    err_c[j] = doc.error_class
                    err_p[j] = doc.error_pos
                    err_m[j] = doc.error_msg
                    continue
                dpy, ldpy = compute_depth_and_last_descendant(doc)
                buf = np.frombuffer(doc.buf, np.uint8)
                a = lambda v: np.array(v, dtype=np.int32)  # noqa: E731
                parent, kind = a(doc.parent), a(doc.kind)
                ls, le = a(doc.loc_start), a(doc.loc_end)
                at_s, at_e = a(doc.attr_start), a(doc.attr_end)
                a_ns, a_ne = a(doc.a_name_start), a(doc.a_name_end)
                a_vs, a_ve = a(doc.a_val_start), a(doc.a_val_end)
                depth, ld = a(dpy), a(ldpy)
                texts[j] = doc.extracted_text()
                mains[j] = _emt(doc)
                n_text_c[j] = doc.n_text_nodes
                max_d_c[j] = doc.max_depth
            kns[j] = time.perf_counter_ns() - t0
            ok_l[j] = True
            n = len(kind)
            n_nodes_c[j] = n - 1
            n_attrs_c[j] = len(a_ns)
            node_counts[j] = n - 1
            attr_counts[j] = len(a_ns)
            if n > 1:
                ncols["node_id"].append(np.arange(1, n, dtype=np.int32))
                ncols["parent"].append(parent[1:])
                ncols["kind"].append(kind[1:])
                ncols["ls"].append(ls[1:])
                ncols["le"].append(le[1:])
                ncols["depth"].append(depth[1:])
                ncols["ld"].append(ld[1:])
                ncols["gls"].append(ls[1:].astype(np.int64) + base)
                ncols["gle"].append(le[1:].astype(np.int64) + base)
            if len(a_ns):
                counts = (at_e[1:] - at_s[1:]).astype(np.int64)
                acols["node_id"].append(
                    np.repeat(np.arange(1, n, dtype=np.int32), counts)
                )
                acols["ns"].append(a_ns.astype(np.int64) + base)
                acols["ne"].append(a_ne.astype(np.int64) + base)
                acols["vs"].append(a_vs.astype(np.int64) + base)
                acols["ve"].append(a_ve.astype(np.int64) + base)
            if n > 1 or len(a_ns):
                chunks.append(buf)
                base += len(buf)

        def _cat(d, k, dtype):
            return (np.concatenate(d[k]) if d[k]
                    else np.empty(0, dtype=dtype))

        bigbuf = (np.concatenate(chunks) if chunks
                  else np.empty(0, np.uint8))
        kind_all = _cat(ncols, "kind", np.int32)
        elem = kind_all == 1
        # old row semantics: text only for kind==2 (TEXT), tag for ELEMENT
        text_mask = kind_all == 2
        gls, gle = _cat(ncols, "gls", np.int64), _cat(ncols, "gle", np.int64)
        node_struct = pa.StructArray.from_arrays(
            [
                pa.array(_cat(ncols, "node_id", np.int32), type=pa.int32()),
                pa.array(_cat(ncols, "parent", np.int32), type=pa.int32()),
                pa.array(kind_all.astype(np.int8), type=pa.int8()),
                _string_from_spans(pa, bigbuf, gls, gle, elem),
                _binary_from_spans(pa, bigbuf, gls, gle, text_mask),
                pa.array(_cat(ncols, "depth", np.int32), type=pa.int32()),
                pa.array(_cat(ncols, "ls", np.int32).astype(np.int64),
                         type=pa.int64()),
                pa.array(_cat(ncols, "ld", np.int32), type=pa.int32()),
            ],
            names=["node_id", "parent_id", "kind", "tag", "text",
                   "depth", "span_start", "last_descendant"],
        )
        node_off = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(node_counts, out=node_off[1:])
        nodes_arr = pa.ListArray.from_arrays(pa.array(node_off), node_struct)
        attr_struct = pa.StructArray.from_arrays(
            [
                pa.array(_cat(acols, "node_id", np.int32), type=pa.int32()),
                _string_from_spans(pa, bigbuf, _cat(acols, "ns", np.int64),
                                   _cat(acols, "ne", np.int64)),
                _binary_from_spans(pa, bigbuf, _cat(acols, "vs", np.int64),
                                   _cat(acols, "ve", np.int64)),
            ],
            names=["node_id", "name", "value"],
        )
        attr_off = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(attr_counts, out=attr_off[1:])
        attrs_arr = pa.ListArray.from_arrays(pa.array(attr_off), attr_struct)

        yield pa.RecordBatch.from_arrays(
            [
                urls,
                pa.array(texts, type=pa.binary()),
                pa.array(mains, type=pa.binary()),
                pa.array(n_nodes_c, type=pa.int32()),
                pa.array(n_attrs_c, type=pa.int32()),
                pa.array(n_text_c, type=pa.int32()),
                pa.array(max_d_c, type=pa.int32()),
                pa.array(html_bytes, type=pa.int64()),
                pa.array(ok_l, type=pa.bool_()),
                pa.array(err_c, type=pa.string()),
                pa.array(err_p, type=pa.int64()),
                pa.array(err_m, type=pa.string()),
                pa.array(kns, type=pa.int64()),
                nodes_arr,
                attrs_arr,
            ],
            names=[f.name for f in FULL_SCHEMA.fields],
        )


def parse_full(pages: DataFrame) -> DataFrame:
    """Parse ONCE, emit everything: extracted text + stats + the whole
    DOM as nested arrays. At 100 TB this is the operator to run when
    consumers want both text and structure -- re-parsing per output
    (parse_pages + parse_nodes + parse_attrs) triples the kernel cost.
    Explode downstream: ``select(url, explode(nodes))``."""
    return pages.select("url", "html").mapInArrow(_full_arrow_batches, FULL_SCHEMA)
