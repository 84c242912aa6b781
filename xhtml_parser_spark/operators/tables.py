"""HTML <table> extraction: one fused Arrow pass from raw pages to
relational (url, table, row, col, cell) rows.

Tables are the densest structured payload a webtext pipeline mines
(infoboxes, spec sheets, data releases), and the reference engine's
DOM surface (children / descendants / get_attribute / Node::text,
src/node.rs) is exactly what table extraction composes; this operator
fuses that composition into the same parse+select+extract single pass
as xpath_select (operators/xpath.py) -- parse each document once,
locate table/tr/td/th with vectorized span compares over the packed
node arrays, resolve structure with index arithmetic, and gather cell
subtree text with the repeat+cumsum span gather. Zero shuffles, zero
per-node Python: the 100-TB shape for a per-document extraction.

Structure semantics (documented contract, XML-parse faithful -- the
kernel does NOT perform HTML5 tree construction, so tags nest as
written):

  * a row is any ``tr`` ELEMENT inside a ``table`` (any depth: thead/
    tbody/tfoot wrappers are transparent); its table is the NEAREST
    enclosing ``table`` (nested tables resolve to the innermost, via a
    vectorized parent-chain walk bounded by tree depth);
  * a cell is a ``td`` or ``th`` that is a DIRECT child of a row (the
    only place valid markup puts one);
  * ``table_id`` / ``row_id`` / ``col_id`` are 0-based DOCUMENT-ORDER
    ordinals (table within document, row within its table, cell within
    its row). They are occurrence positions, NOT resolved grid
    coordinates: colspan/rowspan occupancy expansion is a downstream
    concern, and the raw first-wins attribute values ride along in
    ``colspan_raw``/``rowspan_raw`` (NULL when absent) so a grid
    resolver has what it needs;
  * ``header`` is True for ``th`` cells;
  * ``cell_text`` is the concatenated descendant text bytes (the
    Node::text analogue, reference src/node.rs:214-253) -- nested
    markup inside a cell contributes its text in document order.

Documents that fail to parse contribute no rows; a table with no rows
(or a row with no direct td/th children) contributes none either --
only cells materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    BinaryType,
    StringType,
    StructField,
    StructType,
)

HTML_TABLES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("table_id", IntegerType()),
        StructField("row_id", IntegerType()),
        StructField("col_id", IntegerType()),
        StructField("header", BooleanType()),
        StructField("colspan_raw", BinaryType()),
        StructField("rowspan_raw", BinaryType()),
        StructField("cell_text", BinaryType()),
    ]
)


def _tables_arrow_batches():
    """mapInArrow generator: parse every document once (packed-array
    kernel), then resolve the whole batch's table structure with NumPy
    index algebra -- no per-node Python, no shuffle."""
    from ..kernel.parser import ELEMENT, HEAD, TEXT
    from .xpath import _span_eq_mask

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        from ..kernel.parser import _get_cparser
        from .parse import (
            _binary_from_spans,
            _doc_packed,
            _gather_spans,
            _html_views,
        )

        cp = _get_cparser()
        i64 = np.int64

        def seg_rank(keys):
            # 0-based rank within group; input positions ascend in
            # document order, so a stable argsort by key keeps that
            # order inside each group and the rank IS the DOM ordinal
            order = np.argsort(keys, kind="stable")
            ks = keys[order]
            newg = np.r_[True, ks[1:] != ks[:-1]] if len(ks) else np.empty(0, bool)
            starts = np.flatnonzero(newg)
            gid = np.cumsum(newg) - 1
            ranks = np.arange(len(ks), dtype=i64) - starts[gid]
            out = np.empty(len(ks), dtype=i64)
            out[order] = ranks
            return out

        for rb in batches:
            if rb.num_rows == 0:
                continue
            urls = rb.column(0)
            get_html = _html_views(rb)
            cols = {k: [] for k in ("parent", "kind", "ls", "le", "ld")}
            doc_idx: list = []
            an_node: list = []
            a_sp = {k: [] for k in ("ns", "ne", "vs", "ve")}
            chunks: list = []
            nbase = 0
            bbase = 0
            for j in range(rb.num_rows):
                packed = _doc_packed(cp, get_html(j))
                if packed is None:
                    continue
                buf, parent, kind, ls, le, _depth, ld, at_s, at_e = packed[:9]
                a_ns, a_ne, a_vs, a_ve = packed[9:]
                n = len(kind)
                if n <= 1:
                    continue
                doc_idx.append(np.full(n, j, dtype=i64))
                cols["parent"].append(parent.astype(i64) + nbase)
                cols["kind"].append(kind)
                cols["ls"].append(ls.astype(i64) + bbase)
                cols["le"].append(le.astype(i64) + bbase)
                cols["ld"].append(ld.astype(i64) + nbase)
                counts = (at_e[1:] - at_s[1:]).astype(i64)
                if counts.sum():
                    an_node.append(
                        np.repeat(np.arange(1, n, dtype=i64) + nbase, counts)
                    )
                    a_sp["ns"].append(a_ns.astype(i64) + bbase)
                    a_sp["ne"].append(a_ne.astype(i64) + bbase)
                    a_sp["vs"].append(a_vs.astype(i64) + bbase)
                    a_sp["ve"].append(a_ve.astype(i64) + bbase)
                chunks.append(buf)
                nbase += n
                bbase += len(buf)
            if nbase == 0:
                continue
            N = nbase
            bigbuf = np.concatenate(chunks)
            doc_of = np.concatenate(doc_idx)
            parent_g = np.concatenate(cols["parent"])
            kind_g = np.concatenate(cols["kind"])
            ls_g = np.concatenate(cols["ls"])
            le_g = np.concatenate(cols["le"])
            ld_g = np.concatenate(cols["ld"])
            if an_node:
                attr_node = np.concatenate(an_node)
                a_g = {k: np.concatenate(v) for k, v in a_sp.items()}
            else:
                attr_node = np.empty(0, i64)
                a_g = {k: np.empty(0, i64) for k in a_sp}

            elem = kind_g == ELEMENT
            tbl = _span_eq_mask(bigbuf, ls_g, le_g, b"table", elem)
            trm = _span_eq_mask(bigbuf, ls_g, le_g, b"tr", elem)
            cellm = _span_eq_mask(bigbuf, ls_g, le_g, b"td", elem)
            thm = _span_eq_mask(bigbuf, ls_g, le_g, b"th", elem)
            cellm |= thm
            tr_g = np.flatnonzero(trm)
            if not tr_g.size:
                continue

            # nearest enclosing table per tr: parent-chain walk, all
            # trs advance one hop per iteration (bounded by tree depth)
            table_of = np.full(len(tr_g), -1, dtype=i64)
            cur = parent_g[tr_g].copy()
            active = np.arange(len(tr_g))
            while active.size:
                c = cur[active]
                hit = tbl[c]
                table_of[active[hit]] = c[hit]
                stop = hit | (kind_g[c] == HEAD)
                cont = active[~stop]
                cur[cont] = parent_g[cur[cont]]
                active = cont
            table_of_node = np.full(N, -1, dtype=i64)
            table_of_node[tr_g] = table_of

            cell_g = np.flatnonzero(cellm)
            par = parent_g[cell_g]
            keep = trm[par] & (table_of_node[par] >= 0)
            cell_g = cell_g[keep]
            if not cell_g.size:
                continue
            par = par[keep]

            # ordinals, all document-order (gids ascend in DOM order)
            tbl_gids = np.flatnonzero(tbl)
            table_ord_of = np.full(N, -1, dtype=i64)
            table_ord_of[tbl_gids] = seg_rank(doc_of[tbl_gids])
            kept_tr = tr_g[table_of >= 0]
            row_ord_of = np.full(N, -1, dtype=i64)
            row_ord_of[kept_tr] = seg_rank(table_of[table_of >= 0])
            col_ord = seg_rank(par)

            # subtree text per cell (same two-searchsorted gather as
            # xpath_select)
            t_gids = np.flatnonzero(kind_g == TEXT)
            t_ls, t_le = ls_g[t_gids], le_g[t_gids]
            t_cum = np.zeros(len(t_gids) + 1, dtype=i64)
            np.cumsum(t_le - t_ls, out=t_cum[1:])
            i0 = np.searchsorted(t_gids, cell_g, side="right")
            i1 = np.searchsorted(t_gids, ld_g[cell_g], side="right")
            counts = (i1 - i0).astype(i64)
            total = int(counts.sum())
            row_off = np.zeros(len(cell_g) + 1, dtype=i64)
            np.cumsum(t_cum[i1] - t_cum[i0], out=row_off[1:])
            if row_off[-1] > np.iinfo(np.int32).max:
                raise ValueError(
                    "batch text payload exceeds 2 GiB; lower batch size"
                )
            cnt_off = np.zeros(len(cell_g), dtype=i64)
            np.cumsum(counts[:-1], out=cnt_off[1:])
            span_idx = np.repeat(i0, counts) + (
                np.arange(total) - np.repeat(cnt_off, counts)
            )
            data, _ = _gather_spans(bigbuf, t_ls[span_idx], t_le[span_idx])
            text_arr = pa.Array.from_buffers(
                pa.binary(),
                len(cell_g),
                [None, pa.py_buffer(row_off.astype(np.int32)), pa.py_buffer(data)],
            )

            # first-wins colspan/rowspan values on the kept cells
            def attr_spans(name):
                nm = _span_eq_mask(bigbuf, a_g["ns"], a_g["ne"], name)
                sel_a = np.flatnonzero(nm)
                uniq, fidx = np.unique(attr_node[sel_a], return_index=True)
                fa = sel_a[fidx]
                val_s = np.full(len(cell_g), -1, dtype=i64)
                val_e = np.full(len(cell_g), -1, dtype=i64)
                if len(uniq):
                    pos = np.searchsorted(uniq, cell_g)
                    pos_c = np.minimum(pos, len(uniq) - 1)
                    ok = (pos < len(uniq)) & (uniq[pos_c] == cell_g)
                    val_s[ok] = a_g["vs"][fa[pos_c[ok]]]
                    val_e[ok] = a_g["ve"][fa[pos_c[ok]]]
                return _binary_from_spans(
                    pa, bigbuf, val_s, val_e, mask=val_s >= 0
                )

            yield pa.RecordBatch.from_arrays(
                [
                    urls.take(pa.array(doc_of[cell_g])),
                    pa.array(table_ord_of[table_of_node[par]].astype(np.int32)),
                    pa.array(row_ord_of[par].astype(np.int32)),
                    pa.array(col_ord.astype(np.int32)),
                    pa.array(thm[cell_g]),
                    attr_spans(b"colspan"),
                    attr_spans(b"rowspan"),
                    text_arr,
                ],
                names=[f.name for f in HTML_TABLES_SCHEMA.fields],
            )

    return gen


def html_tables(pages: DataFrame) -> DataFrame:
    """Extract every table cell of every page: one row per (url,
    table_id, row_id, col_id) with header flag, raw colspan/rowspan
    attribute values, and the cell's descendant text bytes. See the
    module docstring for the structure contract. One map-side Arrow
    pass over (url, html); zero shuffles."""
    return pages.select("url", "html").mapInArrow(
        _tables_arrow_batches(), HTML_TABLES_SCHEMA
    )
