"""Relational XPath-lite over the exploded nodes table (north_star
"XPath-lite node location", Spark-first form).

The kernel-side selector (kernel/document.py::select_path) walks one
in-memory document; this operator runs the SAME path semantics over
the ``parse_nodes`` table as pure DataFrame algebra, so path queries
distribute across 10^12 documents:

  * child step      -> equi-join nodes.parent_id = ctx.node_id
  * ``//`` step     -> RANGE join on the contiguous descendant
                       invariant: ctx.node_id < node_id <=
                       ctx.last_descendant (reference
                       src/document.rs:539-583) -- no recursion, no
                       per-document work
  * ``[k]``         -> row_number over (url, context node) in document
                       order, exactly the kernel's per-context 1-based
                       position
  * node-set union  -> dropDuplicates per step, like XPath

Every join carries the url key, so with the nodes table hash- or
range-partitioned by url the steps are co-partitioned shuffles; the
nodes input is consumed once per path segment -- persist it when
running many paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..kernel.document import _path_segments


def xpath_nodes(
    nodes: DataFrame, path: str, attrs: DataFrame | None = None
) -> DataFrame:
    """All node rows matching an ``a/b//c[2]``-style path, per url.

    ``nodes`` must have the parse_nodes schema (url, node_id,
    parent_id, kind, tag, last_descendant, ...). Attribute predicates
    (``div[@id]``, ``div[@class='x']``) additionally need ``attrs``
    with the parse_attrs schema (url, node_id, attr_idx, name, value);
    equality matches the FIRST-WINS value among duplicate attribute
    names (min attr_idx), exactly Node.get_attribute -- duplicates are
    real here because the reference's stale-from quirk produces them.
    Each predicate is one broadcast-able semi-join keyed on
    (url, node_id). Returns the matching rows with their full columns;
    differentially tested against the kernel selector on the fixture
    corpus.
    """
    segs = _path_segments(path)
    if not segs:
        return nodes.limit(0)
    if any(s[3] is not None for s in segs) and attrs is None:
        raise ValueError(
            "path uses an attribute predicate; pass the parse_attrs table"
        )
    ctx = None
    for step, (axis, name, idx, attr) in enumerate(segs):
        n = nodes.alias("n")
        if step == 0:
            # first step runs off the per-document head directly -- no
            # seed table, so the nodes input is consumed exactly once
            # per segment (a select('url').distinct() seed would add a
            # full scan + aggregate of the exploded table per path)
            if axis == "child":
                m = n.where(F.col("n.parent_id") == 0)
            else:
                m = n  # every node descends from the head
            ctx_key = F.lit(0)
        else:
            c = ctx.alias("c")
            if axis == "child":
                m = n.join(
                    c,
                    (F.col("n.url") == F.col("c.url"))
                    & (F.col("n.parent_id") == F.col("c.ctx_id")),
                )
            else:
                m = n.join(
                    c,
                    (F.col("n.url") == F.col("c.url"))
                    & (F.col("n.node_id") > F.col("c.ctx_id"))
                    & (F.col("n.node_id") <= F.col("c.ctx_last")),
                )
            ctx_key = F.col("c.ctx_id")
        m = m.where(F.col("n.kind") == 1)
        if name != "*":
            m = m.where(F.col("n.tag") == name)
        if attr is not None:
            k, v = attr
            named = attrs.where(F.col("name") == k)
            if v is None:
                sel = named.select("url", "node_id").distinct()
            else:
                # first-wins among duplicate names = value at min attr_idx
                sel = (
                    named.groupBy("url", "node_id")
                    .agg(F.min_by("value", "attr_idx").alias("value"))
                    .where(F.col("value") == v)
                    .select("url", "node_id")
                )
            m = m.join(
                sel.alias("a"),
                (F.col("n.url") == F.col("a.url"))
                & (F.col("n.node_id") == F.col("a.node_id")),
                "left_semi",
            )
        if idx is not None:
            w = Window.partitionBy(F.col("n.url"), ctx_key).orderBy(
                F.col("n.node_id")
            )
            m = m.withColumn("_rn", F.row_number().over(w)).where(
                F.col("_rn") == F.lit(idx)
            )
        ctx = m.select(
            F.col("n.url").alias("url"),
            F.col("n.node_id").alias("ctx_id"),
            F.col("n.last_descendant").alias("ctx_last"),
        ).dropDuplicates(["url", "ctx_id"])
    return nodes.join(
        ctx.select("url", F.col("ctx_id").alias("node_id")),
        ["url", "node_id"],
    )


def xpath_nodes_multi(
    nodes: DataFrame,
    paths: list[str],
    attrs: DataFrame | None = None,
    persist: bool = True,
) -> DataFrame:
    """Run a rule PACK of paths over one shared nodes scan: the union
    of ``xpath_nodes(nodes, p)`` for every p in ``paths``, each row
    tagged with its ``path``.

    Real extraction users run dozens of paths per document class
    (the per-doc analogue is the reference's navigation API,
    src/node.rs:575-668 -- one parsed tree, many selector walks).
    Calling xpath_nodes per path re-reads the nodes input once per
    SEGMENT, and when ``nodes`` is an unpersisted parse_nodes plan
    that means re-parsing the corpus segment*path times. Here the
    nodes table (and attrs, when any path carries an attribute
    predicate) is persisted once, so every segment join of every path
    is an InMemoryTableScan of the same cache -- the corpus is parsed
    exactly once however many paths the pack has
    (tests/test_plans.py asserts the plan shape).

    The caches stay live behind the returned DataFrame; handles are
    attached, release with ``caching.released_after(df)``.
    """
    if not paths:
        return nodes.limit(0).select(F.lit("").alias("path"), "*")
    from ..caching import attach_persists

    cached: list[DataFrame] = []
    if persist:
        nodes = nodes.persist()
        cached.append(nodes)
        if attrs is not None and any(
            s[3] is not None for p in paths for s in _path_segments(p)
        ):
            attrs = attrs.persist()
            cached.append(attrs)
    parts = [
        xpath_nodes(nodes, p, attrs).select(F.lit(p).alias("path"), "*")
        for p in paths
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return attach_persists(out, *cached)


XPATH_SELECT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("path", StringType()),
        StructField("node_id", IntegerType()),
        StructField("parent_id", IntegerType()),
        StructField("tag", StringType()),
        StructField("depth", IntegerType()),
        StructField("last_descendant", IntegerType()),
        StructField("span_start", LongType()),
        StructField("text", BinaryType()),
        StructField("attr_value", BinaryType()),
    ]
)


def _span_eq_mask(bigbuf, starts, ends, needle, cand=None):
    """Boolean mask (over the span arrays) of spans byte-equal to
    ``needle``: length compare first, then one windowed 2-D gather
    over the survivors -- vectorized, never per-span Python."""
    import numpy as np

    m = (ends - starts) == len(needle)
    if cand is not None:
        m = m & cand
    if len(needle) == 0:
        return m
    idxs = np.flatnonzero(m)
    if idxs.size == 0:
        return m
    nb = np.frombuffer(needle, np.uint8)
    win = bigbuf[starts[idxs][:, None] + np.arange(len(needle))]
    ok = (win == nb).all(axis=1)
    out = np.zeros(len(starts), dtype=bool)
    out[idxs[ok]] = True
    return out


def _select_arrow_batches_factory(paths, attr_of=None):
    """mapInArrow generator for xpath_select: per batch, parse every
    document once (same packed-array kernel as parse_nodes), then
    evaluate the whole rule pack with vectorized NumPy set algebra
    over the batch-global arrays -- child steps are one mask gather
    through the parent array, '//' steps one diff-array coverage
    cumsum over the laminar descendant ranges, predicates windowed
    byte compares, positional predicates a grouped rank (child axis)
    or a vectorized ancestor-chain walk bounded by tree depth
    (descendant axis). Zero shuffles, zero per-node Python."""
    from ..kernel.document import _path_segments
    from ..kernel.parser import ELEMENT, HEAD, TEXT

    segs_per_path = [(p, _path_segments(p)) for p in paths]
    attr_req = [(attr_of or {}).get(p) for p in paths]

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        from ..kernel.parser import _get_cparser
        from .parse import (
            _binary_from_spans,
            _doc_packed,
            _gather_spans,
            _html_views,
            _string_from_spans,
        )

        cp = _get_cparser()
        i64 = np.int64
        for rb in batches:
            if rb.num_rows == 0:
                continue
            urls = rb.column(0)
            get_html = _html_views(rb)
            cols = {
                k: []
                for k in ("parent", "kind", "ls", "le", "depth", "ld")
            }
            doc_idx: list = []
            nb_l: list = []      # per-node doc node-base (head gid)
            bb_l: list = []      # per-node doc buffer base
            dend_l: list = []    # per-node doc node-range END (exclusive)
            an_node: list = []   # per-attr owning node gid
            a_sp = {k: [] for k in ("ns", "ne", "vs", "ve")}
            chunks: list = []
            nbase = 0
            bbase = 0
            for j in range(rb.num_rows):
                packed = _doc_packed(cp, get_html(j))
                if packed is None:
                    continue
                buf, parent, kind, ls, le, depth, ld, at_s, at_e = packed[:9]
                a_ns, a_ne, a_vs, a_ve = packed[9:]
                n = len(kind)
                if n <= 1:
                    continue
                doc_idx.append(np.full(n, j, dtype=i64))
                cols["parent"].append(parent.astype(i64) + nbase)
                cols["kind"].append(kind)
                cols["ls"].append(ls.astype(i64) + bbase)
                cols["le"].append(le.astype(i64) + bbase)
                cols["depth"].append(depth)
                cols["ld"].append(ld.astype(i64) + nbase)
                nb_l.append(np.full(n, nbase, dtype=i64))
                bb_l.append(np.full(n, bbase, dtype=i64))
                dend_l.append(np.full(n, nbase + n, dtype=i64))
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
            depth_g = np.concatenate(cols["depth"])
            ld_g = np.concatenate(cols["ld"])
            nb_g = np.concatenate(nb_l)
            bb_g = np.concatenate(bb_l)
            dend_g = np.concatenate(dend_l)
            if an_node:
                attr_node = np.concatenate(an_node)
                a_g = {k: np.concatenate(v) for k, v in a_sp.items()}
            else:
                attr_node = np.empty(0, i64)
                a_g = {k: np.empty(0, i64) for k in a_sp}
            elem = kind_g == ELEMENT
            head_gids = np.flatnonzero(kind_g == HEAD)
            # text-node prefetch for subtree-text assembly
            t_gids = np.flatnonzero(kind_g == TEXT)
            t_ls, t_le = ls_g[t_gids], le_g[t_gids]
            t_cum = np.zeros(len(t_gids) + 1, dtype=i64)
            np.cumsum(t_le - t_ls, out=t_cum[1:])

            tag_cache: dict = {}
            attr_cache: dict = {}

            def tag_mask(name):
                if name not in tag_cache:
                    if name == "*":
                        tag_cache[name] = elem
                    else:
                        tag_cache[name] = _span_eq_mask(
                            bigbuf, ls_g, le_g, name.encode(), elem
                        )
                return tag_cache[name]

            def attr_mask(attr):
                if attr not in attr_cache:
                    k, v = attr
                    nm = _span_eq_mask(
                        bigbuf, a_g["ns"], a_g["ne"], k.encode()
                    )
                    out = np.zeros(N, dtype=bool)
                    if v is None:
                        out[attr_node[nm]] = True
                    else:
                        # first-wins among duplicate names: attrs are
                        # globally ordered by (node, attr_idx), so the
                        # first occurrence per node IS min(attr_idx)
                        sel_a = np.flatnonzero(nm)
                        uniq, fidx = np.unique(
                            attr_node[sel_a], return_index=True
                        )
                        fa = sel_a[fidx]
                        vm = _span_eq_mask(
                            bigbuf, a_g["vs"][fa], a_g["ve"][fa], v.encode()
                        )
                        out[uniq[vm]] = True
                    attr_cache[attr] = out
                return attr_cache[attr]

            sel_chunks: list = []
            path_ids: list = []
            for pi, (_path, segs) in enumerate(segs_per_path):
                ctx = head_gids
                for axis, name, idx, attr in segs:
                    cand = tag_mask(name)
                    if axis == "child":
                        in_ctx = np.zeros(N, dtype=bool)
                        in_ctx[ctx] = True
                        matched = cand & in_ctx[parent_g]
                    else:
                        delta = np.zeros(N + 1, dtype=i64)
                        hc = ctx[kind_g[ctx] == HEAD]
                        rc = ctx[kind_g[ctx] != HEAD]
                        np.add.at(delta, rc + 1, 1)
                        np.add.at(delta, ld_g[rc] + 1, -1)
                        np.add.at(delta, hc + 1, 1)
                        np.add.at(delta, dend_g[hc], -1)
                        covered = np.cumsum(delta)[:N] > 0
                        matched = cand & covered
                    if attr is not None:
                        matched = matched & attr_mask(attr)
                    if idx is not None:
                        m = np.flatnonzero(matched)
                        pre = matched
                        matched = np.zeros(N, dtype=bool)
                        if axis == "child":
                            # rank among same-parent matches, document
                            # order (stable sort keeps gid order)
                            p = parent_g[m]
                            order = np.argsort(p, kind="stable")
                            ps = p[order]
                            newg = np.r_[True, ps[1:] != ps[:-1]]
                            starts = np.flatnonzero(newg)
                            gid_of = np.cumsum(newg) - 1
                            ranks = np.arange(len(ps)) - starts[gid_of]
                            matched[m[order[ranks == idx - 1]]] = True
                        elif m.size:
                            # position of g within covering ctx c =
                            # #matched in (c, g] = Pm[g]-Pm[c] (ranges
                            # are laminar subtrees, so covering ctxs
                            # are exactly g's ancestors); walk the
                            # ancestor chain vectorized, pruning once
                            # Pm[c] drops below the target (Pm only
                            # shrinks further up)
                            Pm = np.cumsum(pre, dtype=i64)
                            in_ctx = np.zeros(N, dtype=bool)
                            in_ctx[ctx] = True
                            target = Pm[m] - idx
                            cur = parent_g[m].copy()
                            res = np.zeros(len(m), dtype=bool)
                            active = np.arange(len(m))
                            while active.size:
                                c = cur[active]
                                pmc = Pm[c]
                                hit = in_ctx[c] & (pmc == target[active])
                                res[active[hit]] = True
                                stop = (
                                    hit
                                    | (pmc < target[active])
                                    | (kind_g[c] == HEAD)
                                )
                                cont = active[~stop]
                                cur[cont] = parent_g[cur[cont]]
                                active = cont
                            matched[m[res]] = True
                    ctx = np.flatnonzero(matched)
                    if ctx.size == 0:
                        break
                if ctx.size:
                    sel_chunks.append(ctx)
                    path_ids.append(np.full(len(ctx), pi, dtype=i64))
            if not sel_chunks:
                continue
            sel = np.concatenate(sel_chunks)
            pids = np.concatenate(path_ids)
            # subtree text: every text node in (g, last_descendant(g)],
            # located by two searchsorted calls, gathered by the
            # repeat+cumsum span gather (the anchor-text pattern)
            i0 = np.searchsorted(t_gids, sel, side="right")
            i1 = np.searchsorted(t_gids, ld_g[sel], side="right")
            counts = (i1 - i0).astype(i64)
            total = int(counts.sum())
            row_off = np.zeros(len(sel) + 1, dtype=i64)
            np.cumsum(t_cum[i1] - t_cum[i0], out=row_off[1:])
            if row_off[-1] > np.iinfo(np.int32).max:
                raise ValueError(
                    "batch text payload exceeds 2 GiB; lower batch size"
                )
            cnt_off = np.zeros(len(sel), dtype=i64)
            np.cumsum(counts[:-1], out=cnt_off[1:])
            span_idx = np.repeat(i0, counts) + (
                np.arange(total) - np.repeat(cnt_off, counts)
            )
            data, _ = _gather_spans(bigbuf, t_ls[span_idx], t_le[span_idx])
            text_arr = pa.Array.from_buffers(
                pa.binary(),
                len(sel),
                [
                    None,
                    pa.py_buffer(row_off.astype(np.int32)),
                    pa.py_buffer(data),
                ],
            )
            # per-match attribute payload (attr_of): first-wins value
            # of the requested attribute on each matched node, NULL
            # when absent / not requested for the row's path.  The
            # first-wins scan is the same global-(node, attr_idx)-order
            # np.unique trick attr_mask uses; (uniq, fa) is cached per
            # attribute name so several paths requesting the same
            # attribute pay one scan.
            if any(attr_req):
                val_s = np.full(len(sel), -1, dtype=i64)
                val_e = np.full(len(sel), -1, dtype=i64)
                first_cache: dict = {}
                for pi, aname in enumerate(attr_req):
                    if aname is None:
                        continue
                    rows = np.flatnonzero(pids == pi)
                    if not rows.size:
                        continue
                    if aname not in first_cache:
                        nm = _span_eq_mask(
                            bigbuf, a_g["ns"], a_g["ne"], aname.encode()
                        )
                        sel_a = np.flatnonzero(nm)
                        uniq, fidx = np.unique(
                            attr_node[sel_a], return_index=True
                        )
                        first_cache[aname] = (uniq, sel_a[fidx])
                    uniq, fa = first_cache[aname]
                    pos = np.searchsorted(uniq, sel[rows])
                    pos_c = np.minimum(pos, max(len(uniq) - 1, 0))
                    ok = (
                        (pos < len(uniq)) & (uniq[pos_c] == sel[rows])
                        if len(uniq)
                        else np.zeros(len(rows), dtype=bool)
                    )
                    rr = rows[ok]
                    val_s[rr] = a_g["vs"][fa[pos_c[ok]]]
                    val_e[rr] = a_g["ve"][fa[pos_c[ok]]]
                attr_arr = _binary_from_spans(
                    pa, bigbuf, val_s, val_e, mask=val_s >= 0
                )
            else:
                attr_arr = pa.nulls(len(sel), pa.binary())
            path_strs = np.array(paths, dtype=object)[pids]
            yield pa.RecordBatch.from_arrays(
                [
                    urls.take(pa.array(doc_of[sel])),
                    pa.array(path_strs, type=pa.string()),
                    pa.array((sel - nb_g[sel]).astype(np.int32)),
                    pa.array(
                        (parent_g[sel] - nb_g[sel]).astype(np.int32)
                    ),
                    _string_from_spans(pa, bigbuf, ls_g[sel], le_g[sel]),
                    pa.array(depth_g[sel].astype(np.int32)),
                    pa.array((ld_g[sel] - nb_g[sel]).astype(np.int32)),
                    pa.array(ls_g[sel] - bb_g[sel], type=pa.int64()),
                    text_arr,
                    attr_arr,
                ],
                names=[f.name for f in XPATH_SELECT_SCHEMA.fields],
            )

    return gen


def xpath_select(
    pages: DataFrame, paths: list[str], attr_of: dict[str, str] | None = None
) -> DataFrame:
    """Fused rule-pack XPath over raw pages: parse + select + extract
    in ONE map-side Arrow pass, zero shuffles (the 100-TB shape for
    per-document rule packs -- all path semantics are document-local,
    so nothing here needs an exchange; contrast xpath_nodes, whose
    relational joins are the right tool when the nodes table is
    already materialized or paths must join ACROSS documents).

    Returns one row per (url, path, matching node): the node's
    identity columns exactly as the exploded nodes table carries them
    (node_id, parent_id, tag, depth, last_descendant, span_start) PLUS
    ``text`` = the concatenated descendant text-node bytes (the
    Node::text analogue, reference src/node.rs:214-253) -- the actual
    extraction payload. Differentially tested against xpath_nodes and
    the kernel selector over the adversarial path corpus; same path
    grammar, same first-wins attribute semantics, same true-subtree
    '//' ranges (multi-root safe).

    Documents that fail to parse contribute no rows (see parse_nodes).

    ``attr_of`` maps a path string to an attribute name: rows matched
    by that path additionally carry the node's FIRST-WINS value of
    that attribute (reference ``get_attribute`` scan order,
    src/node.rs:674-705) in ``attr_value`` -- the extraction payload
    for rule packs like ``a[@href]`` or Atom ``entry/link[@href]``
    whose answer lives in an attribute, not the subtree text.
    ``attr_value`` is NULL when absent or not requested for the row's
    path; values arrive entity-decoded + whitespace-normalized from
    the kernel (A12), raw bytes (callers gate utf8 like every other
    crawl payload).
    """
    for p in paths:
        from ..kernel.document import _path_segments

        _path_segments(p)  # raise on bad grammar driver-side
    for p in attr_of or {}:
        if p not in paths:
            raise ValueError(f"attr_of key {p!r} is not in paths")
    if not paths:
        return pages.select("url", "html").limit(0).mapInArrow(
            _select_arrow_batches_factory([]), XPATH_SELECT_SCHEMA
        )
    return pages.select("url", "html").mapInArrow(
        _select_arrow_batches_factory(paths, attr_of), XPATH_SELECT_SCHEMA
    )
