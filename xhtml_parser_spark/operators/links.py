"""Hyperlink extraction, host link graph, and fixed-point PageRank.

The web-corpus layer above the parser: pull every ``<a>``/``<link>``/
``<area>`` href out of the DOM in ONE columnar pass over the corpus
(no parse_nodes-join-parse_attrs double parse), resolve it against the
page url (RFC 3986-lite, ``functions.urls.resolve_url``), normalize
it, and roll the result up into a host-level weighted link graph that
feeds an integer fixed-point PageRank.

Scale posture: ``extract_links`` is map-side only (mapInArrow, same
packed-array gather machinery as operators/parse.py -- mirrors
reference attribute iteration, src/attribute.rs:201-293, restricted to
anchor tags). ``host_link_graph`` is one partial-aggregated hash
shuffle. ``pagerank`` persists the (deduped, out-degree-annotated)
edge list once and runs a fixed number of join+sum rounds with
localCheckpoint()ed rank vectors -- identical iteration shape to
``dedup.connected_components``. Every PageRank quantity is a bigint
(scaled fixed-point, integer division) so the result is reduction-
order independent and exactly replayable by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.urls import (
    _SCHEME_RE,
    normalize_url,
    resolve_url,
    url_host,
)

LINKS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("node_id", IntegerType()),
        StructField("tag", StringType()),
        # href/text are emitted PRE-VALIDATED by the Arrow pass:
        # utf8 string, NULL when the raw bytes are not well-formed
        # UTF-8 (legacy-encoded pages) -- see _utf8_or_null_from_packed
        StructField("href", StringType()),
        StructField("text", StringType()),
    ]
)

# first-wins href per anchor node, matching the reference's
# get_attribute scan order (src/node.rs:674-705): attributes are
# contiguous per node in document order, so the first flat match wins
_HREF = b"href"
_TAGS4 = (b"link", b"area")


def _links_arrow_batches(batches):
    """Per document: vectorized anchor-tag match over the packed tag
    spans (len-1 'a' byte compare; len-4 2-D byte compare for
    link/area), repeat+arange expansion of the matched nodes' attr
    ranges, 4-byte name compare against 'href', first-wins dedup per
    node via np.unique on the (nondecreasing) owner sequence. No
    per-node Python loop; one buffer concat + two span gathers per
    batch, exactly like _nodes_arrow_batches.

    Anchor TEXT (the link's label: concatenated descendant text nodes,
    entity-decoded, in document order) rides the same pass for free --
    the packed DOM's contiguity invariant means node t is a descendant
    of anchor a iff a < t <= last_descendant[a], so per-anchor
    text-node ranges are two searchsorted calls over the text-node
    index vector and the concatenation is one grouped span gather.
    Mirrors reference Node::text + descendants iteration
    (src/node.rs:214-253, src/document.rs:733-811)."""
    import numpy as np
    import pyarrow as pa

    from ..kernel.parser import TEXT, _get_cparser
    from .parse import (
        _doc_packed,
        _gather_spans,
        _html_views,
        _string_from_spans,
        _utf8_or_null_from_packed,
    )

    cp = _get_cparser()
    a_u8 = np.frombuffer(b"a", np.uint8)[0]
    tags4 = np.stack([np.frombuffer(t, np.uint8) for t in _TAGS4])
    href4 = np.frombuffer(_HREF, np.uint8)
    for rb in batches:
        urls = rb.column(0)
        get_html = _html_views(rb)
        doc_idx: list = []
        node_ids: list = []
        tag_gs: list = []
        tag_ge: list = []
        val_gs: list = []
        val_ge: list = []
        txt_gs: list = []
        txt_ge: list = []
        txt_cnt: list = []
        chunks: list = []
        base = 0
        for j in range(rb.num_rows):
            packed = _doc_packed(cp, get_html(j))
            if packed is None:
                continue
            buf, _par, kind, ls, le, _d, ld, at_s, at_e = packed[:9]
            a_ns, a_ne, a_vs, a_ve = packed[9:]
            if len(kind) <= 1 or len(a_ns) == 0:
                continue
            cand = np.flatnonzero(kind == 1)
            cand = cand[cand > 0]
            if len(cand) == 0:
                continue
            tlen = le[cand] - ls[cand]
            one = cand[tlen == 1]
            one = one[buf[ls[one]] == a_u8]
            four = cand[tlen == 4]
            if len(four):
                b4 = buf[ls[four][:, None] + np.arange(4)]
                four = four[(b4[:, None, :] == tags4).all(2).any(1)]
            anchors = np.concatenate([one, four])
            anchors.sort()
            cnt = (at_e[anchors] - at_s[anchors]).astype(np.int64)
            tot = int(cnt.sum())
            if tot == 0:
                continue
            off = np.zeros(len(cnt) + 1, np.int64)
            np.cumsum(cnt, out=off[1:])
            flat = (
                np.repeat(at_s[anchors].astype(np.int64) - off[:-1], cnt)
                + np.arange(tot)
            )
            owner = np.repeat(anchors, cnt)
            m4 = (a_ne[flat] - a_ns[flat]) == 4
            flat, owner = flat[m4], owner[m4]
            if len(flat) == 0:
                continue
            nb = buf[a_ns[flat][:, None] + np.arange(4)]
            is_href = (nb == href4).all(1)
            flat, owner = flat[is_href], owner[is_href]
            if len(flat) == 0:
                continue
            owner_u, first = np.unique(owner, return_index=True)
            flat = flat[first]
            # descendant text-node ranges per kept anchor: contiguity
            # invariant => descendants of a are exactly (a, ld[a]]
            txt = np.flatnonzero(kind == TEXT)
            lo = np.searchsorted(txt, owner_u, side="right")
            hi = np.searchsorted(txt, ld[owner_u], side="right")
            cnt_t = (hi - lo).astype(np.int64)
            tot_t = int(cnt_t.sum())
            if tot_t:
                toff = np.zeros(len(cnt_t) + 1, np.int64)
                np.cumsum(cnt_t, out=toff[1:])
                sel = txt[
                    np.repeat(lo - toff[:-1], cnt_t) + np.arange(tot_t)
                ]
                txt_gs.append(ls[sel].astype(np.int64) + base)
                txt_ge.append(le[sel].astype(np.int64) + base)
            txt_cnt.append(cnt_t)
            doc_idx.append(np.full(len(owner_u), j, dtype=np.int64))
            node_ids.append(owner_u.astype(np.int32))
            tag_gs.append(ls[owner_u].astype(np.int64) + base)
            tag_ge.append(le[owner_u].astype(np.int64) + base)
            val_gs.append(a_vs[flat].astype(np.int64) + base)
            val_ge.append(a_ve[flat].astype(np.int64) + base)
            chunks.append(buf)
            base += len(buf)
        if not doc_idx:
            continue
        bigbuf = np.concatenate(chunks)
        # grouped span gather: spans were appended in anchor order, so
        # the gathered bytes ARE the per-anchor concatenations; the
        # anchor-level value offsets are the grouped byte counts
        cnt_all = np.concatenate(txt_cnt)
        if txt_gs:
            tdata, tsoff = _gather_spans(
                bigbuf, np.concatenate(txt_gs), np.concatenate(txt_ge)
            )
        else:
            tdata = np.empty(0, np.uint8)
            tsoff = np.zeros(1, np.int64)
        grp = np.repeat(np.arange(len(cnt_all)), cnt_all)
        per_anchor = np.bincount(
            grp, weights=np.diff(tsoff), minlength=len(cnt_all)
        ).astype(np.int64)
        aoff = np.zeros(len(cnt_all) + 1, np.int64)
        np.cumsum(per_anchor, out=aoff[1:])
        # href/anchor-text UTF-8 validity is settled HERE, in the same
        # Arrow pass that owns the bytes: the JVM plan then never
        # carries the is_valid_utf8+CASE+decode tree (which macro-
        # expands per reference through resolve/normalize -- the r3
        # extract_links regression)
        text_arr = _utf8_or_null_from_packed(pa, tdata, aoff)
        hdata, hoff = _gather_spans(
            bigbuf, np.concatenate(val_gs), np.concatenate(val_ge)
        )
        yield pa.RecordBatch.from_arrays(
            [
                urls.take(pa.array(np.concatenate(doc_idx))),
                pa.array(np.concatenate(node_ids), type=pa.int32()),
                _string_from_spans(
                    pa, bigbuf, np.concatenate(tag_gs), np.concatenate(tag_ge)
                ),
                _utf8_or_null_from_packed(pa, hdata, hoff),
                text_arr,
            ],
            names=[f.name for f in LINKS_SCHEMA.fields],
        )


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, node_id, tag, href, anchor_text, link_url, link_host) for
    every href-carrying <a>/<link>/<area> element, href resolved
    against the page url and normalized; anchor_text = the element's
    concatenated descendant text (entity-decoded, document order; ''
    for void/empty anchors). Map-side only; failed-parse documents
    contribute no rows (join parse_pages on url for their errors).

    Raw crawls are not all UTF-8 and Spark 4's ANSI ``decode`` RAISES
    on malformed bytes, so the Arrow pass itself emits href/anchor
    bytes as validated utf8-or-NULL (``_utf8_or_null_from_packed``): a
    legacy-encoded href/anchor yields NULL for that column instead of
    aborting the whole export job, and the JVM plan never carries the
    is_valid_utf8+CASE+decode tree (which used to macro-expand once
    per reference through resolve/normalize -- measured 3.6 s vs
    ~2.5 s for this query at sf0.1)."""
    decoded = pages.select("url", "html").mapInArrow(
        _links_arrow_batches, LINKS_SCHEMA
    ).withColumnRenamed("text", "anchor_text")

    # STAGED projections, deliberately -- one alias per derived value,
    # INCLUDING the intermediate resolved url: resolve_url/
    # normalize_url/url_host each reference their argument many times,
    # and the DSL expands column expressions by substitution, so
    # composing normalize_url(resolve_url(...)) in one alias
    # duplicates the whole resolve subtree once per reference inside
    # normalize_url (measured 2.1 s vs 0.9 s for this query's scan at
    # sf0.1 -- codegen subexpression elimination does NOT rescue a
    # tree this large). CollapseProject keeps multi-referenced
    # non-trivial aliases in their own Project, so each stage is
    # computed once per row.
    # host from the NORMALIZED url so default ports are stripped and
    # the host matches the link_url's authority exactly.  resolve_url
    # coalesces a null href to "" (= the base document), so the
    # resolved column is explicitly nulled when the href didn't decode
    # and the nullity cascades through the staged gates.
    resolved = decoded.select(
        "url",
        "node_id",
        "tag",
        "href",
        "anchor_text",
        F.when(
            F.col("href").isNotNull(),
            resolve_url(F.col("url"), F.col("href")),
        ).alias("_resolved"),
    )
    with_url = resolved.select(
        "url",
        "node_id",
        "tag",
        "href",
        "anchor_text",
        F.when(
            F.col("_resolved").isNotNull(),
            normalize_url(F.col("_resolved")),
        ).alias("link_url"),
    )
    return with_url.select(
        "url",
        "node_id",
        "tag",
        "href",
        "anchor_text",
        "link_url",
        F.when(
            F.col("link_url").isNotNull(), url_host(F.col("link_url"))
        ).alias("link_host"),
    )


def _href_has_scheme(href) -> "F.Column":
    """True when href carries an explicit scheme (RFC 3986 relative-ref
    disambiguation). The fragment can't affect the authority ([^/?#]
    classes) but CAN hide a scheme's ':' from the raw-href test -- '#'
    is outside the scheme char class, so testing the raw href is
    equivalent to testing the fragment-stripped form resolve_url
    actually sees."""
    return href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")


def _resolved_scheme(url, href) -> "F.Column":
    """Lowercased scheme of resolve_url(url, href)'s result as
    normalize_url would extract it -- derived from the RAW columns so
    gating on it never pushes the staged resolve/normalize aliases
    into a filter condition (see host_link_graph's docstring). '' when
    the resolved form has no '://' scheme (scheme-without-slashes
    hrefs like 'mailto:' or an unschemed base). A NULL href (legacy-
    encoded bytes nulled by extract_links' utf8 gate) must yield a
    NULL scheme and fall out at the caller's gate -- WHEN treats a
    null condition as false, so without the explicit first branch a
    null href would silently inherit the base's scheme."""
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        .when(
            _href_has_scheme(href),
            F.lower(F.regexp_extract(href, _SCHEME_RE, 1)),
        )
        .otherwise(F.lower(F.regexp_extract(url, _SCHEME_RE, 1)))
    )


def host_link_graph(links: DataFrame, drop_self: bool = False) -> DataFrame:
    """Weighted host-level edge list (src_host, dst_host, weight) from
    an extract_links output. Non-hierarchical link targets (mailto:,
    javascript:) are dropped by the http(s)-scheme gate; one hash-agg
    shuffle, partial map-side.

    The hosts are derived from the RAW (url, href) columns, NOT from
    the link_url/link_host aliases, deliberately: filtering on those
    staged aliases lets PushDownPredicates substitute the whole
    resolve+normalize+utf8-CASE expression tree into the filter
    condition below the staged Projects (measured: a 149 KB condition,
    ~18 s to materialize this 67-row aggregate at sf0.1 vs ~3 s for the
    full extract_links evaluation). A host graph never needs path
    resolution or query normalization -- only the authority -- so
    deriving from (url, href) both sidesteps the expansion and lets
    column pruning drop the expensive aliases from the plan entirely.

    The derivation is case-by-case identical to the definitional
    ``url_host(normalize_url(resolve_url(url, href)))`` under the
    ``'^https?://'`` gate (RFC 3986 §5.2.2's authority component):

      * href with an explicit scheme -> href's own authority; the gate
        keeps lower(scheme) in {http, https} (mailto:/javascript:/ftp:
        and scheme-without-`//` forms normalize to a non-https?://
        link_url, so the old gate dropped them too);
      * protocol-relative ``//host/...`` -> href's authority with the
        BASE's scheme;
      * everything else (root-/path-relative, ``?query``, ``''``,
        ``#frag``) -> the base url's authority and scheme;
      * a NULL href (legacy-encoded bytes nulled by extract_links'
        utf8 gate) -> NULL scheme -> dropped, matching the old path's
        NULL link_url rlike semantics.

    normalize_url lowercases the authority and strips the scheme's
    default port, so dst_host does the same (src_host keeps url_host's
    verbatim port behavior, unchanged). ``tests/test_links.py``
    differential-checks this derivation against the definitional
    expression over the adversarial href corpus."""
    url, href = F.col("url"), F.col("href")
    has_scheme = _href_has_scheme(href)
    dst_scheme = _resolved_scheme(url, href)
    dst_authority = (
        F.when(
            has_scheme,
            F.lower(F.regexp_extract(href, _SCHEME_RE + "([^/?#]*)", 2)),
        )
        .when(
            href.startswith("//"),
            F.lower(F.regexp_extract(href, "^//([^/?#]*)", 1)),
        )
        .otherwise(
            F.lower(
                F.regexp_extract(
                    F.regexp_replace(url, _SCHEME_RE, ""), "^([^/?#]*)", 1
                )
            )
        )
    )
    dst_host = F.when(
        dst_scheme == "http", F.regexp_replace(dst_authority, ":80$", "")
    ).otherwise(F.regexp_replace(dst_authority, ":443$", ""))
    g = (
        links.select(
            url_host(url).alias("src_host"),
            dst_host.alias("dst_host"),
            dst_scheme.alias("dst_scheme"),
        )
        .where(F.col("dst_scheme").isin("http", "https"))
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    )
    if drop_self:
        g = g.where(F.col("src_host") != F.col("dst_host"))
    return g.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("bigint").alias("weight")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str | None = "weight",
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
) -> DataFrame:
    """Weighted PageRank in scaled fixed-point integer arithmetic:
    every node starts at ``scale``; each round

        rank'(v) = floor(scale*(den-num)/den)
                 + floor(num * sum_u floor(rank(u)*w(u,v) / W(u)) / den)

    with W(u) = u's total out-weight. Integer sums are reduction-order
    independent and integer division is identical in Spark (``DIV``)
    and DuckDB (``//``) for the nonnegative operands here, so the
    result is deterministic and oracle-exact -- float PageRank would
    hash-differently per partitioning. Dangling-node mass is NOT
    redistributed (the standard simplified variant; ranks then need no
    global normalization step, keeping every round one join + one
    map-side-partial sum). ``scale`` bounds intermediates: rank*w must
    stay under 2^63, so keep scale <= 1e9 for graphs with heavy edge
    weights. Fixed n_iter (not convergence-tested) keeps the result a
    pure function of the input -- callers pick the oracle-replayable
    depth. Because there is no per-round convergence probe, rounds
    compose LAZILY and only every ``checkpoint_every``-th rank vector
    is localCheckpoint()ed (plus the last): one Spark job per k rounds
    instead of one per round, while still truncating lineage before
    the nested-join plan gets deep (contrast connected_components,
    whose early-exit probe forces a per-round action)."""
    from pyspark import StorageLevel

    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    # persist the deduped edge aggregate BEFORE deriving out-weights:
    # outw and the annotated edge list are two consumers, and without
    # the persist each would re-run the whole upstream DAG (for a
    # host graph that is a full parse of the corpus, twice)
    e0 = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # NB: the out-weight column must not be named "W" -- Spark resolves
    # case-insensitively, so "w DIV W" would be self-referential
    outw = e0.groupBy("src").agg(F.sum("w").alias("outw"))
    e = e0.join(outw, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .localCheckpoint()
    )
    e0.unpersist()
    teleport = (scale * (damping_den - damping_num)) // damping_den
    r = nodes.select("node", F.lit(scale).cast("bigint").alias("rank"))
    zeros = nodes.select("node", F.lit(0).cast("bigint").alias("c"))
    checkpoint_every = 5
    for i in range(1, n_iter + 1):
        # rank update as (contribs UNION zero-per-node) -> one hash
        # aggregate: arithmetically identical to the textbook
        # nodes-LEFT-JOIN-contrib + coalesce(c, 0) formulation, but one
        # shuffle + one broadcast per round instead of two joins -- at
        # tiny graph sizes that's 1/3 fewer sequential stage
        # materializations, at real sizes one shuffle less per round
        contrib = e.join(r.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"),
            F.expr("(rank * w) DIV outw").alias("c"),
        )
        r = (
            contrib.unionByName(zeros)
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
            .select(
                "node",
                (
                    F.lit(teleport).cast("bigint")
                    + F.expr(f"({damping_num} * c) DIV {damping_den}")
                ).alias("rank"),
            )
        )
        if i % checkpoint_every == 0 or i == n_iter:
            # the final checkpoint also materializes r before e is
            # unpersisted below -- without it the returned (lazy) plan
            # would recompute the whole chain against an evicted cache
            r = r.localCheckpoint()
    e.unpersist()
    return r.select("node", F.col("rank").cast("bigint").alias("rank_scaled"))


def anchor_text_index(links: DataFrame, k: int = 5, n_salts: int = 16) -> DataFrame:
    """Inbound anchor-text index: for every link TARGET, the top-k most
    frequent anchor texts across the corpus -- the classic
    query-independent relevance/label signal (anchor text describes the
    target better than the target describes itself), and a standard
    training-corpus artifact.

    Input is the ``extract_links`` output (``link_url``,
    ``anchor_text``). Output (target, anchor, cnt, rnk) with rnk in
    1..k, ordered by (cnt desc, anchor asc) -- fully deterministic.

    Scale shape: one partial-aggregated hash shuffle for the
    (target, anchor) counts, then the same skew-safe TWO-PHASE top-k
    as ``corpus.host_cap``: phase 1 ranks per (target, salt) where
    salt = xxhash64(anchor) %% n_salts and keeps k rows per shard, so
    phase 2's per-target input is bounded at n_salts * k no matter how
    many distinct anchors a hub page attracts -- a single row_number
    over target would funnel https://home-pages through one task."""
    anchor_ok = F.col("anchor_text").isNotNull() & (
        F.trim(F.col("anchor_text")) != ""
    )
    if {"url", "href"} <= set(links.columns):
        # extract_links output: gate on the raw columns so the pushed
        # predicate never macro-expands the staged link_url alias (a
        # filter on link_url carries a ~75 KB copy of the resolve/
        # normalize tree below the Projects -- same disease
        # host_link_graph had, see its docstring). link_url is NULL
        # iff href is NULL, and it starts with "http" iff the resolved
        # scheme does (link_url = concat(scheme, '://', ...), and no
        # prefix of "http" can straddle the '://' separator) -- the
        # differential test pins the two gates equal.
        gate = (
            F.col("href").isNotNull()
            & _resolved_scheme(F.col("url"), F.col("href")).startswith(
                "http"
            )
            & anchor_ok
        )
    else:
        # bare (link_url, anchor_text) frames: the definitional gate
        gate = (
            F.col("link_url").isNotNull()
            & F.col("link_url").startswith("http")
            & anchor_ok
        )
    base = links.where(gate).select(
        F.col("link_url").alias("target"),
        F.trim(F.col("anchor_text")).alias("anchor"),
    )
    counts = base.groupBy("target", "anchor").agg(F.count("*").alias("cnt"))
    from pyspark.sql.window import Window

    salt = F.pmod(F.xxhash64("anchor"), F.lit(n_salts))
    w1 = Window.partitionBy("target", "salt").orderBy(
        F.desc("cnt"), F.asc("anchor")
    )
    phase1 = (
        counts.withColumn("salt", salt)
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy("target").orderBy(F.desc("cnt"), F.asc("anchor"))
    return (
        phase1.withColumn("rnk", F.row_number().over(w2))
        .where(F.col("rnk") <= k)
        .select("target", "anchor", "cnt", F.col("rnk").cast("int").alias("rnk"))
    )
