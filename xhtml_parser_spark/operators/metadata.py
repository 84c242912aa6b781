"""Head-metadata extraction: title / lang / base / canonical / meta tags.

Every web pipeline needs the page's head metadata (title for snippets
and dedup keys, ``lang`` for routing, ``rel=canonical`` for URL
canonicalization, ``meta description`` / OpenGraph fields for quality
and provenance).  ``page_metadata`` pulls all of them in ONE kernel
parse: it runs ``operators.parse.parse_full`` (the parse-once-emit-
everything Arrow pass) and then evaluates a handful of JVM-side
higher-order array expressions over the per-document ``nodes``/
``attrs`` arrays -- no second parse, no explode, no shuffle, no Python
in the metadata stage.  At 100 TB the plan is a single map-side stage
whose cost is the parse itself plus a few O(n) array scans per doc
inside whole-stage codegen.

Semantics (mirroring the reference's navigation/attribute rules):

  * ``title``     -- concatenated descendant TEXT nodes of the FIRST
                     ``<title>`` element, document order (reference
                     ``Node::text`` over descendants,
                     src/node.rs:214-253; the descendant range is the
                     packed-DOM contiguity invariant
                     ``id..last_descendant``).
  * ``lang``      -- ``lang`` attribute of the first root element
                     (first element child of node 0 -- multi-root
                     documents take the first, matching
                     ``Document::root``, src/document.rs:689-704).
  * ``base_href`` -- ``href`` of the first ``<base>`` element.
  * ``canonical`` -- ``href`` of the first ``<link>`` that carries
                     ``rel="canonical"``.
  * ``meta_description`` / ``og_title`` -- ``content`` of the first
                     ``<meta>`` carrying ``name="description"`` /
                     ``property="og:title"``.
  * ``n_meta``    -- count of ``<meta>`` elements (whole document).

"First" is document order everywhere, and attribute lookups are
first-wins per node (duplicate attribute names keep the first, the
reference ``get_attribute`` scan order, src/node.rs:674-705) --
``F.filter`` preserves array order so ``element_at(.., 1)`` IS that
scan.  Attribute values arrive entity-decoded + whitespace-normalized
from the kernel (A12); they are raw crawl bytes, so every string
output is gated by ``is_valid_utf8`` (ANSI ``decode`` raises on
malformed bytes -- CLAUDE.md gotcha) and degrades to NULL, never an
exception.  Documents that fail to parse yield a row with
``parse_ok=false`` and all-NULL metadata, so a funnel can count them.

Plan discipline: each derived value is staged as its own projection
alias (one ``select`` per dependency level) -- passing non-trivial
expressions into multiply-referencing helpers macro-expands the
subtree (the extract_links 2.5->9.0 s lesson, CLAUDE.md).  The
candidate-attribute arrays (``rel=canonical``, ``name=description``,
``property=og:title``) are filtered FIRST (each is tiny on real
pages) and only then cross-checked against the tag-filtered node
arrays, so the nested ``exists`` scans are small-outer x small-inner,
never nodes x attrs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel.parser import ELEMENT, TEXT
from .parse import parse_full


def _first(arr: Column) -> Column:
    """First element of a (possibly empty/null) array, else NULL
    (try_element_at: ANSI element_at RAISES on empty arrays)."""
    return F.try_element_at(arr, F.lit(1))


def _utf8(col: Column) -> Column:
    """Binary -> string, NULL on invalid UTF-8 (hostile-crawl gate)."""
    return F.when(F.is_valid_utf8(col), F.decode(col, "UTF-8"))


def page_metadata(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> one row per document:

    (url, parse_ok, title, lang, base_href, canonical,
     meta_description, og_title, n_meta)

    One kernel parse (parse_full), then JVM-side array expressions;
    map-side only.  See module docstring for exact semantics."""
    return page_metadata_from_full(
        parse_full(pages).select("url", "parse_ok", "nodes", "attrs")
    )


def page_metadata_from_full(full: DataFrame, extra: tuple = ()) -> DataFrame:
    """Metadata stages over an already-parsed ``parse_full`` projection
    (url, parse_ok, nodes, attrs, *extra). ``extra`` columns are
    threaded through every stage untouched -- this is what lets
    ``web_record`` fuse text + links + metadata onto ONE parse instead
    of joining three separately-parsed outputs."""
    extra = tuple(extra)

    el = lambda tag: F.filter(  # noqa: E731 -- local plan shorthand
        F.col("nodes"),
        lambda n: (n["kind"] == ELEMENT) & (n["tag"] == tag),
    )

    def attr_eq(name: str, value: bytes) -> Column:
        return F.filter(
            F.col("attrs"),
            lambda a: (a["name"] == name) & (a["value"] == F.lit(value)),
        )

    # stage 1: tag- and candidate-filtered arrays (each tiny).
    s1 = full.select(
        "url",
        "parse_ok",
        *extra,
        "nodes",
        "attrs",
        _first(el("title")).alias("t_node"),
        _first(el("base")).alias("base_node"),
        _first(
            F.filter(
                F.col("nodes"),
                lambda n: (n["kind"] == ELEMENT) & (n["parent_id"] == 0),
            )
        ).alias("root_node"),
        el("link").alias("link_nodes"),
        el("meta").alias("meta_nodes"),
        attr_eq("rel", b"canonical").alias("canon_attrs"),
        attr_eq("name", b"description").alias("desc_attrs"),
        attr_eq("property", b"og:title").alias("og_attrs"),
    )

    # stage 2: resolve candidate attrs to owning nodes of the right
    # tag (small-outer exists over small-inner), and the title's
    # descendant text-node range.
    def owned_by(cands: str, owners: str) -> Column:
        return _first(
            F.filter(
                F.col(cands),
                lambda a: F.exists(
                    F.col(owners), lambda o: o["node_id"] == a["node_id"]
                ),
            )
        )["node_id"]

    s2 = s1.select(
        "url",
        "parse_ok",
        *extra,
        "attrs",
        F.col("t_node")["node_id"].alias("t_id"),
        F.col("t_node")["last_descendant"].alias("t_ld"),
        F.col("base_node")["node_id"].alias("base_nid"),
        F.col("root_node")["node_id"].alias("root_nid"),
        owned_by("canon_attrs", "link_nodes").alias("canon_nid"),
        owned_by("desc_attrs", "meta_nodes").alias("desc_nid"),
        owned_by("og_attrs", "meta_nodes").alias("og_nid"),
        F.when(F.col("parse_ok"), F.size("meta_nodes")).alias("n_meta"),
        F.filter(
            F.col("nodes"), lambda n: n["kind"] == TEXT
        ).alias("text_nodes"),
    )

    # stage 3: gather raw byte values (first-wins attr scans + the
    # title text concatenation over the contiguity range).
    def node_attr(nid: str, name: str) -> Column:
        return _first(
            F.filter(
                F.col("attrs"),
                lambda a: (a["node_id"] == F.col(nid)) & (a["name"] == name),
            )
        )["value"]

    s3 = s2.select(
        "url",
        "parse_ok",
        *extra,
        "n_meta",
        F.when(
            F.col("t_id").isNotNull(),
            F.aggregate(
                F.filter(
                    F.col("text_nodes"),
                    lambda t: (t["node_id"] > F.col("t_id"))
                    & (t["node_id"] <= F.col("t_ld")),
                ),
                F.lit(b""),
                lambda acc, t: F.concat(acc, t["text"]),
            ),
        ).alias("title_b"),
        node_attr("root_nid", "lang").alias("lang_b"),
        node_attr("base_nid", "href").alias("base_b"),
        node_attr("canon_nid", "href").alias("canon_b"),
        node_attr("desc_nid", "content").alias("desc_b"),
        node_attr("og_nid", "content").alias("og_b"),
    )

    return s3.select(
        "url",
        "parse_ok",
        *extra,
        _utf8(F.col("title_b")).alias("title"),
        _utf8(F.col("lang_b")).alias("lang"),
        _utf8(F.col("base_b")).alias("base_href"),
        _utf8(F.col("canon_b")).alias("canonical"),
        _utf8(F.col("desc_b")).alias("meta_description"),
        _utf8(F.col("og_b")).alias("og_title"),
        "n_meta",
    )


def web_record(pages: DataFrame) -> DataFrame:
    """The one-parse superpass: everything a web-corpus builder wants
    per page -- extracted text, boilerplate-stripped main text, head
    metadata, outgoing hrefs -- from a SINGLE kernel parse.

    (url, parse_ok, title, lang, base_href, canonical,
     meta_description, og_title, n_meta, text, text_main, n_nodes,
     links, n_links)

    ``links`` is the newline-joined href attribute values in document
    order (raw, entity-decoded by the kernel; invalid-UTF-8 hrefs are
    dropped) -- the quick-scan form; ``extract_links`` remains the
    precise per-link operator (tag-filtered, resolved, normalized,
    with anchor text). At 100 TB this operator is the economics
    argument made executable: running parse_pages + page_metadata +
    extract_links separately parses every document three times;
    web_record's plan is ONE MapInArrow stage plus codegen projections
    (zero shuffle, plan-tested)."""
    full = parse_full(pages).select(
        "url", "parse_ok", "nodes", "attrs", "text", "text_main", "n_nodes"
    )
    # stage 0: href values in document order (one O(A) array filter)
    full = full.select(
        "url",
        "parse_ok",
        "nodes",
        "attrs",
        "text",
        "text_main",
        "n_nodes",
        F.filter(
            F.col("attrs"), lambda a: a["name"] == "href"
        ).alias("href_attrs"),
    )
    meta = page_metadata_from_full(
        full, extra=("text", "text_main", "n_nodes", "href_attrs")
    )
    links = F.filter(
        F.transform(F.col("href_attrs"), lambda a: _utf8(a["value"])),
        lambda v: v.isNotNull(),
    )
    return meta.select(
        "url",
        "parse_ok",
        "title",
        "lang",
        "base_href",
        "canonical",
        "meta_description",
        "og_title",
        "n_meta",
        _utf8(F.col("text")).alias("text"),
        _utf8(F.col("text_main")).alias("text_main"),
        "n_nodes",
        F.array_join(links, "\n").alias("links"),
        F.size(links).cast("int").alias("n_links"),
    )


def jsonld_records(pages: DataFrame, fields: dict | None = None) -> DataFrame:
    """Structured-data (JSON-LD) extraction: one row per
    ``<script type="application/ld+json">`` block, document order:

    (url, node_id, jsonld, <out-col per requested field>)

    ``fields`` maps output column -> top-level JSON key (default
    ``{"sd_type": "@type", "name": "name"}`` -- the schema.org
    discriminator + display name every curation pipeline keys on).

    The block location is ONE fused rule-pack pass (``xpath_select``
    with a ``[@type='...']`` predicate -- first-wins attribute
    equality, so a hostile duplicate ``type`` attr can't smuggle a
    block in); the payload is the script element's subtree text, which
    in well-formed XHTML is its single text child.  JSON parsing stays
    JVM-side (``json_tuple``: ONE parse for all requested fields;
    malformed JSON yields NULLs, never an exception), the raw block is
    kept so callers can re-parse with a full schema.  Zero shuffles,
    map-side only.
    """
    from .xpath import xpath_select

    fields = {"sd_type": "@type", "name": "name"} if fields is None else fields
    path = "//script[@type='application/ld+json']"
    # stage the utf8-gated payload as its OWN projection (json_tuple
    # would otherwise macro-expand the CASE+decode per field)
    staged = xpath_select(pages, [path]).select(
        "url", "node_id", _utf8(F.col("text")).alias("jsonld")
    )
    if not fields:
        return staged
    return staged.select(
        "url",
        "node_id",
        "jsonld",
        F.json_tuple(F.col("jsonld"), *fields.values()),
    ).toDF("url", "node_id", "jsonld", *fields.keys())


_META_KEYS = ("name", "property", "http-equiv")


def meta_kv(pages: DataFrame) -> DataFrame:
    """Every ``<meta>`` key/value pair, one row each, document order:

    (url, node_id, key_kind 'name'|'property'|'http-equiv', key,
     content)

    ``key`` is the meta element's first-wins ``name`` attribute,
    falling back to ``property`` (OpenGraph) then ``http-equiv`` --
    the precedence order real extractors use; metas with none of the
    three (e.g. ``charset``) are dropped.  ``content`` is first-wins
    and may be NULL (a keyless content-less meta row would carry no
    signal).  This is the GENERIC companion to ``page_metadata``'s
    fixed columns: quality/provenance pipelines want the whole bag
    (og:*, twitter:*, robots, viewport...) without one operator per
    key.

    Plan shape: one kernel parse (``parse_full``), per-meta attribute
    lookup evaluated INSIDE the per-document arrays (small-outer x
    small-inner nested filters, the page_metadata discipline), then
    one explode of the per-doc kv array -- the explode IS the output,
    nothing re-shuffles.  Attribute values arrive entity-decoded;
    strings are utf8-gated to NULL.
    """
    full = parse_full(pages).select("url", "nodes", "attrs")
    metas = full.select(
        "url",
        "attrs",
        F.filter(
            F.col("nodes"),
            lambda n: (n["kind"] == ELEMENT) & (n["tag"] == "meta"),
        ).alias("metas"),
    )

    def first_attr(m, name):  # first-wins per node (array order = attr order)
        return _first(
            F.filter(
                F.col("attrs"),
                lambda a: (a["node_id"] == m["node_id"])
                & (a["name"] == name),
            )
        )["value"]

    rows = metas.select(
        "url",
        F.explode(
            F.transform(
                F.col("metas"),
                lambda m: F.struct(
                    m["node_id"].alias("node_id"),
                    first_attr(m, "name").alias("k_name"),
                    first_attr(m, "property").alias("k_prop"),
                    first_attr(m, "http-equiv").alias("k_he"),
                    first_attr(m, "content").alias("content"),
                ),
            )
        ).alias("kv"),
    )
    staged = rows.select(
        "url",
        F.col("kv.node_id").alias("node_id"),
        F.when(F.col("kv.k_name").isNotNull(), F.lit("name"))
        .when(F.col("kv.k_prop").isNotNull(), F.lit("property"))
        .when(F.col("kv.k_he").isNotNull(), F.lit("http-equiv"))
        .alias("key_kind"),
        F.coalesce("kv.k_name", "kv.k_prop", "kv.k_he").alias("key_b"),
        F.col("kv.content").alias("content_b"),
    )
    return staged.where(F.col("key_kind").isNotNull()).select(
        "url",
        "node_id",
        "key_kind",
        _utf8(F.col("key_b")).alias("key"),
        _utf8(F.col("content_b")).alias("content"),
    )


def canonical_groups(pages: DataFrame) -> DataFrame:
    """``rel=canonical`` URL grouping -- the crawl-side dedup signal
    that needs no content comparison (mirrors/trackers/pagination
    declare their preferred URL themselves):

    (url, canonical_url, group_size, keep)

    ``canonical_url`` is the page's first ``<link rel="canonical">``
    href (one kernel parse via ``page_metadata``), falling back to the
    page's own url when absent/unparseable -- so every page lands in
    exactly one group.  ``keep`` marks the group's minimum url (one
    deterministic survivor per canonical target, the first-wins
    discipline every dedup operator here uses).

    Scale shape: ONE hash shuffle on canonical_url (two window
    functions over the same partitioning -- Spark plans a single
    Exchange); no join, no second parse.  Skew note: a mega-site
    declaring one canonical for millions of pages concentrates a key
    -- group_size is exactly the skew diagnostic a pipeline caps on
    (cf. operators/corpus.host_cap for the salted-cap pattern).
    """
    from pyspark.sql.window import Window

    meta = page_metadata(pages).select("url", "canonical")
    staged = meta.select(
        "url",
        F.coalesce(F.col("canonical"), F.col("url")).alias("canonical_url"),
    )
    w = Window.partitionBy("canonical_url")
    return staged.select(
        "url",
        "canonical_url",
        F.count("*").over(w).alias("group_size"),
        (F.col("url") == F.min("url").over(w)).alias("keep"),
    )
