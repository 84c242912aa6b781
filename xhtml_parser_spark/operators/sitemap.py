"""Sitemap / sitemap-index parsing (sitemaps.org XML protocol).

Crawl pipelines discover URLs through sitemaps; at CC scale the
sitemap corpus is itself billions of XML documents, so the parse must
be the same columnar kernel pass as every other page (a sitemap IS an
XML document -- the reference parser handles it unchanged) and the
field extraction must be relational, not per-row Python.

``parse_sitemaps`` consumes the exploded ``parse_nodes`` table (the
caller persists it when feeding multiple consumers, same contract as
``operators.xpath``) and emits one row per ``<url>`` / ``<sitemap>``
entry with its ``loc`` / ``lastmod`` / ``changefreq`` / ``priority``
children resolved:

  * entry nodes   = element nodes tagged ``url`` | ``sitemap``
    (`<urlset>` body vs `<sitemapindex>` body -- the ``kind`` column
    says which protocol shape the entry came from).
  * field value   = concatenation of the field element's child TEXT
    nodes in document order (reference ``Node::text`` semantics;
    entities arrive decoded from the kernel, so ``&amp;`` in a loc is
    a literal ``&``), first-wins when an entry repeats a field.
  * absent fields are NULL; values that are not valid UTF-8 are NULL
    (ANSI ``decode`` raises on malformed bytes -- CLAUDE.md gotcha).

Scale shape: every join/aggregate below is keyed on
``(url, node_id)``-shaped keys -- the same equi-join discipline as
``xpath_nodes`` -- and the text-node side is semi-join-pruned to field
children before any aggregation, so nothing ever materializes the full
text-node table into a wide shuffle.  No collect, no Python stage
beyond the one parse the caller already ran.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel.parser import ELEMENT, TEXT

_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def _utf8(col: Column) -> Column:
    return F.when(F.is_valid_utf8(col), F.decode(col, "UTF-8"))


def parse_sitemaps(nodes: DataFrame) -> DataFrame:
    """parse_nodes table -> one row per sitemap entry:

    (url, entry_id, kind 'url'|'sitemap', loc, lastmod, changefreq,
     priority)

    ``entry_id`` is the entry element's node_id (document order --
    ``row_number`` over it per url recovers the ordinal)."""
    entries = nodes.where(
        (F.col("kind") == ELEMENT) & F.col("tag").isin("url", "sitemap")
    ).select("url", F.col("node_id").alias("entry_id"), F.col("tag").alias("kind"))

    fields = nodes.where(
        (F.col("kind") == ELEMENT) & F.col("tag").isin(*_FIELDS)
    ).select(
        "url",
        F.col("node_id").alias("f_id"),
        F.col("parent_id").alias("e_ref"),
        F.col("tag").alias("field"),
    )

    # child text nodes of field elements only (semi-join prune), then
    # document-order concat per field element (Node::text semantics).
    texts = (
        nodes.where(F.col("kind") == TEXT)
        .select("url", "node_id", "parent_id", "text")
        .join(
            fields.select("url", F.col("f_id").alias("parent_id")),
            ["url", "parent_id"],
            "left_semi",
        )
    )
    vals = (
        texts.groupBy("url", "parent_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("node_id", "text"))).alias("ts")
        )
        .select(
            "url",
            F.col("parent_id").alias("f_id"),
            F.aggregate(
                "ts", F.lit(b""), lambda acc, t: F.concat(acc, t["text"])
            ).alias("val_b"),
        )
    )

    # first-wins per (entry, field): value at the minimum field node id.
    pivoted = (
        fields.join(vals, ["url", "f_id"], "left")
        .groupBy("url", "e_ref")
        .pivot("field", list(_FIELDS))
        .agg(F.min_by("val_b", "f_id"))
    )

    out = entries.join(
        pivoted.withColumnRenamed("e_ref", "entry_id"),
        ["url", "entry_id"],
        "left",
    )
    return out.select(
        "url",
        "entry_id",
        "kind",
        *[_utf8(F.col(f)).alias(f) for f in _FIELDS],
    )


# the sitemap protocol's two entry shapes and their four simple-type
# fields, as fused rule-pack paths (first segment matches the root)
_FUSED_ENTRY_PATHS = ("urlset/url", "sitemapindex/sitemap")
_FUSED_FIELD_PATHS = tuple(
    f"{e}/{f}" for e in _FUSED_ENTRY_PATHS for f in _FIELDS
)


def parse_sitemaps_fused(pages: DataFrame) -> DataFrame:
    """``parse_sitemaps`` over RAW pages via the fused rule-pack
    selector (``xpath_select``): parse + entry/field selection + text
    extraction in ONE map-side Arrow pass, so the only post-kernel
    work is a slim pivot over the already-selected entry/field rows --
    no exploded node table, no (url, node_id)-keyed joins over every
    DOM node (the relational form's three legs cost ~2.2 s at sf0.1
    where this runs in well under half that; same output contract).

    Sitemap fields are XSD simple types (sitemaps.org protocol), so
    the fused selector's DESCENDANT-text concatenation equals the
    relational form's child-text concatenation on any protocol-shaped
    document; a non-conforming field with nested markup would differ
    (the relational form skips the nested element's text, this form
    keeps it). First-wins on repeated fields and utf8-or-NULL decode
    match ``parse_sitemaps`` exactly.

    The selector output feeds two consumers (entry rows, field rows),
    so it is persisted; release with ``caching.released_after(df)``
    after materializing (Python-stage outputs consumed twice always
    warrant the cache -- CLAUDE.md)."""
    from ..caching import attach_persists
    from .xpath import xpath_select

    sel = xpath_select(
        pages, [*_FUSED_ENTRY_PATHS, *_FUSED_FIELD_PATHS]
    ).persist()

    entries = sel.where(F.col("path").isin(*_FUSED_ENTRY_PATHS)).select(
        "url", F.col("node_id").alias("entry_id"), F.col("tag").alias("kind")
    )
    # pivot on the FIELD name (the path's last segment = the tag);
    # min_by(node_id) is the same first-wins the relational form uses
    pivoted = (
        sel.where(F.col("path").isin(*_FUSED_FIELD_PATHS))
        .groupBy("url", F.col("parent_id").alias("entry_id"))
        .pivot("tag", list(_FIELDS))
        .agg(F.min_by("text", "node_id"))
    )
    out = entries.join(pivoted, ["url", "entry_id"], "left").select(
        "url",
        "entry_id",
        "kind",
        *[_utf8(F.col(f)).alias(f) for f in _FIELDS],
    )
    return attach_persists(out, sel)
