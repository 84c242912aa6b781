"""RSS 2.0 / Atom feed parsing (one fused kernel pass per feed doc).

Feeds are the other URL-discovery surface next to sitemaps
(``operators.sitemap``): news/blog crawls schedule fetches off
``<rss><channel><item>`` and ``<feed><entry>`` documents, and a CC-
scale corpus carries hundreds of millions of them.  A feed IS an XML
document -- the reference parser handles it unchanged (namespace
prefixes like ``atom:`` strip per A14, src/parser.rs remove_namespace
-- so ``<atom:feed>`` and ``<feed>`` are the same tag here) -- so the
extraction is the same fused rule-pack selector the sitemap path uses
(``xpath_select``: parse + select + text/attr extraction in ONE
map-side Arrow pass, zero shuffles before the slim per-entry pivot).

Field mapping (unified across the two protocols):

  =========  =====================  ==========================
  column     RSS 2.0 (kind 'item')  Atom (kind 'entry')
  =========  =====================  ==========================
  title      <title> text           <title> text
  link       <link> text            first <link href=..> HREF
  guid       <guid> text            <id> text
  updated    <pubDate> text         <updated> text
  =========  =====================  ==========================

Atom's link lives in an ATTRIBUTE (RFC 4287 §4.2.7), which is exactly
what ``xpath_select``'s ``attr_of`` payload exists for; "first" is
document order with first-wins duplicate-name semantics (reference
``get_attribute``, src/node.rs:674-705).  Entity decoding arrives
from the kernel (A8-A12): ``&amp;`` in a guid or href is a literal
``&`` here.  Every output string is utf8-gated (hostile crawl bytes
-> NULL, never an exception; ANSI ``decode`` raises -- CLAUDE.md).
First-wins on repeated fields matches ``parse_sitemaps`` exactly
(``min_by(value, node_id)``).

Scale shape: one Python/Arrow stage (the selector), one pivot
aggregate keyed (url, entry_id) -- partial aggregation applies, no
join, no exploded node table.  Documents that fail to parse
contribute no rows (count them upstream via parse_ok, same contract
as every fused consumer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RSS_ENTRY = "rss/channel/item"
_ATOM_ENTRY = "feed/entry"
_RSS_FIELDS = {  # path -> unified column
    "rss/channel/item/title": "title",
    "rss/channel/item/link": "link",
    "rss/channel/item/guid": "guid",
    "rss/channel/item/pubDate": "updated",
}
_ATOM_TEXT_FIELDS = {
    "feed/entry/title": "title",
    "feed/entry/id": "guid",
    "feed/entry/updated": "updated",
}
_ATOM_LINK = "feed/entry/link[@href]"
_COLUMNS = ("title", "link", "guid", "updated")


def _utf8(col: Column) -> Column:
    return F.when(F.is_valid_utf8(col), F.decode(col, "UTF-8"))


def parse_feeds(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> one row per feed item/entry:

    (url, entry_id, kind 'item'|'entry', title, link, guid, updated)

    ``entry_id`` is the entry element's node_id (document order; a
    ``row_number`` over it per url recovers the ordinal).  A document
    that is neither protocol shape (or fails to parse) yields no rows.
    """
    from ..caching import attach_persists
    from .xpath import xpath_select

    field_of = {**_RSS_FIELDS, **_ATOM_TEXT_FIELDS, _ATOM_LINK: "link"}
    sel = xpath_select(
        pages,
        [_RSS_ENTRY, _ATOM_ENTRY, *field_of],
        attr_of={_ATOM_LINK: "href"},
    ).persist()  # two consumers (entries, fields) -- CLAUDE.md rule

    entries = sel.where(F.col("path").isin(_RSS_ENTRY, _ATOM_ENTRY)).select(
        "url", F.col("node_id").alias("entry_id"), F.col("tag").alias("kind")
    )
    fmap = F.create_map(
        *[F.lit(x) for kv in field_of.items() for x in kv]
    )
    fields = sel.where(F.col("path").isin(*field_of)).select(
        "url",
        F.col("parent_id").alias("entry_id"),
        fmap[F.col("path")].alias("field"),
        # Atom's link answer is the href attribute; everything else is
        # the element's subtree text
        F.when(F.col("path") == _ATOM_LINK, F.col("attr_value"))
        .otherwise(F.col("text"))
        .alias("value"),
        "node_id",
    )
    pivoted = (
        fields.groupBy("url", "entry_id")
        .pivot("field", list(_COLUMNS))
        .agg(F.min_by("value", "node_id"))
    )
    out = entries.join(pivoted, ["url", "entry_id"], "left").select(
        "url",
        "entry_id",
        "kind",
        *[_utf8(F.col(c)).alias(c) for c in _COLUMNS],
    )
    return attach_persists(out, sel)
