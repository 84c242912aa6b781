"""Column-level XHTML escaping helpers (JVM-side, whole-stage codegen).

Used to synthesize parseable documents from plain-text columns inside
Spark SQL -- the inverse of the kernel's entity decoding, so that
parse(wrap(text)) == text gives an end-to-end byte-identity oracle on
any text corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def esc(c: Column) -> Column:
    """Entity-escape text for embedding as PCData: '&' first, then
    '<', '>', and raw CR (reference UB in PCData -> escape to '&#13;',
    which the kernel decodes back to a raw CR byte)."""
    c = F.coalesce(c, F.lit(""))
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit("\r"), F.lit("&#13;"))
    return c


def wrap_simple_doc(text: Column) -> Column:
    """Wrap a text column as a one-text-node document."""
    return F.concat(F.lit("<doc><t>"), esc(text), F.lit("</t></doc>"))


ESC_SQL = (
    "replace(replace(replace(replace(coalesce({c}, ''), "
    "'&', '&amp;'), '<', '&lt;'), '>', '&gt;'), chr(13), '&#13;')"
)
