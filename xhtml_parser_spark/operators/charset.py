"""Charset sniffing + UTF-8 transcoding over binary page tables.

The extract pipeline's kernel is byte-exact on the reference fixtures,
which are UTF-8/ASCII; a real Common-Crawl delivery is not. These two
operators make the engine safe to point at raw crawl bytes:

  * :func:`sniff_charset_pages` -- adds ``charset`` / ``charset_src``
    / ``charset_label`` columns from the HTML5 prescan
    (:mod:`..functions.charset`). Pure JVM built-ins, no shuffle,
    whole-stage codegen -- at 100 TB this is a free rider on the scan.
  * :func:`transcode_utf8` -- decodes ``html`` to a UTF-8 string
    column using the sniffed (or caller-supplied) charset. Rows whose
    charset is ``utf-8`` -- the vast majority of a modern crawl --
    decode JVM-side (``F.decode`` gated by ``is_valid_utf8``, inside
    codegen) and their BYTES are nulled out of the pandas-UDF input,
    so the Arrow IPC cost is paid only for the legacy/malformed tail;
    that tail runs as an Arrow-batched pandas UDF over Python's codec
    machinery (the decode loop per value is C inside
    ``bytes.decode``) with ``errors='replace'``. Valid utf-8 decodes
    identically in both lanes and every malformed document takes the
    Python lane, so U+FFFD replacement semantics are uniform and the
    whole operator is one deterministic total function. Map-side only
    -- partitioning and scale posture identical to the parse
    kernel's.

WHATWG-name -> Python-codec notes: ``euc-kr`` decodes as ``cp949``
(the spec's euc-kr IS the cp949 superset) and any BOM the declared
encoding would re-read as U+FEFF is stripped first, as the spec's
"decode" algorithm does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.charset import sniff_charset

_BOM = {
    "utf-8": b"\xef\xbb\xbf",
    "utf-16be": b"\xfe\xff",
    "utf-16le": b"\xff\xfe",
}

# canonical (WHATWG) name -> python codec
_PY_CODEC = {
    "utf-8": "utf-8",
    "utf-16be": "utf-16-be",
    "utf-16le": "utf-16-le",
    # callers feeding HTTP/WARC-header charsets can say plain utf-16;
    # the python utf-16 codec consumes a BOM itself (LE default)
    "utf-16": "utf-16",
    "windows-1252": "cp1252",
    "windows-1251": "cp1251",
    "windows-1250": "cp1250",
    "windows-1254": "cp1254",
    "windows-1256": "cp1256",
    "koi8-r": "koi8_r",
    "iso-8859-2": "iso8859_2",
    "iso-8859-15": "iso8859_15",
    "shift_jis": "shift_jis",
    "euc-jp": "euc_jp",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "cp949",
}


def sniff_charset_pages(
    pages: DataFrame, html_col: str = "html", prescan: int = 1024
) -> DataFrame:
    """pages + (charset, charset_src, charset_label) from the prescan."""
    s = sniff_charset(F.col(html_col), prescan)
    return pages.select(
        "*",
        s["charset"].alias("charset"),
        s["src"].alias("charset_src"),
        s["label"].alias("charset_label"),
    )


def decode_bytes(raw: bytes | None, charset: str | None) -> str | None:
    """One value of :func:`transcode_utf8`'s slow lane (shared with the
    tests' replica): label-normalize + BOM strip + python-codec decode
    with replacement. Caller-supplied charsets arrive in whatever case
    an HTTP header used ('UTF-8', 'Shift_JIS'), so the name goes
    through lower() and the WHATWG label table before lookup; anything
    still unknown decodes as the windows-1252 default."""
    if raw is None:
        return None
    from ..functions.charset import _LABELS

    name = (charset or "").strip().lower()
    name = _LABELS.get(name, name)
    if name not in _PY_CODEC:
        name = "windows-1252"
    bom = _BOM.get(name)
    if bom and raw[: len(bom)] == bom:
        raw = raw[len(bom):]
    return raw.decode(_PY_CODEC[name], errors="replace")


def transcode_utf8(
    pages: DataFrame,
    html_col: str = "html",
    charset_col: str | None = None,
    out_col: str = "text_utf8",
    prescan: int = 1024,
) -> DataFrame:
    """pages + ``out_col``: html decoded per the (sniffed) charset.

    With ``charset_col=None`` the prescan columns are derived first
    (and kept -- callers almost always want them next to the text).
    An unknown charset value decodes as the windows-1252 default
    rather than raising: at corpus scale one bad label must not kill
    a 10^12-document job.

    Valid-utf-8 rows take the JVM lane. ANSI ``decode`` raises on
    malformed input, so the lane is gated by ``is_valid_utf8`` (CASE
    branches evaluate lazily per row; malformed docs fall through to
    the Python lane's replacement decode). Catalyst extracts python
    UDFs into their own Project, so a plain CASE WHEN would still
    ship every row's bytes through Arrow -- instead the UDF's *input
    bytes* are nulled for JVM-lane rows and only the CASE picks
    between the lanes.
    """
    if charset_col is None:
        pages = sniff_charset_pages(pages, html_col=html_col, prescan=prescan)
        charset_col = "charset"

    @F.pandas_udf("string")
    def _decode(html: pd.Series, charset: pd.Series) -> pd.Series:
        return pd.Series(
            [decode_bytes(b, c) for b, c in zip(html, charset)], dtype=object
        )

    b = F.col(html_col)
    cs = F.col(charset_col)
    no_bom = F.when(
        F.substring(b, 1, 3) == F.lit(_BOM["utf-8"]),
        F.substring(b, 4, 2147483647),
    ).otherwise(b)
    # null-safe: null charset / null bytes make `fast` null -> slow lane
    fast = (cs == "utf-8") & F.is_valid_utf8(no_bom)
    slow_bytes = F.when(fast, F.lit(None).cast("binary")).otherwise(b)
    out = F.when(fast, F.decode(no_bom, "UTF-8")).otherwise(
        _decode(slow_bytes, cs)
    )
    return pages.withColumn(out_col, out)
