"""Deterministic Common-Crawl-style corpus synthesis (FIXTURES.md §4).

Every row is a pure function of ``doc_id`` -- no RNG state crosses rows,
so the corpus is identical no matter how Spark partitions the id range,
and any slice can be regenerated independently (exactly what a
1000-executor backfill needs).

Schema matches BASELINE.json:input_hint:
  pages(url string, warc_ts timestamp, html binary, text string, lang string)

Properties:
  * host Zipf(s=1.2) over 1000 hosts -> top host ~10% of docs
    (exercises the skew/salting path, north_star B4)
  * per-doc size log-uniform 2 KB .. 1 MB by doc_id hash
  * entity-rich markup: named + numeric refs, attributes with ws
    normalization, comments, CDATA, PI, nested div/p/span/a trees
  * 1% of rows malformed (drawn from the negative corpus) so
    parse_error_count > 0 in lineage
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), False),
    ]
)

_EPOCH = datetime.datetime(2025, 8, 8, 0, 0, 0)

_LANGS = ("en", "fr", "es", "de", "zh")

_WORDS = (
    "the quick brown fox jumps over a lazy dog while seventeen archivists "
    "catalogue ancient manuscripts beneath flickering lamplight and "
    "distant engines hum through the northern valley where rivers carve "
    "basalt canyons into patient geometry every winter morning brings "
    "fresh snow over terraced gardens and copper rooftops glisten"
).split()

_ENTITY_SAMPLES = (
    "&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;", "&eacute;",
    "&mdash;", "&ldquo;", "&rdquo;", "&copy;", "&deg;", "&frac12;",
    "&#65;", "&#x42;", "&#233;", "&#x203b;", "&Dagger;", "&permil;",
)

_MALFORMED = (
    b"<root><child>Content",
    b"<root><child>Content</different></root>",
    b"<123invalid>Content</123invalid>",
    b"<root attr=value>Content</root>",
    b"<root>Content</root></extra>",
    b"<a><!--" + b"c" * 6000 + b"--></a>",
)

_N_HOSTS = 1000
_ZIPF_S = 1.2

# Zipf CDF over host ranks, precomputed once.
_zipf_w = [1.0 / (r ** _ZIPF_S) for r in range(1, _N_HOSTS + 1)]
_zipf_total = sum(_zipf_w)
_ZIPF_CDF = []
_acc = 0.0
for _w in _zipf_w:
    _acc += _w / _zipf_total
    _ZIPF_CDF.append(_acc)


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _u01(h: int) -> float:
    return (h >> 11) / float(1 << 53)


def _host_of(doc_id: int) -> int:
    u = _u01(_splitmix64(doc_id * 3 + 1))
    # binary search the CDF
    lo, hi = 0, _N_HOSTS - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _ZIPF_CDF[mid] < u:
            lo = mid + 1
        else:
            hi = mid
    return lo


def _target_size(doc_id: int, min_b: int, max_b: int) -> int:
    u = _u01(_splitmix64(doc_id * 3 + 2))
    return int(math.exp(math.log(min_b) + u * (math.log(max_b) - math.log(min_b))))


def _sentence(h: int, n_words: int) -> str:
    parts = []
    for k in range(n_words):
        w = _WORDS[(h + k * 2654435761) % len(_WORDS)]
        parts.append(w)
        if (h + k) % 17 == 0:
            parts.append(_ENTITY_SAMPLES[(h + k) % len(_ENTITY_SAMPLES)])
    return " ".join(parts)


def gen_page(
    doc_id: int, min_b: int = 2048, max_b: int = 1 << 20, malformed_pct: int = 1
) -> tuple[str, datetime.datetime, bytes, None, str]:
    """Pure function doc_id -> pages row."""
    host = _host_of(doc_id)
    url = f"https://host-{host:04d}.example/doc/{doc_id}"
    ts = _EPOCH + datetime.timedelta(seconds=doc_id)
    lang = _LANGS[doc_id % 5]

    # malformed slots: (doc_id + 63) % 100 in [0, malformed_pct)
    if malformed_pct and (doc_id + 63) % 100 < malformed_pct:
        html = _MALFORMED[doc_id % len(_MALFORMED)]
        return url, ts, html, None, lang

    target = _target_size(doc_id, min_b, max_b)
    h0 = _splitmix64(doc_id)
    out = [
        b'<?xml version="1.0" encoding="UTF-8"?>',
        b"<!DOCTYPE html>",
        b'<html xmlns="http://www.w3.org/1999/xhtml" lang="',
        lang.encode(),
        b'">',
        b"<head><title>",
        _sentence(h0, 5).encode(),
        b"</title>",
        b'<meta name="generator" content="  synth   corpus  "/>',
        b"<style>body { color: #222; }</style>",
        b"<script>var x = 1;</script>",
        b"</head>",
        b"<body>",
        b'<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">About</a></li></ul></nav>',
    ]
    size = sum(len(s) for s in out)
    blk = 0
    while size < target:
        h = _splitmix64(doc_id * 1_000_003 + blk)
        kind = h % 10
        if kind < 6:
            seg = (
                f'<p class="para  b{blk}" id="p{blk}">'
                f"{_sentence(h, 12 + h % 20)} "
                f'<span>{_sentence(h >> 8, 4)}</span> '
                f'<a href="/ref/{blk}">{_sentence(h >> 16, 2)}</a></p>'
            ).encode()
        elif kind < 7:
            items = "".join(
                f"<li>{_sentence(h + k, 5)}</li>" for k in range(3 + h % 4)
            )
            seg = f"<ul>{items}</ul>".encode()
        elif kind < 8:
            seg = (
                f"<div><h2>{_sentence(h, 3)}</h2>"
                f"<blockquote>{_sentence(h >> 4, 15)}</blockquote></div>"
            ).encode()
        elif kind < 9:
            seg = f"<!-- block {blk} metadata -->".encode() + (
                f"<pre>  code_{blk}(x, y)  </pre>"
            ).encode()
        else:
            seg = (
                f"<div><![CDATA[ignored {blk}]]>"
                f"<p>{_sentence(h, 10)}</p></div>"
            ).encode()
        out.append(seg)
        size += len(seg)
        blk += 1
    out.append(b'<footer><p><a href="/x">terms</a> <a href="/y">privacy</a></p></footer>')
    out.append(b"</body></html>")
    return url, ts, b"".join(out), None, lang


def synthesize_pages(
    spark: SparkSession,
    n_docs: int,
    min_b: int = 2048,
    max_b: int = 1 << 20,
    malformed_pct: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: spark.range drives the id space, each
    partition materializes its rows independently (pure function of id)."""
    import pandas as pd  # noqa: PLC0415 (worker-side import)

    def gen(batches):
        for pdf in batches:
            rows = [
                gen_page(int(i), min_b, max_b, malformed_pct) for i in pdf["id"]
            ]
            yield pd.DataFrame(
                {
                    "url": [r[0] for r in rows],
                    "warc_ts": [r[1] for r in rows],
                    "html": [r[2] for r in rows],
                    "text": [r[3] for r in rows],
                    "lang": [r[4] for r in rows],
                }
            )

    rng = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, PAGES_SCHEMA)
