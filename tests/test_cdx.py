"""surt_key + cdx_index: web-archive capture index."""

from __future__ import annotations

import datetime
import hashlib


def test_surt_key_cases(spark):
    from pyspark.sql import functions as F

    from xhtml_parser_spark.functions.urls import surt_key

    cases = [
        # lowercase + www strip + default port + query sort
        ("https://WWW.Example.COM:443/A/B?b=2&a=1", "com,example)/a/b?a=1&b=2"),
        ("http://example.com:80/", "com,example)/"),
        # empty path -> "/"
        ("https://sub.example.org", "org,example,sub)/"),
        # non-default port kept; fragment dropped
        ("http://h.example:8080/p#frag", "example,h:8080)/p"),
        # only ONE leading www strips ("www.www.x" keeps the second)
        ("http://www.www.x.test/", "test,x,www)/"),
        # empty query params dropped
        ("http://a.b/p?&x=1&", "b,a)/p?x=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["k"]
        for r in df.select(surt_key(F.col("url")).alias("k")).collect()
    ]
    assert got == [want for _, want in cases]


def test_cdx_index_rows_and_order(spark):
    from xhtml_parser_spark.sources.warc import cdx_index

    ts = datetime.datetime(2025, 8, 8, 1, 2, 3)
    rows = [
        ("https://B.example/x", ts, b"payload-b"),
        ("https://a.example/y", ts, b"payload-a"),
    ]
    df = spark.createDataFrame(
        [(u, t, bytearray(b)) for u, t, b in rows],
        "url string, warc_ts timestamp, html binary",
    )
    out = cdx_index(df, num_partitions=2).collect()
    by_url = {r["url"]: r for r in out}
    ra = by_url["https://a.example/y"]
    assert ra["surt"] == "example,a)/y"
    assert ra["ts"] == "20250808010203"
    assert ra["digest"] == hashlib.sha256(b"payload-a").hexdigest()
    assert ra["length"] == len(b"payload-a")
    # globally sorted across the range partitions: partition order ==
    # surt order (the binary-searchable shard-set property)
    assert [r["surt"] for r in out] == sorted(r["surt"] for r in out)
