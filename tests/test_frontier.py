"""crawl_delta + fetch_schedule: frontier-side relational operators."""

from __future__ import annotations

import hashlib


def test_crawl_delta_status_lattice(spark):
    from xhtml_parser_spark.operators.frontier import crawl_delta

    def pages(rows):
        return spark.createDataFrame(
            [(u, bytearray(b)) for u, b in rows], "url string, html binary"
        )

    old = pages([("a", b"one"), ("b", b"two"), ("c", b"three")])
    new = pages([("a", b"one"), ("b", b"TWO"), ("d", b"four")])
    got = {r["url"]: r for r in crawl_delta(old, new).collect()}
    assert got["a"]["status"] == "same"
    assert got["b"]["status"] == "changed"
    assert got["c"]["status"] == "removed"
    assert got["d"]["status"] == "added"
    assert got["c"]["new_digest"] is None
    assert got["d"]["old_digest"] is None
    assert got["b"]["old_digest"] == hashlib.sha256(b"two").hexdigest()
    assert got["b"]["new_digest"] == hashlib.sha256(b"TWO").hexdigest()


def test_fetch_schedule_politeness(spark):
    from xhtml_parser_spark.operators.frontier import fetch_schedule

    frontier = spark.createDataFrame(
        [
            # host A: priorities 2, 2, 1 -> order by (prio desc, url)
            ("https://a.example/z", "a.example", 2),
            ("https://a.example/m", "a.example", 2),
            ("https://a.example/q", "a.example", 1),
            # host B: single url
            ("https://b.example/x", "b.example", 0),
        ],
        "url string, host string, priority int",
    )
    delays = spark.createDataFrame(
        [("a.example", 500)], "host string, delay_ms int"
    )
    got = {
        r["url"]: (r["slot"], r["fetch_at_ms"])
        for r in fetch_schedule(frontier, 1000, delays).collect()
    }
    # slot order: /m before /z (same priority, url asc), /q last
    assert got["https://a.example/m"] == (0, 0)
    assert got["https://a.example/z"] == (1, 500)
    assert got["https://a.example/q"] == (2, 1000)
    # host without an override uses the default delay
    assert got["https://b.example/x"] == (0, 0)

    # no delays table at all: default applies everywhere
    got2 = {
        r["url"]: r["fetch_at_ms"]
        for r in fetch_schedule(frontier, 100).collect()
    }
    assert got2["https://a.example/q"] == 200
