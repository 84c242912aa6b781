"""WARC source: record-parser unit tests + Spark datasource roundtrip
(synth corpus -> .warc.gz -> read_warc -> parse_pages equals the
parquet-path extraction)."""

from __future__ import annotations

import datetime
import gzip
import io
import os

import pytest

from xhtml_parser_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    write_warc_gz,
)

TS = datetime.datetime(2025, 8, 8, 12, 0, 0)


def _records(raw: bytes):
    return list(iter_warc_records(io.BytesIO(raw)))


def test_roundtrip_single_record(tmp_path):
    p = str(tmp_path / "one.warc.gz")
    write_warc_gz(p, [("http://a.test/x", TS, b"<r>hi</r>")])
    with gzip.open(p, "rb") as fh:
        got = list(iter_warc_records(fh))
    assert got == [("http://a.test/x", TS, b"<r>hi</r>")]


def test_writer_is_deterministic(tmp_path):
    rows = [("http://a.test/%d" % i, TS, b"<r>%d</r>" % i) for i in range(5)]
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc_gz(p1, rows)
    write_warc_gz(p2, rows)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_non_response_records_skipped():
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 4\r\n"
        b"\r\n"
        b"info\r\n\r\n"
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: <http://b.test/y>\r\n"
        b"WARC-Date: 2025-08-08T12:00:00Z\r\n"
        b"Content-Length: 52\r\n"
        b"\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<r>y</r>"
        b"\r\n\r\n"
    )
    got = _records(raw)
    # the 1.0-style <...> wrapping is stripped
    assert got == [("http://b.test/y", TS, b"<r>y</r>")]


def test_bare_payload_without_http_envelope():
    body = b"<r>bare</r>"
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://c.test/z\r\n"
        b"WARC-Date: 2025-08-08T12:00:00Z\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
    assert _records(raw) == [("http://c.test/z", TS, body)]


def test_truncated_block_raises():
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://t.test/\r\n"
        b"WARC-Date: 2025-08-08T12:00:00Z\r\n"
        b"Content-Length: 999\r\n"
        b"\r\n"
        b"short"
    )
    with pytest.raises(ValueError, match="truncated"):
        _records(raw)


def test_not_warc_raises():
    with pytest.raises(ValueError, match="not a WARC"):
        _records(b"GARBAGE\r\n")


def _response(block: bytes, extra_hdr: bytes = b"") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://e.test/\r\n"
        b"WARC-Date: 2025-08-08T12:00:00Z\r\n"
        + extra_hdr
        + b"Content-Length: " + str(len(block)).encode() + b"\r\n"
        b"\r\n" + block + b"\r\n\r\n"
    )


def test_missing_content_length_raises_value_error():
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        _records(raw)


def test_eof_mid_header_block_raises_value_error():
    raw = b"WARC/1.0\r\nWARC-Type: response\r\n"  # no blank line, EOF
    with pytest.raises(ValueError, match="truncated WARC header"):
        _records(raw)


def test_folded_header_continuation():
    """WARC/1.0 allows values continued on a space/tab-led line; the
    continuation must extend the value, not vanish as a bogus key."""
    block = b"HTTP/1.1 200 OK\r\n\r\n<r>f</r>"
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://long.test/\r\n"
        b" very/deep/path\r\n"
        b"WARC-Date: 2025-08-08T12:00:00Z\r\n"
        b"Content-Length: " + str(len(block)).encode() + b"\r\n"
        b"\r\n" + block + b"\r\n\r\n"
    )
    assert _records(raw) == [("http://long.test/ very/deep/path", TS, b"<r>f</r>")]


def test_lf_only_http_envelope():
    """Captured servers that emit bare-LF HTTP headers must not lose
    the payload (the separator is then LFLF, not CRLFCRLF)."""
    block = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<r>lf</r>"
    assert _records(_response(block)) == [("http://e.test/", TS, b"<r>lf</r>")]


def test_chunked_body_is_dechunked():
    body = b"4\r\n<r>c\r\n5\r\n</r>x\r\n0\r\n\r\n"
    block = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
    )
    assert _records(_response(block)) == [("http://e.test/", TS, b"<r>c</r>x")]


def test_gzip_body_is_decompressed():
    payload = gzip.compress(b"<r>gz</r>")
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + payload
    assert _records(_response(block)) == [("http://e.test/", TS, b"<r>gz</r>")]


def test_bad_gzip_body_passes_through_raw():
    block = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip"
    assert _records(_response(block)) == [("http://e.test/", TS, b"not-gzip")]


def test_timestamp_microseconds_and_tz_roundtrip(tmp_path):
    """Sub-second precision survives the roundtrip; tz-aware stamps are
    written as their UTC instant, not their wall time."""
    micro = datetime.datetime(2025, 8, 8, 12, 0, 0, 123456)
    plus5 = datetime.datetime(
        2025, 8, 8, 12, 0, 0,
        tzinfo=datetime.timezone(datetime.timedelta(hours=5)),
    )
    p = str(tmp_path / "ts.warc.gz")
    write_warc_gz(p, [("http://m.test/", micro, b"<r/>"),
                      ("http://z.test/", plus5, b"<r/>")])
    with gzip.open(p, "rb") as fh:
        got = {u: ts for u, ts, _ in iter_warc_records(fh)}
    assert got["http://m.test/"] == micro
    assert got["http://z.test/"] == datetime.datetime(2025, 8, 8, 7, 0, 0)


def test_already_dechunked_body_kept_raw():
    """A record whose header says chunked but whose stored body is the
    already-decoded stream (proxies/crawlers that de-chunk but keep the
    header) must keep its bytes -- the old behavior silently emptied
    the document."""
    block = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"<r>plain, not chunk-framed</r>"
    )
    assert _records(_response(block)) == [
        ("http://e.test/", TS, b"<r>plain, not chunk-framed</r>")
    ]


def test_chunked_body_with_bare_lf_framing():
    """LF-only captures frame chunks with bare LFs too."""
    body = b"4\n<r>c\n5\n</r>x\n0\n\n"
    block = b"HTTP/1.1 200 OK\nTransfer-Encoding: chunked\n\n" + body
    assert _records(_response(block)) == [("http://e.test/", TS, b"<r>c</r>x")]


def test_extension_headers_do_not_trigger_decoding():
    """Transfer/Content-Encoding detection matches the header NAME, not
    a substring of the whole block: X-Original-Transfer-Encoding (a
    de-chunking proxy's breadcrumb) and an ETag containing "gzip" must
    not reroute the body through _dechunk/decompress."""
    block = (
        b"HTTP/1.1 200 OK\r\n"
        b"X-Original-Transfer-Encoding: chunked\r\n"
        b'ETag: "abc-gzip"\r\n'
        b"\r\n<r>verbatim</r>"
    )
    assert _records(_response(block)) == [("http://e.test/", TS, b"<r>verbatim</r>")]


def test_tzless_warc_date_taken_as_utc():
    """A timezone-less WARC-Date is the module's naive-is-UTC
    convention -- it must parse to the same instant on every host, not
    via the machine's local timezone."""
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://t.test/\r\n"
        b"WARC-Date: 2025-08-08T12:00:00\r\n"
        b"Content-Length: 4\r\n"
        b"\r\n<r/>\r\n\r\n"
    )
    assert _records(raw)[0][1] == datetime.datetime(2025, 8, 8, 12, 0, 0)


def test_ctl_chars_in_url_cannot_corrupt_framing(tmp_path):
    """A hostile url with embedded CRLF must not inject WARC headers or
    break Content-Length framing for subsequent records."""
    evil = "http://a.test/x\r\nContent-Length: 0"
    p = str(tmp_path / "evil.warc.gz")
    write_warc_gz(p, [(evil, TS, b"<r>1</r>"), ("http://b.test/", TS, b"<r>2</r>")])
    with gzip.open(p, "rb") as fh:
        got = list(iter_warc_records(fh))
    assert len(got) == 2
    assert got[0][0] == "http://a.test/x%0D%0AContent-Length: 0"
    assert got[1] == ("http://b.test/", TS, b"<r>2</r>")


def test_spark_warc_roundtrip_matches_parquet_path(spark, tmp_path):
    """synth pages -> .warc.gz shards -> read_warc -> parse_pages must
    extract byte-identical text to the parquet-path pipeline."""
    from pyspark.sql import functions as F

    from xhtml_parser_spark.operators import parse_pages
    from xhtml_parser_spark.sources import synthesize_pages

    pages = synthesize_pages(spark, 60, max_b=4096)
    rows = pages.select("url", "warc_ts", "html").collect()
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    for shard in range(3):
        write_warc_gz(
            str(wdir / f"seg-{shard}.warc.gz"),
            [
                (r["url"], r["warc_ts"], bytes(r["html"]))
                for i, r in enumerate(rows)
                if i % 3 == shard
            ],
        )

    back = read_warc(spark, str(wdir), num_partitions=2)
    assert back.count() == 60
    via_warc = {
        r["url"]: bytes(r["text"])
        for r in parse_pages(back).where(F.col("parse_ok")).collect()
    }
    via_parquet = {
        r["url"]: bytes(r["text"])
        for r in parse_pages(pages).where(F.col("parse_ok")).collect()
    }
    assert via_warc == via_parquet
    # timestamps survive the ISO round trip
    ts = {r["url"]: r["warc_ts"] for r in back.collect()}
    want = {r["url"]: r["warc_ts"] for r in rows}
    assert ts == want


def test_wet_sink_roundtrip(spark, tmp_path):
    """parse -> WET shards -> read back: Common Crawl's extracted-text
    exchange format as the pipeline's sink."""
    import glob
    import gzip as _gzip

    from xhtml_parser_spark.operators import parse_pages
    from xhtml_parser_spark.sources import synthesize_pages
    from xhtml_parser_spark.sources.warc import iter_wet_records, write_wet_shards

    pages = synthesize_pages(spark, 30, max_b=4096)
    parsed = parse_pages(pages).join(
        pages.select("url", "warc_ts"), "url"
    )
    out = str(tmp_path / "wet")
    write_wet_shards(parsed, out)
    got = {}
    for p in glob.glob(out + "/*.wet.gz"):
        with _gzip.open(p, "rb") as fh:
            for url, ts, text in iter_wet_records(fh):
                got[url] = (ts, text)
    want = {
        r["url"]: (r["warc_ts"], bytes(r["text"]))
        for r in parsed.select("url", "warc_ts", "text").collect()
    }
    assert got == want and len(got) == 30


def test_wet_shards_null_ts_stamps_epoch(spark, tmp_path):
    """A null warc_ts must stamp the epoch, not kill the task
    (timedelta(microseconds=None) crashed the 10x-corpus rehearsal:
    BENCH.md round 5)."""
    import datetime
    import glob
    import gzip as _gzip

    from pyspark.sql import functions as F

    from xhtml_parser_spark.sources.warc import iter_wet_records, write_wet_shards

    df = spark.createDataFrame(
        [("http://a.test/", b"hello")], "url string, text binary"
    ).select("url", F.lit(None).cast("timestamp").alias("warc_ts"), "text")
    out = str(tmp_path / "wet")
    write_wet_shards(df, out)
    recs = []
    for p in glob.glob(out + "/*.wet.gz"):
        with _gzip.open(p, "rb") as fh:
            recs.extend(iter_wet_records(fh))
    assert recs == [
        ("http://a.test/", datetime.datetime(1970, 1, 1), b"hello")
    ]


def test_warc_shards_distributed_writer(spark, tmp_path):
    """write_warc_shards (the bench's corpus->delivery synthesizer) is
    read_warc's exact inverse: urls, instants, and html bytes survive
    the distributed shard roundtrip."""
    from xhtml_parser_spark.sources import synthesize_pages
    from xhtml_parser_spark.sources.warc import write_warc_shards

    pages = synthesize_pages(spark, 40, max_b=2048).repartition(4)
    out = str(tmp_path / "delivery")
    write_warc_shards(pages, out)
    back = read_warc(spark, out, num_partitions=2)
    want = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in pages.select("url", "warc_ts", "html").collect()
    }
    got = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in back.select("url", "warc_ts", "html").collect()
    }
    assert got == want


def test_run_extract_over_warc_input(spark, tmp_path):
    """The flagship job runs straight off a crawl delivery: extraction
    over .warc.gz shards equals extraction over the same pages as
    parquet, slice manifests and all."""
    from xhtml_parser_spark.plans import run_extract
    from xhtml_parser_spark.plans.extract_job import read_extracted
    from xhtml_parser_spark.sources import synthesize_pages

    pages = synthesize_pages(spark, 40, max_b=4096)
    rows = pages.select("url", "warc_ts", "html").collect()
    wdir = tmp_path / "crawl"
    wdir.mkdir()
    write_warc_gz(
        str(wdir / "seg-0.warc.gz"),
        [(r["url"], r["warc_ts"], bytes(r["html"])) for r in rows],
    )
    pdir = str(tmp_path / "pages_pq")
    pages.write.parquet(pdir)

    out_w = str(tmp_path / "out_warc")
    out_p = str(tmp_path / "out_pq")
    run_extract(spark, str(wdir), out_w, run_id="w", n_slices=2,
                input_format="warc")
    run_extract(spark, pdir, out_p, run_id="p", n_slices=2)
    got_w = {r["url"]: bytes(r["text"])
             for r in read_extracted(spark, out_w).collect()}
    got_p = {r["url"]: bytes(r["text"])
             for r in read_extracted(spark, out_p).collect()}
    assert got_w == got_p and len(got_w) == 40

    with pytest.raises(ValueError, match="parquet input only"):
        run_extract(spark, str(wdir), str(tmp_path / "x"), run_id="f",
                    fused=True, input_format="warc")

    # cross-format resume re-keys slice membership (url-hash classes vs
    # file groups) -> hard error, same rule as fused-vs-standard
    with pytest.raises(ValueError, match="input_format"):
        run_extract(spark, pdir, out_w, run_id="w2", n_slices=2)
    with pytest.raises(ValueError, match="input_format"):
        run_extract(spark, str(wdir), out_p, run_id="p2", n_slices=2,
                    input_format="warc")


def test_run_extract_warc_resume_refuses_changed_listing(spark, tmp_path):
    """warc slices are file groups of the sorted listing: adding a
    shard between runs re-keys every group, so resume must refuse."""
    from xhtml_parser_spark.plans import run_extract
    from xhtml_parser_spark.sources import synthesize_pages

    pages = synthesize_pages(spark, 20, max_b=2048)
    rows = pages.select("url", "warc_ts", "html").collect()
    wdir = tmp_path / "crawl"
    wdir.mkdir()
    write_warc_gz(
        str(wdir / "seg-0.warc.gz"),
        [(r["url"], r["warc_ts"], bytes(r["html"])) for r in rows[:10]],
    )
    out = str(tmp_path / "out")
    run_extract(spark, str(wdir), out, run_id="a", n_slices=2,
                max_slices=1, input_format="warc")
    write_warc_gz(
        str(wdir / "seg-1.warc.gz"),
        [(r["url"], r["warc_ts"], bytes(r["html"])) for r in rows[10:]],
    )
    with pytest.raises(ValueError, match="input listing"):
        run_extract(spark, str(wdir), out, run_id="b", n_slices=2,
                    input_format="warc")


def test_wat_sink_roundtrip(spark, tmp_path):
    """pages -> WAT shards -> read back: per-page JSON metadata records
    whose Links list matches extract_links exactly (href, anchor text,
    resolved url), including empty lists for link-free and failed-parse
    pages."""
    import datetime
    import glob
    import gzip as _gzip
    import json

    from pyspark.sql import functions as F

    from xhtml_parser_spark.operators.links import extract_links
    from xhtml_parser_spark.sources.warc import iter_wat_records, write_wat_shards

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        ("https://a.com/d/x.html",
         b'<html><body><a href="../p.html">go <b>now</b></a>'
         b'<link rel="s" href="/m.css"/></body></html>', ts),
        ("https://b.com/", b"<html><body><p>no links</p></body></html>", ts),
        ("https://bad.com/", b"<root><dangling", ts),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, warc_ts timestamp")
    out = str(tmp_path / "wat")
    write_wat_shards(pages, out)
    got = {}
    for p in sorted(glob.glob(out + "/*.wat.gz")):
        with _gzip.open(p, "rb") as fh:
            for url, rts, js in iter_wat_records(fh):
                got[url] = (rts, json.loads(js))
    assert set(got) == {r[0] for r in rows} and all(t == ts for t, _ in got.values())
    want_links = {}
    for r in extract_links(pages).collect():
        want_links.setdefault(r["url"], []).append(
            {"node_id": r["node_id"], "tag": r["tag"], "href": r["href"],
             "text": r["anchor_text"], "url": r["link_url"]}
        )
    for url, (_, env) in got.items():
        meta = env["Envelope"]
        assert meta["WARC-Header-Metadata"]["WARC-Target-URI"] == url
        links = meta["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"]["Links"]
        norm = [
            {"node_id": l["node_id"], "tag": l["tag"], "href": l["href"],
             "text": l["text"], "url": l["url"]}
            for l in links
        ]
        assert norm == sorted(
            want_links.get(url, []), key=lambda d: d["node_id"]
        ), url
    assert got["https://b.com/"][1]["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"]["HTML-Metadata"]["Links"] == []


# --------------------------------------------------------------------
# Fast .warc.gz path (chunked zlib members + index-based framing) --
# must agree with the streaming walk on everything, including layouts
# our own writer never produces.
# --------------------------------------------------------------------


def _gz_member(payload: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(payload)
    return buf.getvalue()


def _fast(comp: bytes):
    from xhtml_parser_spark.sources.warc import iter_warc_records_gz_bytes

    return list(iter_warc_records_gz_bytes(comp))


def _record_raw(url: bytes, body: bytes, rtype: bytes = b"response") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        b"WARC-Target-URI: " + url + b"\r\n"
        b"WARC-Date: 2025-08-08T12:00:00Z\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )


def test_fast_path_matches_streaming_on_writer_output(tmp_path):
    p = str(tmp_path / "w.warc.gz")
    rows = [
        ("http://a.test/%d" % i, TS, b"<r>%d</r>" % i) for i in range(7)
    ]
    write_warc_gz(p, rows)
    comp = open(p, "rb").read()
    with gzip.open(p, "rb") as fh:
        stream = list(iter_warc_records(fh))
    assert _fast(comp) == stream == rows


def test_fast_path_multi_record_single_member():
    """A whole-file single gzip member holding many records (the
    non-per-record packaging some writers emit)."""
    raw = b"".join(
        _record_raw(b"http://m.test/%d" % i, b"<r>%d</r>" % i)
        for i in range(5)
    )
    comp = _gz_member(raw)
    assert _fast(comp) == _records(raw)
    assert len(_fast(comp)) == 5


def test_fast_path_record_split_across_members():
    """A record whose header and block land in DIFFERENT gzip members
    must reassemble through the carry buffer."""
    raw = _record_raw(b"http://s.test/x", b"<r>split</r>")
    cut = raw.find(b"Content-Length")  # mid-header
    comp = _gz_member(raw[:cut]) + _gz_member(raw[cut:])
    assert _fast(comp) == _records(raw)
    cut2 = raw.find(b"<r>") + 4  # mid-block
    comp2 = _gz_member(raw[:cut2]) + _gz_member(raw[cut2:])
    assert _fast(comp2) == _records(raw)


def test_fast_path_mixed_types_and_lf_headers():
    raw = (
        _record_raw(b"http://a.test/req", b"ignored", rtype=b"request")
        + _record_raw(b"http://a.test/1", b"<r>1</r>")
        # LF-only header block (lenient writers)
        + b"WARC/1.0\nWARC-Type: response\n"
        b"WARC-Target-URI: http://a.test/2\n"
        b"WARC-Date: 2025-08-08T12:00:00Z\n"
        b"Content-Length: 8\n\n<r>2</r>\r\n\r\n"
    )
    comp = _gz_member(raw)
    assert _fast(comp) == _records(raw)
    assert [u for u, _, _ in _fast(comp)] == ["http://a.test/1", "http://a.test/2"]


def test_fast_path_truncated_tail_raises():
    raw = _record_raw(b"http://a.test/1", b"<r>1</r>")
    comp = _gz_member(raw[: len(raw) - 12])  # cut inside the block
    with pytest.raises(ValueError):
        _fast(comp)


def test_fast_path_http_envelope_stripped():
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<r>pay</r>"
    raw = _record_raw(b"http://a.test/h", body)
    assert _fast(_gz_member(raw)) == _records(raw)
    assert _fast(_gz_member(raw))[0][2] == b"<r>pay</r>"


def test_read_parsed_warc_matches_two_step_path(spark, tmp_path):
    """Fused scan+parse datasource == read_warc -> parse_pages, row for
    row (url, parse_ok, text bytes)."""
    from xhtml_parser_spark.operators import parse_pages
    from xhtml_parser_spark.sources.warc import read_parsed_warc

    d = str(tmp_path / "shards")
    os.makedirs(d)
    rows = [
        ("http://f.test/%d" % i, TS, b"<html><body><p>doc %d</p></body></html>" % i)
        for i in range(20)
    ]
    rows.append(("http://f.test/bad", TS, b"<open><no close>"))
    write_warc_gz(os.path.join(d, "a.warc.gz"), rows[:10])
    write_warc_gz(os.path.join(d, "b.warc.gz"), rows[10:20])
    # plain (uncompressed) .warc shard: the fused reader's stream lane
    write_warc_gz(os.path.join(d, "_c.warc.gz"), rows[20:])
    with gzip.open(os.path.join(d, "_c.warc.gz"), "rb") as fh:
        plain = fh.read()
    os.remove(os.path.join(d, "_c.warc.gz"))
    with open(os.path.join(d, "c.warc"), "wb") as fh:
        fh.write(plain)
    fused = {
        (r["url"], r["parse_ok"], bytes(r["text"]) if r["text"] is not None else None)
        for r in read_parsed_warc(spark, d).select("url", "parse_ok", "text").collect()
    }
    two_step = {
        (r["url"], r["parse_ok"], bytes(r["text"]) if r["text"] is not None else None)
        for r in parse_pages(read_warc(spark, d))
        .select("url", "parse_ok", "text")
        .collect()
    }
    assert fused == two_step
    assert len(fused) == 21


@pytest.mark.parametrize("seed", range(4))
def test_fast_path_fuzz_random_streams_and_splits(seed):
    """Differential fuzz: random record streams (types, header shapes,
    binary bodies, blank-line runs) packed into random gzip-member
    splits must decode identically to the streaming walk."""
    import random

    rng = random.Random(seed)
    recs = []
    raw_parts = []
    for i in range(rng.randint(1, 12)):
        rtype = rng.choice([b"response", b"request", b"metadata", b"conversion"])
        body = bytes(rng.randrange(256) for _ in range(rng.randint(0, 300)))
        if rng.random() < 0.3:
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: x\r\n\r\n" + body
            )
        url = ("http://f%d.test/%d" % (seed, i)).encode()
        nl = b"\n" if rng.random() < 0.3 else b"\r\n"
        part = (
            b"WARC/1.0" + nl
            + b"WARC-Type: " + rtype + nl
            + b"WARC-Target-URI: " + url + nl
            + b"WARC-Date: 2025-08-08T12:00:00Z" + nl
            + b"Content-Length: " + str(len(body)).encode() + nl
            + nl + body + b"\r\n" * rng.randint(0, 3)
        )
        raw_parts.append(part)
    raw = b"".join(raw_parts)
    # random member split points (any byte offsets, including mid-record)
    cuts = sorted(rng.sample(range(1, len(raw)), min(rng.randint(0, 6), len(raw) - 1)))
    pieces = [raw[a:b] for a, b in zip([0] + cuts, cuts + [len(raw)])]
    comp = b"".join(_gz_member(p) for p in pieces if p)
    assert _fast(comp) == _records(raw)
