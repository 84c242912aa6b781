"""Distributed WET/WARC export: round-trip, determinism, lineage
reconciliation, hostile-url safety (sources/wet_export.py)."""

from __future__ import annotations

import datetime
import glob
import os

import pytest

from xhtml_parser_spark.sources.wet_export import (
    read_wet,
    warc_export,
    wet_export,
)

TS = datetime.datetime(2024, 5, 6, 7, 8, 9)


@pytest.fixture(scope="module")
def extracted(spark):
    rows = [
        (f"http://h{i % 3}.test/p{i}", TS, f"text {i} ☃".encode())
        for i in range(40)
    ]
    rows.append(("http://evil.test/\r\nWARC-Type: smuggled", TS, b"x"))
    rows.append(("http://empty.test/", TS, b""))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text binary"
    )


def _read_back(spark, out):
    return {
        (r["url"]): (r["ts"], bytes(r["text"]))
        for r in read_wet(spark, out).collect()
    }


def test_wet_roundtrip_and_lineage(spark, extracted, tmp_path):
    out = str(tmp_path / "wet")
    lineage = wet_export(
        extracted, out, n_shards=4, ts_col="warc_ts"
    ).collect()
    # lineage reconciles with the input exactly
    assert sum(r["records"] for r in lineage) == extracted.count()
    want_bytes = sum(
        len(bytes(r["text"])) for r in extracted.collect()
    )
    assert sum(r["block_bytes"] for r in lineage) == want_bytes
    for r in lineage:
        assert os.path.getsize(r["path"]) == r["file_bytes"]
    # round-trip: every url comes back with its exact text bytes and
    # ts; the hostile url's CTL bytes are percent-encoded on write
    # (warc._safe_uri) so the record FRAMING survives -- the encoded
    # form is the read-back key, and no record was smuggled/lost
    got = _read_back(spark, out)
    enc = {
        "http://evil.test/\r\nWARC-Type: smuggled":
        "http://evil.test/%0D%0AWARC-Type: smuggled"
    }
    for r in extracted.collect():
        ts, text = got[enc.get(r["url"], r["url"])]
        assert text == bytes(r["text"])
        assert ts == TS
    assert len(got) == extracted.count()


def test_wet_export_deterministic(spark, extracted, tmp_path):
    """Two exports of the same input are byte-identical per shard —
    the property that makes retry idempotent without a commit log."""
    o1, o2 = str(tmp_path / "a"), str(tmp_path / "b")
    wet_export(extracted, o1, n_shards=3, ts_col="warc_ts").collect()
    wet_export(extracted, o2, n_shards=3, ts_col="warc_ts").collect()
    f1 = sorted(glob.glob(os.path.join(o1, "*.gz")))
    f2 = sorted(glob.glob(os.path.join(o2, "*.gz")))
    assert [os.path.basename(f) for f in f1] == [
        os.path.basename(f) for f in f2
    ]
    for a, b in zip(f1, f2):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), os.path.basename(a)


def test_wet_default_epoch_ts(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://a.test/", b"hello")], "url string, text binary"
    )
    out = str(tmp_path / "wet")
    wet_export(df, out, n_shards=1).collect()
    got = _read_back(spark, out)
    ts, text = got["http://a.test/"]
    assert text == b"hello" and ts == datetime.datetime(1970, 1, 1)


def test_warc_export_roundtrip(spark, tmp_path):
    """warc_export re-emits pages as response records the repo's own
    WARC reader ingests back byte-for-byte."""
    from xhtml_parser_spark.sources.warc import read_warc

    pages = spark.createDataFrame(
        [
            (f"http://h.test/p{i}", TS, f"<r>doc {i}</r>".encode())
            for i in range(10)
        ],
        "url string, warc_ts timestamp, html binary",
    )
    out = str(tmp_path / "warc")
    lineage = warc_export(pages, out, n_shards=2).collect()
    assert sum(r["records"] for r in lineage) == 10
    got = {
        r["url"]: bytes(r["html"])
        for r in read_warc(spark, out).collect()
    }
    for r in pages.collect():
        assert got[r["url"]] == bytes(r["html"])


def test_wet_resume_skips_committed_shards(spark, extracted, tmp_path):
    """resume=True: shards whose final file exists are not rewritten
    (mtime unchanged), missing shards are completed, lineage covers
    all shards either way, and the completed output is byte-identical
    to a fresh full export."""
    out = str(tmp_path / "wet")
    wet_export(extracted, out, n_shards=4, ts_col="warc_ts").collect()
    files = sorted(glob.glob(os.path.join(out, "*.gz")))
    assert len(files) == 4
    # simulate a crash that lost two shards
    victims, survivors = files[:2], files[2:]
    for f in victims:
        os.remove(f)
    marks = {f: os.stat(f).st_mtime_ns for f in survivors}
    lineage = wet_export(
        extracted, out, n_shards=4, ts_col="warc_ts", resume=True
    ).collect()
    assert sum(r["records"] for r in lineage) == extracted.count()
    for f in survivors:  # untouched, not rewritten
        assert os.stat(f).st_mtime_ns == marks[f]
    # completed output equals a fresh full export byte-for-byte
    ref = str(tmp_path / "ref")
    wet_export(extracted, ref, n_shards=4, ts_col="warc_ts").collect()
    for f in sorted(glob.glob(os.path.join(out, "*.gz"))):
        r = os.path.join(ref, os.path.basename(f))
        with open(f, "rb") as fa, open(r, "rb") as fb:
            assert fa.read() == fb.read(), os.path.basename(f)


def test_wet_export_validates(spark, extracted, tmp_path):
    with pytest.raises(ValueError, match="n_shards"):
        wet_export(extracted, str(tmp_path / "x"), n_shards=0)


def test_wet_duplicate_urls_deterministic_and_null_handling(spark, tmp_path):
    """Duplicate urls (same page fetched twice) sort on the total
    (url, ts, payload) key so re-runs stay byte-identical; null url
    rows are dropped (unaddressable record), null payload becomes an
    empty block, null ts stamps the epoch."""
    rows = [
        ("http://dup.test/", TS, b"second"),
        ("http://dup.test/", TS, b"first"),
        ("http://dup.test/", datetime.datetime(2020, 1, 1), b"zz-earliest"),
        (None, TS, b"dropped"),
        ("http://nullpayload.test/", None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text binary"
    )
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        lineage = wet_export(
            df.repartition(4) if name == "b" else df,
            out, n_shards=1, ts_col="warc_ts",
        ).collect()
        assert sum(r["records"] for r in lineage) == 4  # null url dropped
        outs.append(out)
    f1 = sorted(glob.glob(os.path.join(outs[0], "*.gz")))
    f2 = sorted(glob.glob(os.path.join(outs[1], "*.gz")))
    for a, b in zip(f1, f2):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()
    recs = [
        (r["url"], r["ts"], bytes(r["text"]))
        for r in read_wet(spark, outs[0]).collect()
    ]
    dup = [r for r in recs if r[0] == "http://dup.test/"]
    # shard-internal order is the total sort key: earliest ts first,
    # then payload bytes
    assert [r[2] for r in dup] == [b"zz-earliest", b"first", b"second"]
    null_p = next(r for r in recs if r[0] == "http://nullpayload.test/")
    assert null_p[2] == b"" and null_p[1] == datetime.datetime(1970, 1, 1)
