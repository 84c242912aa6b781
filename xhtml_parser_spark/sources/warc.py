"""WARC source: Common-Crawl's native archive format as a pages table.

A crawl delivery is ``.warc.gz`` files -- one gzip MEMBER per WARC
record (ISO 28500 packaging, what makes per-record range requests
possible on CC's S3 buckets). This module provides:

  * ``iter_warc_records(stream)``  -- pure-Python WARC/1.0 record
    parser (headers + Content-Length-framed block), response records
    reduced to (url, warc_ts, html) with the HTTP response envelope
    stripped;
  * ``write_warc_gz(path, rows)`` -- deterministic writer (one gzip
    member per record, mtime pinned) used by tests and corpus
    synthesis;
  * a Spark Python Data Source ``xps_warc`` scanning a directory of
    ``.warc(.gz)`` files into the standard PAGES_SCHEMA -- one
    partition per file group (listing/grouping shared with the other
    python sources), the scan itself streaming: records decode one at
    a time inside the python task, so a 1 GB archive never
    materializes.

At scale the posture matches the fused reader: the work unit is the
input file, partitions() lists the directory on the driver, and
parallelism comes from the file count (CC segments ship ~1 GB
apiece -- thousands of files per crawl).

The HTTP envelope strip follows what CC consumers do: the record block
of a ``response`` record is an HTTP/1.x message; everything past the
first CRLFCRLF is the payload. ``WARC-Target-URI`` and ``WARC-Date``
(ISO 8601, UTC) map to (url, warc_ts).
"""

from __future__ import annotations

import datetime
import gzip
import io
import os
from typing import Iterable, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_CRLF = b"\r\n"


def _read_headers(fh) -> dict[bytes, bytes] | None:
    """Read a WARC header block (terminated by an empty line). Returns
    None at clean EOF. Raises on a malformed block."""
    first = fh.readline()
    # tolerate inter-record blank lines (the spec mandates exactly two
    # CRLFs after the block; be liberal in what we accept)
    while first in (_CRLF, b"\n"):
        first = fh.readline()
    if not first:
        return None
    if not first.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {first[:40]!r}")
    headers: dict[bytes, bytes] = {}
    while True:
        line = fh.readline()
        if line in (_CRLF, b"\n", b""):
            return headers
        k, _, v = line.partition(b":")
        headers[k.strip().lower()] = v.strip()


def iter_warc_records(
    fh,
) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """(url, warc_ts, html) for each ``response`` record in a WARC
    stream (plain or wrapped in a decompressing file object). Non-
    response records (warcinfo, request, metadata) are skipped; the
    HTTP envelope is stripped from response blocks."""
    while True:
        headers = _read_headers(fh)
        if headers is None:
            return
        length = int(headers[b"content-length"])
        block = fh.read(length)
        if len(block) != length:
            raise ValueError("truncated WARC record block")
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        # strip a wrapping <...> (WARC 1.0 allowed it; 1.1 forbids it)
        if uri.startswith("<") and uri.endswith(">"):
            uri = uri[1:-1]
        ts_raw = headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode()
        ts = datetime.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
        ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        # response block = HTTP message; payload follows the first
        # CRLFCRLF (CC convention; a bare payload without an HTTP
        # status line is passed through whole)
        if block.startswith(b"HTTP/"):
            sep = block.find(b"\r\n\r\n")
            payload = block[sep + 4 :] if sep >= 0 else b""
        else:
            payload = block
        yield uri, ts, payload


def write_warc_gz(path: str, rows: Iterable[tuple[str, datetime.datetime, bytes]]) -> int:
    """Deterministic .warc.gz writer: one gzip member per response
    record (the CC packaging), mtime pinned to 0 so identical input
    produces identical bytes. Returns the record count."""
    n = 0
    with open(path, "wb") as out:
        for url, ts, html in rows:
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
            hdr = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Target-URI: " + url.encode() + b"\r\n"
                b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
                b"Content-Length: " + str(len(http)).encode() + b"\r\n"
                b"\r\n"
            )
            record = hdr + http + b"\r\n\r\n"
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            out.write(buf.getvalue())
            n += 1
    return n


def write_wet_gz(
    path: str, rows: Iterable[tuple[str, datetime.datetime, bytes]]
) -> int:
    """WET sink: extracted text as WARC ``conversion`` records --
    Common Crawl's exchange format for exactly this pipeline's output
    (a .wet.gz file per shard, one gzip member per record, text/plain
    blocks, no HTTP envelope). Deterministic like write_warc_gz.
    Returns the record count."""
    n = 0
    with open(path, "wb") as out:
        for url, ts, text in rows:
            hdr = (
                b"WARC/1.0\r\n"
                b"WARC-Type: conversion\r\n"
                b"WARC-Target-URI: " + url.encode() + b"\r\n"
                b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
                b"Content-Type: text/plain\r\n"
                b"Content-Length: " + str(len(text)).encode() + b"\r\n"
                b"\r\n"
            )
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(hdr + text + b"\r\n\r\n")
            out.write(buf.getvalue())
            n += 1
    return n


def iter_wet_records(fh) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """(url, ts, text) for each ``conversion`` record in a WET stream."""
    while True:
        headers = _read_headers(fh)
        if headers is None:
            return
        length = int(headers[b"content-length"])
        block = fh.read(length)
        if len(block) != length:
            raise ValueError("truncated WET record block")
        if headers.get(b"warc-type") != b"conversion":
            continue
        uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts_raw = headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode()
        ts = datetime.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
        ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        yield uri, ts, block


def write_wet_shards(parsed, out_dir: str, text_col: str = "text") -> None:
    """Distributed WET export of a DataFrame carrying (url, warc_ts,
    <text_col>) -- e.g. parse_pages output joined back to the pages
    table for the timestamp. One .wet.gz shard per partition, written
    in-task (the same shared-filesystem posture as the fused sink).
    The crawl-ecosystem-facing sink: downstream consumers that already
    read CC WET files ingest this pipeline's output unchanged."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)

    def _write(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = [
            (r["url"], r["warc_ts"], bytes(r[text_col] or b"")) for r in it
        ]
        if rows:
            write_wet_gz(
                _os.path.join(out_dir, f"part-{pid:05d}.wet.gz"), rows
            )

    parsed.select("url", "warc_ts", text_col).foreachPartition(_write)


def _open_warc(path: str):
    if path.endswith(".gz"):
        # gzip transparently concatenates members -- exactly the
        # one-member-per-record framing
        return gzip.open(path, "rb")
    return open(path, "rb")


class _WarcPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xps_warc requires a path")
        self.num_partitions = int(options.get("num_partitions", "0"))

    def partitions(self):
        from .listing import group_round_robin

        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith((".warc", ".warc.gz"))
        )
        if not files:
            raise FileNotFoundError(f"no .warc(.gz) files under {self.path}")
        return [
            _WarcPartition(g) for g in group_round_robin(files, self.num_partitions)
        ]

    def read(self, partition: _WarcPartition) -> Iterator:
        for path in partition.paths:
            with _open_warc(path) as fh:
                for url, ts, html in iter_warc_records(fh):
                    # PAGES_SCHEMA order: url, warc_ts, html, text, lang
                    yield (url, ts, html, None, "unknown")


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xps_warc"

    def schema(self):
        from .synth import PAGES_SCHEMA

        return PAGES_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path: str, num_partitions: int | None = None):
    """Directory of .warc(.gz) files -> pages DataFrame
    (PAGES_SCHEMA). Feed straight into parse_pages/run_extract."""
    register(spark)
    reader = spark.read.format("xps_warc").option("path", path)
    if num_partitions:
        reader = reader.option("num_partitions", str(num_partitions))
    return reader.load()
