"""WARC source: Common-Crawl's native archive format as a pages table.

A crawl delivery is ``.warc.gz`` files -- one gzip MEMBER per WARC
record (ISO 28500 packaging, what makes per-record range requests
possible on CC's S3 buckets). This module provides:

  * ``iter_warc_records(stream)``  -- pure-Python WARC/1.0 record
    parser (headers + Content-Length-framed block), response records
    reduced to (url, warc_ts, html) with the HTTP response envelope
    stripped (incl. de-chunking Transfer-Encoding: chunked bodies and
    decompressing Content-Encoding: gzip/deflate ones, as warcio and
    every CC consumer does);
  * ``write_warc_gz(path, rows)`` -- deterministic writer (one gzip
    member per record, mtime pinned) used by tests and corpus
    synthesis;
  * ``write_wet_gz`` / ``iter_wet_records`` / ``write_wet_shards`` --
    the WET (extracted-text ``conversion`` record) counterpart, the
    crawl ecosystem's exchange format for exactly this pipeline's
    output;
  * ``wat_metadata`` / ``write_wat_shards`` / ``iter_wat_records`` --
    the WAT (JSON ``metadata`` record) counterpart: per-page link
    list (href + anchor text + resolved url) from one extract_links
    DOM pass, completing the WARC/WET/WAT trio;
  * a Spark Python Data Source ``xps_warc`` scanning ``.warc(.gz)``
    files into the standard PAGES_SCHEMA -- one partition per file
    group (listing/grouping shared with the other python sources), the
    scan itself streaming: records decode one at a time inside the
    python task, so a 1 GB archive never materializes.

At scale the posture matches the fused reader: the work unit is the
input file, partitions() lists the directory on the driver, and
parallelism comes from the file count (CC segments ship ~1 GB
apiece -- thousands of files per crawl). run_extract's warc path
slices by FILE GROUP (files[k::n_slices] of the sorted listing, the
fused path's commit unit) so each archive is gzip-decoded exactly
once per job, not once per slice.

The HTTP envelope strip follows what CC consumers do: the record block
of a ``response`` record is an HTTP/1.x message; everything past the
first blank line (CRLFCRLF per spec, bare LFLF tolerated -- real
crawls capture servers that emit either) is the payload.
``WARC-Target-URI`` and ``WARC-Date`` (ISO 8601, UTC) map to
(url, warc_ts).
"""

from __future__ import annotations

import datetime
import gzip
import io
import os
import zlib
from typing import Iterable, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_CRLF = b"\r\n"


def _read_headers(fh) -> dict[bytes, bytes] | None:
    """Read a WARC header block (terminated by an empty line). Returns
    None at clean EOF. Raises ValueError on a malformed or truncated
    block. Folded continuation lines (leading space/tab, legal in
    WARC/1.0) append to the previous header's value."""
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
    last_key: bytes | None = None
    while True:
        line = fh.readline()
        if line in (_CRLF, b"\n"):
            return headers
        if line == b"":
            raise ValueError("truncated WARC header block (EOF before blank line)")
        if line[:1] in (b" ", b"\t") and last_key is not None:
            # folded header: continuation of the previous value
            headers[last_key] += b" " + line.strip()
            continue
        k, _, v = line.partition(b":")
        last_key = k.strip().lower()
        headers[last_key] = v.strip()


def _read_block(fh, headers: dict[bytes, bytes]) -> bytes:
    if b"content-length" not in headers:
        raise ValueError("WARC record missing Content-Length header")
    length = int(headers[b"content-length"])
    block = fh.read(length)
    if len(block) != length:
        raise ValueError("truncated WARC record block")
    return block


def _parse_ts(headers: dict[bytes, bytes]) -> datetime.datetime:
    ts_raw = headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode()
    ts = datetime.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
    if ts.tzinfo is None:
        # tz-less WARC-Date (lenient writers): take as already-UTC --
        # astimezone() would read it as HOST-local time and make the
        # stored instant depend on the machine's TZ
        return ts
    return ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)


def _format_ts(ts: datetime.datetime) -> bytes:
    """WARC-Date bytes for a datetime: tz-aware values are converted to
    the UTC instant (naive ones are taken as already-UTC, the pages
    convention), sub-second precision is preserved when present (WARC
    1.1 allows it; second-only stamps stay in the 1.0 shape)."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if ts.microsecond else "%Y-%m-%dT%H:%M:%SZ"
    return ts.strftime(fmt).encode()


def _dechunk(body: bytes) -> bytes:
    """Decode a Transfer-Encoding: chunked HTTP body (never raises -- a
    crawl row with a bad body should surface as a parse error, not kill
    the task). A body whose FIRST size line doesn't parse was never
    chunk-framed (crawlers/proxies that de-chunk the stream but keep
    the header are common) -- returned raw. Framing that breaks
    mid-stream returns what decoded so far (genuinely truncated)."""
    out = []
    pos = 0
    while True:
        # tolerate bare-LF size-line endings like the header separator
        nl_crlf = body.find(b"\r\n", pos)
        nl_lf = body.find(b"\n", pos)
        if nl_crlf >= 0 and nl_crlf <= nl_lf:
            nl, skip = nl_crlf, 2
        elif nl_lf >= 0:
            nl, skip = nl_lf, 1
        else:
            if pos == 0:
                return body  # no framing at all: not actually chunked
            break
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            if pos == 0:
                return body  # first size line isn't hex: already de-chunked
            break
        if size == 0:
            break
        chunk = body[nl + skip : nl + skip + size]
        out.append(chunk)
        if len(chunk) != size:
            break
        pos = nl + skip + size + skip  # skip chunk + trailing line end
    return b"".join(out)


def _header_value(head: bytes, name: bytes) -> bytes:
    """Lower-cased value of the named HTTP header in a header block, or
    b"" when absent. Matches the header NAME only -- a substring scan
    of the whole block would misfire on extension headers
    (X-Original-Transfer-Encoding) or unrelated values (an ETag
    containing "gzip")."""
    for line in head.split(b"\n"):
        k, sep, v = line.partition(b":")
        if sep and k.strip().lower() == name:
            return v.strip().lower()
    return b""


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP/1.x envelope from a response block: payload =
    bytes past the first blank line (CRLFCRLF, or bare LFLF for
    LF-only captures), de-chunked / decompressed per the envelope's
    Transfer-Encoding / Content-Encoding. A block without a blank line
    is all headers -- empty payload."""
    i_crlf = block.find(b"\r\n\r\n")
    i_lf = block.find(b"\n\n")
    if i_crlf >= 0 and (i_lf < 0 or i_crlf + 1 <= i_lf):
        head, payload = block[:i_crlf], block[i_crlf + 4 :]
    elif i_lf >= 0:
        head, payload = block[:i_lf], block[i_lf + 2 :]
    else:
        return b""
    te = _header_value(head, b"transfer-encoding")
    ce = _header_value(head, b"content-encoding")
    if b"chunked" in te:
        payload = _dechunk(payload)
    if b"gzip" in ce or b"deflate" in ce:
        try:
            if payload[:2] == b"\x1f\x8b":
                payload = gzip.decompress(payload)
            else:
                payload = zlib.decompress(payload, -zlib.MAX_WBITS)
        except (OSError, zlib.error):
            pass  # keep raw bytes; the parser reports them as bad XHTML
    return payload


def _iter_typed_records(
    fh, want_type: bytes, strip_http: bool
) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """Shared WARC/WET record walk: (url, ts, block) for records of
    ``want_type``, other record types (warcinfo, request, metadata)
    skipped after their framed block is consumed."""
    while True:
        headers = _read_headers(fh)
        if headers is None:
            return
        block = _read_block(fh, headers)
        if headers.get(b"warc-type") != want_type:
            continue
        uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        # strip a wrapping <...> (WARC 1.0 allowed it; 1.1 forbids it)
        if uri.startswith("<") and uri.endswith(">"):
            uri = uri[1:-1]
        ts = _parse_ts(headers)
        if strip_http and block.startswith(b"HTTP/"):
            payload = _http_payload(block)
        else:
            payload = block
        yield uri, ts, payload


def iter_warc_records(fh) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """(url, warc_ts, html) for each ``response`` record in a WARC
    stream (plain or wrapped in a decompressing file object). Non-
    response records are skipped; the HTTP envelope is stripped from
    response blocks (chunked bodies de-chunked, gzip/deflate bodies
    decompressed)."""
    return _iter_typed_records(fh, b"response", strip_http=True)


# --------------------------------------------------------------------------
# Fast .warc.gz ingest path (round-2 verdict item #7)
#
# Profiled on the bench shards (938 records / 30.5 MB raw per shard):
# the gzip MEMBER DECODE dominates, not the record framing --
# gzip.open().read() 0.42 s vs 0.07 s for framing the same bytes; the
# module-level GzipFile pays full header/CRC re-init per member, which
# one-member-per-record packaging (the CC layout) multiplies by the
# record count. A chunked zlib.decompressobj(31) walk decodes the same
# members in 0.178 s (2.4x), and an index-based buffer walk replaces
# readline() framing (0.072 -> ~0.02 s). Record boundaries spanning
# member boundaries are handled with a carry buffer, so multi-record
# and split-record members stay correct (differentially tested against
# the streaming walk).
# --------------------------------------------------------------------------


def _iter_gzip_members(comp: bytes, chunk: int = 1 << 16) -> Iterator[bytes]:
    """Decode each gzip member of a concatenated-member buffer.
    Bounded chunk feeds keep the walk O(n): feeding the whole remaining
    buffer per member would memcpy the tail once per member, and each
    member's LAST feed still copies its chunk-sized leftover into
    unused_data -- measured sweep: 64 KB chunks hit the single-stream
    inflate floor (347 MB/s vs 98 MB/s at 1 MB chunks, 72 MB/s for
    module-level gzip on the same per-record members)."""
    pos, n = 0, len(comp)
    while pos < n:
        d = zlib.decompressobj(31)
        parts = []
        while not d.eof:
            fed = comp[pos : pos + chunk]
            if not fed:
                raise ValueError("truncated gzip member")
            parts.append(d.decompress(fed))
            pos += len(fed) - len(d.unused_data)
            if d.unused_data:
                break
        yield b"".join(parts)


def _parse_record_at(buf: bytes, pos: int):
    """One record from ``buf`` at ``pos``: (headers, block, next_pos),
    or None when the record is INCOMPLETE at the buffer's end (caller
    carries the tail into the next gzip member). Malformed data raises,
    exactly like the streaming walk."""
    n = len(buf)
    while True:  # skip inter-record blank lines
        if buf.startswith(b"\r\n", pos):
            pos += 2
        elif buf.startswith(b"\n", pos):
            pos += 1
        else:
            break
    if pos >= n:
        return None
    head_end = buf.find(b"\r\n\r\n", pos)
    # bare LFLF tolerated (same liberality as _read_headers). When the
    # CRLF separator exists, only an EARLIER bare LFLF can matter --
    # bounding the search to the header block avoids re-scanning each
    # record's whole body for a "\n\n" that CRLF headers never contain
    # (measured ~25% of the framing cost on the bench shards).
    lf_end = (
        buf.find(b"\n\n", pos, head_end)
        if head_end >= 0
        else buf.find(b"\n\n", pos)
    )
    sep = 4
    if head_end < 0 or (0 <= lf_end < head_end):
        if lf_end >= 0:
            head_end, sep = lf_end, 2
        else:
            return None  # incomplete header block
    if not buf.startswith(b"WARC/", pos):
        raise ValueError(f"not a WARC record header: {buf[pos:pos+40]!r}")
    headers: dict[bytes, bytes] = {}
    last_key: bytes | None = None
    for line in buf[pos:head_end].splitlines()[1:]:
        if line[:1] in (b" ", b"\t") and last_key is not None:
            headers[last_key] += b" " + line.strip()
            continue
        k, _, v = line.partition(b":")
        last_key = k.strip().lower()
        headers[last_key] = v.strip()
    if b"content-length" not in headers:
        raise ValueError("WARC record missing Content-Length header")
    length = int(headers[b"content-length"])
    body_start = head_end + sep
    if body_start + length > n:
        return None  # block continues in the next member
    return headers, buf[body_start : body_start + length], body_start + length


def _iter_typed_records_gz(
    comp: bytes, want_type: bytes, strip_http: bool
) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """The buffer-walk twin of _iter_typed_records over a concatenated
    .warc.gz byte string; same yielded tuples, same error classes."""
    carry = b""
    for member in _iter_gzip_members(comp):
        buf = carry + member if carry else member
        pos = 0
        while True:
            parsed = _parse_record_at(buf, pos)
            if parsed is None:
                carry = buf[pos:]
                break
            headers, block, pos = parsed
            if headers.get(b"warc-type") != want_type:
                continue
            uri = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
            if uri.startswith("<") and uri.endswith(">"):
                uri = uri[1:-1]
            ts = _parse_ts(headers)
            if strip_http and block.startswith(b"HTTP/"):
                yield uri, ts, _http_payload(block)
            else:
                yield uri, ts, block
    if carry.strip(b"\r\n"):
        raise ValueError("truncated WARC record block")


def iter_warc_records_gz_bytes(
    comp: bytes,
) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """(url, warc_ts, html) response records from raw .warc.gz bytes --
    the fast ingest path (chunked zlib members + index framing)."""
    return _iter_typed_records_gz(comp, b"response", strip_http=True)


def iter_wet_records(fh) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """(url, ts, text) for each ``conversion`` record in a WET stream."""
    return _iter_typed_records(fh, b"conversion", strip_http=False)


def _write_members_gz(path: str, records: Iterable[bytes]) -> int:
    """One gzip member per record, mtime pinned to 0 (deterministic:
    identical input produces identical bytes). Returns the count.

    compresslevel 6 (zlib default, the CC-conventional setting), not
    Python's gzip default 9: level 9 measured ~2x slower for ~1%
    smaller output and made gzip THE bottleneck of the sharded WET
    export at the 10x corpus (BENCH.md round 5). Determinism is
    per-level; the level is pinned here, never caller-chosen."""
    n = 0
    with open(path, "wb") as out:
        for record in records:
            buf = io.BytesIO()
            with gzip.GzipFile(
                fileobj=buf, mode="wb", mtime=0, compresslevel=6
            ) as gz:
                gz.write(record)
            out.write(buf.getvalue())
            n += 1
    return n


def _safe_uri(url: str) -> bytes:
    """URL bytes safe to embed in a WARC header line: CTL characters
    (CR/LF/TAB/...) are percent-encoded so a hostile url from an
    arbitrary pages table cannot inject headers or break the
    Content-Length framing of the archive."""
    raw = url.encode()
    if not any(b < 0x20 or b == 0x7F for b in raw):
        return raw
    return b"".join(
        b"%%%02X" % b if (b < 0x20 or b == 0x7F) else bytes((b,)) for b in raw
    )


def _record_bytes(
    warc_type: bytes, url: str, ts: datetime.datetime, block: bytes,
    extra: bytes = b"",
) -> bytes:
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Target-URI: " + _safe_uri(url) + b"\r\n"
        b"WARC-Date: " + _format_ts(ts) + b"\r\n"
        + extra
        + b"Content-Length: " + str(len(block)).encode() + b"\r\n"
        b"\r\n"
    )
    return hdr + block + b"\r\n\r\n"


def write_warc_gz(
    path: str, rows: Iterable[tuple[str, datetime.datetime, bytes]]
) -> int:
    """Deterministic .warc.gz writer: one gzip member per ``response``
    record (the CC packaging). Returns the record count."""
    return _write_members_gz(
        path,
        (
            _record_bytes(
                b"response", url, ts,
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html,
            )
            for url, ts, html in rows
        ),
    )


def write_wet_gz(
    path: str, rows: Iterable[tuple[str, datetime.datetime, bytes]]
) -> int:
    """WET sink: extracted text as WARC ``conversion`` records --
    Common Crawl's exchange format for exactly this pipeline's output
    (one gzip member per record, text/plain blocks, no HTTP envelope).
    Deterministic like write_warc_gz. Returns the record count."""
    return _write_members_gz(
        path,
        (
            _record_bytes(
                b"conversion", url, ts, text,
                extra=b"Content-Type: text/plain\r\n",
            )
            for url, ts, text in rows
        ),
    )


_EPOCH = datetime.datetime(1970, 1, 1)


def _write_shards(df, out_dir: str, payload_col: str, writer, suffix: str) -> None:
    """Shared distributed shard-writer core: one ``writer``-produced
    gz shard per partition of (url, warc_ts, <payload_col>), written
    in-task (the same shared-filesystem posture as the fused sink) and
    STREAMED record by record -- the partition never materializes in
    the python worker. The timestamp travels as epoch MICROS
    (``unix_micros``, an instant): PySpark's row path converts
    TimestampType to naive datetimes in the worker's OS-local timezone,
    which would shift every exported WARC-Date by the host's UTC offset
    on a non-UTC machine. A null warc_ts stamps the epoch (previously
    crashed the task: timedelta(microseconds=None))."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def _write(it):
        from pyspark import TaskContext

        first = next(it, None)
        if first is None:
            return  # empty partition: no shard file
        pid = TaskContext.get().partitionId()

        def rows():
            for r in _chain_one(first, it):
                ts = _EPOCH + datetime.timedelta(microseconds=r["_ts_us"])
                yield r["url"], ts, bytes(r[payload_col] or b"")

        writer(os.path.join(out_dir, f"part-{pid:05d}{suffix}"), rows())

    df.select(
        "url",
        F.coalesce(F.unix_micros("warc_ts"), F.lit(0)).alias("_ts_us"),
        payload_col,
    ).foreachPartition(_write)


def _chain_one(first, rest):
    yield first
    yield from rest


def write_wet_shards(parsed, out_dir: str, text_col: str = "text") -> None:
    """Distributed WET export of a DataFrame carrying (url, warc_ts,
    <text_col>) -- e.g. parse_pages output joined back to the pages
    table for the timestamp. One .wet.gz shard per partition. The
    crawl-ecosystem-facing sink: downstream consumers that already read
    CC WET files ingest this pipeline's output unchanged."""
    _write_shards(parsed, out_dir, text_col, write_wet_gz, ".wet.gz")


def iter_wat_records(fh) -> Iterator[tuple[str, datetime.datetime, bytes]]:
    """(url, ts, json_bytes) for each ``metadata`` record in a WAT
    stream."""
    return _iter_typed_records(fh, b"metadata", strip_http=False)


def write_wat_gz(
    path: str, rows: Iterable[tuple[str, datetime.datetime, bytes]]
) -> int:
    """WAT sink: per-page metadata as WARC ``metadata`` records with a
    JSON block -- the Common Crawl companion format carrying the link
    graph and page metadata (one gzip member per record). Deterministic
    like write_warc_gz. Returns the record count."""
    return _write_members_gz(
        path,
        (
            _record_bytes(
                b"metadata", url, ts, js,
                extra=b"Content-Type: application/json\r\n",
            )
            for url, ts, js in rows
        ),
    )


def wat_metadata(pages):
    """CC-WAT-style metadata per page as (url, warc_ts, wat:binary):
    the JSON Envelope carries WARC-Target-URI plus the page's out-link
    list -- (node_id, tag, href, text, url) per href-carrying element,
    node-id ordered, from ONE extract_links DOM pass. Pages with no
    links (or a failed parse -- WAT generators emit a record per
    response either way) carry an empty Links array.

    The JSON is deterministic: to_json renders struct fields in
    declaration order and the Links array is array_sort'ed by its
    leading node_id field, so identical input produces identical
    bytes (the same guarantee as the WARC/WET writers)."""
    from pyspark.sql import functions as F

    from ..operators.links import extract_links

    links = extract_links(pages)
    per_url = links.groupBy("url").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("node_id"),
                    F.col("tag"),
                    F.col("href"),
                    F.col("anchor_text").alias("text"),
                    F.col("link_url").alias("url"),
                )
            )
        ).alias("links")
    )
    base = pages.select("url", "warc_ts").join(per_url, "url", "left")
    empty = F.array().cast(per_url.schema["links"].dataType)
    envelope = F.struct(
        F.struct(
            F.struct(F.col("url").alias("WARC-Target-URI")).alias(
                "WARC-Header-Metadata"
            ),
            F.struct(
                F.struct(
                    F.struct(
                        F.coalesce(F.col("links"), empty).alias("Links")
                    ).alias("HTML-Metadata")
                ).alias("HTTP-Response-Metadata")
            ).alias("Payload-Metadata"),
        ).alias("Envelope")
    )
    return base.select(
        "url", "warc_ts", F.encode(F.to_json(envelope), "UTF-8").alias("wat")
    )


def write_wat_shards(pages, out_dir: str) -> None:
    """Distributed WAT export of a pages DataFrame (url, warc_ts,
    html): one .wat.gz shard per partition carrying the per-page JSON
    metadata records (see wat_metadata). Completes the crawl-ecosystem
    sink trio: WARC (raw pages) / WET (extracted text) / WAT (metadata
    + link graph)."""
    _write_shards(wat_metadata(pages), out_dir, "wat", write_wat_gz, ".wat.gz")


def cdx_index(pages, num_partitions: int | None = None):
    """CDX capture index of a pages DataFrame (url, warc_ts, html):

    (surt, ts, url, digest, length)

    -- the web-archive lookup artifact (Common Crawl publishes exactly
    this next to its WARCs): ``surt`` is the SURT sort key
    (functions.urls.surt_key), ``ts`` the 14-digit capture timestamp,
    ``digest`` the SHA-256 hex of the raw payload (classic CDX uses
    SHA-1-Base32; SHA-256 here so the DuckDB oracle can replay it --
    the column is the content-identity role, not a wire format), and
    ``length`` the payload octet count.

    Scale shape: the index IS its global sort order, so the plan is
    one range repartition on ``surt`` + in-partition sort -- writing
    the partitions in order yields a globally sorted, binary-
    searchable shard set (the ZipNum layout's precondition). Map-side
    everything else; timestamps format in the session timezone (pin
    UTC, as get_spark does)."""
    from pyspark.sql import functions as F

    from ..functions.urls import surt_key

    keyed = pages.select(
        surt_key(F.col("url")).alias("surt"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts"),
        "url",
        F.sha2(F.col("html"), 256).alias("digest"),
        F.octet_length("html").cast("bigint").alias("length"),
    )
    n = num_partitions or pages.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, "surt", "ts").sortWithinPartitions(
        "surt", "ts"
    )


def write_warc_shards(pages, out_dir: str, html_col: str = "html") -> None:
    """Distributed WARC export of a pages DataFrame (url, warc_ts,
    <html_col>): one .warc.gz shard per partition, response records
    with a minimal HTTP envelope. The inverse of read_warc -- used by
    the bench to synthesize a crawl delivery from the parquet corpus."""
    _write_shards(pages, out_dir, html_col, write_warc_gz, ".warc.gz")


def _open_warc(path: str):
    if path.endswith(".gz"):
        # gzip transparently concatenates members -- exactly the
        # one-member-per-record framing
        return gzip.open(path, "rb")
    return open(path, "rb")


def list_warc_files(input_dir: str) -> list[str]:
    """Sorted absolute paths of the dir's .warc(.gz) files (shared
    listing core -- see listing.list_files)."""
    from .listing import list_files

    return list_files(input_dir, (".warc", ".warc.gz"))


def warc_listing_digest(input_dir: str) -> str:
    """md5 of the sorted .warc basename listing -- run_extract's warc
    slice membership is files[k::n_slices] of this listing, so resume
    must refuse to continue when it changes (shared digest core --
    see listing.files_digest)."""
    from .listing import files_digest

    return files_digest(list_warc_files(input_dir))


class _WarcPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.files = options.get("files")  # newline-joined explicit list
        if not self.path and not self.files:
            raise ValueError("xps_warc requires a path or a files option")
        self.num_partitions = int(options.get("num_partitions", "0"))

    def partitions(self):
        from .listing import group_round_robin

        if self.files:
            files = [f for f in self.files.split("\n") if f]
        else:
            files = list_warc_files(self.path)
        return [
            _WarcPartition(g) for g in group_round_robin(files, self.num_partitions)
        ]

    def read(self, partition: _WarcPartition) -> Iterator:
        for path in partition.paths:
            if path.endswith(".gz"):
                # fast path: one read + chunked zlib member walk +
                # index-based framing (2-3x the gzip.open/readline
                # stream; memory bounded by one decoded member + carry)
                with open(path, "rb") as fh:
                    comp = fh.read()
                for url, ts, html in iter_warc_records_gz_bytes(comp):
                    # PAGES_SCHEMA order: url, warc_ts, html, text, lang
                    yield (url, ts, html, None, "unknown")
                continue
            with _open_warc(path) as fh:
                for url, ts, html in iter_warc_records(fh):
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


def read_warc_files(spark, files: list[str], num_partitions: int | None = None):
    """Explicit .warc(.gz) file list -> pages DataFrame. The slice
    reader for run_extract's warc path: each slice reads (and gzip-
    decodes) ONLY its own file group, so a delivery is decoded once
    per job instead of once per slice."""
    register(spark)
    reader = spark.read.format("xps_warc").option("files", "\n".join(files))
    if num_partitions:
        reader = reader.option("num_partitions", str(num_partitions))
    return reader.load()


# --------------------------------------------------------------------------
# Fused WARC scan+parse data source
#
# read_warc -> parse_pages ships every html byte Python worker -> JVM
# (datasource output) -> Python worker (mapInArrow input): the corpus
# crosses Arrow IPC twice before the kernel sees it. Profiled at sf0.1
# that IPC -- not the gzip decode (~0.8 core-s/shard-wave) and not the
# record framing -- is most of the warc bench's gap vs the parquet
# datasource. This source is the parquet read_parsed twin for crawl
# deliveries: decode members + frame records + PARSE inside the task,
# so only the (much smaller) parsed rows cross into the JVM.
# --------------------------------------------------------------------------


class ParsedWarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.files = options.get("files")
        if not self.path and not self.files:
            raise ValueError("xps_parsed_warc requires a path or files")
        self.batch_rows = int(options.get("batch_rows", "256"))
        self.num_partitions = int(options.get("num_partitions", "0"))

    def partitions(self):
        from .listing import group_round_robin

        files = (
            self.files.splitlines() if self.files else list_warc_files(self.path)
        )
        return [
            _WarcPartition(g)
            for g in group_round_robin(files, self.num_partitions)
        ]

    def read(self, partition: _WarcPartition) -> Iterator:
        import pyarrow as pa

        from ..operators.parse import _parse_arrow_batches

        def record_batches():
            urls: list[str] = []
            htmls: list[bytes] = []
            for path in partition.paths:
                if path.endswith(".gz"):
                    with open(path, "rb") as fh:
                        records = iter_warc_records_gz_bytes(fh.read())
                else:
                    records = iter_warc_records(open(path, "rb"))
                for url, _ts, html in records:
                    urls.append(url)
                    htmls.append(html)
                    if len(urls) >= self.batch_rows:
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(urls, type=pa.string()),
                                pa.array(htmls, type=pa.binary()),
                            ],
                            names=["url", "html"],
                        )
                        urls, htmls = [], []
            if urls:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(urls, type=pa.string()),
                        pa.array(htmls, type=pa.binary()),
                    ],
                    names=["url", "html"],
                )

        yield from _parse_arrow_batches(record_batches())


class ParsedWarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xps_parsed_warc"

    def schema(self):
        from ..operators.parse import PARSED_SCHEMA

        return PARSED_SCHEMA

    def reader(self, schema) -> ParsedWarcReader:
        return ParsedWarcReader(self.options)


def read_parsed_warc(spark, path: str, num_partitions: int | None = None):
    """Fused crawl ingest: .warc.gz shards -> parsed rows (PARSED_SCHEMA)
    without the html bytes ever crossing the JVM. The warc twin of
    parse_datasource.read_parsed."""
    spark.dataSource.register(ParsedWarcDataSource)
    reader = spark.read.format("xps_parsed_warc")
    if num_partitions:
        reader = reader.option("num_partitions", str(num_partitions))
    return reader.load(path)


def read_parsed_warc_files(
    spark, files: list[str], num_partitions: int | None = None
):
    """Explicit file-list variant of read_parsed_warc -- the slice
    reader for run_extract's warc path: each slice gzip-decodes AND
    parses only its own file group in-task, so the (much smaller)
    parsed rows are what the layout shuffle moves, not the raw html."""
    spark.dataSource.register(ParsedWarcDataSource)
    reader = spark.read.format("xps_parsed_warc").option(
        "files", "\n".join(files)
    )
    if num_partitions:
        reader = reader.option("num_partitions", str(num_partitions))
    return reader.load()
